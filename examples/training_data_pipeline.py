#!/usr/bin/env python3
"""End-to-end training-data pipeline on the engine — the composition a
user of the reference system would run after switching:

  raw corpus → quality filter → benchmark decontamination (bloom
  prefilter + exact verify) → exact dedup → near dedup (MinHash
  clusters) → chunk to token budget → embed (cache-aside) → pack into
  training sequences → stable train/val/test split → partitioned
  parquet layout → data-quality expectation gate

Run:  python examples/training_data_pipeline.py [sf_dir] [out_dir]
Defaults: /root/testdata/sf0.01 → /tmp/dp2s_example_out
Every stage prints row counts; the output directory holds the final
sequence table partitioned by split.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window


def main(sf_dir: str, out_dir: str):
    from data_pipeline2_spark.operators import chunking, dedup, embedding
    from data_pipeline2_spark.operators.sampling import train_test_split
    from data_pipeline2_spark.operators.textanalysis import quality_score
    from data_pipeline2_spark.session import get_spark
    from data_pipeline2_spark.sources.parquet import load_table

    spark = get_spark("dp2s-example")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    print(f"corpus:            {docs.count():>8} docs")

    # 0. corpus diagnostics BEFORE touching anything: how duplicated is
    #    this corpus, and what boilerplate spans repeat across docs?
    #    (these numbers decide how aggressive the dedup passes must be)
    from data_pipeline2_spark.operators.dedup import (
        duplicate_ngram_spans,
        near_dup_stats,
    )

    stats = near_dup_stats(docs).collect()[0]
    frac = stats.dup_doc_fraction if stats.dup_doc_fraction is not None else 0.0
    print(
        f"diagnostics:       {stats.n_dup_pairs} near-dup pairs, "
        f"{frac:.1%} of docs in a dup pair"
    )
    spans = duplicate_ngram_spans(docs, top=3).collect()
    for sp in spans:
        print(f"  boilerplate x{sp.n_docs} docs: \"{sp.gram[:60]}…\"")

    # 1. quality filter: drop bottom-quality documents
    scored = quality_score(docs).filter(F.col("quality") >= 0.5)
    docs = docs.join(scored.select("doc_id"), "doc_id", "left_semi")
    print(f"quality >= 0.5:    {docs.count():>8} docs")

    # 2. benchmark decontamination: treat the 20 lowest doc ids as the
    #    stand-in eval suite; drop corpus docs with >= 10% 5-gram
    #    overlap. Bloom-bits prefilter + exact verify — identical
    #    output to the exact path at any eval-set size.
    from data_pipeline2_spark.operators.textanalysis import decontaminate_bloom

    eval_set = docs.orderBy("doc_id").limit(20)
    corpus = docs.join(eval_set.select("doc_id"), "doc_id", "left_anti")
    contaminated = (
        decontaminate_bloom(corpus, eval_set)
        .filter(F.col("contaminated"))
        .select("doc_id")
    )
    docs = corpus.join(contaminated, "doc_id", "left_anti")
    print(f"decontaminated:    {docs.count():>8} docs")

    # 3. exact dedup (normalized content hash, keeper = min id)
    docs = dedup.dedup_exact_drop(docs)
    print(f"exact-deduped:     {docs.count():>8} docs")

    # 4. near dedup: MinHash/LSH pairs → connected components → keep
    #    one doc per cluster
    pairs = dedup.dedup_near_minhash(docs, threshold=0.6)
    clusters = dedup.dedup_clusters(pairs)
    doomed = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select(
        "doc_id"
    )
    docs = docs.join(doomed, "doc_id", "left_anti")
    print(f"near-deduped:      {docs.count():>8} docs")

    # 4b. exact-substring pass (Lee et al. 2022's 50-token standard):
    #     report the maximal cross-doc shared spans that survive
    #     doc-level dedup, and account for what the apply step would
    #     cut (lowest doc id keeps its copy, overlapping cuts merged)
    span_stats = dedup.exact_substring_dedup_stats(docs, n_tokens=50)
    agg = span_stats.agg(
        F.count(F.lit(1)).alias("docs_cut"),
        F.coalesce(F.sum("tokens_removed"), F.lit(0)).alias("tok_cut"),
    ).collect()[0]
    print(
        f"substring pass:    {agg.docs_cut:>8} docs carry >=50-token "
        f"duplicated spans ({agg.tok_cut} tokens would be cut)"
    )

    # 5. chunk to a 64-token budget (context-window chunking)
    chunks = chunking.chunk_metadata_enrich(
        chunking.chunk_sentence(docs, 400), "sentence"
    )
    print(f"chunks:            {chunks.count():>8}")

    # 6. embed with cache-aside (second run would only embed new chunks)
    cache_path = os.path.join(out_dir, "embedding_cache")
    try:
        cached = spark.read.parquet(cache_path)
    except Exception:
        cached = spark.createDataFrame(
            [], "chunk_id string, provider string, embedding array<float>"
        )
    embedded = embedding.embed_incremental(chunks, cached)
    embedded.write.mode("overwrite").parquet(cache_path)
    print(f"embedded:          {embedded.count():>8} vectors (cache at {cache_path})")

    # 7. pack whole documents into ~512-token training sequences and
    #    split stably by document id
    est = F.ceil(F.col("n_chars") / 4.0).cast("long")
    sized = docs.select("doc_id", "text", est.alias("est_tokens"))
    split = train_test_split(sized, "doc_id", 90, 5)
    w = (
        Window.partitionBy("split")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = split.withColumn(
        "seq_id",
        F.floor((F.sum("est_tokens").over(w) - 1) / 512.0).cast("int"),
    )
    final = out.select("split", "seq_id", "doc_id", "est_tokens", "text")
    final.write.mode("overwrite").partitionBy("split").parquet(
        os.path.join(out_dir, "sequences")
    )
    print("final split:")
    final.groupBy("split").agg(
        F.count(F.lit(1)).alias("docs"),
        F.count_distinct("seq_id").alias("sequences"),
        F.sum("est_tokens").alias("tokens"),
    ).orderBy("split").show()
    print(f"written to {out_dir}/sequences (partitioned by split)")

    # 8. expectation gate: refuse to ship a malformed sequence table
    from data_pipeline2_spark.operators import expectations as ex

    checks = ex.check_expectations(
        final,
        [
            ex.not_null("doc_id"),
            ex.unique("doc_id"),
            ex.in_set("split", ["train", "val", "test"]),
            ex.in_range("est_tokens", 0, 10_000_000),
            ex.row_count_between(1, 10**12),
        ],
    )
    checks.show(truncate=False)
    failed = checks.filter(~F.col("passed")).count()
    if failed:
        raise SystemExit(f"expectation gate FAILED: {failed} checks")
    print("expectation gate: all checks passed")


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/dp2s_example_out"
    main(sf, out)
