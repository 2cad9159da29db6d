#!/usr/bin/env python3
"""End-to-end training-data pipeline on the engine — the composition a
user of the reference system would run after switching:

  raw corpus → quality filter → benchmark decontamination (adaptive:
  broadcast-exact for small suites, bloom prefilter + exact verify
  past the broadcast threshold — output-identical either way) → exact
  dedup → near dedup (MinHash clusters) → chunk to token budget →
  embed (cache-aside) → pack into training sequences → stable
  train/val/test split → partitioned parquet layout → data-quality
  expectation gate

The composition itself lives in
`data_pipeline2_spark.operators.pipeline_e2e` and is exported as the
DuckDB-oracled registry key `training_pipeline_e2e` — this script
calls the SAME function (training_pipeline_frames), narrates the
per-stage census, and adds the side-effecting steps a walkthrough
wants (corpus diagnostics, cache-aside embedding, the parquet write).

Run:  python examples/training_data_pipeline.py [sf_dir] [out_dir]
Defaults: /root/testdata/sf0.01 → /tmp/dp2s_example_out
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main(sf_dir: str, out_dir: str):
    from data_pipeline2_spark.operators import chunking, embedding
    from data_pipeline2_spark.operators.pipeline_e2e import (
        census_from_frames,
        training_pipeline_frames,
    )
    from data_pipeline2_spark.session import get_spark
    from data_pipeline2_spark.sources.parquet import load_table

    spark = get_spark("dp2s-example")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")

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
    for sp in duplicate_ngram_spans(docs, top=3).collect():
        print(f"  boilerplate x{sp.n_docs} docs: \"{sp.gram[:60]}…\"")

    # 1-8. the oracled composition — quality gate, decontamination,
    #      exact + near dedup, chunking, pack/split, expectation gate —
    #      exactly what the `training_pipeline_e2e` registry key runs
    frames = training_pipeline_frames(docs)
    print("per-stage census (the driver-oracled view of this run):")
    census_from_frames(frames).orderBy("stage_idx").show(truncate=False)

    # 6b. embed the chunk table with cache-aside (a second run embeds
    #     only chunks the cache has not seen)
    chunks = chunking.chunk_metadata_enrich(frames["chunks"], "sentence")
    cache_path = os.path.join(out_dir, "embedding_cache")
    try:
        cached = spark.read.parquet(cache_path)
    except Exception:
        cached = spark.createDataFrame(
            [], "chunk_id string, provider string, embedding array<float>"
        )
    # materialize BEFORE overwriting the plan's own input: `embedded`
    # reads `cache_path` (the hits + the miss fetch), and
    # mode("overwrite") deletes those files before the write job runs
    # the plan — on a second run (warm cache, the whole point of
    # cache-aside) that's FAILED_READ_FILE mid-write. The eager
    # localCheckpoint pins the result first; a production lake would
    # stage-and-swap instead (writers.delete_keys shows the protocol).
    embedded = embedding.embed_incremental(chunks, cached).localCheckpoint(
        eager=True
    )
    embedded.write.mode("overwrite").parquet(cache_path)
    print(
        f"embedded:          {embedded.count():>8} vectors "
        f"(cache at {cache_path})"
    )

    # 7b. persist the packed sequence table, partitioned by split —
    # re-join the surviving docs so each sequence row carries its TEXT
    # (the census frame is metadata-only by design)
    final = frames["final"].join(
        frames["s5"].select("doc_id", "text"), "doc_id"
    ).select("split", "seq_id", "doc_id", "est_tokens", "text")
    final.write.mode("overwrite").partitionBy("split").parquet(
        os.path.join(out_dir, "sequences")
    )
    final.groupBy("split").agg(
        F.count(F.lit(1)).alias("docs"),
        F.count_distinct("seq_id").alias("sequences"),
        F.sum("est_tokens").alias("tokens"),
    ).orderBy("split").show()
    print(f"written to {out_dir}/sequences (partitioned by split)")

    # 8b. expectation gate: refuse to ship a malformed sequence table
    checks = frames["checks"]
    checks.show(truncate=False)
    failed = checks.filter(~F.col("passed")).count()
    if failed:
        raise SystemExit(f"expectation gate FAILED: {failed} checks")
    print("expectation gate: all checks passed")


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/dp2s_example_out"
    main(sf, out)
