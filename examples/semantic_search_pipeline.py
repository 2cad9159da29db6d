#!/usr/bin/env python3
"""End-to-end semantic-search pipeline on the engine — the reference's
query lifecycle (SURVEY.md §3.3; doc_pipeline/services/vector_storage.py
kNN + ES `match` full-text + search cache) re-expressed Spark-first:

  ingest documents → chunk (sentence pack) → embed chunks (cache-aside,
  deterministic hash embedder) → three retrieval modes over the corpus:
    1. lexical   — BM25 top-k (ES `match` scoring parity)
    2. vector    — cosine kNN top-k (ES script_score parity)
    3. hybrid    — reciprocal-rank fusion of both (ES RRF parity)
  → search-cache key for the fused request (sha256, reference
    search_cache.py:18-33 parity)

Run:  python examples/semantic_search_pipeline.py [sf_dir]
Default: /root/testdata/sf0.01. Prints each stage's row counts and the
top-5 hits per retrieval mode.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


QUERY_TERMS = ["dup", "vector", "spark"]


def main(sf_dir: str):
    from data_pipeline2_spark.operators import chunking, embedding
    from data_pipeline2_spark.operators.similarity import (
        hybrid_search_rrf,
        knn_cosine,
        search_cache_key,
    )
    from data_pipeline2_spark.operators.textanalysis import bm25_search
    from data_pipeline2_spark.session import get_spark
    from data_pipeline2_spark.sources.parquet import load_table

    spark = get_spark("dp2s-search-example")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    print(f"corpus:          {docs.count():>8} docs")

    # 1. chunk: sentence-pack to the reference's 500-char default
    chunks = chunking.chunk_sentence(docs, chunk_size=500)
    print(f"chunks:          {chunks.count():>8}")

    # 2. embed chunks with the deterministic hash embedder (the
    #    pluggable pandas_udf seam the reference fills with HTTP
    #    providers), dim matching the embeddings table
    embedded = embedding.embed_chunks(chunks, dim=64)
    print(f"chunk vectors:   {embedded.count():>8}")

    # 3a. lexical: BM25 over the document corpus
    bm = bm25_search(docs, QUERY_TERMS, k=5)
    print("\nBM25 top-5:")
    for r in bm.collect():
        print(f"  doc {r['doc_id']:>6}  score={r['score']:.4f}  terms={r['matched_terms']}")

    # 3b. vector: cosine kNN against the corpus embedding table
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    vec = knn_cosine(emb, qvec, k=5)
    print("\nkNN top-5:")
    for r in vec.collect():
        print(f"  vec {r['vec_id']:>6}  score={r['score']:.4f}")

    # 3c. hybrid: RRF fusion of both rankings
    fused = hybrid_search_rrf(docs, emb, QUERY_TERMS, qvec, k=5)
    print("\nHybrid RRF top-5:")
    for r in fused.collect():
        print(
            f"  doc {r['doc_id']:>6}  rrf={r['rrf_score']:.6f}  "
            f"bm25_rank={r['bm25_rank']}  vec_rank={r['vec_rank']}"
        )

    # 4. deterministic search-cache key for this request (the engine's
    #    analog of the reference's Redis search cache key)
    key_df = spark.range(1).select(
        search_cache_key(
            F.lit("hash64"),
            F.lit(",".join(QUERY_TERMS)),
            F.lit(5),
            F.lit(str([round(float(x), 4) for x in qvec[:8]])),
        ).alias("cache_key")
    )
    print(f"\nsearch cache key: {key_df.collect()[0]['cache_key'][:32]}…")
    return fused


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
