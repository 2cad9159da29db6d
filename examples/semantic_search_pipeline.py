#!/usr/bin/env python3
"""End-to-end semantic-search pipeline on the engine — the reference's
query lifecycle (SURVEY.md §3.3; doc_pipeline/services/
document_processor.py chunking → embedding_service.py cache-aside →
vector_storage.py kNN + search_cache.py request keys) re-expressed
Spark-first.

The serving spine (chunk store → embedding cache-aside → vector index
→ cosine top-k → search-cache key) runs through
`operators/serving_e2e.semantic_search_frames` — the SAME function the
driver-oracled `semantic_search_e2e` registry key exports, so this
walkthrough narrates exactly the composition the correctness gate
value-checks (the r10 training_data_pipeline.py pattern). The lexical
(BM25) and hybrid (RRF) retrieval modes follow as solo members.

Run:  python examples/semantic_search_pipeline.py [sf_dir]
Default: /root/testdata/sf0.01. Prints the per-stage census, the top-5
hits per retrieval mode, and the request's cache key.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


QUERY_TERMS = ["dup", "vector", "spark"]


def main(sf_dir: str):
    from data_pipeline2_spark.operators import serving_e2e
    from data_pipeline2_spark.operators.similarity import (
        hybrid_search_rrf,
        search_cache_key,
    )
    from data_pipeline2_spark.operators.textanalysis import bm25_search
    from data_pipeline2_spark.session import get_spark
    from data_pipeline2_spark.sources.parquet import load_table

    spark = get_spark("dp2s-search-example")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")

    # 1. the composed serving lifecycle — the oracled flagship: chunk
    #    store, cache-aside embed, vector index, ranked top-5 serve
    fr = serving_e2e.semantic_search_frames(docs, k=5)
    census = serving_e2e.census_from_frames(fr, k=5)
    print("serving census (stage, rows_in -> rows_out):")
    for r in census.orderBy("stage_idx").collect():
        d = f"  detail={r['detail']}" if r["detail"] is not None else ""
        print(
            f"  {r['stage_idx']}. {r['stage']:<13} "
            f"{r['rows_in']:>8} -> {r['rows_out']:>8}{d}"
        )

    print(f"\nvector top-5 for {serving_e2e.QUERY_TEXT!r}:")
    for r in fr["ranked"].collect():
        print(f"  #{r['rank']}  chunk {r['chunk_id']:>10}  score={r['score']:.6f}")

    # 2. lexical: BM25 over the document corpus (solo member)
    bm = bm25_search(docs, QUERY_TERMS, k=5)
    print("\nBM25 top-5:")
    for r in bm.collect():
        print(f"  doc {r['doc_id']:>6}  score={r['score']:.4f}  terms={r['matched_terms']}")

    # 3. hybrid: RRF fusion of lexical + vector over the corpus
    #    embedding table (solo member)
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    fused = hybrid_search_rrf(docs, emb, QUERY_TERMS, qvec, k=5)
    print("\nHybrid RRF top-5:")
    for r in fused.collect():
        print(
            f"  doc {r['doc_id']:>6}  rrf={r['rrf_score']:.6f}  "
            f"bm25_rank={r['bm25_rank']}  vec_rank={r['vec_rank']}"
        )

    # 4. deterministic search-cache key for the fused request (the
    #    engine's analog of the reference's Redis search cache)
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
