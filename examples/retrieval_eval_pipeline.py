"""Offline retrieval evaluation in ONE Spark application.

The batch counterpart of the reference's per-request search API: score
a whole query table through the lexical, vector, and hybrid paths and
compare their rankings — the calibration loop behind choosing rrf_k /
n_candidates / quantization depth.

Run: python examples/retrieval_eval_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    from data_pipeline2_spark.operators.similarity import (
        hybrid_search_rrf_batch,
        knn_batch,
        knn_batch_sq8,
    )
    from data_pipeline2_spark.operators.textanalysis import bm25_search_batch
    from data_pipeline2_spark.session import get_spark
    from data_pipeline2_spark.sources.parquet import load_table

    spark = get_spark("retrieval-eval-example")
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    texts = {0: "hash join strategy", 1: "slow scan filter",
             2: "customer order data"}
    qv = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    queries = spark.createDataFrame(
        list(texts.items()), "qid long, query string"
    ).join(qv, "qid")

    k = 10
    bm = bm25_search_batch(docs, queries, k=k)
    exact = knn_batch(emb, queries.select("qid", "qvec"), k=k)
    sq8 = knn_batch_sq8(emb, queries.select("qid", "qvec"), k=k, rerank=50)
    hybrid = hybrid_search_rrf_batch(docs, emb, queries, k=k)

    def topset(df, id_col):
        rows = df.collect()  # one job per result table
        return {q: {r[id_col] for r in rows if r.qid == q} for q in texts}

    bm_s, ex_s, sq_s, hy_s = (
        topset(bm, "doc_id"), topset(exact, "vec_id"),
        topset(sq8, "vec_id"), topset(hybrid, "doc_id"),
    )
    for q, text in texts.items():
        overlap = len(bm_s[q] & ex_s[q])
        sq8_recall = len(sq_s[q] & ex_s[q]) / k
        from_each = (len(hy_s[q] & bm_s[q]), len(hy_s[q] & ex_s[q]))
        print(
            f"q{q} '{text}': lexical∩vector@{k}={overlap}, "
            f"SQ8 recall@{k}={sq8_recall:.2f}, "
            f"hybrid draws {from_each[0]} lexical / {from_each[1]} vector"
        )


if __name__ == "__main__":
    main(*sys.argv[1:2])
