"""Embedding seam invariants, mirroring the reference's
test_embedding_service.py: cache hit returns identical vector without
recompute (:62-84), failures dropped from results (:109-123),
determinism of the provider seam."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from data_pipeline2_spark.operators import embedding


def test_hash_embed_deterministic_unit_norm():
    a = embedding.hash_embed_one("hello world", 64)
    b = embedding.hash_embed_one("hello world", 64)
    c = embedding.hash_embed_one("different", 64)
    assert a == b
    assert a != c
    assert len(a) == 64
    assert abs(math.sqrt(sum(x * x for x in a)) - 1.0) < 1e-6


def test_embed_chunks_drops_failures(spark):
    rows = [("c1", "some text"), ("c2", "   "), ("c3", "more text")]
    chunks = spark.createDataFrame(rows, "chunk_id string, content string")
    out = embedding.embed_chunks(chunks).toPandas()
    # blank content = provider failure → dropped, not nulled (reference
    # embedding_service.py:206-212)
    assert set(out.chunk_id) == {"c1", "c3"}
    assert (out.provider == "hash64").all()


def test_embed_incremental_reuses_cache(spark):
    rows = [(f"c{i}", f"text number {i}") for i in range(10)]
    chunks = spark.createDataFrame(rows, "chunk_id string, content string")
    # cache holds poisoned vectors for even ids: if the pipeline
    # recomputed them, values would differ
    poisoned = embedding.embed_chunks(
        chunks.filter(F.expr("substring(chunk_id, 2) % 2 = 0"))
    ).withColumn("embedding", F.transform("embedding", lambda x: x * 0 + 7.0))
    out = embedding.embed_incremental(chunks, poisoned).toPandas()
    assert len(out) == 10
    vals = {r.chunk_id: r.embedding for r in out.itertuples()}
    assert all(v == 7.0 for v in vals["c0"])  # cache hit: untouched
    assert any(abs(v) < 1.0 for v in vals["c1"])  # miss: freshly computed


def test_embed_metrics_counts(spark):
    log = spark.createDataFrame(
        [("nomic", "success"), ("nomic", "success"), ("nomic", "error"),
         ("granite", "cache_hit")],
        "provider string, status string",
    )
    out = {(r.provider, r.status): r.requests
           for r in embedding.embed_metrics(log).collect()}
    assert out[("nomic", "success")] == 2
    assert out[("granite", "cache_hit")] == 1


def test_embed_incremental_scoped_to_request(spark):
    # the cache holds MANY more chunks than requested; output must be
    # keyed to the request, not the cache
    all_chunks = spark.createDataFrame(
        [(f"c{i}", f"text {i}") for i in range(100)],
        "chunk_id string, content string",
    )
    cached = embedding.embed_chunks(all_chunks)
    request = all_chunks.filter(F.expr("substring(chunk_id, 2) < 10"))
    out = embedding.embed_incremental(request, cached)
    assert out.count() == request.count()
