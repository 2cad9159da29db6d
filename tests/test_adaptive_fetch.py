"""Adaptive key-set joins + null-key cache-aside semantics (ADVICE r11
/ VERDICT r11 item 5).

The r11 content-shuffle rule pinned F.broadcast on miss-id sets so
content never enters an exchange; that left two seams:

1. the pinned hint bypassed autoBroadcastJoinThreshold with no size
   bound — a pathological full-miss / bulk-delete set would OOM the
   driver instead of degrading to the shuffle join Spark would choose
   at that size (`adaptive_key_join` now counts the materialized key
   set and drops the hint above BROADCAST_KEY_LIMIT);
2. the anti→broadcast-semi rewrite silently dropped null-key rows
   (null = null never matches in equality joins), so hits ∪ misses no
   longer partitioned the input in cache_aside / chunk_fallback /
   embed_incremental (`null_key_rows` routes them into misses — the
   pre-r11 left_anti behavior).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline2_spark.operators import cache, chunking, embedding
from data_pipeline2_spark.plans.partitioning import (
    adaptive_key_join,
    null_key_rows,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_small_key_set_broadcasts(spark):
    content = spark.range(1000).select(
        F.col("id"), F.repeat(F.lit("x"), 100).alias("payload")
    )
    keys = spark.range(10).select("id")
    out = adaptive_key_join(content, keys, "id")
    assert out.count() == 10
    assert "BroadcastHashJoin" in _plan(out)


def test_large_key_set_degrades_to_shuffle(spark):
    """The large-miss path (VERDICT r11 item 5 'done' criterion): above
    the limit the PINNED hint is dropped and the plan choice returns
    to Spark's own size accounting — same rows either way. Asserted
    with autoBroadcastJoinThreshold disabled, because that is exactly
    the regime the guard exists for: an explicit hint overrides the
    threshold unconditionally (the r11 OOM seam), an unhinted join
    obeys it."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", None)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        content = spark.range(5000).select(
            F.col("id"), F.repeat(F.lit("x"), 10).alias("payload")
        )
        keys = spark.range(4000).select("id")
        over = adaptive_key_join(content, keys, "id", limit=1000)
        assert over.count() == 4000
        over.collect()
        semi = [
            l
            for l in _plan(over).splitlines()
            if "Join" in l and "LeftSemi" in l
        ]
        assert semi and all(
            "BroadcastHashJoin" not in l for l in semi
        ), semi
        # control: within the limit the pin still forces the broadcast
        # even with the threshold off — the steady-state contract
        under = adaptive_key_join(content, keys, "id", limit=10**9)
        assert "BroadcastHashJoin" in _plan(under)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        if old_aqe is None:
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        else:
            spark.conf.set(
                "spark.sql.adaptive.autoBroadcastJoinThreshold", old_aqe
            )


def test_anti_variant_output_identical_across_limit(spark):
    content = spark.range(100).select("id")
    keys = spark.range(30).select("id")
    lo = adaptive_key_join(content, keys, "id", "left_anti", limit=5)
    hi = adaptive_key_join(content, keys, "id", "left_anti", limit=10**9)
    assert sorted(r.id for r in lo.collect()) == sorted(
        r.id for r in hi.collect()
    )


def test_null_key_rows_multi_key(spark):
    df = spark.createDataFrame(
        [(1, "a"), (None, "b"), (2, None), (None, None)],
        "k1 int, k2 string",
    )
    assert null_key_rows(df, ["k1", "k2"]).count() == 3
    assert null_key_rows(df, "k1").count() == 2


def test_cache_aside_partitions_input_with_null_keys(spark):
    requests = spark.createDataFrame(
        [(1, "r1"), (2, "r2"), (None, "r3")], "key int, body string"
    )
    cached = spark.createDataFrame([(1, "c1")], "key int, val string")
    hits, misses = cache.cache_aside(requests, cached, ["key"])
    hit_rows = {r.body for r in hits.collect()}
    miss_rows = {r.body for r in misses.collect()}
    # null-key request: never a hit, must not vanish (ADVICE r11)
    assert hit_rows == {"r1"}
    assert miss_rows == {"r2", "r3"}
    assert hit_rows | miss_rows == {"r1", "r2", "r3"}
    assert not hit_rows & miss_rows


def test_embed_incremental_keeps_null_id_chunks(spark):
    chunks = spark.createDataFrame(
        [("c1", "alpha"), (None, "beta")], "chunk_id string, content string"
    )
    cached = embedding.embed_chunks(
        chunks.filter(F.col("chunk_id") == "c1"),
        text_col="content",
        id_col="chunk_id",
    )
    out = embedding.embed_incremental(chunks, cached)
    assert out.count() == 2  # the null-id chunk still embeds as a miss
    assert out.filter(F.col("chunk_id").isNull()).count() == 1


def test_chunk_fallback_covers_null_id_documents(spark):
    docs = spark.createDataFrame(
        [(1, "some text"), (None, "orphan text")], "doc_id int, text string"
    )
    chunks = chunking.chunk_fixed(
        docs.filter(F.col("doc_id").isNotNull()), 500
    ).select("doc_id", "pos", "chunk_id", "content")
    out = chunking.chunk_fallback(docs, chunks)
    fb = out.filter(F.col("is_fallback")).collect()
    assert len(fb) == 1 and fb[0]["content"] == "orphan text"
    assert out.count() == chunks.count() + 1
