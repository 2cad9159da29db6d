"""Edge semantics of the as-of and banded range joins, plus their plan
shapes (one hash shuffle / equi-join — never a nested loop)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from data_pipeline2_spark.operators import joins


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _left(spark):
    return spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01 10:00:00")),
            (2, 10, _ts("2024-01-01 12:00:00")),
            (3, 10, _ts("2024-01-01 09:00:00")),  # before any right row
            (4, 20, _ts("2024-01-01 10:00:00")),  # key with no right rows
        ],
        "id long, k long, ts timestamp",
    )


def _right(spark):
    return spark.createDataFrame(
        [
            (10, _ts("2024-01-01 10:00:00"), 100.0),  # tie with left id=1
            (10, _ts("2024-01-01 11:30:00"), 200.0),
        ],
        "k long, ts timestamp, px double",
    )


def test_asof_backward_semantics(spark):
    out = joins.join_asof(
        _left(spark), _right(spark), ["k"], "ts", "ts", ["px"]
    )
    got = {r["id"]: r["px"] for r in out.collect()}
    # equal ts matches (<=): id=1 sees the 10:00 row
    assert got[1] == 100.0
    # latest-at-or-before wins: id=2 sees 11:30, not 10:00
    assert got[2] == 200.0
    # left rows before all right rows and unmatched keys get NULL
    assert got[3] is None
    assert got[4] is None
    assert out.count() == 4  # left join: every left row survives


def test_asof_single_shuffle(spark):
    out = joins.join_asof(
        _left(spark), _right(spark), ["k"], "ts", "ts", ["px"]
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # one hash-partitioning exchange on the key; no join operator at all
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_range_join_boundaries(spark):
    probe = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01 10:00:00")),  # == start: in
            (2, 10, _ts("2024-01-01 11:59:59")),  # inside
            (3, 10, _ts("2024-01-01 12:00:00")),  # == end: out
            (4, 10, _ts("2024-01-01 09:59:59")),  # before: out
            (5, 30, _ts("2024-01-01 10:30:00")),  # wrong key: out
        ],
        "id long, k long, ts timestamp",
    )
    iv = spark.createDataFrame(
        [(7, 10, _ts("2024-01-01 10:00:00"), _ts("2024-01-01 12:00:00"))],
        "wid long, k long, w_start timestamp, w_end timestamp",
    )
    # bucket width much smaller than the window: interval spans many
    # buckets, and each probe row must still match at most once
    out = joins.join_range(
        probe, iv, ["k"], "ts", "w_start", "w_end", 15 * 60 * 1_000_000
    )
    assert sorted(r["id"] for r in out.collect()) == [1, 2]


def test_range_join_is_equi_join(spark):
    probe = _left(spark)
    iv = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01 00:00:00"), _ts("2024-01-02 00:00:00"))],
        "wid long, k long, w_start timestamp, w_end timestamp",
    )
    out = joins.join_range(
        probe, iv, ["k"], "ts", "w_start", "w_end", 3600 * 1_000_000
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_range_join_matches_nested_loop(spark):
    """Bucketed rewrite == the obviously-correct inequality join."""
    ev = spark.range(200).select(
        (F.col("id") % 7).alias("k"),
        F.timestamp_micros(F.col("id") * 13_000_000 + 1_700_000_000_000_000).alias(
            "ts"
        ),
        F.col("id").alias("eid"),
    )
    iv = spark.range(20).select(
        (F.col("id") % 7).alias("k"),
        F.timestamp_micros(
            F.col("id") * 120_000_000 + 1_700_000_000_000_000
        ).alias("w_start"),
        F.timestamp_micros(
            F.col("id") * 120_000_000 + 1_700_000_300_000_000
        ).alias("w_end"),
        F.col("id").alias("wid"),
    )
    fast = joins.join_range(ev, iv, ["k"], "ts", "w_start", "w_end", 60_000_000)
    slow = (
        ev.alias("e")
        .join(
            iv.alias("i"),
            (F.col("e.k") == F.col("i.k"))
            & (F.col("e.ts") >= F.col("i.w_start"))
            & (F.col("e.ts") < F.col("i.w_end")),
        )
        .select(F.col("e.eid"), F.col("i.wid"))
    )
    got = sorted((r["eid"], r["wid"]) for r in fast.select("eid", "wid").collect())
    want = sorted((r["eid"], r["wid"]) for r in slow.collect())
    assert got == want and len(want) > 0
