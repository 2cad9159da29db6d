"""Bucketed co-located joins: the shuffle-deletion scale pattern.

At 100 TB the orders⋈lineitem shuffle dominates q3/q5/q18-class
queries; bucketing both fact tables by the join key at write time makes
the join a zero-exchange local merge. This test proves the engine's
write+read path achieves exactly that (no Exchange above either scan).
"""

from __future__ import annotations


import pytest
from pyspark.sql import functions as F

from data_pipeline2_spark.sources.parquet import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def warehouse(spark):
    # warehouse dir is a static conf — use the session default
    # (./spark-warehouse, gitignored) and clean the tables up after
    yield
    for t in ("orders_b", "lineitem_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_has_no_shuffle(spark, warehouse):
    orders = load_table(spark, SF, "orders")
    lineitem = load_table(spark, SF, "lineitem")
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("orders_b")
    )
    (
        lineitem.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("lineitem_b")
    )
    joined = (
        spark.table("orders_b")
        .join(
            spark.table("lineitem_b"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    join_section = plan.split("HashAggregate")[-1]
    assert "Exchange hashpartitioning" not in join_section, plan
    # and the result matches the unbucketed join
    base = (
        orders.join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(joined.collect()) == sorted(base.collect())


def test_bucketed_rate_limit_window_has_no_shuffle(spark):
    """hash(user_id) bucketing satisfies the rate limiter's
    (user_id, window) ClusteredDistribution — all rows of one
    (user, minute) cell share the user bucket — so admission over a
    user-bucketed event lake is a ZERO-exchange local sort. This is the
    lake-layout lever for the admission/sessionize family (same
    clustering serves sessionization, EWMA, top_paths)."""
    from data_pipeline2_spark.operators.lifecycle import rate_limit_flags

    events = load_table(spark, SF, "events")
    try:
        (
            events.write.mode("overwrite")
            .bucketBy(8, "user_id")
            .sortBy("user_id", "ts")
            .saveAsTable("events_b")
        )
        flagged = rate_limit_flags(spark.table("events_b"), cap=1)
        plan = flagged._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan
        # values identical to the unbucketed path
        base = {
            r.event_id: r.admitted
            for r in rate_limit_flags(events, cap=1).collect()
        }
        got = {r.event_id: r.admitted for r in flagged.collect()}
        assert got == base
    finally:
        spark.sql("DROP TABLE IF EXISTS events_b")
