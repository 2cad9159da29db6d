"""Planted-fixture tests: CDC merge, market basket, EWMA, triangles."""

import pytest

from pyspark.sql import functions as F


def test_merge_upsert_latest_wins(spark):
    from data_pipeline2_spark.operators.joins import merge_upsert

    base = spark.createDataFrame(
        [(1, "a", 100), (2, "b", 200), (3, "c", 300)],
        "k long, status string, cents long",
    )
    changes = spark.createDataFrame(
        [
            (2, "U", 1, "b2", 250),   # update
            (4, "I", 1, "new", 400),  # insert
            (3, "D", 1, None, None),  # delete
            (1, "U", 1, "a2", 110),   # superseded by later delete
            (1, "D", 2, None, None),
        ],
        "k long, op string, change_ts int, status string, cents long",
    )
    out = {r.k: r for r in merge_upsert(base, changes, ["k"]).collect()}
    assert set(out) == {2, 4}  # 1 and 3 deleted, 4 inserted
    assert out[2].status == "b2" and out[2].cents == 250
    assert out[4].status == "new" and out[4].cents == 400


def test_merge_upsert_no_changes_passthrough(spark):
    from data_pipeline2_spark.operators.joins import merge_upsert

    base = spark.createDataFrame([(1, "a")], "k long, status string")
    empty = spark.createDataFrame(
        [], "k long, op string, change_ts int, status string"
    )
    out = merge_upsert(base, empty, ["k"]).collect()
    assert len(out) == 1 and out[0].status == "a"


def test_market_basket_support_and_lift(spark):
    from data_pipeline2_spark.operators.joins import market_basket

    # 4 orders: {10,20} x3, {10,30} x1 -> pair (10,20) support 3
    rows = []
    for o, parts in [(1, [10, 20]), (2, [10, 20]), (3, [10, 20, 30]),
                     (4, [10, 30])]:
        rows += [(o, p) for p in parts]
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    out = {(r.part_a, r.part_b): r for r in market_basket(df).collect()}
    r = out[(10, 20)]
    assert r.pair_orders == 3 and r.orders_a == 4 and r.orders_b == 3
    # lift = N*c_ab/(c_a*c_b) = 4*3/(4*3) = 1.0
    assert r.lift == pytest.approx(1.0)
    assert (10, 30) in out and out[(10, 30)].pair_orders == 2


def test_ewma_values_planted(spark):
    from data_pipeline2_spark.streaming.events import ewma_values

    df = spark.createDataFrame(
        [(1, 1, "2024-01-01 00:00:00", 0.0), (2, 1, "2024-01-01 00:01:00", 2.0),
         (3, 1, "2024-01-01 00:02:00", 2.0)],
        "event_id long, user_id long, ts string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {r.event_id: r.ewma for r in ewma_values(df).collect()}
    assert out[1] == 0.0
    # n=2: (0.5*2 + 0.25*0) / 0.75
    assert out[2] == pytest.approx(4 / 3, abs=1e-6)
    # n=3: (0.5*2 + 0.25*2 + 0.125*0) / 0.875
    assert out[3] == pytest.approx(1.5 / 0.875, abs=1e-6)


def test_ewma_single_shuffle(spark):
    from data_pipeline2_spark.streaming.events import ewma_values

    df = spark.createDataFrame(
        [(1, 1, "2024-01-01 00:00:00", 1.0)],
        "event_id long, user_id long, ts string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    plan = ewma_values(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1  # one window partition, 8 lags share it


def test_dup_graph_triangles_planted(spark):
    from data_pipeline2_spark.operators.dedup import dup_graph_triangles

    body = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    docs = spark.createDataFrame(
        [(1, body), (2, body + " tail1"), (3, body + " tail2"),
         (9, "completely unrelated text about other things entirely here")],
        "doc_id long, text string",
    )
    out = dup_graph_triangles(docs).collect()
    assert [(r.doc_a, r.doc_b, r.doc_c) for r in out] == [(1, 2, 3)]


def test_top_paths_respects_session_boundaries(spark):
    from data_pipeline2_spark.streaming.events import top_paths

    rows = [
        # user 1, one session: view>click>buy and click>buy>view
        (1, 1, "2024-01-01 10:00:00", "view"),
        (2, 1, "2024-01-01 10:01:00", "click"),
        (3, 1, "2024-01-01 10:02:00", "buy"),
        (4, 1, "2024-01-01 10:03:00", "view"),
        # same user, NEW session (gap > 30 min): must not chain across
        (5, 1, "2024-01-01 12:00:00", "click"),
        (6, 1, "2024-01-01 12:01:00", "buy"),
        # user 2 repeats view>click>buy
        (7, 2, "2024-01-01 09:00:00", "view"),
        (8, 2, "2024-01-01 09:01:00", "click"),
        (9, 2, "2024-01-01 09:02:00", "buy"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {r.path: r.occurrences for r in top_paths(df).collect()}
    assert got["view>click>buy"] == 2
    assert got["click>buy>view"] == 1
    # cross-boundary paths (buy>view>click, view>click>buy via evt 4-6) absent
    assert "buy>view>click" not in got
    assert sum(got.values()) == 3


def test_ewma_null_values_and_all_null_user(spark):
    """NULL values drop out of the weighted sum; a user whose entire
    lookback is NULL gets NULL (not NaN — engines spell NaN
    differently)."""
    df = spark.createDataFrame(
        [(1, 1, "2024-01-01 00:00:00", None),
         (2, 1, "2024-01-01 00:01:00", 4.0),
         (3, 2, "2024-01-01 00:00:00", None)],
        "event_id long, user_id long, ts string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    from data_pipeline2_spark.streaming.events import ewma_values

    out = {r.event_id: r.ewma for r in ewma_values(df).collect()}
    assert out[1] is None          # only a NULL in the window
    assert out[2] == 4.0           # NULL lag contributes nothing
    assert out[3] is None          # all-NULL user
