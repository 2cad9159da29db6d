"""Expectation-suite semantics on constructed data (the testdata tables
are clean, so violations need synthetic rows)."""

from __future__ import annotations

import pytest

from data_pipeline2_spark.operators import expectations as ex


def _df(spark):
    rows = [
        (1, 10.0, "O"),
        (2, 20.0, "F"),
        (2, -5.0, "X"),   # dup key, out-of-range, out-of-set
        (None, 30.0, "O"),  # null key
    ]
    return spark.createDataFrame(rows, "k long, price double, status string")


def test_each_kind_counts_violations(spark):
    out = {
        r["expectation"]: r.asDict()
        for r in ex.check_expectations(
            _df(spark),
            [
                ex.not_null("k"),
                ex.unique("k"),
                ex.in_range("price", 0, 100),
                ex.in_set("status", ["O", "F"]),
                ex.max_null_fraction("k", 0.5),
                ex.row_count_between(1, 3),
            ],
        ).collect()
    }
    assert out["not_null(k)"]["violations"] == 1
    # 4 rows, 2 distinct non-null values -> dup + null = 2 violations
    assert out["unique(k)"]["violations"] == 2
    assert out["in_range(price,0,100)"]["violations"] == 1
    assert out["in_set(status,[O,F])"]["violations"] == 1
    # null fraction 1/4 <= 0.5 -> passes
    assert out["max_null_fraction(k,0.5)"]["passed"] is True
    # 4 rows > hi=3 -> 1 violation
    assert out["row_count_between(1,3)"]["violations"] == 1
    assert all(r["total"] == 4 for r in out.values())
    assert out["not_null(k)"]["passed"] is False


def test_clean_table_passes_everything(spark):
    from data_pipeline2_spark.sources.parquet import load_table

    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    out = ex.check_expectations(
        orders,
        [
            ex.not_null("o_custkey"),
            ex.unique("o_orderkey"),
            ex.row_count_between(1, 10**9),
        ],
    ).collect()
    assert all(r["passed"] for r in out)


def test_single_scan_plan(spark):
    """The whole suite must compile to ONE aggregate over one scan —
    adding checks adds expressions, not passes."""
    df = _df(spark)
    plan = (
        ex.check_expectations(
            df, [ex.not_null("k"), ex.in_range("price", 0, 100)]
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan") <= 1


def test_null_in_condition_is_violation(spark):
    """A null price makes in_range unevaluable -> counts as violation,
    never a vacuous pass."""
    df = spark.createDataFrame(
        [(1, None)], "k long, price double"
    )
    out = ex.check_expectations(df, [ex.in_range("price", 0, 100)]).collect()
    assert out[0]["violations"] == 1 and out[0]["passed"] is False


def test_suite_validation(spark):
    df = _df(spark)
    with pytest.raises(ValueError, match="empty suite"):
        ex.check_expectations(df, [])
    with pytest.raises(ValueError, match="duplicate"):
        ex.check_expectations(df, [ex.not_null("k"), ex.not_null("k")])


def test_approx_quantile_check_contract(spark):
    from data_pipeline2_spark.operators.aggregates import approx_quantile_check
    from data_pipeline2_spark.sources.parquet import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    out = approx_quantile_check(ev, "event_type", "value", [0.5, 0.9]).collect()
    assert len(out) == 10  # 5 event types x 2 quantiles
    assert all(r["approx_ok"] for r in out)


def test_approx_quantile_check_catches_broken_accuracy(spark):
    """A sketch far coarser than the claimed accuracy must flip the
    boolean: emulate by lying about accuracy (claim 200k on a coarse
    accuracy-1 sketch via a monkeypatched threshold)."""
    from pyspark.sql import functions as F

    from data_pipeline2_spark.operators import aggregates as ag

    # one group, adversarial data: heavy ties away from the median
    rows = [(i, "a", float(i)) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, g string, value double")
    # accuracy=1 -> rank error up to n; claimed tolerance 1/200000
    orig = F.percentile_approx

    def coarse(col, ps, accuracy):
        return orig(col, ps, 1)

    ag.F.percentile_approx = coarse
    try:
        out = ag.approx_quantile_check(df, "g", "value", [0.9], 200_000).collect()
    finally:
        ag.F.percentile_approx = orig
    assert any(not r["approx_ok"] for r in out)


def test_expectation_names_with_backslashes_and_quotes(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1,)], "k long")
    weird = (r"not_null(we'ird\)", "not_null", F.count(F.lit(1)) - F.count("k"))
    out = ex.check_expectations(df, [weird]).collect()
    assert out[0]["expectation"] == r"not_null(we'ird\)"
    assert out[0]["passed"] is True


def test_approx_quantile_ignores_null_values_and_keeps_null_groups(spark):
    from pyspark.sql import functions as F

    from data_pipeline2_spark.operators.aggregates import approx_quantile_check

    rows = [(i, "a", float(i)) for i in range(1000)]
    rows += [(i + 1000, "a", None) for i in range(1000)]  # nulls must not skew
    rows += [(i + 2000, None, float(i)) for i in range(100)]  # NULL group
    df = spark.createDataFrame(rows, "id long, g string, value double")
    out = approx_quantile_check(df, "g", "value", [0.5, 0.9]).collect()
    assert len(out) == 4  # groups 'a' and NULL x 2 quantiles
    assert all(r["approx_ok"] for r in out)
    assert any(r["g"] is None for r in out)


def test_finite_flags_nan_and_inf_but_not_null(spark):
    """finite() is the ingest gate for the non-finite-double contract:
    NaN and ±Inf violate; NULL passes (presence is not_null's job, and
    conflating them would hide which check failed)."""
    from data_pipeline2_spark.operators import expectations as ex

    df = spark.createDataFrame(
        [(1.0,), (float("nan"),), (float("inf"),), (float("-inf"),), (None,)],
        "x double",
    )
    out = {
        r.expectation: (r.violations, r.passed)
        for r in ex.check_expectations(
            df, [ex.finite("x"), ex.not_null("x")]
        ).collect()
    }
    assert out["finite(x)"] == (3, False)
    assert out["not_null(x)"] == (1, False)
    clean = spark.createDataFrame([(0.0,), (None,)], "x double")
    ok = ex.check_expectations(clean, [ex.finite("x")]).collect()[0]
    assert ok.violations == 0 and ok.passed
