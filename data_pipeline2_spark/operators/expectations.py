"""Data-quality expectations — the Deequ/Great-Expectations-shaped
constraint pass a pipeline runs before shipping a table downstream.

Reference parity: the reference validates payloads per-row with
Pydantic models at ingest (doc_pipeline/models/*.py); at lake scale
validation becomes per-COLUMN aggregate constraints over the whole
table. Every registered expectation compiles to an aggregate
expression, so a suite of any size runs in ONE scan with map-side
partial aggregation — adding checks never adds passes.

→ (expectation, kind, violations, total, passed), one row per check.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _viol_count(cond: Column) -> Column:
    """Count of rows VIOLATING the row-level condition (nulls in the
    condition itself count as violations — an unevaluable check fails
    loudly rather than vacuously passing)."""
    return F.count(F.lit(1)) - F.count(F.when(cond, F.lit(1)))


def not_null(col: str):
    return (f"not_null({col})", "not_null", _viol_count(F.col(col).isNotNull()))


def unique(col: str):
    """Violations = rows minus distinct non-null values: duplicates AND
    nulls both violate (a unique key must also be present)."""
    return (
        f"unique({col})",
        "unique",
        F.count(F.lit(1)) - F.count_distinct(F.col(col)),
    )


def in_range(col: str, lo, hi):
    return (
        f"in_range({col},{lo},{hi})",
        "in_range",
        _viol_count(F.col(col).between(F.lit(lo), F.lit(hi))),
    )


def in_set(col: str, values: list):
    vals = ",".join(str(v) for v in values)
    return (
        f"in_set({col},[{vals}])",
        "in_set",
        _viol_count(F.col(col).isin(values)),
    )


def max_null_fraction(col: str, frac: float):
    """Violations = null count when the null FRACTION exceeds `frac`,
    else 0 — so `passed` reflects the threshold while `violations`
    still reports the magnitude when it trips."""
    nulls = F.count(F.lit(1)) - F.count(F.col(col))
    limit = F.count(F.lit(1)) * F.lit(float(frac))
    return (
        f"max_null_fraction({col},{frac})",
        "max_null_fraction",
        F.when(nulls > limit, nulls).otherwise(F.lit(0)),
    )


def row_count_between(lo: int, hi: int):
    """Violations = |count - nearest bound| when outside [lo, hi]."""
    n = F.count(F.lit(1))
    return (
        f"row_count_between({lo},{hi})",
        "row_count_between",
        F.when(n < lo, F.lit(lo) - n).otherwise(
            F.when(n > hi, n - F.lit(hi)).otherwise(F.lit(0))
        ),
    )


def check_expectations(df: DataFrame, checks: list) -> DataFrame:
    """Run an expectation suite in ONE aggregation pass.

    `checks` is a list of (name, kind, violation_count_expr) tuples
    from the constructors above. The single agg computes every
    violation count plus the total; the per-check rows come from an
    unpivot (`stack`) of the one-row aggregate — no second scan, no
    driver-side loop over the data.
    """
    if not checks:
        raise ValueError("check_expectations: empty suite")
    names = [c[0] for c in checks]
    if len(set(names)) != len(names):
        raise ValueError("check_expectations: duplicate expectation names")
    agg = df.agg(
        F.count(F.lit(1)).alias("__total"),
        *[expr.cast("long").alias(f"__v{i}") for i, (_, _, expr) in enumerate(checks)],
    )
    n = len(checks)
    stacked = agg.select(
        F.col("__total"),
        F.expr(
            f"stack({n}, "
            + ", ".join(
                f"{_sql_str(name)}, {_sql_str(kind)}, __v{i}"
                for i, (name, kind, _) in enumerate(checks)
            )
            + ") as (expectation, kind, violations)"
        ),
    )
    return stacked.select(
        "expectation",
        "kind",
        "violations",
        F.col("__total").alias("total"),
        (F.col("violations") == 0).alias("passed"),
    )


def _sql_str(s: str) -> str:
    # Spark SQL string literals treat backslash as an escape char —
    # escape it BEFORE quoting or a name ending in a backslash turns
    # \' into an escaped quote and unbalances the stack() expression
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def finite(col: str):
    """Violations = NaN or ±Inf values (NULLs pass — presence is
    `not_null`'s job, and conflating the two hides which failed).

    The ingest gate for the non-finite-double contract: aggregate
    operators follow SQL semantics, where one NaN poisons a group's
    sum/avg and sorts above every real number — a pipeline is expected
    to run this check (and quarantine violators) BEFORE shipping a
    numeric column downstream, exactly like the reference validates
    payloads at ingest rather than teaching every consumer to tolerate
    garbage.
    """
    c = F.col(col)
    ok = c.isNull() | (
        ~F.isnan(c)
        & (c != F.lit(float("inf")))
        & (c != F.lit(float("-inf")))
    )
    return (f"finite({col})", "finite", _viol_count(ok))


def no_control_chars(col: str):
    """Violations = text containing C0/DEL control characters OTHER
    than the PORTABLE whitespace set (\\t \\n \\f \\r are legitimate;
    \\x00-\\x08, \\x0e-\\x1f, \\x7f are producer bugs — encoding
    damage, binary spill into a text column — and \\x0b (VT) is ruled
    out with them for a sharper reason: VT is whitespace to Java and
    Python regex but NOT to RE2, so no portable tokenization of a
    VT-bearing text exists — Spark would split a word where the DuckDB
    oracle keeps it whole. \\f sits in ALL three dialects' \\s and
    stays legal).

    This is the gate that makes the engine's ASCII-whitespace contract
    (functions/text.py:ASCII_WS) total: trim/split/blank semantics are
    pinned for the whitespace set, and every OTHER control character is
    ruled out of the lake here instead of each operator defining ad-hoc
    behavior for it. NULL text counts as a violation (the module-wide
    unevaluable-fails-loudly rule); pair with `not_null` to tell the
    two apart.
    """
    ok = ~F.col(col).rlike("[\\x00-\\x08\\x0b\\x0e-\\x1f\\x7f]")
    return (f"no_control_chars({col})", "no_control_chars", _viol_count(ok))
