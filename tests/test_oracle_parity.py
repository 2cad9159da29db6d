"""Self-check harness mirroring the driver's t2 correctness gate:
run every registry query on Spark AND its DuckDB oracle, compare
row count, column names, and exact values (order-insensitive).

If this passes, the driver's value-hash comparison passes too (we
compare raw values, which is strictly stronger than hash equality).
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from data_pipeline2_spark import registry

from .conftest import SF_ORACLE

# driver-certification tier (see pytest.ini): -m driver selects the
# fast oracle/contract subset the verify harness runs each round
pytestmark = pytest.mark.driver

SPECS = [q for q in registry._QUERIES if q.sql is not None]
ROWS_ONLY = [q for q in registry._QUERIES if q.sql is None]


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            s = pd.to_datetime(s).astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            s = s.astype("float64")
        elif pd.api.types.is_bool_dtype(s):
            s = s.astype("bool")
        elif pd.api.types.is_integer_dtype(s):
            s = s.astype("int64")
        else:
            s = s.astype("string")
        out[c] = s
    norm = pd.DataFrame(out)
    return norm.sort_values(by=list(norm.columns), ignore_index=True)


def _compare(name: str, left: pd.DataFrame, right: pd.DataFrame):
    assert list(sorted(left.columns)) == list(sorted(right.columns)), (
        f"{name}: column mismatch {sorted(left.columns)} vs {sorted(right.columns)}"
    )
    # exact physical dtype parity (pre-normalization): int32 vs int64
    # differences would show up in the driver's schema record
    for c in left.columns:
        lk, rk = str(left[c].dtype), str(right[c].dtype)
        if "datetime" in lk and "datetime" in rk:
            continue  # ns-vs-us resolution is a pandas artifact
        assert lk == rk, f"{name}: dtype mismatch on {c}: {lk} vs {rk}"
    assert len(left) == len(right), f"{name}: rowcount {len(left)} vs {len(right)}"
    ln, rn = _normalize(left), _normalize(right)
    for c in ln.columns:
        lv, rv = ln[c], rn[c]
        if pd.api.types.is_float_dtype(lv):
            diff = ~(
                (lv.isna() & rv.isna())
                | (lv == rv)
            )
            if diff.any():
                i = diff.idxmax()
                assert False, (
                    f"{name}: float col {c} differs at row {i}: "
                    f"{lv[i]!r} vs {rv[i]!r} (exact compare)"
                )
        else:
            neq = ~((lv.isna() & rv.isna()) | (lv == rv))
            if neq.any():
                i = neq.idxmax()
                assert False, (
                    f"{name}: col {c} differs at row {i}: {lv[i]!r} vs {rv[i]!r}"
                )


@pytest.mark.parametrize("spec", SPECS, ids=[s.name for s in SPECS])
def test_oracle_parity(spec, spark, duck):
    sdf = spec.fn(spark, SF_ORACLE).toPandas()
    odf = duck.sql(spec.sql).df()
    _compare(spec.name, sdf, odf)


@pytest.mark.parametrize("spec", ROWS_ONLY, ids=[s.name for s in ROWS_ONLY])
def test_rows_only_runs(spec, spark):
    df = spec.fn(spark, SF_ORACLE)
    n = df.count()
    assert n >= 0
    df.limit(5).collect()  # schema + execution sanity
