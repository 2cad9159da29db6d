r"""Dirty-lake differential gate: Spark-vs-DuckDB value parity over a
lake with NULL texts, blank/whitespace-only texts, non-ASCII content,
messy internal whitespace, NULL langs, NULL event values, and NULL
event_type group keys (scripts/make_dirty_lake.py).

Why this exists: every driver fixture is PRISTINE — zero nulls, zero
blanks, zero non-ASCII in every sf* table (measured 2026-08-15) — so
the clean-lake parity gate can never exercise null three-valued
logic, trim-vs-strip whitespace classes, or NULL group keys. The
first run of this sweep found 11 real divergences (NOT IN + NULL
nullifying dedup_incremental's oracle to 0 rows, count(DISTINCT)
silently dropping the NULL category from the chi-square dof, python
strip() vs SQL space-only trim() disagreeing on tab-only chunks,
NULL-payload probes, ...) — all fixed and pinned here.

Round 9 added the Unicode-whitespace-ONLY document (ADVICE r8 item 3
generalized) and it surfaced 42 more: DuckDB's bare trim()/ltrim()/
rtrim() strip Unicode Zs where Spark's strip ONLY 0x20, DuckDB's
levenshtein counts BYTES where Spark's counts CODEPOINTS, and the
Python twins (str.strip()/str.split()/re \s) default to Unicode
whitespace. All pinned: every oracle 1-arg trim → explicit char set
(' ' for JVM F.trim replays, the 6-char ASCII set for Python-strip
twins), Python seams → ASCII_WS / re.ASCII, edit_distance → ASCII
projection on both sides.

Scope: keys whose oracle reads the dirtied tables (documents /
events). Keys over the untouched TPC-H/embeddings tables would just
repeat the clean-lake gate.
"""

from __future__ import annotations

import duckdb
import pytest

from data_pipeline2_spark import registry

from .test_oracle_parity import _compare

DIRTY_SPECS = [
    q
    for q in registry._QUERIES
    if q.sql is not None and ("documents" in q.sql or "events" in q.sql)
]


@pytest.fixture(scope="session")
def dirty_lake(tmp_path_factory):
    import sys
    import os

    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts",
        ),
    )
    from make_dirty_lake import build

    out = str(tmp_path_factory.mktemp("dirty_lake"))
    build(out)
    return out


@pytest.fixture(scope="session")
def dirty_duck(dirty_lake):
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{dirty_lake}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize(
    "spec", DIRTY_SPECS, ids=[s.name for s in DIRTY_SPECS]
)
def test_dirty_lake_parity(spec, spark, dirty_lake, dirty_duck):
    sdf = spec.fn(spark, dirty_lake).toPandas()
    odf = dirty_duck.sql(spec.sql).df()
    _compare(spec.name, sdf, odf)
