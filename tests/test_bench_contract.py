"""bench.py output/baseline contract (VERDICT r11 finding 1).

Two coupled r11 defects, both judge-reproduced:
  (a) the single JSON stdout line outgrew the driver's 2000-char tail
      capture, so BENCH_r11.json recorded `parsed: null` and lost the
      headline value + 13 medians;
  (b) `_common_vs_prev` did `data.get("parsed", data).get(...)` —
      when `parsed` EXISTS but is null it raised AttributeError, so
      the next round's bench would exit rc=1.

These tests pin the fixes without a SparkSession: the baseline walk
skips non-dict `parsed` and falls through to older/local files, and
the compact stdout line stays under the capture budget and degrades
field-by-field instead of truncating mid-JSON.
"""

from __future__ import annotations

import json
import os
import sys

import pytest

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
import bench  # noqa: E402

# driver-certification tier (see pytest.ini): -m driver selects the
# fast oracle/contract subset the verify harness runs each round
pytestmark = pytest.mark.driver

TIMINGS = {f"q{i}": 0.5 + i / 100 for i in range(20)}
TMINS = {k: v * 0.9 for k, v in TIMINGS.items()}


def _write(path, obj):
    with open(path, "w") as fh:
        json.dump(obj, fh)


@pytest.fixture()
def bench_root(tmp_path, monkeypatch):
    """Point the baseline glob at a scratch dir via the pinned-path
    escape hatch being absent and __file__ redirection."""
    monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))
    monkeypatch.delenv("SPARK_GRAFT_BENCH_BASELINE", raising=False)
    return tmp_path


def test_parsed_null_newest_file_is_skipped(bench_root):
    # r11-shaped driver artifact: tail truncated, parsed null.
    _write(bench_root / "BENCH_r11.json", {"rc": 0, "tail": "x", "parsed": None})
    _write(
        bench_root / "BENCH_r10.json",
        {"parsed": {"queries": {"q1": 1.0, "q2": 2.0}, "sf": 0.1}},
    )
    prev = bench._common_vs_prev({"q1": 1.1, "q2": 2.1}, {"q1": 1.0, "q2": 2.0}, 0.1)
    assert prev is not None
    assert prev["prev_file"] == "BENCH_r10.json"
    assert prev["basis"] == "min"  # old-format baseline: min-vs-min


def test_local_baseline_beats_unparseable_driver_file_same_round(bench_root):
    _write(bench_root / "BENCH_r11.json", {"parsed": None})
    _write(
        bench_root / "BENCH_LOCAL_r11.json",
        {"queries": {"q1": 1.0}, "queries_min": {}, "sf": 0.1},
    )
    _write(
        bench_root / "BENCH_r10.json",
        {"parsed": {"queries": {"q1": 9.0}, "sf": 0.1}},
    )
    prev = bench._common_vs_prev({"q1": 1.2}, {"q1": 1.1}, 0.1)
    assert prev["prev_file"] == "BENCH_LOCAL_r11.json"
    # queries_min present (even empty) marks the new median format.
    assert prev["basis"] == "median"
    assert prev["ratio"] == pytest.approx(1.2, abs=0.01)


def test_compact_driver_capture_compares_median_basis(bench_root):
    """A DRIVER-captured r12+ file holds the COMPACT line: no
    queries_min, but noise.stat == 'median'. The next round must
    compare median-vs-median against it — falling back to min-vs-
    median would report a spurious improvement every round."""
    _write(
        bench_root / "BENCH_r12.json",
        {
            "parsed": {
                "queries": {"q1": 1.0},
                "noise": {"passes": 5, "stat": "median", "max_iqr_pct": 10.0},
                "sf": 0.1,
            }
        },
    )
    prev = bench._common_vs_prev({"q1": 1.1}, {"q1": 0.5}, 0.1)
    assert prev["basis"] == "median"
    assert prev["ratio"] == pytest.approx(1.1, abs=0.01)


def test_driver_file_wins_over_local_when_both_parse(bench_root):
    _write(
        bench_root / "BENCH_r11.json",
        {"parsed": {"queries": {"q1": 2.0}, "queries_min": {}, "sf": 0.1}},
    )
    _write(
        bench_root / "BENCH_LOCAL_r11.json",
        {"queries": {"q1": 1.0}, "queries_min": {}, "sf": 0.1},
    )
    prev = bench._common_vs_prev({"q1": 2.0}, {"q1": 1.8}, 0.1)
    assert prev["prev_file"] == "BENCH_r11.json"


def test_all_unparseable_returns_none(bench_root):
    _write(bench_root / "BENCH_r11.json", {"parsed": None})
    _write(bench_root / "BENCH_r10.json", "not a dict")
    assert bench._common_vs_prev(TIMINGS, TMINS, 0.1) is None


def test_sf_mismatch_skipped(bench_root):
    _write(
        bench_root / "BENCH_r11.json",
        {"parsed": {"queries": {"q1": 1.0}, "sf": 0.01}},
    )
    assert bench._common_vs_prev({"q1": 1.0}, {"q1": 0.9}, 0.1) is None


def test_pinned_baseline_missing_raises(bench_root, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_BENCH_BASELINE", "/nope/missing.json")
    with pytest.raises(FileNotFoundError):
        bench._common_vs_prev({"q1": 1.0}, {"q1": 0.9}, 0.1)


def _full_record(nq=20, with_prev=True):
    qs = {f"some_longish_query_name_{i:02d}": 1.234 for i in range(nq)}
    full = {
        "metric": "headline_total_wall",
        "value": round(sum(qs.values()), 3),
        "unit": "sec",
        "queries": qs,
        "queries_min": {k: v * 0.9 for k, v in qs.items()},
        "noise": {
            "passes": 5,
            "stat": "median",
            "iqr_pct": {k: 10.0 for k in qs},
            "max_iqr_pct": 43.4,
        },
        "sf": 0.1,
        "table_cache_warm": True,
        "cold_value": 28.5,
        "queries_cold": {k: v * 1.1 for k, v in qs.items()},
        "pass_totals": [30.1, 29.2, 29.3, 29.9, 30.0],
    }
    if with_prev:
        full["common_vs_prev"] = {
            "prev_file": "BENCH_LOCAL_r11.json",
            "basis": "median",
            "queries": sorted(qs),
            "subtotal": 24.1,
            "prev_subtotal": 24.0,
            "ratio": 1.004,
            "worst_regression": {"query": "x", "delta_sec": 0.5},
        }
    return full


def test_compact_line_fits_capture_window():
    line = bench._compact_line(_full_record())
    assert len(line) <= 1800
    out = json.loads(line)
    # The essentials survive compaction at today's headline count.
    assert out["value"] > 0 and out["sf"] == 0.1
    assert len(out["queries"]) == 20
    assert out["noise"]["max_iqr_pct"] == 43.4
    assert out["common_vs_prev"]["n_common"] == 20
    assert "queries" not in out["common_vs_prev"]  # the r11 bloat field
    # Bulk fields stay OUT of stdout (they live in BENCH_FULL_LATEST).
    for bulky in ("queries_min", "queries_cold", "pass_totals"):
        assert bulky not in out
    assert "iqr_pct" not in out["noise"]


def test_compact_line_degrades_not_truncates():
    # Pathological growth: 200 queries would blow the window; the line
    # must drop whole fields and stay valid JSON under budget.
    line = bench._compact_line(_full_record(nq=200))
    assert len(line) <= 1800
    out = json.loads(line)
    assert out["value"] > 0  # headline always survives
    assert "queries" not in out  # dropped first, as documented
