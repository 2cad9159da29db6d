"""The examples/ pipeline must keep running end-to-end."""

from __future__ import annotations

import os
import runpy
import shutil
import sys
import tempfile


def test_training_data_pipeline_example(spark):
    out = tempfile.mkdtemp(prefix="dp2s_example_test_")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    mod = runpy.run_path(os.path.join(repo, "examples", "training_data_pipeline.py"))
    mod["main"]("/root/testdata/sf0.001", out)
    seq = spark.read.parquet(os.path.join(out, "sequences"))
    assert seq.count() > 0
    assert set(r.split for r in seq.select("split").distinct().collect()) <= {
        "train", "val", "test"
    }
    shutil.rmtree(out, ignore_errors=True)


def test_semantic_search_pipeline_example(spark):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    mod = runpy.run_path(os.path.join(repo, "examples", "semantic_search_pipeline.py"))
    fused = mod["main"]("/root/testdata/sf0.001")
    rows = fused.collect()
    assert len(rows) == 5
    # fused output carries at least one doc ranked by BOTH legs
    assert any(r["bm25_rank"] is not None and r["vec_rank"] is not None for r in rows)
