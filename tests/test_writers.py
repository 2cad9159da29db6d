"""Sink maintenance operators: compaction and key deletion."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from data_pipeline2_spark.operators.writers import compact, delete_keys


@pytest.fixture()
def fragmented_table(spark):
    d = tempfile.mkdtemp(prefix="dp2s_compact_")
    path = os.path.join(d, "t")
    # simulate streaming rot: 40 tiny files
    spark.range(4000).withColumn("v", F.col("id") * 2).repartition(40).write.parquet(
        path
    )
    yield path
    shutil.rmtree(d, ignore_errors=True)


def test_compact_reduces_files_preserves_rows(spark, fragmented_table):
    before = len(glob.glob(os.path.join(fragmented_table, "*.parquet")))
    assert before >= 30
    n_after = compact(spark, fragmented_table, target_bytes=1 << 30)
    assert n_after == 1
    df = spark.read.parquet(fragmented_table)
    assert df.count() == 4000
    assert df.agg(F.sum("v")).collect()[0][0] == sum(i * 2 for i in range(4000))


def test_delete_keys_anti_join_rewrite(spark, fragmented_table):
    doomed = spark.createDataFrame([(i,) for i in range(0, 4000, 10)], "id long")
    out = delete_keys(spark, fragmented_table, doomed, "id")
    assert out.count() == 4000 - 400
    assert out.filter(F.col("id") % 10 == 0).count() == 0
    # idempotent: deleting again changes nothing
    out2 = delete_keys(spark, fragmented_table, doomed, "id")
    assert out2.count() == 3600


def test_compact_preserves_partition_layout(spark):
    d = tempfile.mkdtemp(prefix="dp2s_compact_part_")
    path = os.path.join(d, "t")
    df = spark.range(2000).withColumn("part", (F.col("id") % 3).cast("string"))
    df.repartition(10).write.partitionBy("part").parquet(path)
    before_leaves = {os.path.dirname(f) for f in
                     glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)}
    assert len(before_leaves) == 3
    compact(spark, path, target_bytes=1 << 30)
    after = spark.read.parquet(path)
    assert after.count() == 2000
    after_leaves = {os.path.dirname(f) for f in
                    glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)}
    assert after_leaves == before_leaves  # layout preserved
    plan = after.filter(F.col("part") == "1")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    shutil.rmtree(d, ignore_errors=True)


def test_compact_recovers_from_crashed_swap(spark, fragmented_table):
    # simulate a crash between the two renames: table dir missing,
    # .compact_old holding the data
    old = fragmented_table.rstrip("/") + ".compact_old"
    os.rename(fragmented_table, old)
    n = compact(spark, fragmented_table, target_bytes=1 << 30)
    assert n == 1
    assert spark.read.parquet(fragmented_table).count() == 4000


def test_compact_recovers_partitioned_leaf_crash(spark):
    d = tempfile.mkdtemp(prefix="dp2s_leafcrash_")
    path = os.path.join(d, "t")
    df = spark.range(600).withColumn("part", (F.col("id") % 2).cast("string"))
    df.repartition(6).write.partitionBy("part").parquet(path)
    # simulate a crash mid-leaf-swap: leaf renamed away, tmp left behind
    leaf = os.path.join(path, "part=0")
    os.rename(leaf, leaf + ".compact_old")
    os.makedirs(leaf + ".compact_tmp")
    compact(spark, path, target_bytes=1 << 30)
    back = spark.read.parquet(path)
    assert back.count() == 600  # leaf restored, nothing lost
    # partition-value inference may read them back as ints; compare as str
    assert {str(r.part) for r in back.select("part").distinct().collect()} == {"0", "1"}
    shutil.rmtree(d, ignore_errors=True)


def test_delete_keys_preserves_partitions_and_recovers(spark):
    d = tempfile.mkdtemp(prefix="dp2s_delpart_")
    path = os.path.join(d, "t")
    df = spark.range(500).withColumn("part", (F.col("id") % 2).cast("string"))
    df.write.partitionBy("part").parquet(path)
    doomed = spark.createDataFrame([(i,) for i in range(0, 500, 5)], "id long")
    out = delete_keys(spark, path, doomed, "id")
    assert out.count() == 400
    # partition layout survived
    assert any("part=" in n for n in os.listdir(path))
    plan = spark.read.parquet(path).filter(F.col("part") == "1")._jdf \
        .queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # crash recovery: table renamed away mid-swap, rerun restores + deletes
    os.rename(path, path + ".delete_old")
    out2 = delete_keys(spark, path, doomed, "id")
    assert out2.count() == 400
    shutil.rmtree(d, ignore_errors=True)


def test_upsert_version_tie_is_deterministic(spark):
    base = spark.createDataFrame(
        [(1, "aaa", 1), (1, "zzz", 1)], "doc_id long, payload string, version int"
    )
    d = tempfile.mkdtemp(prefix="dp2s_tie_")
    from data_pipeline2_spark.operators.writers import upsert_documents

    outs = set()
    for i in range(3):
        out = upsert_documents(
            base, base.limit(0), os.path.join(d, f"t{i}"),
            key="doc_id", version_col="version",
        )
        outs.add(out.collect()[0]["payload"])
    assert len(outs) == 1  # same winner every run
    shutil.rmtree(d, ignore_errors=True)


def test_jsonl_csv_roundtrip_hostile_content(spark):
    from data_pipeline2_spark.sources import text_formats

    rows = [
        (1, 'quote " and comma, and\nnewline', "en"),
        (2, "unicode: naïve café 中文 🙂", "zh"),
        (3, None, None),  # nulls survive both formats
        (4, "trailing space ", "en"),
    ]
    ddl = "doc_id long, text string, lang string"
    df = spark.createDataFrame(rows, ddl)
    base = tempfile.mkdtemp(prefix="dp2s_fmt_")
    try:
        for fmt, write, read in (
            ("jsonl", text_formats.write_jsonl, text_formats.read_jsonl),
            ("csv", text_formats.write_csv, text_formats.read_csv),
        ):
            path = os.path.join(base, fmt)
            write(df, path)
            back = read(spark, path, ddl)
            got = {r.doc_id: (r.text, r.lang) for r in back.collect()}
            want = {i: (t, l) for i, t, l in rows}
            assert got == want, f"{fmt} roundtrip mismatch: {got}"
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_compact_small_files_reduces_count_preserves_rows(spark, tmp_path):
    import glob

    from data_pipeline2_spark.operators.writers import compact_small_files
    from data_pipeline2_spark.sources.parquet import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    path = str(tmp_path / "fragmented")
    docs.repartition(40).write.parquet(path)  # simulate micro-batch litter
    n_before = len(glob.glob(path + "/*.parquet"))
    assert n_before >= 30

    before = {r.doc_id for r in docs.collect()}
    out = compact_small_files(spark, path, target_mb=128)
    n_after = len(glob.glob(path + "/*.parquet"))
    assert n_after < n_before
    assert {r.doc_id for r in out.collect()} == before
    # second run is a no-op (already compacted)
    out2 = compact_small_files(spark, path, target_mb=128)
    assert len(glob.glob(path + "/*.parquet")) == n_after
    assert out2.count() == len(before)
    # no stray staging dirs
    assert not glob.glob(path + ".__compact*")


def test_roundtrip_refuses_self_overwrite(spark, tmp_path):
    """mode('overwrite') deletes the target before the write job runs
    the plan — a df that reads `path` would fail mid-write with
    FAILED_READ_FILE on any warm-cache rerun (hit live in
    examples/training_data_pipeline.py's embedding cache, r12). The
    writer detects the self-read and raises up front; the materialized
    (localCheckpoint) form of the same plan writes fine."""
    import pytest

    from data_pipeline2_spark.operators.writers import (
        write_parquet_roundtrip,
    )

    path = str(tmp_path / "cache")
    spark.range(10).write.parquet(path)
    again = spark.read.parquet(path).withColumn("x", F.lit(1))
    with pytest.raises(ValueError, match="refusing to overwrite"):
        write_parquet_roundtrip(again, path)
    # writing somewhere else never triggers the guard
    assert write_parquet_roundtrip(again, str(tmp_path / "b")).count() == 10
    # the documented escape hatch round-trips (last: the overwrite
    # replaces the files `again`'s listing points at)
    out = write_parquet_roundtrip(
        again.localCheckpoint(eager=True), path
    )
    assert out.count() == 10


def test_swap_writers_refuse_remote_schemes(spark):
    """The rename-swap recovery protocol is local-only; a remote URI
    must fail BEFORE any work (the upsert_sink contract, extended to
    every swap writer after ADVICE r11's silent-local-probe finding)."""
    import pytest

    from data_pipeline2_spark.operators.writers import (
        compact,
        compact_small_files,
        delete_keys,
    )

    keys = spark.range(1).selectExpr("id AS doc_id")
    for call in (
        lambda: delete_keys(spark, "s3a://bucket/table", keys, "doc_id"),
        lambda: compact(spark, "hdfs://nn/table"),
        lambda: compact_small_files(spark, "s3a://bucket/t"),
    ):
        with pytest.raises(ValueError, match="local-filesystem-only"):
            call()
