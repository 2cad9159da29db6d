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
