"""Write-path operators — the engine's sinks.

Reference sinks are ES index upserts keyed by deterministic _id
(documents: document_storage.py:66-114; embeddings composite id
`{chunk_id}_{provider}`: vector_storage.py:61-67; jobs:
job_storage.py:55-75) plus Redis SETEX caches. On an immutable lake:

- upsert        → append to a log + latest-wins compaction on rewrite
  (never update in place);
- idempotent PK → dropDuplicates on the key before write;
- TTL cache     → expires_at column (operators/cache.py);
- partitioned layout → `partitionBy` on the natural pruning column
  (job_type / event date), which at 100 TB is what makes readers prune.

Each writer returns the re-read DataFrame so pipelines (and the oracle
harness) can verify the roundtrip — a write is only done when a reader
sees exactly the intended rows.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline2_spark.operators.relational import latest_state


def write_parquet_roundtrip(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> DataFrame:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    return df.sparkSession.read.parquet(path)


def upsert_documents(
    base: DataFrame,
    updates: DataFrame,
    path: str,
    key: str = "doc_id",
    version_col: str = "updated_at",
) -> DataFrame:
    """ES-style upsert-by-id: append updates, keep latest per key,
    rewrite. (document_storage.py:86-114 as a batch rewrite.)"""
    log = base.unionByName(updates)
    current = latest_state(log, [key], [F.desc(version_col)])
    return write_parquet_roundtrip(current, path)


def write_embeddings_idempotent(
    embeddings: DataFrame,
    path: str,
    keys: tuple[str, ...] = ("chunk_id", "provider"),
) -> DataFrame:
    """Composite-PK idempotent write: duplicate submissions collapse to
    one row per key (the `_id = chunk_id_provider` overwrite,
    vector_storage.py:61-67)."""
    return write_parquet_roundtrip(
        embeddings.dropDuplicates(list(keys)), path
    )


def write_jobs_partitioned(jobs: DataFrame, path: str) -> DataFrame:
    """Jobs sink partitioned by job_type → readers prune by type."""
    return write_parquet_roundtrip(jobs, path, partition_by=["job_type"])


def compact(spark: SparkSession, path: str, target_bytes: int = 128 * 1024 * 1024):
    """Small-file compaction: rewrite each leaf directory of a table
    into ~target_bytes files, preserving any partition layout.

    100 TB lakes rot into millions of small files under streaming /
    incremental writers; scan throughput and driver planning both
    degrade. Per-leaf: read → coalesce to ceil(total/target) → write to
    .tmp → swap. Crash leftovers (.compact_tmp / .compact_old from an
    interrupted run) are recovered or cleared before the swap, so the
    operation is safely re-runnable. Returns total file count after.
    """
    import glob
    import shutil

    root = path.rstrip("/")
    # crash recovery: a previous run may have died mid-swap
    old, tmp = root + ".compact_old", root + ".compact_tmp"
    if not os.path.exists(root) and os.path.exists(old):
        os.rename(old, root)  # swap died between the two renames
    shutil.rmtree(old, ignore_errors=True)
    shutil.rmtree(tmp, ignore_errors=True)

    # leaf dirs = directories that directly contain parquet files
    # (partitioned tables have hive-style key=value subdirs)
    leaves = sorted(
        {os.path.dirname(f) for f in glob.glob(os.path.join(root, "**", "*.parquet"), recursive=True)}
    )
    total_files = 0
    for leaf in leaves:
        files = glob.glob(os.path.join(leaf, "*.parquet"))
        total = sum(os.path.getsize(f) for f in files)
        n_files = int(max(1, (total + target_bytes - 1) // target_bytes))
        if n_files >= len(files):
            total_files += len(files)
            continue  # already compact enough
        leaf_tmp = leaf + ".compact_tmp"
        leaf_old = leaf + ".compact_old"
        shutil.rmtree(leaf_tmp, ignore_errors=True)
        spark.read.parquet(leaf).coalesce(n_files).write.mode("overwrite").parquet(
            leaf_tmp
        )
        os.rename(leaf, leaf_old)
        os.rename(leaf_tmp, leaf)
        shutil.rmtree(leaf_old, ignore_errors=True)
        total_files += len(glob.glob(os.path.join(leaf, "*.parquet")))
    return total_files


def delete_keys(
    spark: SparkSession, path: str, keys_df: DataFrame, key_col: str
) -> DataFrame:
    """Hard-delete rows by key from an immutable table: anti-join
    rewrite (the GDPR/right-to-be-forgotten pattern). On a partitioned
    lake, restrict the rewrite to affected partitions.
    """
    df = spark.read.parquet(path)
    kept = df.join(keys_df.select(key_col), key_col, "left_anti")
    tmp = path.rstrip("/") + ".delete_tmp"
    kept.write.mode("overwrite").parquet(tmp)
    import shutil

    old = path.rstrip("/") + ".delete_old"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
    return spark.read.parquet(path)


def scratch_dir(name: str, sf_dir: str) -> str:
    """Deterministic per-(operator, dataset) scratch path for
    write-roundtrip queries; overwrite mode keeps repeated runs
    idempotent."""
    tag = sf_dir.strip("/").replace("/", "_")
    return os.path.join("/tmp", "dp2s_write", tag, name)
