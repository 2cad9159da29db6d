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
    if mode == "overwrite":
        # refuse to overwrite the plan's own input: mode("overwrite")
        # deletes the target BEFORE the write job executes the plan, so
        # a df that scans `path` fails mid-write with FAILED_READ_FILE
        # — or worse, silently computes from partially-deleted input.
        # Best-effort detection (scan locations can truncate in big
        # plans): the caller should localCheckpoint first, or
        # stage-and-swap like delete_keys.
        plan = df._jdf.queryExecution().executedPlan().toString()
        ap = os.path.abspath(path).rstrip("/")
        if ap in plan or f"file:{ap}" in plan:
            raise ValueError(
                f"write_parquet_roundtrip: refusing to overwrite {path!r}"
                " — the DataFrame's plan reads from that very path."
                " Materialize first (df.localCheckpoint(eager=True)) or"
                " write to a staging dir and swap (see delete_keys)."
            )
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    # explicit schema on the read-back: a zero-row partitioned write
    # leaves only _SUCCESS (no part files, no partition dirs), and
    # schema inference then fails with UNABLE_TO_INFER_SCHEMA — an
    # empty source partition/date must round-trip to an empty table,
    # not an AnalysisException. Name-matched, so partitioned layouts
    # read identically (values unchanged, column order = df's).
    return df.sparkSession.read.schema(df.schema).parquet(path)


def upsert_documents(
    base: DataFrame,
    updates: DataFrame,
    path: str,
    key: str = "doc_id",
    version_col: str = "updated_at",
) -> DataFrame:
    """ES-style upsert-by-id: append updates, keep latest per key,
    rewrite. (document_storage.py:86-114 as a batch rewrite.)

    Version ties (same key, same version, different payload) break
    deterministically on a content hash of the remaining columns —
    never on partition order, so reruns produce identical tables.
    """
    log = base.unionByName(updates)
    payload_cols = [c for c in log.columns if c not in (key, version_col)]
    tie_break = F.md5(
        F.concat_ws("\x1f", *[F.col(c).cast("string") for c in payload_cols])
    )
    current = latest_state(
        log, [key], [F.desc(version_col), F.desc(tie_break)]
    )
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


def _require_local(fn_name: str, path: str) -> None:
    """The rename-swap crash-recovery protocol (os.rename + os.walk) is
    local-filesystem-only. On a remote URI (s3a://, hdfs://) the
    os.path probes would read 'absent', compute a full rewrite, then
    die at the first rename — or silently mistake state. Fail before
    any work, the same contract streaming/events.upsert_sink pins
    (ADVICE r11's silent-local-probe lesson, applied to every swap
    writer)."""
    from urllib.parse import urlparse

    scheme = urlparse(path).scheme
    if len(scheme) > 1 and scheme != "file":
        raise ValueError(
            f"{fn_name}: path {path!r} has URI scheme {scheme!r}; the "
            "rename-swap recovery protocol is local-filesystem-only "
            "(for object stores, use a table format with atomic MERGE)"
        )


def _recover_swaps(root: str, suffix: str) -> None:
    """Repair `<dir>{suffix}_old` / `<dir>{suffix}_tmp` leftovers from a
    crashed swap, at the root AND at every partition leaf.

    A crash between os.rename(leaf, leaf_old) and os.rename(leaf_tmp,
    leaf) leaves the leaf missing with its data in leaf_old; restore it.
    Any remaining _old/_tmp dirs are deleted so a rerun's recursive glob
    cannot mistake them for hive partitions.
    """
    import glob
    import shutil

    if not os.path.exists(root) and os.path.exists(root + suffix + "_old"):
        os.rename(root + suffix + "_old", root)  # root swap died mid-way
    shutil.rmtree(root + suffix + "_old", ignore_errors=True)
    shutil.rmtree(root + suffix + "_tmp", ignore_errors=True)
    if os.path.isdir(root):
        for d in glob.glob(os.path.join(root, "**", f"*{suffix}_old"), recursive=True):
            original = d[: -len(suffix + "_old")]
            if not os.path.exists(original):
                os.rename(d, original)  # leaf swap died mid-way
            else:
                shutil.rmtree(d, ignore_errors=True)
        for d in glob.glob(os.path.join(root, "**", f"*{suffix}_tmp"), recursive=True):
            shutil.rmtree(d, ignore_errors=True)


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

    _require_local("compact", path)
    root = path.rstrip("/")
    _recover_swaps(root, ".compact")

    # leaf dirs = directories that directly contain parquet files
    # (partitioned tables have hive-style key=value subdirs); swap
    # leftovers were cleared above so none can masquerade as partitions
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


def _partition_columns(path: str) -> list[str]:
    """Hive-style partition column names (in nesting order) of a table
    directory, detected from `key=value` subdirectory names."""
    cols: list[str] = []
    cur = path
    while True:
        subdirs = [
            d for d in os.listdir(cur)
            if "=" in d and os.path.isdir(os.path.join(cur, d))
        ]
        if not subdirs:
            return cols
        name = subdirs[0].split("=", 1)[0]
        cols.append(name)
        cur = os.path.join(cur, subdirs[0])


def delete_keys(
    spark: SparkSession, path: str, keys_df: DataFrame, key_col: str
) -> DataFrame:
    """Hard-delete rows by key from an immutable table: anti-join
    rewrite (the GDPR/right-to-be-forgotten pattern).

    Preserves any hive partition layout (detected from the directory
    structure and re-applied via partitionBy) and recovers from a crash
    between the swap renames before running — safe to re-run. On a real
    partitioned lake, additionally restrict the rewrite to partitions
    that actually contain doomed keys.
    """
    import shutil

    _require_local("delete_keys", path)
    root = path.rstrip("/")
    _recover_swaps(root, ".delete")
    part_cols = _partition_columns(root)
    df = spark.read.parquet(root)
    # the doomed-key set is a deletion REQUEST batch — small by
    # construction, so it broadcasts and the full-width lake rows never
    # enter an exchange during the rewrite (r11 content-shuffle rule).
    # Sized, not pinned (ADVICE r11): a bulk purge beyond the key limit
    # degrades to the shuffle anti join rather than OOMing the driver —
    # output-identical either way.
    from data_pipeline2_spark.plans.partitioning import adaptive_key_join

    kept = adaptive_key_join(df, keys_df.select(key_col), key_col, "left_anti")
    tmp = root + ".delete_tmp"
    writer = kept.write.mode("overwrite")
    if part_cols:
        writer = writer.partitionBy(*part_cols)
    writer.parquet(tmp)
    old = root + ".delete_old"
    os.rename(root, old)
    os.rename(tmp, root)
    shutil.rmtree(old, ignore_errors=True)
    return spark.read.parquet(root)


def scratch_dir(name: str, sf_dir: str) -> str:
    """Deterministic per-(operator, dataset) scratch path for
    write-roundtrip queries; overwrite mode keeps repeated runs
    idempotent."""
    tag = sf_dir.strip("/").replace("/", "_")
    return os.path.join("/tmp", "dp2s_write", tag, name)


def compact_small_files(
    spark: SparkSession,
    path: str,
    target_mb: int = 128,
) -> DataFrame:
    """Roundtrip veneer over `compact` (the per-leaf, crash-recoverable,
    partition-preserving compaction above): run the maintenance job,
    then return the re-read DataFrame — the writers-module contract
    that a write is only done when a reader sees exactly the intended
    rows. Use `compact` directly for the file-count telemetry."""
    compact(spark, path, target_bytes=target_mb * 1024 * 1024)
    return spark.read.parquet(path)


def shard_manifest(
    documents: DataFrame,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic export-shard manifest → one row per shard:
    (shard, n_docs, n_tokens, n_bytes, content_checksum, min_doc_id,
    max_doc_id).

    The reproducibility artifact a training-data export ships next to
    its files (every published corpus release carries one): shard
    assignment is pmod(doc_id, n_shards) — pure, re-derivable, no
    packing state — and `content_checksum` is the order-insensitive
    BIGINT sum of each doc's 60-bit text fingerprint folded to 32 bits,
    so a re-export (or a consumer) re-computes the manifest and
    byte-diffs it without ordering guarantees. NULL-text docs count in
    n_docs (they ship as rows) with zero tokens/bytes/checksum.

    Scale shape: ONE aggregation keyed on the shard id — map-side
    partials, n_shards output rows; the fingerprints hash inside the
    scan projection, so no exchange ever carries text.
    """
    from data_pipeline2_spark.functions.text import token_count
    from data_pipeline2_spark.operators.dedup import shingle_hash64

    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    t = F.col(text_col)
    has_text = t.isNotNull()
    return (
        documents.select(
            F.pmod(F.col(id_col), F.lit(n_shards)).cast("int").alias(
                "shard"
            ),
            F.col(id_col).alias("__id"),
            F.when(has_text, token_count(t).cast("long"))
            .otherwise(F.lit(0))
            .alias("__tok"),
            F.when(has_text, F.octet_length(t).cast("long"))
            .otherwise(F.lit(0))
            .alias("__bytes"),
            F.when(
                has_text, F.pmod(shingle_hash64(t), F.lit(4_294_967_296))
            )
            .otherwise(F.lit(0))
            .alias("__fp32"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("__tok").cast("long").alias("n_tokens"),
            F.sum("__bytes").cast("long").alias("n_bytes"),
            F.sum("__fp32").cast("long").alias("content_checksum"),
            F.min("__id").alias("min_doc_id"),
            F.max("__id").alias("max_doc_id"),
        )
    )
