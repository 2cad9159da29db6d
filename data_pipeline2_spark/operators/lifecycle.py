"""Job / document status lifecycle — append-only, latest-wins.

Reference: status enums + monotone transitions PENDING→PROCESSING→
COMPLETED/FAILED (models/document.py:7-12, models/job.py:6-18;
transition writes document_processor.py:96-132). The engine never
mutates: every transition is an appended log row; current state is a
latest-wins window (relational.latest_state); progress/queue metrics
are plain aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_pipeline2_spark.operators.relational import latest_state

# terminal statuses per the reference enums
TERMINAL = ("completed", "failed")


def current_status(status_log: DataFrame) -> DataFrame:
    """Latest status row per doc from the append-only log."""
    return latest_state(
        status_log,
        ["doc_id"],
        [F.desc("updated_at"), F.desc("status")],
    )


def job_stats(jobs: DataFrame) -> DataFrame:
    """Queue/progress rollup — the analog of the reference's job
    progress fields + queue-depth gauge (models/job.py:33-35,
    document_processor.py:14)."""
    return jobs.groupBy("job_type", "status").agg(
        F.count(F.lit(1)).alias("jobs"),
        F.round(F.avg("progress"), 6).alias("avg_progress"),
        F.sum("processed_items").alias("processed_items"),
    )


def scd2_history(
    change_log: DataFrame,
    key_cols: list[str],
    ts_col: str,
    attr_cols: list[str],
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Type-2 slowly-changing-dimension history from an append-only
    change log → every input row + (valid_from, valid_to, is_current):
    valid_to = next change's timestamp for the key (NULL while current).

    One lead() window per key — sorts within the existing hash(key)
    clustering, no extra shuffle beyond the partitionBy. tiebreak_cols
    order same-timestamp changes deterministically (default: the attr
    columns themselves). This is the warehouse-standard history build;
    at 100 TB it runs incrementally by unioning the new log slice with
    each key's current row and re-windowing only touched keys.
    """
    tb = tiebreak_cols if tiebreak_cols is not None else attr_cols
    w = Window.partitionBy(*key_cols).orderBy(ts_col, *tb)
    return (
        change_log.select(*key_cols, ts_col, *attr_cols)
        .withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop(ts_col)
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Markov-style transition counts → (from_type, to_type, transitions):
    how often each event type is immediately followed by each other type
    within a user's ordered stream (id_col breaks timestamp ties
    deterministically). lead() sorts within the user clustering; the
    final count agg is tiny (|types|² groups).
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    pairs = events.select(
        F.col(type_col).alias("from_type"),
        F.lead(type_col).over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    return (
        pairs.groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("transitions"))
        .orderBy("from_type", "to_type")
    )


def validate_transitions(status_log: DataFrame) -> DataFrame:
    """Rows that violate the monotone lifecycle (a terminal status
    followed by a later non-terminal row) — data-quality check."""
    w = Window.partitionBy("doc_id").orderBy("updated_at")
    with_prev = status_log.withColumn("prev_status", F.lag("status").over(w))
    return with_prev.filter(
        F.col("prev_status").isin(*TERMINAL) & ~F.col("status").isin(*TERMINAL)
    )


# ---------------------------------------------------------------- rate
# limiting (reference: API_RATE_LIMIT, .env.example:45 — 100 req/min)


def rate_limit_flags(
    events: DataFrame,
    cap: int = 100,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    bucket: str = "minute",
) -> DataFrame:
    """Per-event admission flag under a fixed-window rate limit: within
    each (key, date_trunc(bucket, ts)) window the first `cap` events by
    (ts, id) are admitted, the rest rejected.

    This is the replayable batch semantics of the reference's API rate
    limiter (.env.example:45: 100 requests/minute per client) — the one
    reference knob with no engine analog until now. The window
    partitions on (key, bucket) so admission is embarrassingly parallel
    across keys and windows: at 100 TB the only shuffle carries
    (key, bucket)-hashed rows, no global ordering anywhere. The same
    expression runs under Structured Streaming on a keyed state or a
    foreachBatch sink, since a fixed window never spans microbatches
    once the stream is bucketed by event time.

    → input columns + (win_start timestamp, admitted boolean)
    """
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    win = F.date_trunc(bucket, F.col(ts_col))
    w = Window.partitionBy(F.col(key_col), win).orderBy(
        F.col(ts_col), F.col(id_col)
    )
    return events.withColumn("win_start", win).withColumn(
        "admitted", F.row_number().over(w) <= F.lit(cap)
    )


def rate_limit_admission(
    events: DataFrame,
    cap: int = 100,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    bucket: str = "minute",
) -> DataFrame:
    """Per-key admission report under `rate_limit_flags` semantics:
    how many events a key sent, how many the limiter admitted/rejected,
    and in how many distinct windows the key had rejections (a window
    with exactly `cap` events is saturated but rejection-free and does
    NOT count — this reports dropped traffic, not utilization).

    → (key, n_events, n_admitted, n_rejected, n_limited_windows)
    """
    flagged = rate_limit_flags(events, cap, key_col, ts_col, id_col, bucket)
    rejected_win = F.when(~F.col("admitted"), F.col("win_start"))
    return flagged.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("admitted").cast("long")).alias("n_admitted"),
        F.sum((~F.col("admitted")).cast("long")).alias("n_rejected"),
        F.count_distinct(rejected_win).alias("n_limited_windows"),
    )
