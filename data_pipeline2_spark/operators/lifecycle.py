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


def validate_transitions(status_log: DataFrame) -> DataFrame:
    """Rows that violate the monotone lifecycle (a terminal status
    followed by a later non-terminal row) — data-quality check."""
    w = Window.partitionBy("doc_id").orderBy("updated_at")
    with_prev = status_log.withColumn("prev_status", F.lag("status").over(w))
    return with_prev.filter(
        F.col("prev_status").isin(*TERMINAL) & ~F.col("status").isin(*TERMINAL)
    )
