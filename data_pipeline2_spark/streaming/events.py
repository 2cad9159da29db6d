"""Streaming surface — windowed aggregations + the processing queue.

The reference's "streaming" is an asyncio FIFO with one background
consumer and poison-pill shutdown (document_processor.py:14,29,76-94).
Structured Streaming is the engine analog: an unbounded source, a
declarative transformation, checkpointed exactly-once sinks, graceful
`query.stop()`.

Every windowed aggregation here is written once and runs in BOTH modes:
batch (for the DuckDB oracle) and streaming (readStream + availableNow
trigger for batch-parity tests). Late data: `withWatermark` + append —
the principled version of the reference's silent skip-and-continue
(embedding_service.py:206-212).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_pipeline2_spark.operators.aggregates import exact_sum


def tumbling_counts(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """Per-window, per-type counts and value sums.

    → (w_start, w_end, event_type, events, total_value), deterministic
    via exact decimal sums.
    """
    return (
        events.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("events"),
            exact_sum(F.col("value")).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "event_type",
            "events",
            "total_value",
        )
    )


def _interval_seconds(spec: str) -> int | None:
    """Parse the simple '<n> <unit>' interval strings this module uses
    into seconds; None when unrecognized (caller falls back)."""
    units = {
        "second": 1, "seconds": 1,
        "minute": 60, "minutes": 60,
        "hour": 3600, "hours": 3600,
        "day": 86400, "days": 86400,
    }
    parts = spec.strip().split()
    if len(parts) != 2 or not parts[0].isdigit() or parts[1] not in units:
        return None
    return int(parts[0]) * units[parts[1]]


def sliding_counts(
    events: DataFrame, width: str = "1 hour", slide: str = "15 minutes"
) -> DataFrame:
    """Sliding windows (each event lands in width/slide windows).

    Batch path (r13, guide §2.3 "aggregate before you shuffle"): when
    `slide` divides `width`, counts pre-aggregate per SLIDE SLOT before
    the width/slide-fold window expansion — the Expand operator then
    multiplies slot-aggregate rows (slot cardinality), not raw events,
    and the corpus-side exchange carries per-(slot, type) partials
    (1/(width/slide) the rows of the per-(window, type) partials it
    replaced). Equivalence: window membership is decided at slide
    granularity — for any event ts, w_start <= ts < w_start + width
    with w_start on the slide grid holds iff it holds for
    slot_start(ts) (both bounds are grid points), so
    windows(ts) == windows(slot_start) and summing slot counts per
    window reproduces the per-event counts exactly. Streaming inputs
    keep the single-level shape (chained streaming aggregations are
    unsupported); both shapes compute identical results.
    """
    ws, ss = _interval_seconds(width), _interval_seconds(slide)
    if events.isStreaming or ws is None or ss is None or ws % ss != 0:
        return (
            events.groupBy(
                F.window("ts", width, slide).alias("w"), "event_type"
            )
            .agg(F.count(F.lit(1)).alias("events"))
            .select(
                F.col("w.start").alias("w_start"),
                "event_type",
                "events",
            )
        )
    slots = events.groupBy(
        F.window("ts", slide).alias("s"), "event_type"
    ).agg(F.count(F.lit(1)).alias("c"))
    return (
        slots.groupBy(
            F.window(F.col("s.start"), width, slide).alias("w"),
            "event_type",
        )
        .agg(F.sum("c").alias("events"))
        .select(
            F.col("w.start").alias("w_start"),
            "event_type",
            "events",
        )
    )


def session_counts(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Per-user session windows (gap-based).

    → (user_id, s_start, s_end, events, total_value). session_window's
    end = last event + gap, matching the gaps-and-islands SQL analog
    (max(ts) + gap) the oracle uses.
    """
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("events"),
            exact_sum(F.col("value")).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("s_start"),
            F.col("w.end").alias("s_end"),
            "events",
            "total_value",
        )
    )


def funnel(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered funnel → (step_no, step, users): users who performed
    step_i strictly AFTER their qualifying step_{i-1} time (earliest
    qualifying time carried forward — the standard strict-order funnel).

    One filtered min-agg per step, each joined on user_col: every
    shuffle is on the same key, so co-partitioning (or a lake layout
    partitioned by user bucket) collapses the chain to one exchange.
    The per-step filter prunes the events scan before aggregation —
    step cardinality is usually a small slice of the log.
    """
    step_users: list[DataFrame] = []
    prev = None
    for s in steps:
        cur = events.filter(F.col(type_col) == s).select(
            F.col(user_col).alias("user_id"), F.col(ts_col).alias("__ts")
        )
        if prev is not None:
            cur = cur.join(prev, "user_id").filter(F.col("__ts") > F.col("__t"))
        cur = cur.groupBy("user_id").agg(F.min("__ts").alias("__t"))
        step_users.append(cur)
        prev = cur
    out = None
    for i, (s, df) in enumerate(zip(steps, step_users)):
        row = df.agg(F.count(F.lit(1)).alias("users")).select(
            F.lit(i + 1).alias("step_no"), F.lit(s).alias("step"), "users"
        )
        out = row if out is None else out.unionByName(row)
    return out


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly retention triangle → (cohort_week, week_offset, users):
    users first seen in cohort_week who were active week_offset weeks
    later.

    Two aggregations on user_col (first-seen, then distinct activity
    weeks — same shuffle key) + a final tiny rollup. Offsets divide
    exactly (both sides are week-truncated), so the int cast is safe
    and engine-portable.
    """
    first_seen = events.groupBy(F.col(user_col).alias("user_id")).agg(
        F.date_trunc("week", F.min(ts_col)).alias("cohort_week")
    )
    active = events.select(
        F.col(user_col).alias("user_id"),
        F.date_trunc("week", F.col(ts_col)).alias("active_week"),
    ).distinct()
    return (
        active.join(first_seen, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff("active_week", "cohort_week") / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("users"))
        .orderBy("cohort_week", "week_offset")
    )


def read_events_stream(spark, path: str) -> DataFrame:
    """File-source stream over events parquet (schema pinned —
    streaming sources never infer).

    Accepts either a testdata sf dir (streams `{path}/events.parquet`,
    whose TIMESTAMP(NANOS) ts is read as long and converted, matching
    sources/parquet.load_table) or a directory of events-schema parquet
    files written by the engine (µs timestamps).
    """
    import os

    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StructField, StructType

    from data_pipeline2_spark.schemas import EVENTS

    testdata_file = os.path.join(path, "events.parquet")
    if os.path.exists(testdata_file):
        raw_schema = StructType(
            [
                StructField(f.name, LongType() if f.name == "ts" else f.dataType)
                for f in EVENTS.fields
            ]
        )
        stream = (
            spark.readStream.schema(raw_schema)
            .format("parquet")
            .load(testdata_file)
        )
        return stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.readStream.schema(EVENTS).format("parquet").load(path)


def windowed_stream(
    events_stream: DataFrame,
    width: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked tumbling aggregation (append mode): rows later than
    the watermark are dropped — the documented analog of the reference's
    skip-and-continue for stragglers."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("events"))
        .select(F.col("w.start").alias("w_start"), "event_type", "events")
    )


def enrich_stream(events_stream: DataFrame, dim: DataFrame, key: str) -> DataFrame:
    """Stream-static join: enrich each event with a broadcast dimension.

    The static side is re-read per micro-batch (picking up dim updates);
    broadcast keeps the stream side shuffle-free — the streaming analog
    of join_lookup.
    """
    return events_stream.join(F.broadcast(dim), key, "left")


def dedup_stream(events_stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Exactly-once event-id dedup within a watermark horizon.

    dropDuplicatesWithinWatermark bounds state to the horizon (drop the
    duplicate arrivals of the same event_id, forget ids older than the
    watermark) — unbounded dropDuplicates state would grow forever on a
    100 TB/day stream.
    """
    return events_stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def queue_process(
    events_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    priority_col: str | None = None,
):
    """The processing-queue analog: consume the stream, emit per-item
    status rows, exactly-once via checkpointing.

    Ordering: within each micro-batch items are processed
    priority-then-arrival — higher `priority_col` first, ties by ts
    then event_id (the reference's Job.priority field, models/job.py:26;
    its asyncio queue is plain FIFO, so priority_col=None preserves
    that). The per-batch `process_seq` column records the order the
    consumer handled items, making the discipline observable and
    testable. The seq is a single-partition row_number per micro-batch
    — bounded by the trigger size (maxFilesPerTrigger /
    maxOffsetsPerTrigger caps a batch), not by stream size, so the
    one-task sort is safe at scale.

    foreachBatch writes a status log (append-only; current state =
    latest-wins window, operators/lifecycle.py). Exactly-once comes from
    IDEMPOTENT batch writes: each micro-batch overwrites its own
    batch_id-keyed partition, so a crash between the sink write and the
    checkpoint commit replays the batch onto itself instead of
    appending duplicates (a blind append would be at-least-once).
    availableNow trigger drains everything then stops — the
    batch-parity mode the tests use; a live deployment omits the
    trigger. Graceful shutdown = `query.stop()`, replacing the
    reference's (None, None) poison pill (document_processor.py:35,82-84).
    """
    import os

    from pyspark.sql.window import Window

    order = [F.col("ts").asc(), F.col("event_id").asc()]
    if priority_col is not None:
        order.insert(0, F.col(priority_col).desc())

    def handle_batch(batch_df: DataFrame, batch_id: int):
        seq = F.row_number().over(Window.orderBy(*order)) - 1
        (
            batch_df.withColumn("status", F.lit("completed"))
            .withColumn("process_seq", seq.cast("long"))
            .select("event_id", "ts", "event_type", "status", "process_seq")
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, f"batch_id={batch_id}"))
        )

    return (
        events_stream.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def trending_topk(
    events: DataFrame,
    k: int = 3,
    width: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Top-k keys per time window by total value → (window_start, rank,
    event_type, total) — the trending/leaderboard composite (windowed
    aggregation + per-window top-k).

    Two-level: (window, key) partial-summed aggregation, then a
    per-window rank over key-cardinality rows. The heavy shuffle
    carries one row per (window, key); the rank window is tiny. Exact
    decimal totals keep ranking ties engine-portable.
    """
    from pyspark.sql.window import Window

    from data_pipeline2_spark.operators.aggregates import exact_sum

    agg = (
        events.groupBy(F.window(F.col(ts_col), width).alias("w"), key_col)
        .agg(exact_sum(F.col(value_col)).alias("total"))
        .select(F.col("w.start").alias("window_start"), key_col, "total")
    )
    rw = Window.partitionBy("window_start").orderBy(
        F.desc("total"), F.col(key_col)
    )
    return (
        agg.withColumn("rank", F.row_number().over(rw))
        .filter(F.col("rank") <= k)
        .select("window_start", "rank", key_col, "total")
    )


def attribution_pairs(
    events: DataFrame,
    key: str = "user_id",
    cause: str = "view",
    effect: str = "click",
    max_delay: str = "10 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Cause→effect interval join (ad-attribution shape): every effect
    event paired with each same-key cause event that strictly precedes
    it by at most `max_delay` → (user_id, cause_id, effect_id, delay_us).

    One function, two modes:
    - batch `events`: a plain self-join with a range predicate (the
      oracle-checkable path);
    - streaming `events` (pass `watermark`): a STREAM-STREAM interval
      join — both derived sides watermarked, and the range condition is
      exactly what lets Spark bound the join state: a cause older than
      (watermark + max_delay) can never match a future effect, so its
      state is evicted. An equi-join without the time bound would grow
      state forever on an unbounded stream.
    """
    c = events.filter(F.col("event_type") == cause)
    e = events.filter(F.col("event_type") == effect)
    if watermark is not None:
        c = c.withWatermark("ts", watermark)
        e = e.withWatermark("ts", watermark)
    c = c.select(
        F.col(key).alias("__k"),
        F.col("ts").alias("cause_ts"),
        F.col("event_id").alias("cause_id"),
    )
    e = e.select(
        F.col(key).alias("__ek"),
        F.col("ts").alias("effect_ts"),
        F.col("event_id").alias("effect_id"),
    )
    cond = (
        (F.col("__k") == F.col("__ek"))
        & (F.col("effect_ts") > F.col("cause_ts"))
        & (
            F.col("effect_ts")
            <= F.col("cause_ts") + F.expr(f"INTERVAL {max_delay}")
        )
    )
    return c.join(e, cond, "inner").select(
        F.col("__k").alias(key),
        "cause_id",
        "effect_id",
        (
            F.unix_micros(F.col("effect_ts")) - F.unix_micros(F.col("cause_ts"))
        ).alias("delay_us"),
    )


def attribution_last_touch(
    events: DataFrame,
    key: str = "user_id",
    cause: str = "view",
    effect: str = "click",
    max_delay: str = "10 minutes",
) -> DataFrame:
    """Last-touch attribution: each effect credited to its LATEST
    in-window cause (ties broken by highest cause_id, deterministic) →
    (user_id, cause_id, effect_id, delay_us). Batch-only — the ranking
    window after a stream-stream join would need its own output-mode
    gymnastics; streaming callers take attribution_pairs and reduce
    downstream."""
    from pyspark.sql import Window

    pairs = attribution_pairs(events, key, cause, effect, max_delay)
    w = Window.partitionBy("effect_id").orderBy(
        F.col("delay_us").asc(), F.col("cause_id").desc()
    )
    return (
        pairs.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def _session_tagged(events: DataFrame, gap_seconds: int):
    """Shared gap-rule tagging: NULL-ts rows are dropped (an event with
    no timestamp belongs to no session — made explicit so engine and
    oracle agree instead of diverging on NULLS FIRST/LAST ordering),
    then each event gets a per-user running session number. Single hash
    exchange on user_id; lag and the running sum share one ordering."""
    from pyspark.sql.window import Window

    events = events.filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    is_new = (
        prev.isNull()
        | ((F.col("ts").cast("double") - prev.cast("double")) > gap_seconds)
    ).cast("int")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return events.select(
        "event_id",
        "user_id",
        F.col("ts").cast("double").alias("__sec"),
        F.sum(is_new).over(wsum).cast("int").alias("session_seq"),
    )


def sessionize(
    events: DataFrame, gap_seconds: int = 1800
) -> DataFrame:
    """Per-event session assignment by inactivity gap → (event_id,
    user_id, session_seq): a new session starts when the gap to the
    user's previous event exceeds `gap_seconds`. The row-level
    counterpart of `session_counts` (which aggregates via
    session_window): pipelines that label training events with session
    ids need the assignment itself, not just per-session rollups.
    NULL-ts events are dropped (no timestamp, no session).

    One hash partition by user + a local sort; the running-sum frame is
    computed within the partition — a single exchange at any scale.
    """
    return _session_tagged(events, gap_seconds).select(
        "event_id", "user_id", "session_seq"
    )


def session_stats(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """One-row corpus session summary → (n_sessions, avg_events,
    avg_duration_secs): the rollup a product-analytics run reports from
    the gap-rule assignment. Same single user-partition exchange as
    `sessionize`; the per-session and global aggregations are partial-
    aggregated on top.
    """
    tagged = _session_tagged(events, gap_seconds).select(
        "user_id", "__sec", F.col("session_seq").alias("__sess")
    )
    per_session = tagged.groupBy("user_id", "__sess").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("__sec") - F.min("__sec")).alias("dur"),
    )
    from data_pipeline2_spark.operators.aggregates import exact_avg

    # avg over decimal-exact sums: double sum order varies with
    # partitioning and engine, and a last-ulp flip at a rounding
    # boundary would hash-mismatch; event counts sum exactly in longs,
    # durations are microsecond-aligned so scale 6 loses nothing
    return per_session.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.round(
            F.sum("n_events") / F.count(F.lit(1)), 6
        ).alias("avg_events"),
        F.round(exact_avg(F.col("dur"), scale=6), 6).alias(
            "avg_duration_secs"
        ),
    )


def windowed_distinct_users(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """Exact distinct users per tumbling window → (w_start, w_end,
    users). The exact companion of the approx_count_distinct key: the
    shuffle carries (window, user_id) pairs once (partial distinct
    map-side), then counts per window. NULL-ts rows are dropped on both
    engine and oracle sides (F.window emits no bucket for them)."""
    return (
        events.filter(F.col("ts").isNotNull())
        .groupBy(F.window("ts", width).alias("w"))
        .agg(F.countDistinct("user_id").alias("users"))
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "users",
        )
    )


def ewma_values(
    events: DataFrame, alpha: float = 0.5, lookback: int = 8
) -> DataFrame:
    """Per-user truncated EWMA of `value` → (event_id, user_id, ts,
    value, ewma): ewma_n = Σ_{k<lookback} α(1-α)^k·x_{n-k} normalized
    by the weights actually present (window head / null values drop).

    Determinism contract: α defaults to 0.5 so every weight (1-α)^k is
    an EXACT binary double, each term is one IEEE multiply of a lag
    value, and the terms add in fixed expression order — no aggregation
    reordering, so the oracle replays it bit-for-bit. One shuffle
    (window partition by user); lookback bounds the expression tree,
    not state.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    num = F.lit(0.0)
    den = F.lit(0.0)
    for k in range(lookback):
        weight = alpha * (1.0 - alpha) ** k
        lagged = F.lag("value", k).over(w)
        num = num + F.when(lagged.isNotNull(), lagged * F.lit(weight)).otherwise(
            F.lit(0.0)
        )
        den = den + F.when(lagged.isNotNull(), F.lit(weight)).otherwise(
            F.lit(0.0)
        )
    # den = 0 (all lookback values NULL) must yield NULL, not a 0/0 NaN
    # whose spelling differs between engines
    ewma = F.when(den > 0, F.round(num / den, 6))
    return events.select("event_id", "user_id", "ts", "value", ewma.alias("ewma"))


def view_click_join(
    views_stream: DataFrame,
    clicks_stream: DataFrame,
    within: str = "10 minutes",
    watermark: str = "20 minutes",
) -> DataFrame:
    """Stream-stream interval join: each click pairs with the same
    user's prior view(s) within `within` → (user_id, view_id, click_id,
    view_ts, click_ts).

    The canonical two-stream correlation (impression→conversion).
    Watermarks bound BOTH sides' state: a view older than
    watermark+within can never match a future click and is evicted —
    state is O(active users × events inside the horizon), not O(stream
    history). Output is append-mode-safe because the join emits only
    when both sides are final under their watermarks.
    """
    v = views_stream.withWatermark("ts", watermark).select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("view_ts"),
    )
    c = clicks_stream.withWatermark("ts", watermark).select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
    )
    joined = v.join(
        c,
        F.expr(
            f"""v_user = c_user AND click_ts >= view_ts
                AND click_ts <= view_ts + interval {within}"""
        ),
    )
    return joined.select(
        F.col("v_user").alias("user_id"),
        "view_id",
        "click_id",
        "view_ts",
        "click_ts",
    )


def top_paths(
    events: DataFrame,
    gap_seconds: int = 1800,
    top: int = 50,
) -> DataFrame:
    """Most common 3-step event-type paths within sessions →
    (path, occurrences), top `top` under a total order (count desc,
    path) — the navigation-pattern / funnel-discovery miner.

    Shape: one hash exchange on user_id (session tagging, the two
    leads, and the session-membership check all share the same window
    ordering), then a path-count aggregation whose width is the
    distinct-path vocabulary (event-type³ bounded, tiny). The
    session-equality filter on the LED session ids keeps paths from
    crossing a session boundary without re-partitioning by session.
    """
    from pyspark.sql.window import Window

    # NULL event_type rows drop explicitly: concat_ws would silently
    # skip the segment and collapse a 3-step path into a lie
    ev_ = events.filter(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    ).select("event_id", "user_id", "ts", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    is_new = (
        prev.isNull()
        | ((F.col("ts").cast("double") - prev.cast("double")) > gap_seconds)
    ).cast("int")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged = ev_.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.sum(is_new).over(wsum).alias("sess"),
    ).select(
        "user_id",
        "event_type",
        "sess",
        F.lead("event_type", 1).over(w).alias("t1"),
        F.lead("event_type", 2).over(w).alias("t2"),
        F.lead("sess", 2).over(w).alias("sess2"),
    )
    paths = tagged.filter(
        F.col("t2").isNotNull() & (F.col("sess2") == F.col("sess"))
    ).select(
        F.concat_ws(">", "event_type", "t1", "t2").alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("occurrences"))
        .orderBy(F.desc("occurrences"), "path")
        .limit(top)
    )


def _recover_table(table_dir: str) -> None:
    """Crash recovery for upsert_sink's two-rename swap. Three possible
    on-disk states:
    - table present, no `.__old`: clean — nothing to do;
    - table ABSENT, `.__old` present: the crash hit between the two
      renames — restore the displaced copy (the interrupted batch will
      replay and re-merge idempotently);
    - both present: the crash hit after the new table landed but before
      the stale backup was removed — discard the backup.
    Never deletes the only copy of the data."""
    import os
    import shutil

    old = table_dir + ".__old"
    if os.path.exists(old):
        if os.path.exists(table_dir):
            shutil.rmtree(old, ignore_errors=True)
        else:
            os.rename(old, table_dir)


def upsert_sink(
    changes_stream: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    key_cols: list[str],
    ts_col: str = "change_ts",
    op_col: str = "op",
    output_mode: str = "append",
):
    """Streaming CDC apply: each micro-batch of change rows MERGEs into
    a parquet table via joins.merge_upsert (latest change per key wins,
    'D' deletes) — the continuously-maintained-table pattern
    (Delta/Iceberg MERGE fed by a stream), composed from the engine's
    own batch operator.

    Exactly-once: the merge is computed against the CURRENT table and
    written to a staging dir, then swapped in via two renames with a
    crash-recovery protocol (`_recover_table`, run before every merge):
    if a crash lands between the renames, the displaced `.__old` copy
    is restored; if it lands after, the stale backup is discarded. In
    either case the checkpoint replays the batch and re-merges, which
    is idempotent (applying the same changeset twice yields the same
    table) — the table is never lost and never double-applied.

    Scale note: each batch rewrites the table once (full-outer join by
    key). For a 100 TB table, partition `table_dir` and merge only the
    partitions a batch touches — merge_upsert itself is
    partition-agnostic, so the same plan applies per slice.
    """
    import os
    import shutil
    from urllib.parse import urlparse

    from data_pipeline2_spark.operators.joins import merge_upsert

    # The swap/recovery protocol is os.rename-based, so the table must
    # live on the local filesystem; a remote URI (s3://, hdfs://) would
    # silently read as "absent", bootstrap an empty base, then fail at
    # the rename AFTER the merge was computed. Fail before any work.
    for name, path in (("table_dir", table_dir), ("checkpoint_dir", checkpoint_dir)):
        scheme = urlparse(path).scheme
        if len(scheme) > 1 and scheme != "file":
            raise ValueError(
                f"upsert_sink: {name}={path!r} has URI scheme {scheme!r}; "
                "the rename-swap recovery protocol is local-filesystem-only "
                "(for object stores, use a table format with atomic MERGE)"
            )

    def handle_batch(batch_df: DataFrame, batch_id: int):
        spark = batch_df.sparkSession
        _recover_table(table_dir)
        if not os.path.exists(table_dir):
            # first batch bootstraps the table from I/U rows
            base = batch_df.filter(F.col(op_col) != "D").drop(
                op_col, ts_col
            ).limit(0)
        else:
            base = spark.read.parquet(table_dir)
        merged = merge_upsert(base, batch_df, key_cols, ts_col, op_col)
        staging = table_dir + f".__stage_{batch_id}"
        merged.write.mode("overwrite").parquet(staging)
        old = table_dir + ".__old"
        shutil.rmtree(old, ignore_errors=True)
        if os.path.exists(table_dir):
            os.rename(table_dir, old)
        os.rename(staging, table_dir)  # crash before this: old restores
        shutil.rmtree(old, ignore_errors=True)

    # output_mode "update" is the streaming-AGGREGATION feed shape:
    # each micro-batch delivers the touched keys' new cumulative rows
    # and the sequential MERGEs keep the latest — the continuously
    # maintained materialized-aggregate pattern (stream_tumbling_upsert)
    return (
        changes_stream.writeStream.foreachBatch(handle_batch)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
