"""Custom stateful streaming operators via applyInPandasWithState.

The reference's only stateful machinery is the queue consumer's
in-memory progress tracking (document_processor.py:96-132). At engine
scale the equivalent needs per-key state that survives micro-batches:

- `streaming_dedup_first_seen`: emit each key once across the stream
  (exact streaming dedup — state = seen marker with optional TTL);
- `running_user_totals`: per-user running aggregate emitted per batch
  (the job-progress analog: processed_items accumulating).

State is bounded when a processing-time TTL is configured (the
`state_ttl` parameter → GroupStateTimeout.ProcessingTimeTimeout with
per-key eviction): size stays O(keys active within the TTL), not
O(all keys ever seen) — the property that matters at 100 TB/day. The
default (no TTL) keeps state forever, which is only appropriate for
bounded key domains (e.g. event_type).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEDUP_SCHEMA = "key string, first_ts timestamp"
DEDUP_STATE_SCHEMA = "seen boolean"
DEDUP_STATE_TTL_MS = 24 * 3600 * 1000  # embedding-cache TTL analog (86400 s)

TOTALS_SCHEMA = "user_id long, events long, total_value double"
TOTALS_STATE_SCHEMA = "events long, total_value double"


def dedup_first_seen(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    """Emit the first occurrence of each key, drop the rest. A timed-out
    key's marker is evicted (after the configured TTL the key may be
    emitted again — bounded-state streaming dedup semantics)."""
    if state.hasTimedOut:
        state.remove()
        return iter(())
    if state.exists:
        # GroupState clears the timeout on every invocation — re-arm it
        # or a key seen twice within the TTL keeps its marker forever
        try:
            state.setTimeoutDuration(DEDUP_STATE_TTL_MS)
        except Exception:
            pass  # NoTimeout mode
        return iter(())
    first_ts = None
    for pdf in pdfs:
        ts = pdf["ts"].min()
        first_ts = ts if first_ts is None else min(first_ts, ts)
    state.update((True,))
    try:  # evict the marker after the TTL (only in ProcessingTimeTimeout mode)
        state.setTimeoutDuration(DEDUP_STATE_TTL_MS)
    except Exception:
        pass  # NoTimeout mode: bounded key domain, marker kept forever
    return iter([pd.DataFrame({"key": [key[0]], "first_ts": [first_ts]})])


def running_totals(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    """Accumulate per-user counts/sums across micro-batches and emit the
    running value each time the user appears."""
    if state.exists:
        events, total = state.get
    else:
        events, total = 0, 0.0
    for pdf in pdfs:
        events += len(pdf)
        total += float(pdf["value"].sum())
    state.update((events, total))
    return iter(
        [pd.DataFrame({"user_id": [key[0]], "events": [events],
                       "total_value": [round(total, 2)]})]
    )


def streaming_dedup_first_seen(events_stream, bounded_state: bool = False):
    """events stream → one row per event_type with its first timestamp.

    bounded_state=True enables the processing-time TTL (state evicted
    after DEDUP_STATE_TTL_MS) — required for unbounded key domains.
    """
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if bounded_state
        else GroupStateTimeout.NoTimeout
    )
    return (
        events_stream.select("event_type", "ts")
        .withColumnRenamed("event_type", "key")
        .groupBy("key")
        .applyInPandasWithState(
            dedup_first_seen,
            outputStructType=DEDUP_SCHEMA,
            stateStructType=DEDUP_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=timeout,
        )
    )


def streaming_running_totals(events_stream):
    """events stream → running (events, total_value) per user."""
    return events_stream.select("user_id", "value").groupBy(
        "user_id"
    ).applyInPandasWithState(
        running_totals,
        outputStructType=TOTALS_SCHEMA,
        stateStructType=TOTALS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
