"""Lineage-truncating materialization with a durability switch.

Every operator that re-reads an intermediate more than once (manifest
tables, edge lists, banded fingerprints, candidate pairs) materializes
it through `materialize()` instead of calling `localCheckpoint`
directly, so ONE switch selects the durability/performance trade:

- default: `localCheckpoint` — blocks live on executors, lineage is
  truncated, no filesystem round-trip. Fastest, and correct in local
  mode (executor == driver == one process). On a real cluster, losing
  an executor loses its blocks with NO recompute path (the lineage is
  gone), failing the job; that is the standard trade for iterative
  algorithms, acceptable when the job can simply be rerun.
- `SPARK_GRAFT_CHECKPOINT_DIR=<path>`: reliable `checkpoint()` into
  that directory (HDFS/object store on a cluster). Blocks survive
  executor loss; the job keeps running through failures. Costs one
  write+read of the materialized frame — the right default for
  long multi-hour 100 TB runs where a restart is more expensive than
  the checkpoint I/O.

The switch changes WHERE the materialized bytes live, never WHAT they
hold: both paths compute the identical frame eagerly (or lazily for
`materialize_lazy`) and downstream plans read the truncated scan
either way.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def _reliable_dir() -> str | None:
    return os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR") or None


#: last ckdir handed to setCheckpointDir — getCheckpointDir returns the
#: scheme-qualified resolved path, so remember what we set instead of
#: string-comparing against it
_LAST_SET_DIR: list = [None]


def _ensure_checkpoint_dir(df: DataFrame, ckdir: str) -> None:
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is None or _LAST_SET_DIR[0] != ckdir:
        sc.setCheckpointDir(ckdir)
        _LAST_SET_DIR[0] = ckdir


def materialize(df: DataFrame) -> DataFrame:
    """Eagerly materialize `df` and truncate its lineage.

    Used via `.transform(materialize)` so call sites read like the
    `localCheckpoint` chains they replace.
    """
    ckdir = _reliable_dir()
    if ckdir:
        _ensure_checkpoint_dir(df, ckdir)
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)


def materialize_lazy(df: DataFrame) -> DataFrame:
    """Lineage truncation that materializes on FIRST use (no dedicated
    job) — for frames whose first consumer is itself an action."""
    ckdir = _reliable_dir()
    if ckdir:
        _ensure_checkpoint_dir(df, ckdir)
        return df.checkpoint(eager=False)
    return df.localCheckpoint(eager=False)
