"""Partitioning policy helpers.

The engine's scale stance: the lake layout provides scan parallelism
(100 TB = ~800k 128 MB splits), so operators never blindly repartition.
But compute-heavy per-document operators (chunking, shingling, hashing,
embedding) must not inherit a degenerate upstream layout — locally a
small table is one parquet file = one partition = one core doing all
the md5/regex work.

`ensure_parallelism` is the adaptive middle ground: repartition by the
processing key ONLY when the input has fewer partitions than the
cluster's parallelism. On a real cluster over real data it's a no-op;
on a single small file it unlocks every core. Keying by the document id
also protects the downstream per-doc windows/groupBys from skew and
lets Catalyst reuse the partitioning (no second shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ensure_parallelism(df: DataFrame, key: str | Column | None = None) -> DataFrame:
    """Repartition to the session's default parallelism iff the current
    layout has fewer partitions than that.

    Only active on local masters: on a cluster the lake layout provides
    scan parallelism, and even *checking* the partition count there
    isn't free (df.rdd forces physical planning), so the guard
    short-circuits to a no-op without touching the plan.
    """
    sc = df.sparkSession.sparkContext
    if not sc.master.startswith("local"):
        return df
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    if key is None:
        return df.repartition(target)
    key_col = F.col(key) if isinstance(key, str) else key
    return df.repartition(target, key_col)
