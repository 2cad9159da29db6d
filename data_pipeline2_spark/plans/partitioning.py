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
from data_pipeline2_spark.plans.materialize import materialize


# Broadcast guard for KEY-ONLY sets (8-byte ids / short strings): rows,
# not bytes. 4M long keys ≈ 32 MB — comfortable on a driver, far below
# the 8 GB broadcast hard cap, but far above what "misses are the
# steady-state delta" ever produces; crossing it means the caller is in
# the cold-start / bulk regime where a shuffle join is the right plan.
BROADCAST_KEY_LIMIT = 4_000_000


def adaptive_key_join(
    content: DataFrame,
    keys_df: DataFrame,
    on: str | list[str],
    how: str = "left_semi",
    limit: int = BROADCAST_KEY_LIMIT,
) -> DataFrame:
    """Join a content-bearing frame against a (small-by-construction)
    KEY set with a broadcast hint that degrades instead of OOMing.

    The r11 content-shuffle rule pinned `F.broadcast(keys)` so full-
    width rows never enter an exchange — correct at steady state, but
    an explicit hint bypasses autoBroadcastJoinThreshold entirely, so
    a pathological key set (cold cache, bulk delete) would blow the
    driver rather than degrade (ADVICE r11). Here the key set is
    deduplicated and materialized ONCE (eager localCheckpoint — every
    caller previously evaluated it at least twice: once per consuming
    join or once lazily inside the hint), its now-free count picks the
    plan: within `limit` rows → pinned broadcast (map-side, zero
    content exchange); above → the plain shuffle join Spark would
    choose anyway at that size. Output-identical either way — join
    semantics (including null-key behavior) don't depend on the hint.
    """
    cols = [on] if isinstance(on, str) else list(on)
    kdf = keys_df.select(*cols).distinct().transform(materialize)
    side = F.broadcast(kdf) if kdf.count() <= limit else kdf
    return content.join(side, cols, how)


def null_key_rows(df: DataFrame, keys: list[str] | str) -> DataFrame:
    """Rows where ANY join key is null: equality joins null-reject, so
    these can never be cache HITS — a cache-aside split must route
    them straight into misses or hits ∪ misses stops partitioning the
    input (ADVICE r11: the left_anti → broadcast-semi rewrite silently
    dropped them). On non-nullable key schemas Catalyst folds the
    predicate to false and prunes the branch — the union is free."""
    cols = [keys] if isinstance(keys, str) else list(keys)
    pred = F.lit(False)
    for c in cols:
        pred = pred | F.col(c).isNull()
    return df.filter(pred)


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
