"""Skew mitigation: key salting for hot-key joins and aggregations.

AQE's skew-join splitting (on by default, session.py) handles most
cases at runtime; salting is the explicit fallback for EXTREME producer
skew (one key holding a double-digit percent of rows — e.g. a viral
document id in an events join) where even split partitions bottleneck.

Pattern: explode the hot side's key into (key, salt) with a random-free
deterministic salt (hash of a row-unique column), replicate the small
side across all salts, join on the composite key, then drop the salt.
Deterministic salting (hash, not rand) keeps the engine oracle-able and
retries stable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_large(
    df: DataFrame, unique_col: str, n_salts: int = 16, salt_col: str = "__salt"
) -> DataFrame:
    """Attach a deterministic salt in [0, n_salts) derived from a
    row-unique column (xxhash64 — uniform, engine-stable). pmod, not
    abs(x) % n: abs(Long.MIN_VALUE) overflows (ANSI error / negative
    salt that silently drops the row from the join)."""
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(F.col(unique_col)), F.lit(n_salts)).cast("int")
    )


def replicate_small(
    df: DataFrame, n_salts: int = 16, salt_col: str = "__salt"
) -> DataFrame:
    """Replicate each row once per salt value (small/broadcast side)."""
    return df.withColumn(
        salt_col, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )


def salted_join(
    large: DataFrame,
    small: DataFrame,
    keys: list[str],
    unique_col: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join immune to hot keys: shuffle spreads each join key over
    n_salts partitions. Result is identical to the unsalted join for
    inner/left-family joins; right/full outer are rejected — an
    unmatched small-side row exists n_salts times after replication and
    would surface once per salt.
    """
    if how.replace("_", "").lower() in {"right", "rightouter", "full", "fullouter", "outer"}:
        raise ValueError(
            f"salted_join does not support how={how!r}: replicated "
            "unmatched small-side rows would be duplicated per salt"
        )
    lg = salt_large(large, unique_col, n_salts)
    sm = replicate_small(small, n_salts)
    return lg.join(sm, keys + ["__salt"], how).drop("__salt")
