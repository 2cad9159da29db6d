"""Cache-aside & TTL semantics in a batch engine.

The reference's caches are Redis SETEX with TTLs (docs/jobs/search
3600 s: document_storage.py:79-83, job_storage.py:70-74,
search_cache.py:58-62; embeddings 86 400 s: embedding_cache.py:30-34).
In an immutable-lake engine those become:

- materialized result tables (the "cache") written by previous runs;
- freshness = an `expires_at` timestamp column; readers filter
  `now < expires_at` with `now` passed explicitly (no wall clock inside
  oracled queries — determinism);
- cache-aside composition = left_anti (compute misses) + union
  (operators/joins.py:join_anti_incremental / embedding.embed_incremental);
- invalidation = partition overwrite on rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_pipeline2_spark.plans.partitioning import (
    adaptive_key_join,
    null_key_rows,
)

TTL_DOCS_S = 3600  # document_storage.py:81
TTL_JOBS_S = 3600  # job_storage.py:73
TTL_SEARCH_S = 3600  # search_cache.py:16
TTL_EMBED_S = 86_400  # embedding_cache.py:33


def with_expiry(df: DataFrame, created_col: str, ttl_seconds: int) -> DataFrame:
    """Attach expires_at = created_at + TTL (the SETEX analog)."""
    return df.withColumn(
        "expires_at",
        F.col(created_col) + F.make_interval(secs=F.lit(float(ttl_seconds))),
    )


def ttl_filter(
    df: DataFrame, created_col: str, ttl_seconds: int, now: str
) -> DataFrame:
    """Rows still fresh at `now` (ISO timestamp string, explicit)."""
    expiry = F.col(created_col) + F.make_interval(secs=F.lit(float(ttl_seconds)))
    return df.filter(expiry > F.lit(now).cast("timestamp"))


def cache_aside(
    requests: DataFrame, cache: DataFrame, keys: list[str]
) -> tuple[DataFrame, DataFrame]:
    """Split requests into (hits, misses) against a cache table.

    hits = semi-join, misses = anti-join — two pushdown-friendly passes,
    no driver-side loop. Callers compute misses and union with hits.
    """
    hits = requests.join(cache, keys, "left_semi")
    # misses resolve as an id-only anti join + adaptive broadcast semi
    # fetch (r11 content-shuffle rule + r12 size guard): misses are the
    # cache-aside DELTA — small by construction at steady state — so
    # full-width request rows never enter an exchange; a pathological
    # full-miss set degrades to a shuffle join instead of OOMing the
    # driver. Null-key requests can never hit (equality joins
    # null-reject) and the semi fetch would silently drop them, so they
    # route straight into misses — hits ∪ misses partitions the input.
    miss_keys = requests.select(*keys).join(
        cache.select(*keys), keys, "left_anti"
    )
    misses = adaptive_key_join(requests, miss_keys, keys).unionByName(
        null_key_rows(requests, keys)
    )
    return hits, misses
