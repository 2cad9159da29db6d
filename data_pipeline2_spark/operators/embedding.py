"""Embedding generation — the reference's UDF surface, Spark-first.

Reference (doc_pipeline/services/embedding_service.py): pluggable HTTP
providers (Nomic :95-105, Granite :107-122), batch fan-out of 32
(:197-204), per-item retry (tenacity 3x exp backoff :45-50), cache-aside
via Redis (:148-170), failed items dropped from results (:206-212).

Engine realization:
- the provider seam is a scalar pandas_udf over Arrow batches (the
  10-100x-over-row-Python path); batch size = Arrow batch config, the
  analog of EMBEDDING_BATCH_SIZE;
- the default provider is a deterministic hash-projection embedder so
  the whole pipeline is reproducible (the reference's live HTTP calls
  are a non-deterministic dependency, excluded from the correctness
  surface by design — SURVEY.md §7); real providers implement the same
  signature (text batch -> vector batch) including retry loops;
- failure semantics: a provider returns null for a failed item; callers
  drop nulls — identical to the reference's skip-and-continue;
- cache-aside: left_anti against the materialized embedding table, then
  compute only the misses and union (operators/joins.py:join_anti_incremental).
"""

from __future__ import annotations

import hashlib
import math

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType
from pyspark.sql import pandas as _  # noqa: F401  (ensures pandas-on-spark support loaded)

DEFAULT_DIM = 64  # testdata embedding width; reference providers use 768
EMBED_BATCH_SIZE = 32  # reference settings.py:43 — maps to Arrow batch size


def hash_embed_one(text: str, dim: int = DEFAULT_DIM) -> list[float]:
    """Deterministic unit-norm vector from text content.

    sha256-seeded byte stream → [-1,1) components → L2 normalize. Pure
    python/stdlib so driver, executor, and tests agree bit-for-bit.
    """
    out: list[float] = []
    counter = 0
    raw = text.encode("utf-8", errors="replace")
    while len(out) < dim:
        h = hashlib.sha256(raw + b"|" + str(counter).encode()).digest()
        for i in range(0, len(h) - 1, 2):
            if len(out) >= dim:
                break
            v = int.from_bytes(h[i : i + 2], "big") / 32768.0 - 1.0
            out.append(v)
        counter += 1
    norm = math.sqrt(sum(v * v for v in out)) or 1.0
    return [float(v / norm) for v in out]


def make_hash_embedder(dim: int = DEFAULT_DIM, fail_on_empty: bool = True):
    """pandas_udf text -> array<float>; null (dropped later) for blank
    input, mirroring the reference's skip-and-continue on provider error."""

    @F.pandas_udf(ArrayType(FloatType()))
    def embed(texts: pd.Series) -> pd.Series:
        def one(t):
            if t is None or (fail_on_empty and not t.strip()):
                return None
            return hash_embed_one(t, dim)

        return texts.map(one)

    return embed


def embed_chunks(
    chunks: DataFrame,
    text_col: str = "content",
    id_col: str = "chunk_id",
    provider: str = "hash64",
    dim: int = DEFAULT_DIM,
) -> DataFrame:
    """chunks → (chunk_id, provider, embedding) with failed rows dropped.

    Reference contract: generate_embeddings returns only successes
    (embedding_service.py:206-212).
    """
    embedder = make_hash_embedder(dim)
    return (
        chunks.select(
            F.col(id_col).alias("chunk_id"),
            F.lit(provider).alias("provider"),
            embedder(F.col(text_col)).alias("embedding"),
        )
        .filter(F.col("embedding").isNotNull())
    )


def embed_incremental(
    chunks: DataFrame,
    cached: DataFrame,
    text_col: str = "content",
    id_col: str = "chunk_id",
    provider: str = "hash64",
    dim: int = DEFAULT_DIM,
) -> DataFrame:
    """Cache-aside embedding: compute only chunks missing from `cached`,
    return cached ∪ fresh.

    Reference: _generate_single_embedding probe/miss/store
    (embedding_service.py:141-181). The left_anti + union is the batch
    re-expression of per-key Redis cache-aside; at 100 TB it is the
    difference between an incremental append and a full recompute.
    """
    requested = chunks.select(
        F.col(id_col).alias("chunk_id"), F.col(text_col).alias("__text")
    )
    cached_kv = cached.select("chunk_id", "provider", "embedding").filter(
        F.col("provider") == provider
    )
    # the output is keyed to the REQUESTED chunks: cache hits for this
    # batch plus freshly computed misses — never the whole cache table
    # (reference contract: generate_embeddings returns results for the
    # chunks passed in, embedding_service.py:183-214)
    hits = cached_kv.join(
        requested.select("chunk_id"), "chunk_id", "left_semi"
    )
    pending = requested.join(
        cached_kv.select("chunk_id"), "chunk_id", "left_anti"
    )
    fresh = embed_chunks(
        pending, text_col="__text", id_col="chunk_id", provider=provider, dim=dim
    )
    return hits.unionByName(fresh)


def embed_metrics(embeddings_log: DataFrame) -> DataFrame:
    """Request counters by (provider, status) — the engine analog of the
    reference's Prometheus embedding counters (embedding_service.py:14-23)."""
    return embeddings_log.groupBy("provider", "status").agg(
        F.count(F.lit(1)).alias("requests")
    )
