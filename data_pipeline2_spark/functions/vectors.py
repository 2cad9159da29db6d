"""Vector math as pure Catalyst expressions — no UDFs in the hot path.

The reference scores cosine similarity inside Elasticsearch
(script_score `cosineSimilarity(params.query_vector, 'embedding') + 1.0`,
doc_pipeline/services/vector_storage.py:85-91). Here the same math is a
JVM-side higher-order-function expression over `array<float>` columns:
whole-stage-codegen'd, columnar, no Python in the loop.

Determinism: every element is cast to double before multiply/accumulate,
and accumulation is a left fold in array order (`aggregate`), so results
are bit-stable across runs and partitionings (per-row computation only).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array columns, computed in double."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    """cosine(a, b) = a·b / (|a| |b|); callers round for oracle parity.

    Zero-norm inputs yield NULL, not NaN: Spark's NaN semantics
    (NaN >= x is true, NaN sorts above every double) would otherwise
    rank a zero vector as everyone's best match; NULL drops out of
    filters and sorts last under desc.
    """
    na, nb = l2_norm(a), l2_norm(b)
    return F.when((na > 0) & (nb > 0), dot(a, b) / (na * nb))


def query_vector_lit(vec) -> Column:
    """A python list of floats → array<double> literal column.

    Used to broadcast a single query vector into the plan (the analog of
    ES `params.query_vector`). For batches of query vectors use a
    broadcast join instead (operators/similarity.py:knn_batch).
    """
    return F.array(*[F.lit(float(x)).cast("double") for x in vec])
