"""Data-governance operators: deletion cascades and anonymity audits.

A training-data lake carries compliance obligations the reference
handles ad hoc (per-chunk cache invalidation,
services/embedding_cache.py:36 delete_embedding) — at lake scale the
same obligations become set operations: right-to-be-forgotten deletes
must CASCADE through every derived table, and quasi-identifier
combinations must be audited for re-identification risk before a
corpus ships.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def delete_cascade_audit(
    documents: DataFrame,
    embeddings: DataFrame,
    requests: DataFrame,
    doc_id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
) -> DataFrame:
    """Right-to-be-forgotten cascade with a proof-of-cleanliness audit
    → one row per entity: (entity, n_before, n_deleted, n_after,
    n_orphans_after).

    `requests` is the deletion set (one doc id per row, any column
    name — first column is taken). Documents matching a request are
    deleted; embeddings cascade via their parent doc id. The
    n_orphans_after column is the COMPLIANCE PROOF, computed from the
    surviving frames: embeddings whose parent document no longer
    exists. A correct cascade yields 0; shipping the number (instead
    of asserting it) makes the audit row the artifact a DPO files.

    Scale shape: the deletion set broadcasts (it is human-request
    sized); every delete is a broadcast LEFT ANTI join — no shuffle of
    either fact table; the audit counts are single-pass aggregates.
    The generalization of the reference's single-key
    delete_embedding(chunk_id, provider) (embedding_cache.py:36) to a
    lake-wide set operation.
    """
    req_col = requests.columns[0]
    req = requests.select(
        F.col(req_col).cast("long").alias("__del_id")
    ).distinct()

    docs = documents.select(F.col(doc_id_col).cast("long").alias("__id"))
    embs = embeddings.select(F.col(vec_id_col).cast("long").alias("__id"))

    docs_after = docs.join(
        F.broadcast(req), docs["__id"] == req["__del_id"], "left_anti"
    )
    embs_after = embs.join(
        F.broadcast(req), embs["__id"] == req["__del_id"], "left_anti"
    )
    # orphan check runs on the SURVIVING embeddings against SURVIVING
    # documents — the post-state, which is what compliance cares about
    orphans = embs_after.join(
        docs_after.withColumnRenamed("__id", "__doc"),
        embs_after["__id"] == F.col("__doc"),
        "left_anti",
    )

    def audit(entity: str, before: DataFrame, after: DataFrame, orph):
        b = before.agg(F.count(F.lit(1)).alias("n_before"))
        a = after.agg(F.count(F.lit(1)).alias("n_after"))
        o = orph.agg(F.count(F.lit(1)).alias("n_orphans_after"))
        return (
            b.crossJoin(a)
            .crossJoin(o)
            .select(
                F.lit(entity).alias("entity"),
                "n_before",
                (F.col("n_before") - F.col("n_after")).alias("n_deleted"),
                "n_after",
                "n_orphans_after",
            )
        )

    none = docs.limit(0)  # empty frame: documents have no parent table
    return audit("documents", docs, docs_after, none).unionByName(
        audit("embeddings", embs, embs_after, orphans)
    )


def k_anonymity_audit(
    df: DataFrame,
    quasi_cols: list,
    k: int = 5,
) -> DataFrame:
    """k-anonymity audit over a quasi-identifier combination → one row
    per equivalence class: (quasi cols..., n, anonymous).

    A record is k-anonymous when at least k-1 other records share its
    full quasi-identifier tuple (Sweeney); classes with n < k are the
    re-identification risk a release gate must suppress or generalize.
    Shipping per-class rows (rather than one pass/fail bit) gives the
    curation pipeline the exact suppression worklist.

    Scale shape: one hash aggregation on the quasi tuple — map-side
    partial combine, class-cardinality shuffle. The release-gate
    sibling of pii_redact (detection) and leakage_safe_split
    (split hygiene).
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    if not quasi_cols:
        raise ValueError("need at least one quasi-identifier column")
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            *quasi_cols,
            "n",
            (F.col("n") >= F.lit(k)).alias("anonymous"),
        )
    )


def l_diversity_audit(
    df: DataFrame,
    quasi_cols: list,
    sensitive_col: str,
    l: int = 3,
) -> DataFrame:
    """ℓ-diversity audit (Machanavajjhala et al. 2007: k-anonymity's
    fix for the homogeneity attack) → one row per equivalence class:
    (quasi cols..., n, n_sensitive_distinct, l_diverse).

    A class is distinct-ℓ-diverse when its SENSITIVE attribute takes at
    least ℓ different values — a k-anonymous class whose every member
    shares one sensitive value still leaks it, which is exactly what
    `k_anonymity_audit` cannot see. NULL sensitive values don't count
    toward diversity (count-distinct semantics, identical in both
    engines). Ships the per-class worklist like its k-anonymity
    sibling: the rows with l_diverse = false are what a release gate
    suppresses or generalizes.

    Scale shape: one hash aggregation on the quasi tuple with a
    count-distinct expand on the sensitive column — the expand doubles
    the shuffled rows of the plain k-audit but stays
    class-cardinality-bounded after partial aggregation; at 100 TB
    with a hot class, approx_count_distinct is the documented fallback
    (the audit only compares against ℓ, so HLL error only matters at
    the boundary — use exact for release gates, approx for monitoring).
    """
    if l < 2:
        raise ValueError(f"l must be >= 2, got {l}")
    if not quasi_cols:
        raise ValueError("need at least one quasi-identifier column")
    return (
        df.groupBy(*quasi_cols)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct(F.col(sensitive_col)).alias(
                "n_sensitive_distinct"
            ),
        )
        .select(
            *quasi_cols,
            "n",
            "n_sensitive_distinct",
            (F.col("n_sensitive_distinct") >= F.lit(l)).alias("l_diverse"),
        )
    )
