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
from data_pipeline2_spark.plans.materialize import materialize


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
    from data_pipeline2_spark.plans.partitioning import BROADCAST_KEY_LIMIT

    req_col = requests.columns[0]
    # materialized once (it feeds two anti joins), broadcast only while
    # request-sized: a bulk purge beyond the key limit degrades to the
    # shuffle anti join instead of OOMing the driver (ADVICE r11) —
    # output-identical either way
    req = (
        requests.select(F.col(req_col).cast("long").alias("__del_id"))
        .distinct()
        .transform(materialize)
    )
    if req.count() <= BROADCAST_KEY_LIMIT:
        req = F.broadcast(req)

    docs = documents.select(F.col(doc_id_col).cast("long").alias("__id"))
    embs = embeddings.select(F.col(vec_id_col).cast("long").alias("__id"))

    docs_after = docs.join(
        req, docs["__id"] == req["__del_id"], "left_anti"
    )
    embs_after = embs.join(
        req, embs["__id"] == req["__del_id"], "left_anti"
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


def t_closeness_audit(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    t: float = 0.2,
) -> DataFrame:
    """t-closeness audit (Li et al. 2007 — the skewness/similarity-attack
    fix ℓ-diversity still misses) → one row per equivalence class:
    (quasi cols..., n, emd_num, emd, t_close).

    A class is t-close when the Earth Mover's Distance between its
    SENSITIVE-value distribution and the whole table's is <= t. For an
    ORDERED sensitive attribute with m distinct global values the EMD
    is the ordered-distance form (Li et al. §4.2):

        EMD = (1/(m-1)) · Σ_{i=1..m-1} |Σ_{j<=i} (p_j − q_j)|

    computed here over the common denominator — every cumulative
    difference is the exact BIGINT |P_i·n_total − Q_i·n_class| (P/Q =
    cumulative class/global counts), summed into `emd_num`, with ONE
    closing division by (m−1)·n_class·n_total. NULL sensitive values
    are excluded from both distributions (they carry no order).

    Scale shape: one (quasi, value) aggregation and one value
    aggregation (both class/value-cardinality after map-side partials),
    then the cumulative walk runs on the classes × values grid — audit-
    sized, corpus-independent: the grid joins the broadcast global
    value table and windows per class. The fact table never re-enters.
    """
    from pyspark.sql.window import Window

    if not quasi_cols:
        raise ValueError("need at least one quasi-identifier column")
    if not (0.0 < t <= 1.0):
        raise ValueError(f"t must be in (0, 1], got {t}")
    base = df.filter(F.col(sensitive_col).isNotNull())
    gv = (
        base.groupBy(F.col(sensitive_col).alias("__v"))
        .agg(F.count(F.lit(1)).alias("__g"))
        .transform(materialize)
    )
    cls_val = base.groupBy(*quasi_cols, F.col(sensitive_col).alias("__v")).agg(
        F.count(F.lit(1)).alias("__c")
    )
    classes = cls_val.groupBy(*quasi_cols).agg(
        F.sum("__c").cast("long").alias("n")
    )
    grid = (
        classes.crossJoin(F.broadcast(gv))
        .join(cls_val, [*quasi_cols, "__v"], "left")
        .fillna({"__c": 0})
    )
    w = Window.partitionBy(*quasi_cols).orderBy("__v")
    tot = gv.agg(
        F.sum("__g").cast("long").alias("__n_total"),
        F.count(F.lit(1)).cast("long").alias("__m"),
    )
    walk = grid.select(
        *quasi_cols,
        "n",
        "__v",
        F.sum("__c").over(w).cast("long").alias("__P"),
        F.sum("__g").over(w).cast("long").alias("__Q"),
        F.row_number().over(w).alias("__i"),
    ).crossJoin(F.broadcast(tot))
    # the i = m term contributes 0 (both cumulatives reach 1 there);
    # zeroing it instead of filtering the row keeps every class in the
    # output even at m = 1, where EMD is 0 by definition (one-value
    # domain: the distributions are necessarily identical)
    term = F.when(
        F.col("__i") < F.col("__m"),
        F.abs(
            F.col("__P") * F.col("__n_total") - F.col("__Q") * F.col("n")
        ),
    ).otherwise(F.lit(0))
    out = walk.groupBy(*quasi_cols, "n", "__n_total", "__m").agg(
        F.sum(term).cast("long").alias("emd_num")
    )
    emd = F.when(F.col("__m") > 1, F.round(
        F.col("emd_num")
        / (
            (F.col("__m") - 1).cast("double")
            * F.col("n").cast("double")
            * F.col("__n_total").cast("double")
        ),
        6,
    )).otherwise(F.lit(0.0))
    return out.select(
        *quasi_cols,
        "n",
        "emd_num",
        emd.alias("emd"),
        (emd <= F.lit(float(t))).alias("t_close"),
    )
