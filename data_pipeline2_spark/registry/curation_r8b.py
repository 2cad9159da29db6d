"""Round-8b registry keys: the SimHash arm of the near-dup family and
the explicit Bloom semijoin prefilter.

`simhash_pairs` completes the near-dup method set the training-data
brief names (exact / minhash-LSH / SimHash / n-gram Jaccard /
embedding-cosine): `simhash` shipped the fingerprint in round 2 but
had no pair join — this adds the banded multi-index equi-join
(Norouzi et al., the `ahash_dup_pairs` scheme) with pigeonhole
completeness at the exported threshold, so SimHash dedup now has the
same bucketed no-all-pairs scale shape as the minhash path.

`join_bloom_prefilter` pins the runtime-row-filter join pattern as an
operator: bloom bits over the dim keys probe the fact map-side before
the shuffle — the 100 TB shape for selective fact⋈dim joins whose dim
outgrows a broadcast (Spark's own runtime bloomFilter rewrite, made
explicit and plan-asserted).

Reference anchors: BASELINE.json north_star's dedup mandate; Charikar
2002 (STOC) defines SimHash; Norouzi/Punjani/Fleet 2012 define
multi-index hamming search; Bloom 1970 for the filter.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline2_spark.operators import dedup, joins
from data_pipeline2_spark.registry._core import _register, _t
from data_pipeline2_spark.registry.search_multimodal import _simhash_sql

_SIMHASH_MAX_HAMMING = 3  # complete under the default 4 bands (d <= bands-1)


def _simhash_pairs_sql() -> str:
    # full-table scope (vs the simhash key's doc_id < 100 pin): the
    # pair join must see every near-dup cluster. The oracle is the
    # all-pairs ground truth; banding completeness (pigeonhole at
    # d <= bands-1) is exactly the claim this key's green row checks.
    base = _simhash_sql(where="len(trim(text, ' ')) > 0")
    return f"""
    WITH sh AS ({base})
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {_SIMHASH_MAX_HAMMING}
    """


@_register("simhash_pairs", _simhash_pairs_sql())
def q_simhash_pairs(spark, sf_dir):
    """SimHash near-dup pairs at hamming <= 3 over the full documents
    table: fingerprint (1 groupBy) -> banded multi-index equi-join ->
    exact popcount verify. The oracle replays the ALL-PAIRS join, so a
    green row proves the banded plan loses no pair (pigeonhole
    completeness, measured not assumed)."""
    sh = dedup.simhash64(_t(spark, sf_dir, "documents"))
    return dedup.simhash_pairs(
        sh, max_hamming=_SIMHASH_MAX_HAMMING, bands=4
    )


@_register(
    "join_bloom_prefilter",
    """
    SELECT s_suppkey,
           count(*) AS n_items,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(25,4))) AS DOUBLE) AS revenue
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    WHERE s_nationkey < 10
    GROUP BY s_suppkey
    """,
)
def q_join_bloom_prefilter(spark, sf_dir):
    """Selective fact⋈dim with the bloom bits probing lineitem
    map-side before any exchange; the exact join drops bloom false
    positives, so the oracle is the PLAIN join — identical output is
    the operator's contract."""
    supp = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_nationkey") < 10)
        .select("s_suppkey")
    )
    li = _t(spark, sf_dir, "lineitem")
    joined = joins.bloom_prefilter_join(
        li, supp, fact_key="l_suppkey", dim_key="s_suppkey"
    )
    revenue = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
    ).cast("decimal(25,4)")
    return joined.groupBy("s_suppkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum(revenue).cast("double").alias("revenue"),
    )


def _simhash_drop_sql() -> str:
    base = _simhash_sql(where="len(trim(text, ' ')) > 0")
    return f"""
    WITH RECURSIVE sh AS ({base}),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.simhash, b.simhash)) <= {_SIMHASH_MAX_HAMMING}
    ), edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ), reach(node, label) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.node
    ), clusters AS (
      SELECT node AS doc_id, min(label) AS cid FROM reach GROUP BY node
    )
    SELECT d.doc_id,
           coalesce(c.cid, d.doc_id) AS cluster_id,
           (c.cid IS NULL OR c.cid = d.doc_id) AS kept
    FROM documents d LEFT JOIN clusters c ON d.doc_id = c.doc_id
    """


@_register("simhash_dedup_drop", _simhash_drop_sql())
def q_simhash_dedup_drop(spark, sf_dir):
    """The APPLY step of the SimHash arm (minhash has dedup_clusters /
    dedup_representative; this completes the symmetry): hamming<=3
    pairs -> pointer-doubling connected components -> keep the min-id
    doc per cluster. Docs outside any cluster (including null/blank
    texts, which carry no fingerprint) are singleton keepers. The
    oracle replays all-pairs + recursive CC, so both the banding
    completeness AND the component labels are value-checked."""
    docs = _t(spark, sf_dir, "documents")
    sh = dedup.simhash64(docs)
    pairs = dedup.simhash_pairs(
        sh, max_hamming=_SIMHASH_MAX_HAMMING, bands=4
    ).select("doc_a", "doc_b")
    clusters = dedup.dedup_clusters(pairs)
    cid = F.coalesce(F.col("cluster_id"), F.col("doc_id"))
    return (
        docs.select("doc_id")
        .join(clusters, "doc_id", "left")
        .select(
            "doc_id",
            cid.alias("cluster_id"),
            (cid == F.col("doc_id")).alias("kept"),
        )
    )
