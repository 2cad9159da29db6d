"""Round-8 registry keys: exact-substring dedup at the published
50-token standard (report + apply), the winnowed fingerprint index
with its measured guarantee, and the auto-gated TPC-H q12/q21 pair.

Reference anchors: BASELINE.json north_star's dedup mandate; Lee et
al. 2022 (arXiv:2107.06499) define the 50-token exact-substring
criterion; Schleimer/Wilkerson/Aiken 2003 (SIGMOD) define winnowing;
TPC-H spec Q12/Q21 for the gated pair (blocked on testdata columns,
COVERAGE.md request).
"""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401

from data_pipeline2_spark.operators import dedup
from data_pipeline2_spark.plans.materialize import materialize
from data_pipeline2_spark.registry._core import _register, _t

_ESS_N = 50
_ESS_CAP = 16

# spans construction shared by the report key, the apply key, and the
# winnowing recall eval — ends in a CTE named `spans`
_ESS_CTES = f"""
    toks AS (
      SELECT doc_id, regexp_split_to_array(trim(lower(text), ' '), '\\s+') AS ws
      FROM documents WHERE text IS NOT NULL AND len(trim(text, ' ')) > 0
    ), wins AS (
      SELECT doc_id, i AS p,
             md5(array_to_string(ws[i:i+{_ESS_N - 1}], ' ')) AS h
      FROM (SELECT doc_id, ws,
                   unnest(generate_series(1, len(ws) - {_ESS_N - 1}))
                     AS i
            FROM toks WHERE len(ws) >= {_ESS_N})
    ), hd AS (
      SELECT h FROM wins GROUP BY h
      HAVING count(DISTINCT doc_id) BETWEEN 2 AND {_ESS_CAP}
    ), cand AS (SELECT wins.* FROM wins JOIN hd USING (h)),
    mt AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.p AS pa, b.p AS pb, a.p - b.p AS diag
      FROM cand a JOIN cand b
        ON a.h = b.h AND a.doc_id < b.doc_id
    ), isl AS (
      SELECT *, pa - row_number() OVER (
               PARTITION BY doc_a, doc_b, diag ORDER BY pa) AS grp
      FROM mt
    ), spans AS (
      SELECT doc_a, doc_b,
             CAST(min(pa) AS INT) AS a_start,
             CAST(min(pb) AS INT) AS b_start,
             CAST(max(pa) - min(pa) + {_ESS_N} AS INT) AS span_tokens
      FROM isl GROUP BY doc_a, doc_b, diag, grp
    )
"""


@_register(
    "exact_substring_spans",
    f"""
    WITH {_ESS_CTES}
    SELECT * FROM spans
    """,
)
def q_exact_substring_spans(spark, sf_dir):
    """Maximal cross-document exact shared spans >= 50 tokens — the
    Lee et al. 2022 exact-substring training-data dedup standard as a
    fingerprint-bucketed join + diagonal-run merge (never all-pairs;
    window emission is map-only over in-row token-array slices). The
    oracle replays the identical construction in SQL, so span starts
    and lengths are value-checked, not just counted."""
    return dedup.exact_substring_spans(
        _t(spark, sf_dir, "documents"),
        n_tokens=_ESS_N,
        df_cap_abs=_ESS_CAP,
    )


@_register(
    "exact_substring_dedup_stats",
    f"""
    WITH {_ESS_CTES},
    cuts AS (
      SELECT doc_b AS doc_id, b_start AS s,
             b_start + span_tokens - 1 AS e
      FROM spans
    ), flagged AS (
      SELECT doc_id, s, e,
             CASE WHEN s > coalesce(max(e) OVER (
                    PARTITION BY doc_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  -1)
                  THEN 1 ELSE 0 END AS ni
      FROM cuts
    ), grouped AS (
      SELECT doc_id, s, e,
             sum(ni) OVER (PARTITION BY doc_id ORDER BY s, e
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS g
      FROM flagged
    ), merged AS (
      SELECT doc_id, max(e) - min(s) + 1 AS cut_len
      FROM grouped GROUP BY doc_id, g
    ), per_doc AS (
      SELECT doc_id, count(*) AS n_cut_spans,
             sum(cut_len) AS tokens_removed
      FROM merged GROUP BY doc_id
    ), nt AS (
      SELECT doc_id,
             CASE WHEN text IS NULL OR len(trim(text, ' ')) = 0 THEN 0
                  ELSE len(regexp_split_to_array(trim(lower(text), ' '),
                                                 '\\s+'))
             END AS n_tokens
      FROM documents
    )
    SELECT per_doc.doc_id,
           CAST(nt.n_tokens AS BIGINT) AS n_tokens,
           CAST(per_doc.n_cut_spans AS BIGINT) AS n_cut_spans,
           CAST(per_doc.tokens_removed AS BIGINT) AS tokens_removed,
           CAST(nt.n_tokens - per_doc.tokens_removed AS BIGINT)
             AS tokens_kept,
           round(per_doc.tokens_removed::DOUBLE / nt.n_tokens, 6)
             AS removed_ratio
    FROM per_doc JOIN nt USING (doc_id)
    """,
)
def q_exact_substring_dedup_stats(spark, sf_dir):
    """The APPLY step of 50-token exact-substring dedup: every maximal
    shared span cuts its higher-doc-id occurrence (lowest id keeps its
    copy — the deterministic remove-all-but-one rule of Lee et al.
    2022), overlapping cuts merged by the gaps-and-islands interval
    union so token accounting is exact. Per affected doc: counts,
    removed/kept tokens, removal ratio."""
    return dedup.exact_substring_dedup_stats(
        _t(spark, sf_dir, "documents"),
        n_tokens=_ESS_N,
        df_cap_abs=_ESS_CAP,
    )


# winnowing parameters bound to the 50-token standard: any shared span
# of >= K + W - 1 = 50 tokens is guaranteed a shared fingerprint
_WIN_K, _WIN_W = 25, 26

_WINNOW_CTES = f"""
    toks AS (
      SELECT doc_id, regexp_split_to_array(trim(lower(text), ' '), '\\s+') AS ws
      FROM documents WHERE text IS NOT NULL AND len(trim(text, ' ')) > 0
    ), g AS (
      SELECT doc_id, i AS p,
             CAST('0x' || substring(
               md5(array_to_string(ws[i:i+{_WIN_K - 1}], ' ')), 1, 15)
             AS BIGINT) AS h
      FROM (SELECT doc_id, ws,
                   unnest(generate_series(1, len(ws) - {_WIN_K - 1}))
                     AS i
            FROM toks WHERE len(ws) >= {_WIN_K + _WIN_W - 1})
    ), m AS (
      SELECT doc_id, p, min({{'h': h, 'p': p}}) OVER (
               PARTITION BY doc_id ORDER BY p
               ROWS BETWEEN {_WIN_W - 1} PRECEDING AND CURRENT ROW) AS s
      FROM g
    ), wfp AS (
      SELECT DISTINCT doc_id, s.p AS pos, s.h AS fp
      FROM m WHERE p >= {_WIN_W}
    )
"""


@_register(
    "winnow_fingerprints",
    f"""
    WITH {_WINNOW_CTES}
    SELECT doc_id, CAST(pos AS INT) AS pos, fp FROM wfp
    """,
)
def q_winnow_fingerprints(spark, sf_dir):
    """Winnowed token-25-gram fingerprints, window 26 (Schleimer et
    al. 2003, the MOSS scheme): the persisted dedup INDEX — ~2/(w+1)
    of positions selected, yet any >= 50-token shared substring is
    GUARANTEED a shared fingerprint (k + w - 1 = 50, binding the
    published guarantee to the Lee et al. exact-substring standard).
    Struct-min tie-break (leftmost position) is lexicographic in both
    engines, so the selection is value-oracled, not just counted."""
    return dedup.winnow_fingerprints(
        _t(spark, sf_dir, "documents"), k=_WIN_K, w=_WIN_W
    )


@_register(
    "winnow_span_recall_eval",
    f"""
    WITH {_WINNOW_CTES},
    ewins AS (
      SELECT doc_id, i AS p,
             md5(array_to_string(ws[i:i+{_ESS_N - 1}], ' ')) AS h
      FROM (SELECT doc_id, ws,
                   unnest(generate_series(1, len(ws) - {_ESS_N - 1}))
                     AS i
            FROM toks WHERE len(ws) >= {_ESS_N})
    ), ehd AS (
      SELECT h FROM ewins GROUP BY h
      HAVING count(DISTINCT doc_id) BETWEEN 2 AND {_ESS_CAP}
    ), ecand AS (SELECT ewins.* FROM ewins JOIN ehd USING (h)),
    span_pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM ecand a JOIN ecand b
        ON a.h = b.h AND a.doc_id < b.doc_id
    ),
    fp_pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM wfp a JOIN wfp b
        ON a.fp = b.fp AND a.doc_id < b.doc_id
    ),
    cov AS (
      SELECT count(*) AS n_span_pairs,
             sum(CASE WHEN fp_pairs.doc_a IS NOT NULL
                 THEN 1 ELSE 0 END) AS n_covered
      FROM span_pairs LEFT JOIN fp_pairs USING (doc_a, doc_b)
    ),
    dens AS (
      SELECT count(*) AS n_fingerprints,
             (SELECT count(*) FROM g) AS n_positions
      FROM wfp
    )
    SELECT CAST(cov.n_span_pairs AS BIGINT) AS n_span_pairs,
           CAST(cov.n_covered AS BIGINT) AS n_covered_pairs,
           cov.n_covered = cov.n_span_pairs AS guarantee_holds,
           CAST(dens.n_fingerprints AS BIGINT) AS n_fingerprints,
           CAST(dens.n_positions AS BIGINT) AS n_positions,
           round(dens.n_fingerprints::DOUBLE / dens.n_positions, 6)
             AS density
    FROM cov, dens
    """,
)
def q_winnow_span_recall_eval(spark, sf_dir):
    """MEASURED winnowing guarantee + density (the image_ahash_band_eval
    precedent: export the recall evidence, don't just assert the
    theorem): every document pair sharing a >= 50-token exact span
    (the exact_substring_spans candidate-pair construction) must share
    a winnowed fingerprint — n_covered_pairs == n_span_pairs — while
    the index holds ~2/(w+1) of gram positions (density column). The
    guarantee quantifies over PAIRS, not span instances, because a
    shared fingerprint bucket is what seeds the pair for exhaustive
    verification in a winnow-then-verify pipeline."""
    docs = _t(spark, sf_dir, "documents")
    wfp = dedup.winnow_fingerprints(docs, k=_WIN_K, w=_WIN_W)
    # candidate-pair construction of exact_substring_spans, pair level
    spans = dedup.exact_substring_spans(
        docs, n_tokens=_ESS_N, df_cap_abs=_ESS_CAP
    )
    span_pairs = spans.select("doc_a", "doc_b").distinct()
    a = wfp.select(F.col("fp").alias("fa"), F.col("doc_id").alias("doc_a"))
    b = wfp.select(F.col("fp").alias("fb"), F.col("doc_id").alias("doc_b"))
    fp_pairs = (
        a.join(b, F.col("fa") == F.col("fb"))
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    cov = (
        span_pairs.join(
            fp_pairs.withColumn("__hit", F.lit(1)), ["doc_a", "doc_b"], "left"
        )
        .agg(
            F.count(F.lit(1)).alias("n_span_pairs"),
            F.sum(
                F.when(F.col("__hit").isNotNull(), 1).otherwise(0)
            ).alias("n_covered"),
        )
    )
    n_positions = (
        docs.filter(
            F.col("text").isNotNull()
            & (F.length(F.trim(F.col("text"))) > 0)
        )
        .select(
            F.size(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+")
            ).alias("n")
        )
        .filter(F.col("n") >= _WIN_K + _WIN_W - 1)
        .agg(F.sum(F.col("n") - F.lit(_WIN_K - 1)).alias("n_positions"))
    )
    n_fps = wfp.agg(F.count(F.lit(1)).alias("n_fingerprints"))
    return (
        cov.crossJoin(F.broadcast(n_fps))
        .crossJoin(F.broadcast(n_positions))
        .select(
            F.col("n_span_pairs").cast("long"),
            F.col("n_covered").cast("long").alias("n_covered_pairs"),
            (F.col("n_covered") == F.col("n_span_pairs")).alias(
                "guarantee_holds"
            ),
            F.col("n_fingerprints").cast("long"),
            F.col("n_positions").cast("long"),
            F.round(
                F.col("n_fingerprints")
                / F.col("n_positions").cast("double"),
                6,
            ).alias("density"),
        )
    )


@_register(
    "exact_substring_spans_winnowed",
    f"""
    WITH {_WINNOW_CTES},
    fpc AS (
      SELECT fp FROM wfp GROUP BY fp
      HAVING count(DISTINCT doc_id) BETWEEN 2 AND {_ESS_CAP}
    ), fpp AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM wfp a JOIN fpc USING (fp)
      JOIN wfp b ON a.fp = b.fp AND a.doc_id < b.doc_id
    ), kd AS (
      SELECT doc_a AS doc_id FROM fpp
      UNION SELECT doc_b FROM fpp
    ), wins2 AS (
      SELECT doc_id, i AS p,
             md5(array_to_string(ws[i:i+{_ESS_N - 1}], ' ')) AS h
      FROM (SELECT toks.doc_id, ws,
                   unnest(generate_series(1, len(ws) - {_ESS_N - 1}))
                     AS i
            FROM toks JOIN kd USING (doc_id)
            WHERE len(ws) >= {_ESS_N})
    ), hd2 AS (
      SELECT h FROM wins2 GROUP BY h
      HAVING count(DISTINCT doc_id) BETWEEN 2 AND {_ESS_CAP}
    ), cand2 AS (SELECT wins2.* FROM wins2 JOIN hd2 USING (h)),
    mt2 AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.p AS pa, b.p AS pb, a.p - b.p AS diag
      FROM cand2 a JOIN cand2 b
        ON a.h = b.h AND a.doc_id < b.doc_id
      JOIN fpp ON a.doc_id = fpp.doc_a AND b.doc_id = fpp.doc_b
    ), isl2 AS (
      SELECT *, pa - row_number() OVER (
               PARTITION BY doc_a, doc_b, diag ORDER BY pa) AS grp
      FROM mt2
    )
    SELECT doc_a, doc_b,
           CAST(min(pa) AS INT) AS a_start,
           CAST(min(pb) AS INT) AS b_start,
           CAST(max(pa) - min(pa) + {_ESS_N} AS INT) AS span_tokens
    FROM isl2 GROUP BY doc_a, doc_b, diag, grp
    """,
)
def q_exact_substring_spans_winnowed(spark, sf_dir):
    """The winnow-then-verify SCALE PATH for 50-token exact-substring
    dedup: the winnowed index (~2/(w+1) of positions) buckets candidate
    pairs, and only docs appearing in a candidate pair emit full window
    fingerprints — at lake scale almost every doc is pair-free and
    skips the exhaustive pass entirely. Because k + w - 1 = 50 binds
    the winnowing guarantee to the span threshold, the output EQUALS
    exact_substring_spans on every corpus where the df-cap scope
    difference is inert (pytest-asserted on the fixture; the cap counts
    docs within the restricted set, documented in the operator)."""
    docs = _t(spark, sf_dir, "documents")
    # r13 (VERDICT r12 item 5): materialize the winnow index ONCE — it
    # feeds the df-cap aggregate AND the pair join (via wfpc, both
    # self-join sides), so without the cut the full winnow subtree
    # (corpus gram hashing + per-doc window min + distinct) re-executed
    # per consumer. The index is exactly the table a lake deployment
    # PERSISTS (the operator's own contract), its md5-based fp VALUES
    # are untouched (output-semantic — the oracle replays them), and
    # its size is ~2/(w+1) of corpus positions.
    wfp = dedup.winnow_fingerprints(docs, k=_WIN_K, w=_WIN_W).transform(
        materialize
    )
    # fp df cap BEFORE the pair join — the sparse_cosine/exact-key
    # lesson applied to the index itself: a boilerplate fingerprint
    # shared by thousands of docs would otherwise build a quadratic
    # pair block. Inert on the fixture (max fp df = 3 at sf0.01) so
    # equality with the exhaustive key holds; at lake scale a span
    # whose ONLY selected fingerprint is boilerplate is excluded, the
    # same stance the exhaustive key takes for all-boilerplate spans.
    eligible = (
        wfp.groupBy("fp")
        .agg(F.count_distinct("doc_id").alias("df"))
        .filter((F.col("df") >= 2) & (F.col("df") <= _ESS_CAP))
        .select("fp")
    )
    wfpc = wfp.join(eligible, "fp")
    a = wfpc.select(F.col("fp").alias("fa"), F.col("doc_id").alias("doc_a"))
    b = wfpc.select(F.col("fp").alias("fb"), F.col("doc_id").alias("doc_b"))
    fpp = (
        a.join(b, F.col("fa") == F.col("fb"))
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    return dedup.exact_substring_spans(
        docs,
        n_tokens=_ESS_N,
        df_cap_abs=_ESS_CAP,
        restrict_pairs=fpp,
    )


# incremental split point: doc_id < _INC_BASE plays the already-
# indexed corpus, doc_id >= _INC_BASE the incoming batch
_INC_BASE = 250


@_register(
    "exact_substring_spans_incremental",
    f"""
    WITH {_WINNOW_CTES},
    fpc AS (
      SELECT fp FROM wfp GROUP BY fp
      HAVING count(DISTINCT doc_id) BETWEEN 2 AND {_ESS_CAP}
    ), fpp AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM wfp a JOIN fpc USING (fp)
      JOIN wfp b ON a.fp = b.fp AND a.doc_id < b.doc_id
      WHERE NOT (a.doc_id < {_INC_BASE} AND b.doc_id < {_INC_BASE})
    ), kd AS (
      SELECT doc_a AS doc_id FROM fpp
      UNION SELECT doc_b FROM fpp
    ), wins2 AS (
      SELECT doc_id, i AS p,
             md5(array_to_string(ws[i:i+{_ESS_N - 1}], ' ')) AS h
      FROM (SELECT toks.doc_id, ws,
                   unnest(generate_series(1, len(ws) - {_ESS_N - 1}))
                     AS i
            FROM toks JOIN kd USING (doc_id)
            WHERE len(ws) >= {_ESS_N})
    ), hd2 AS (
      SELECT h FROM wins2 GROUP BY h
      HAVING count(DISTINCT doc_id) BETWEEN 2 AND {_ESS_CAP}
    ), cand2 AS (SELECT wins2.* FROM wins2 JOIN hd2 USING (h)),
    mt2 AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.p AS pa, b.p AS pb, a.p - b.p AS diag
      FROM cand2 a JOIN cand2 b
        ON a.h = b.h AND a.doc_id < b.doc_id
      JOIN fpp ON a.doc_id = fpp.doc_a AND b.doc_id = fpp.doc_b
    ), isl2 AS (
      SELECT *, pa - row_number() OVER (
               PARTITION BY doc_a, doc_b, diag ORDER BY pa) AS grp
      FROM mt2
    )
    SELECT doc_a, doc_b,
           CAST(min(pa) AS INT) AS a_start,
           CAST(min(pb) AS INT) AS b_start,
           CAST(max(pa) - min(pa) + {_ESS_N} AS INT) AS span_tokens
    FROM isl2 GROUP BY doc_a, doc_b, diag, grp
    """,
)
def q_exact_substring_spans_incremental(spark, sf_dir):
    """The CONTINUOUS-INGESTION shape of exact-substring dedup (the
    dedup_incremental precedent): docs below the split play the
    already-indexed corpus, docs at/above it the incoming batch, and
    only pairs TOUCHING the batch are extracted — base-vs-base pairs
    were settled when the base was indexed, so a daily increment pays
    for its own spans, never the lake's. The winnow index buckets the
    candidate pairs (in production it is read back from the persisted
    fingerprint table rather than recomputed; the plan from the pair
    filter onward is identical either way)."""
    docs = _t(spark, sf_dir, "documents")
    # r13: winnow index materialized once — same rationale (and same
    # persisted-index justification) as the winnowed key above; in
    # production this frame is READ BACK from the fingerprint table,
    # so the checkpoint is the faithful stand-in for that read.
    wfp = dedup.winnow_fingerprints(docs, k=_WIN_K, w=_WIN_W).transform(
        materialize
    )
    eligible = (
        wfp.groupBy("fp")
        .agg(F.count_distinct("doc_id").alias("df"))
        .filter((F.col("df") >= 2) & (F.col("df") <= _ESS_CAP))
        .select("fp")
    )
    wfpc = wfp.join(eligible, "fp")
    a = wfpc.select(F.col("fp").alias("fa"), F.col("doc_id").alias("doc_a"))
    b = wfpc.select(F.col("fp").alias("fb"), F.col("doc_id").alias("doc_b"))
    fpp = (
        a.join(b, F.col("fa") == F.col("fb"))
        .filter(F.col("doc_a") < F.col("doc_b"))
        .filter(
            ~(
                (F.col("doc_a") < _INC_BASE)
                & (F.col("doc_b") < _INC_BASE)
            )
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    return dedup.exact_substring_spans(
        docs,
        n_tokens=_ESS_N,
        df_cap_abs=_ESS_CAP,
        restrict_pairs=fpp,
    )


# ------------------------------------------------- q12/q21 (auto-gated)
#
# Blocked on driver testdata since round 4: the generated lineitem has
# no l_receiptdate/l_commitdate/l_shipmode (re-checked every round;
# COVERAGE.md carries the standing request). The implementations are
# DONE (operators/joins.py: shipmode_priority, suppliers_waiting;
# pytest-pinned on constructed fixtures with the columns present), and
# this block sniffs the parquet schema at import so the keys register
# THEMSELVES with full dbgen-semantics oracles the round the columns
# ship — zero builder latency, and until then the driver contract only
# ever sees keys it can run.


def _lineitem_has_q12_columns() -> bool:
    try:
        import pyarrow.parquet as _pq

        need = {"l_receiptdate", "l_commitdate", "l_shipmode"}
        return all(
            need
            <= set(_pq.read_schema(f"/root/testdata/sf{sf}/lineitem.parquet").names)
            for sf in ("0.001", "0.01")
        )
    except Exception:
        return False


if _lineitem_has_q12_columns():

    @_register(
        "q12_shipmode_priority",
        """
        SELECT l_shipmode,
               sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                   THEN 1 ELSE 0 END) AS high_line_count,
               sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                   THEN 0 ELSE 1 END) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_commitdate < l_receiptdate
          AND l_shipdate < l_commitdate
        GROUP BY l_shipmode ORDER BY l_shipmode
        """,
    )
    def q_q12(spark, sf_dir):
        """TPC-H q12: late-but-honest lines per ship mode, split by
        order priority (receipt-year window omitted — fixture date
        ranges unpublished; the structural late-chain predicates carry
        the dbgen semantics)."""
        from data_pipeline2_spark.operators import joins as _joins

        return _joins.shipmode_priority(
            _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "lineitem")
        )

    @_register(
        "q21_suppliers_waiting",
        """
        WITH late AS (
          SELECT l_orderkey, l_suppkey FROM lineitem
          WHERE l_receiptdate > l_commitdate
        ), fin AS (
          SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'
        ), l1 AS (
          SELECT late.* FROM late JOIN fin ON l_orderkey = o_orderkey
        ), po AS (
          SELECT a.l_orderkey, a.n_supp, b.n_late
          FROM (SELECT l_orderkey, count(DISTINCT l_suppkey) AS n_supp
                FROM lineitem GROUP BY 1) a
          JOIN (SELECT l_orderkey, count(DISTINCT l_suppkey) AS n_late
                FROM late GROUP BY 1) b USING (l_orderkey)
        )
        SELECT s_name, count(*) AS numwait
        FROM l1
        JOIN po ON l1.l_orderkey = po.l_orderkey
               AND po.n_supp >= 2 AND po.n_late = 1
        JOIN supplier ON l1.l_suppkey = s_suppkey
        GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100
        """,
    )
    def q_q21(spark, sf_dir):
        """TPC-H q21: suppliers whose line was the only late one on a
        finalized multi-supplier order (nation filter omitted —
        fixture-agnostic; EXISTS/NOT-EXISTS expressed as one aggregated
        per-order predicate, no correlated subqueries)."""
        from data_pipeline2_spark.operators import joins as _joins

        return _joins.suppliers_waiting(
            _t(spark, sf_dir, "supplier"),
            _t(spark, sf_dir, "lineitem"),
            _t(spark, sf_dir, "orders"),
        )
