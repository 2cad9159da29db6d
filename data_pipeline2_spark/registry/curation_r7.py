"""Round-7 registry keys: banding-recall eval for the aHash near-dup
join, plus the round's new operator surface.

Reference parity: the reference's media-asset near-dup path is the
ES `dense_vector` script-score (services/search_service.py) — the
banded Hamming join re-expresses that as a Spark-native LSH; the eval
here is the measured counterpart of its recall claims.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline2_spark.operators import multimodal
from data_pipeline2_spark.registry._core import _register, _t
from data_pipeline2_spark.registry.curation_r6 import _AHASH_PX_CTES

# Eval threshold: deliberately ABOVE the pigeonhole-complete regime
# (bands-1 = 7) so the recorded curve shows where banded recall decays
# — the number a media-lake operator needs before widening a dedup
# threshold past the guarantee.
_BAND_EVAL_MAX_HAMMING = 24


@_register(
    "image_ahash_band_eval",
    f"""
    WITH {_AHASH_PX_CTES},
    bnd AS (
      SELECT asset_id, k,
             CASE WHEN k < 4 THEN (hash_lo >> (k * 8)) & 255
                  ELSE (hash_hi >> ((k - 4) * 8)) & 255 END AS bv
      FROM hashes, generate_series(0, 7) AS t(k)
    ), cand AS (
      SELECT DISTINCT a.asset_id AS id_a, b.asset_id AS id_b
      FROM bnd a JOIN bnd b
        ON a.k = b.k AND a.bv = b.bv AND a.asset_id < b.asset_id
    ), allp AS (
      SELECT a.asset_id AS id_a, b.asset_id AS id_b,
             CAST(bit_count(xor(a.hash_hi, b.hash_hi))
                  + bit_count(xor(a.hash_lo, b.hash_lo)) AS INT) AS hamming
      FROM hashes a JOIN hashes b ON a.asset_id < b.asset_id
    ), tru AS (
      SELECT hamming, count(*) AS n_true FROM allp
      WHERE hamming <= {_BAND_EVAL_MAX_HAMMING} GROUP BY hamming
    ), fnd AS (
      SELECT p.hamming, count(*) AS n_found
      FROM allp p JOIN cand c ON p.id_a = c.id_a AND p.id_b = c.id_b
      WHERE p.hamming <= {_BAND_EVAL_MAX_HAMMING} GROUP BY p.hamming
    )
    SELECT t.hamming, t.n_true,
           COALESCE(f.n_found, 0)::BIGINT AS n_found,
           round(COALESCE(f.n_found, 0) / t.n_true, 6) AS recall
    FROM tru t LEFT JOIN fnd f USING (hamming)
    """,
)
def q_image_ahash_band_eval(spark, sf_dir):
    """Banded-join recall vs exact all-pairs ground truth, per Hamming
    distance (the dedup_lsh_eval mold for the image path): recall is
    1.0 for d <= 7 by pigeonhole, measured (not asserted) for
    8 <= d <= 24. Ground truth uses the exact=True crossJoin —
    fixture-scale-only by construction; the banded candidate set is
    the exported production plan."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 120)
    hashes = multimodal.image_ahash(
        multimodal.gif_assets(docs), codec="gif"
    )
    truth = multimodal.ahash_dup_pairs(
        hashes, max_hamming=_BAND_EVAL_MAX_HAMMING, exact=True
    )
    banded = multimodal.ahash_dup_pairs(
        hashes, max_hamming=_BAND_EVAL_MAX_HAMMING
    )
    tc = truth.groupBy("hamming").agg(F.count(F.lit(1)).alias("n_true"))
    fc = banded.groupBy("hamming").agg(F.count(F.lit(1)).alias("n_found"))
    return tc.join(fc, "hamming", "left").select(
        "hamming",
        "n_true",
        F.coalesce(F.col("n_found"), F.lit(0)).cast("long").alias("n_found"),
        F.round(
            F.coalesce(F.col("n_found"), F.lit(0)) / F.col("n_true"), 6
        ).alias("recall"),
    )


# ------------------------------------------------------------ governance

from data_pipeline2_spark.operators import governance  # noqa: E402


@_register(
    "k_anonymity",
    """
    SELECT c_nationkey, c_mktsegment, CAST(count(*) AS BIGINT) AS n,
           count(*) >= 5 AS anonymous
    FROM customer GROUP BY 1, 2
    """,
)
def q_k_anonymity(spark, sf_dir):
    """k-anonymity audit over the (nation, market-segment) quasi-
    identifier tuple: every equivalence class sized, classes under
    k=5 flagged — the release-gate worklist for suppression or
    generalization before a corpus ships."""
    return governance.k_anonymity_audit(
        _t(spark, sf_dir, "customer"),
        ["c_nationkey", "c_mktsegment"],
        k=5,
    )


@_register(
    "gdpr_delete_cascade",
    """
    WITH req AS (
      SELECT DISTINCT doc_id AS d FROM documents WHERE doc_id % 97 = 0
    ),
    d0 AS (SELECT count(*) AS nb FROM documents),
    d1 AS (SELECT count(*) AS na FROM documents
           WHERE doc_id NOT IN (SELECT d FROM req)),
    e0 AS (SELECT count(*) AS nb FROM embeddings),
    e1 AS (SELECT count(*) AS na FROM embeddings
           WHERE vec_id NOT IN (SELECT d FROM req)),
    orp AS (
      SELECT count(*) AS n_orph FROM embeddings e
      WHERE e.vec_id NOT IN (SELECT d FROM req)
        AND e.vec_id NOT IN (
          SELECT doc_id FROM documents
          WHERE doc_id NOT IN (SELECT d FROM req))
    )
    SELECT 'documents' AS entity, d0.nb::BIGINT AS n_before,
           (d0.nb - d1.na)::BIGINT AS n_deleted, d1.na::BIGINT AS n_after,
           0::BIGINT AS n_orphans_after
    FROM d0, d1
    UNION ALL
    SELECT 'embeddings', e0.nb::BIGINT, (e0.nb - e1.na)::BIGINT,
           e1.na::BIGINT, orp.n_orph::BIGINT
    FROM e0, e1, orp
    """,
)
def q_gdpr_delete_cascade(spark, sf_dir):
    """Right-to-be-forgotten cascade audit: a deterministic request
    set (doc_id % 97 == 0) deletes documents and cascades to their
    embeddings via broadcast anti-joins; the audit rows carry the
    post-state orphan count as the compliance proof (0 = clean)."""
    docs = _t(spark, sf_dir, "documents")
    req = docs.filter(F.col("doc_id") % 97 == 0).select("doc_id")
    return governance.delete_cascade_audit(
        docs, _t(spark, sf_dir, "embeddings"), req
    )


# ------------------------------------------------------------ quality

from data_pipeline2_spark.operators import quality  # noqa: E402

_ENT_SCALE = "10000000000.0"


@_register(
    "char_entropy",
    f"""
    WITH ch AS (
      SELECT doc_id, unnest(string_split(text, '')) AS c
      FROM documents WHERE text IS NOT NULL AND len(text) > 0
    ), counts AS (
      SELECT doc_id, c, count(*) AS cnt FROM ch GROUP BY 1, 2
    ), tot AS (
      SELECT doc_id, sum(cnt) AS total, count(*) AS n_cats
      FROM counts GROUP BY 1
    ), terms AS (
      SELECT co.doc_id, t.total, t.n_cats,
             co.cnt * CAST(floor(
               ln(co.cnt::DOUBLE / t.total::DOUBLE) * {_ENT_SCALE}
             ) AS BIGINT) AS term
      FROM counts co JOIN tot t USING (doc_id)
    )
    SELECT doc_id,
           CAST(total AS BIGINT) AS n_chars,
           CAST(n_cats AS BIGINT) AS n_distinct,
           round(-(sum(term) / {_ENT_SCALE}) / total, 6) AS entropy,
           round(-(sum(term) / {_ENT_SCALE}) / total, 6) < 1.5
             AS low_entropy
    FROM terms GROUP BY doc_id, total, n_cats
    """,
)
def q_char_entropy(spark, sf_dir):
    """Character-level Shannon entropy per document — the gibberish /
    encoding-noise curation filter (floor-integerized log terms keep
    the per-doc sums associative and engine-portable; the idiom of
    events_type_entropy applied at character granularity)."""
    return quality.char_entropy(_t(spark, sf_dir, "documents"))


# ------------------------------------------------------------ aggregates

from data_pipeline2_spark.operators import aggregates  # noqa: E402


@_register(
    "events_cusum_drift",
    """
    WITH c AS (
      SELECT user_id, date_trunc('hour', ts) AS bucket_ts,
             count(*) AS x
      FROM events GROUP BY 1, 2
    ), t AS (
      SELECT user_id, sum(x) AS total, count(*) AS nb FROM c GROUP BY 1
    ), s AS (
      SELECT c.user_id, c.bucket_ts, c.x, t.total, t.nb,
             sum(t.nb * c.x - t.total) OVER (
               PARTITION BY c.user_id ORDER BY c.bucket_ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM c JOIN t USING (user_id)
    ), m AS (
      SELECT *, least(0, min(cum) OVER (
               PARTITION BY user_id ORDER BY bucket_ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS smin
      FROM s
    )
    SELECT user_id, bucket_ts, CAST(x AS BIGINT) AS n_events,
           round((cum - smin) / nb, 6) AS score,
           (cum - smin) > 3 * total AS drift
    FROM m
    """,
)
def q_events_cusum_drift(spark, sf_dir):
    """One-sided CUSUM drift detection per user over hourly event
    rates — the recursive S_t = max(0, S_{t-1} + (x_t - mean)) in its
    closed window form cum - running_min(cum), with mean kept rational
    so every intermediate is an exact bigint."""
    return aggregates.cusum_changepoints(_t(spark, sf_dir, "events"))


@_register(
    "cohort_ltv",
    """
    WITH f AS (
      SELECT o_custkey, min(date_trunc('month', o_orderdate)) AS cohort
      FROM orders GROUP BY 1
    ), e AS (
      SELECT f.cohort AS cohort_month,
             CAST((year(date_trunc('month', o.o_orderdate)) * 12
                   + month(date_trunc('month', o.o_orderdate)))
                  - (year(f.cohort) * 12 + month(f.cohort)) AS INT)
               AS month_offset,
             o.o_custkey AS cust, o.o_totalprice AS amt
      FROM orders o JOIN f ON o.o_custkey = f.o_custkey
    )
    SELECT cohort_month, month_offset,
           CAST(count(DISTINCT cust) AS BIGINT) AS n_customers,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(CAST(sum(CAST(amt AS DECIMAL(25,2))) AS DOUBLE), 2)
             AS revenue
    FROM e GROUP BY 1, 2
    """,
)
def q_cohort_ltv(spark, sf_dir):
    """Acquisition-cohort LTV matrix over orders: customers cohort by
    first-order month, revenue lands in (cohort, months-since) cells
    with exact decimal sums — the revenue sibling of events_retention."""
    return aggregates.cohort_ltv(_t(spark, sf_dir, "orders"))


# ------------------------------------------------------------ joins

from data_pipeline2_spark.operators import joins as _joins  # noqa: E402


@_register(
    "join_interval_overlap",
    """
    WITH iv AS (
      SELECT user_id * 100000
               + date_diff('day', DATE '1970-01-01',
                           CAST(date_trunc('day', ts) AS DATE)) AS iid,
             min(ts) AS s, max(ts) AS e
      FROM events WHERE event_type = 'error'
      GROUP BY user_id, date_trunc('day', ts)
    )
    SELECT a.iid AS id_a, b.iid AS id_b,
           round((epoch_us(least(a.e, b.e))
                  - epoch_us(greatest(a.s, b.s))) / 1000000.0, 6)
             AS overlap_seconds
    FROM iv a JOIN iv b
      ON a.iid < b.iid AND a.s < b.e AND b.s < a.e
    WHERE a.s < a.e AND b.s < b.e
    """,
)
def q_join_interval_overlap(spark, sf_dir):
    """Interval overlap self-join (banded by hour buckets — the LSH
    idiom applied to time): per-user daily error-activity spans,
    paired across users wherever the spans overlap. The oracle is the
    naive inequality join; the engine plan is the bucket-exploded
    equi-join that survives a lake-sized interval table. The interval
    id is a MONTH-SAFE epoch-day ordinal (user_id·100000 + days since
    1970-01-01): the r7 dayofmonth encoding collided across months for
    any fixture spanning a month boundary (ADVICE r7), silently
    merging distinct intervals on both engine and oracle sides."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "error")
    iv = (
        ev.groupBy(
            "user_id", F.date_trunc("day", F.col("ts")).alias("__d")
        )
        .agg(F.min("ts").alias("start_ts"), F.max("ts").alias("end_ts"))
        .select(
            (
                F.col("user_id") * 100000
                + F.datediff(F.col("__d"), F.lit("1970-01-01"))
            ).alias("iid"),
            "start_ts",
            "end_ts",
        )
    )
    return _joins.interval_overlap_join(iv, bucket="hour")


# ------------------------------------------------------------ retrieval

from data_pipeline2_spark.operators import textanalysis  # noqa: E402
from data_pipeline2_spark.registry.curation_r5 import (  # noqa: E402
    _BM25_BATCH_QUERIES,
    _bm25_batch_ctes,
)


@_register(
    "rm3_expansion",
    f"""
    WITH {_bm25_batch_ctes(_BM25_BATCH_QUERIES)},
    fb AS (
      SELECT qid, doc_id, CAST(score AS DECIMAL(18,6)) AS sc
      FROM bscored WHERE rn <= 5
    ), ftoks AS (
      SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, unnest(toks) AS term FROM docs)
      WHERE doc_id IN (SELECT DISTINCT doc_id FROM fb)
      GROUP BY doc_id, term
    ), wgt AS (
      SELECT f.qid, t.term,
             round(CAST(sum(CAST(t.tf * f.sc AS DECIMAL(28,6)))
                        AS DOUBLE), 6) AS weight
      FROM ftoks t JOIN fb f USING (doc_id)
      GROUP BY f.qid, t.term
    ), ex AS (
      SELECT * FROM wgt w WHERE NOT EXISTS (
        SELECT 1 FROM qt WHERE qt.qid = w.qid AND qt.term = w.term)
    ), r AS (
      SELECT qid, term, weight,
             row_number() OVER (PARTITION BY qid
                                ORDER BY weight DESC, term) AS rank
      FROM ex
    )
    SELECT qid, CAST(rank AS INT) AS rank, term, weight
    FROM r WHERE rank <= 10
    """,
)
def q_rm3_expansion(spark, sf_dir):
    """RM3 pseudo-relevance-feedback expansion over the shared BM25
    batch queries: top-5 feedback docs per query, expansion terms
    weighted by decimal-exact Σ tf·score, original query terms
    excluded — the offline query-rewrite stage feeding the next
    retrieval round."""
    queries = spark.createDataFrame(
        _BM25_BATCH_QUERIES, "qid int, query string"
    )
    return textanalysis.rm3_expansion(
        _t(spark, sf_dir, "documents"), queries, fb_k=5, top_terms=10
    )


# ------------------------------------------------------------ multimodal


@_register(
    "video_scene_cuts",
    """
    WITH d AS (
      SELECT doc_id AS asset_id, 1000 + (doc_id % 97) * 137 AS dur
      FROM documents WHERE doc_id < 150
    ), fr AS (
      SELECT asset_id, CAST(f * 1000 AS BIGINT) AS ts_ms,
             (asset_id * 131 + (f * 1000 // 3000) * 977) % 256 AS luma
      FROM (SELECT asset_id,
                   unnest(generate_series(0, greatest(dur // 1000, 1) - 1))
                     AS f
            FROM d)
    ), cuts AS (
      SELECT asset_id, ts_ms,
             CASE WHEN lag(luma) OVER w IS NULL THEN 1
                  WHEN abs(luma - lag(luma) OVER w) >= 16 THEN 1
                  ELSE 0 END AS cut
      FROM fr WINDOW w AS (PARTITION BY asset_id ORDER BY ts_ms)
    ), sc AS (
      SELECT asset_id, ts_ms,
             CAST(sum(cut) OVER (
               PARTITION BY asset_id ORDER BY ts_ms
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT)
               AS scene_no
      FROM cuts
    )
    SELECT asset_id, scene_no, CAST(count(*) AS BIGINT) AS n_frames,
           min(ts_ms) AS start_ms, max(ts_ms) AS end_ms
    FROM sc GROUP BY 1, 2
    """,
)
def q_video_scene_cuts(spark, sf_dir):
    """Scene segmentation over the real-MP4 frame grid (mvhd container
    walk drives the durations; the per-frame luma is the documented
    deterministic stub for the H.264 decode): lag-diff cut detection +
    cumulative run groups → per-scene spans."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    return multimodal.video_scene_cuts(multimodal.mp4_assets(docs))


# ---------------------------------------------------- graph / accounting

from data_pipeline2_spark.operators import dedup as _dedup  # noqa: E402
from data_pipeline2_spark.registry.ingest_chunk import (  # noqa: E402
    _MINHASH_SQL,
)

_KCORE_K, _KCORE_ROUNDS = 2, 3


def _kcore_rounds_sql(k: int, rounds: int) -> tuple[str, str]:
    """Unrolled fixed-round peel CTEs (the kmeans fixed-iteration
    convention applied to graph peeling).

    Every CTE is MATERIALIZED (r13): each round references the
    previous edge set three times (degree count twice via the UNION
    ALL, the peel join once), so DuckDB's default inlining re-evaluated
    the whole upstream chain — including the embedded minhash pipeline
    in `p` — once per reference, ~3^rounds times in total (measured
    280+ s at sf0.001; materialized: 0.2 s). AS MATERIALIZED is an
    optimization fence only — row values are untouched (the oracle
    parity test re-verifies Spark against the materialized form)."""
    parts = ["e0 AS MATERIALIZED (SELECT doc_a AS a, doc_b AS b FROM p)"]
    for r in range(1, rounds + 1):
        parts.append(
            f"d{r} AS MATERIALIZED (SELECT n, count(*) AS deg FROM "
            f"(SELECT a AS n FROM e{r-1} UNION ALL SELECT b AS n "
            f"FROM e{r-1}) GROUP BY n)"
        )
        parts.append(
            f"k{r} AS MATERIALIZED (SELECT n FROM d{r} WHERE deg >= {k})"
        )
        parts.append(
            f"e{r} AS MATERIALIZED (SELECT e.a, e.b FROM e{r-1} e "
            f"JOIN k{r} x ON e.a = x.n JOIN k{r} y ON e.b = y.n)"
        )
    final = (
        f"SELECT n AS doc_id, CAST(count(*) AS BIGINT) AS degree FROM "
        f"(SELECT a AS n FROM e{rounds} UNION ALL SELECT b AS n "
        f"FROM e{rounds}) GROUP BY n"
    )
    return ",\n    ".join(parts), final


_KC_PARTS, _KC_FINAL = _kcore_rounds_sql(_KCORE_K, _KCORE_ROUNDS)


@_register(
    "dedup_kcore",
    f"""
    WITH p AS MATERIALIZED ({_MINHASH_SQL}),
    {_KC_PARTS}
    {_KC_FINAL}
    """,
)
def q_dedup_kcore(spark, sf_dir):
    """k-core peel (k=2, 3 unrolled rounds) over the verified minhash
    near-dup graph: the dense boilerplate/template families survive,
    incidental one-off matches peel away — the density layer on top of
    dedup_clusters' connectivity."""
    pairs = _dedup.dedup_near_minhash(_t(spark, sf_dir, "documents"))
    return _dedup.kcore_nodes(pairs, k=_KCORE_K, rounds=_KCORE_ROUNDS)


@_register(
    "dedup_token_savings",
    """
    WITH base AS (
      SELECT doc_id AS id, source, md5(text) AS h,
             CASE WHEN len(trim(text, ' ')) = 0 THEN 0
                  ELSE len(regexp_split_to_array(trim(lower(text), ' '),
                                                 '\\s+')) END AS nt
      FROM documents WHERE text IS NOT NULL
    ), keep AS (
      SELECT min(id) AS kid FROM base GROUP BY h
    ), flagged AS (
      SELECT b.source, b.nt,
             CASE WHEN k.kid IS NULL THEN 0 ELSE 1 END AS kept
      FROM base b LEFT JOIN keep k ON b.id = k.kid
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(nt) AS BIGINT) AS n_tokens,
           CAST(sum(kept) AS BIGINT) AS n_docs_kept,
           CAST(sum(kept * nt) AS BIGINT) AS n_tokens_kept,
           round(1.0 - sum(kept * nt) / sum(nt), 6) AS token_savings
    FROM flagged GROUP BY source
    """,
)
def q_dedup_token_savings(spark, sf_dir):
    """Per-source token accounting of exact dedup (global-first keep
    rule): the budget question — how many tokens does each source
    contribute AFTER dedup, and what fraction was duplicate weight."""
    return _dedup.dedup_token_savings(_t(spark, sf_dir, "documents"))


_PSI_SPLIT_TS = "2024-01-16 00:00:00"


@_register(
    "events_psi_drift",
    f"""
    WITH s AS (
      SELECT event_type AS g,
             CAST(floor(value / 25.0) AS BIGINT) AS bkt,
             CASE WHEN ts < TIMESTAMP '{_PSI_SPLIT_TS}' THEN 1
                  ELSE 0 END AS is_base
      FROM events
    ), counts AS (
      SELECT g, bkt, sum(is_base) + 1 AS c1, sum(1 - is_base) + 1 AS c2
      FROM s GROUP BY 1, 2
    ), tot AS (
      SELECT g, sum(c1) AS t1, sum(c2) AS t2, count(*) AS n_buckets
      FROM counts GROUP BY 1
    ), terms AS (
      SELECT c.g, t.t1, t.t2, t.n_buckets,
             (c.c1 * t.t2 - c.c2 * t.t1)
             * CAST(floor(ln((c.c1 * t.t2)::DOUBLE
                             / (c.c2 * t.t1)::DOUBLE)
                          * 1000000.0) AS BIGINT) AS term
      FROM counts c JOIN tot t USING (g)
    )
    SELECT g AS event_type,
           CAST(n_buckets AS BIGINT) AS n_buckets,
           CAST(t1 AS BIGINT) AS n_base,
           CAST(t2 AS BIGINT) AS n_curr,
           round(sum(term) / (t1 * t2)::DOUBLE / 1000000.0, 6) AS psi,
           round(sum(term) / (t1 * t2)::DOUBLE / 1000000.0, 6) > 0.2
             AS drifted
    FROM terms GROUP BY g, t1, t2, n_buckets
    """,
)
def q_events_psi_drift(spark, sf_dir):
    """Population Stability Index per event type between the first 15
    days and the rest — the ML-ops drift gate, with floor-integerized
    log terms so the bucket sum is associative and engine-portable."""
    ev = _t(spark, sf_dir, "events")
    return aggregates.psi_drift(
        ev, F.col("ts") < F.lit(_PSI_SPLIT_TS).cast("timestamp")
    )


# ---------------------------------------------------- sketches / layout

_KMV_K = 16
_KMV_SPACE = str(float(1 << 60))


@_register(
    "kmv_distinct_sketch",
    f"""
    WITH h0 AS (
      SELECT DISTINCT source AS scope,
             CAST('0x' || substring(md5(text), 1, 15) AS BIGINT) AS h
      FROM documents WHERE text IS NOT NULL
    ), hb AS (
      SELECT scope, h FROM h0
      UNION ALL
      SELECT DISTINCT 'ALL' AS scope, h FROM h0
    ), r AS (
      SELECT scope, h,
             row_number() OVER (PARTITION BY scope ORDER BY h) AS rn
      FROM hb
    ), st AS (
      SELECT scope, count(*) AS n_exact FROM hb GROUP BY scope
    ), kth AS (
      SELECT scope, h AS hk FROM r WHERE rn = {_KMV_K}
    )
    SELECT st.scope, CAST(st.n_exact AS BIGINT) AS n_exact,
           CASE WHEN kth.hk IS NULL THEN st.n_exact::DOUBLE
                ELSE round({_KMV_K - 1}.0 * {_KMV_SPACE} / kth.hk, 6)
           END AS kmv_estimate,
           round(abs(CASE WHEN kth.hk IS NULL THEN st.n_exact::DOUBLE
                          ELSE round({_KMV_K - 1}.0 * {_KMV_SPACE}
                                     / kth.hk, 6) END
                     - st.n_exact) / st.n_exact, 6) AS rel_error
    FROM st LEFT JOIN kth USING (scope)
    """,
)
def q_kmv_distinct_sketch(spark, sf_dir):
    """K-Minimum-Values distinct sketch per source + the merged ALL
    row — the mergeable-sketch complement to approx_count_distinct's
    HLL: per-source sketches union into the global estimate without
    re-touching data, and the 60-bit md5-prefix hashes make the whole
    sketch (including its error) bit-reproducible on both engines."""
    return aggregates.kmv_distinct(
        _t(spark, sf_dir, "documents"), k=_KMV_K
    )


from data_pipeline2_spark.plans.zorder import (  # noqa: E402
    zone_map_prune_eval,
)
from data_pipeline2_spark.registry.curation_r6 import (  # noqa: E402
    _z_interleave_sql,
)

_ZM_XPT, _ZM_YPT = 42, 14


@_register(
    "zone_map_prune_eval",
    f"""
    WITH e AS (
      SELECT user_id::BIGINT AS x,
             date_part('day', ts)::BIGINT - 1 AS y
      FROM events WHERE ts IS NOT NULL
    ), z AS (
      SELECT x, y, {_z_interleave_sql('x', 'y')} AS zv FROM e
    ), zf AS (
      SELECT zv // 64 AS file_id,
             min(x) AS x_lo, max(x) AS x_hi,
             min(y) AS y_lo, max(y) AS y_hi
      FROM z GROUP BY 1
    ), lf AS (
      SELECT (x * 64 + y) // 150 AS file_id,
             min(x) AS x_lo, max(x) AS x_hi,
             min(y) AS y_lo, max(y) AS y_hi
      FROM e GROUP BY 1
    ), agg AS (
      SELECT 'linear_x' AS layout, count(*) AS n_files,
             sum(CASE WHEN x_lo <= {_ZM_XPT} AND x_hi >= {_ZM_XPT}
                 THEN 1 ELSE 0 END) AS hit_x,
             sum(CASE WHEN y_lo <= {_ZM_YPT} AND y_hi >= {_ZM_YPT}
                 THEN 1 ELSE 0 END) AS hit_y
      FROM lf
      UNION ALL
      SELECT 'zorder', count(*),
             sum(CASE WHEN x_lo <= {_ZM_XPT} AND x_hi >= {_ZM_XPT}
                 THEN 1 ELSE 0 END),
             sum(CASE WHEN y_lo <= {_ZM_YPT} AND y_hi >= {_ZM_YPT}
                 THEN 1 ELSE 0 END)
      FROM zf
    )
    SELECT layout, CAST(n_files AS BIGINT) AS n_files,
           CAST(hit_x AS BIGINT) AS hit_x,
           CAST(hit_y AS BIGINT) AS hit_y,
           round(1.0 - hit_x / n_files, 6) AS prune_x,
           round(1.0 - hit_y / n_files, 6) AS prune_y
    FROM agg
    """,
)
def q_zone_map_prune_eval(spark, sf_dir):
    """Data-skipping selectivity measured over two layouts of the same
    events: linear (sorted by user_id — prunes only its leading
    column) vs z-order (bounded squares — prunes BOTH dimensions).
    The quantified justification for zorder_layout's write path."""
    evt = _t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    return zone_map_prune_eval(
        evt.select(
            F.col("user_id").alias("x"),
            (F.dayofmonth("ts") - 1).alias("y"),
        ),
        "x",
        "y",
        x_point=_ZM_XPT,
        y_point=_ZM_YPT,
    )


# ------------------------------------------------- textrank / robust trend

from data_pipeline2_spark.registry.analytics_ext import (  # noqa: E402
    _COOC_SQL,
    _pagerank_sql,
)

_TR_PARTS, _TR_FINAL = _pagerank_sql(parts_only=True)


@_register(
    "textrank_terms",
    f"""
    WITH cooc AS ({_COOC_SQL}),
    pairs AS (SELECT w1 AS doc_a, w2 AS doc_b FROM cooc),
    {_TR_PARTS},
    fin AS (SELECT node, round(rank, 6) AS pagerank FROM {_TR_FINAL}),
    rk AS (
      SELECT node AS term, pagerank,
             row_number() OVER (ORDER BY pagerank DESC, node) AS rn
      FROM fin
    )
    SELECT CAST(rn AS INT) AS rank, term, pagerank
    FROM rk WHERE rn <= 20
    """,
)
def q_textrank_terms(spark, sf_dir):
    """TextRank keyword extraction: PageRank over the top-100 term
    co-occurrence edges — structurally central vocabulary, composed
    from term_cooccurrence + the oracled fixed-iteration pagerank."""
    return textanalysis.textrank_terms(_t(spark, sf_dir, "documents"))


@_register(
    "events_theil_sen",
    """
    WITH daily AS (
      SELECT user_id AS key, date_trunc('day', ts) AS d, count(*) AS x
      FROM events GROUP BY 1, 2
    ), pairs AS (
      SELECT a.key,
             (b.x - a.x) / CAST(date_diff('day', a.d, b.d) AS DOUBLE) AS s
      FROM daily a JOIN daily b ON a.key = b.key AND a.d < b.d
    ), med AS (
      SELECT key, count(*) AS n_pairs,
             round(quantile_cont(s, 0.5), 6) AS slope_median
      FROM pairs GROUP BY key
    ), cnt AS (
      SELECT key, count(*) AS n_buckets FROM daily GROUP BY key
    )
    SELECT cnt.key AS user_id,
           CAST(cnt.n_buckets AS BIGINT) AS n_buckets,
           CAST(COALESCE(med.n_pairs, 0) AS BIGINT) AS n_pairs,
           COALESCE(med.slope_median, 0.0) AS slope_median,
           COALESCE(med.slope_median, 0.0) > 0 AS rising
    FROM cnt LEFT JOIN med USING (key)
    """,
)
def q_events_theil_sen(spark, sf_dir):
    """Per-user Theil–Sen activity trend (median of pairwise slopes
    over daily counts): the robust growing-or-decaying detector — a
    single burst day cannot drag it the way it drags an OLS slope.
    Pairwise blow-up is quadratic only in each key's bucket count."""
    return aggregates.theil_sen_trend(_t(spark, sf_dir, "events"))


# --------------------------------------------------- audio VAD / A-B test


@_register(
    "audio_vad_segments",
    """
    WITH d AS (
      SELECT doc_id AS asset_id,
             500 + (doc_id % 41) * 250 AS n,
             8 + doc_id % 32 AS p,
             200 + doc_id % 56 AS high
      FROM documents WHERE doc_id < 150
    )
    SELECT asset_id, CAST(k + 1 AS INT) AS seg_no,
           CAST(2 * k * p AS BIGINT) AS start_sample,
           CAST(least((2 * k + 1) * p, n) - 2 * k * p AS BIGINT)
             AS n_samples,
           CAST(high AS INT) AS level
    FROM (SELECT asset_id, n, p, high,
                 unnest(generate_series(0, (n - 1) // (2 * p))) AS k
          FROM d)
    """,
)
def q_audio_vad_segments(spark, sf_dir):
    """Activity segmentation over the REAL byte-level WAV PCM decode:
    runs of amplitude >= 128 become segments (numpy run detection per
    asset inside the Arrow batch — map-only, no shuffle carries
    samples). The square-wave fixtures make every high half-period one
    closed-form segment, so the oracle verifies decode + segmentation
    end-to-end."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    return multimodal.audio_vad_segments(docs)


@_register(
    "events_ab_chi2",
    """
    WITH cells AS (
      -- NULL variant = no arm assignment: outside the experiment,
      -- excluded from cells AND margins AND N AND k (ADVICE r8 — a
      -- partial exclusion biases chi2; the engine applies the same
      -- filter before its groupBy)
      SELECT user_id % 2 AS v, event_type AS c, count(*) AS o
      FROM events WHERE user_id % 2 IS NOT NULL GROUP BY 1, 2
    ), rt AS (SELECT v, sum(o) AS rt FROM cells GROUP BY v),
    ct AS (SELECT c AS ct_c, sum(o) AS ct FROM cells GROUP BY c),
    nn AS (SELECT sum(o) AS nn FROM cells),
    -- NULL event_type is a real category: distinct-subquery count
    -- keeps the NULL group (count(DISTINCT c) would drop it), and the
    -- margin join below is null-safe — mirrors the engine exactly
    kk AS (SELECT count(*) AS k FROM (SELECT DISTINCT c FROM cells)),
    nv AS (SELECT count(*) AS nv FROM (SELECT DISTINCT v FROM cells)),
    terms AS (
      SELECT CAST(round(
               cells.o::DOUBLE * cells.o * nn.nn
               / (rt.rt::DOUBLE * ct.ct), 12)
             AS DECIMAL(28,12)) AS t
      FROM cells JOIN rt USING (v)
      JOIN ct ON cells.c IS NOT DISTINCT FROM ct.ct_c
      CROSS JOIN nn
    ), s AS (SELECT round(CAST(sum(t) AS DOUBLE)
                          - (SELECT nn FROM nn), 6) AS chi2 FROM terms),
    cv AS (SELECT ([3.841, 5.991, 7.815, 9.488, 11.070, 12.592, 14.067,
                    15.507, 16.919, 18.307, 19.675, 21.026, 22.362,
                    23.685, 24.996, 26.296, 27.587, 28.869, 30.144,
                    31.410, 32.671, 33.924, 35.172, 36.415, 37.652,
                    38.885, 40.113, 41.337, 42.557, 43.773, 44.985,
                    46.194, 47.400, 48.602, 49.802, 50.998, 52.192,
                    53.384, 54.572, 55.758])
                   [CAST((nv.nv - 1) * (kk.k - 1) AS INT)]
             AS crit FROM kk, nv)
    SELECT CAST(nn.nn AS BIGINT) AS n_total,
           CAST((nv.nv - 1) * (kk.k - 1) AS INT) AS dof,
           s.chi2,
           cv.crit,
           s.chi2 > cv.crit AS significant
    FROM s, nn, kk, cv, nv
    """,
)
def q_events_ab_chi2(spark, sf_dir):
    """Chi-square homogeneity A/B gate: does the event-type mix differ
    between the user_id-parity variants beyond chance? Exact integer
    contingency algebra inside one double division per cell, 12-dp
    decimal-summed — the experimentation primitive on top of the
    events analytics family."""
    return aggregates.ab_chi2(
        _t(spark, sf_dir, "events"), F.col("user_id") % 2
    )


# ------------------------------------------------ survival / concentration


@_register(
    "events_kaplan_meier",
    """
    WITH life AS (
      SELECT user_id, min(ts) AS f, max(ts) AS l FROM events GROUP BY 1
    ), horizon AS (SELECT max(ts) AS e FROM events),
    pu AS (
      SELECT date_diff('day', f, l) AS dur,
             epoch_us(e) - epoch_us(l) > 86400000000 AS churned
      FROM life, horizon
    ), bd AS (
      SELECT dur, count(*) AS n_ending,
             sum(CASE WHEN churned THEN 1 ELSE 0 END) AS n_churned
      FROM pu GROUP BY dur
    ), rk AS (
      SELECT *, sum(n_ending) OVER (
               ORDER BY dur DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS n_at_risk
      FROM bd
    ), tm AS (
      SELECT dur, n_at_risk, n_churned,
             CASE WHEN n_churned >= n_at_risk THEN NULL
                  ELSE CAST(floor(ln((n_at_risk - n_churned)::DOUBLE
                       / n_at_risk::DOUBLE) * 1000000000.0) AS BIGINT)
             END AS t,
             n_churned >= n_at_risk AS dead
      FROM rk WHERE n_churned > 0
    ), cm AS (
      SELECT *, sum(t) OVER (
               ORDER BY dur
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM tm
    )
    SELECT CAST(dur AS INT) AS duration_days,
           CAST(n_at_risk AS BIGINT) AS n_at_risk,
           CAST(n_churned AS BIGINT) AS n_churned,
           CASE WHEN dead THEN NULL
                ELSE round(cum / 1000000000.0, 6) END AS log_survival
    FROM cm
    """,
)
def q_events_kaplan_meier(spark, sf_dir):
    """Kaplan–Meier survival over user lifetimes (churn = last event
    more than 24 HOURS of exact epoch time before the observation end;
    later finishers are right-censored). The 24 h horizon is derived
    from the fixture's inter-event cadence: the r7 3-calendar-day gap
    made every user censored at every SF, so the driver green row
    compared two EMPTY frames (VERDICT r7 item 1) — at 24 h sf0.001/
    0.01/0.1 churn 1/14/141 users, so the estimator itself is now under
    oracle. The cumulative product ships in the LOG domain with
    floor-integerized factors — associative, engine-portable, and
    exp-free (libm last-ulp differences would break value parity)."""
    return aggregates.kaplan_meier(
        _t(spark, sf_dir, "events"), censor_gap_hours=24
    )


@_register(
    "orders_pareto",
    """
    WITH pk AS (
      SELECT o_custkey AS key,
             sum(CAST(o_totalprice AS DECIMAL(25,2))) AS rev
      FROM orders GROUP BY 1
    ), tl AS (
      SELECT key, rev, ntile(10) OVER (ORDER BY rev DESC, key) AS tile
      FROM pk
    ), bt AS (
      SELECT tile, count(*) AS n_customers, sum(rev) AS trev
      FROM tl GROUP BY tile
    ), g AS (SELECT sum(trev) AS grand FROM bt),
    cm AS (
      SELECT *, sum(trev) OVER (
               ORDER BY tile
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM bt
    )
    SELECT CAST(tile AS INT) AS tile,
           CAST(n_customers AS BIGINT) AS n_customers,
           round(CAST(trev AS DOUBLE), 2) AS revenue,
           round(trev::DOUBLE / grand::DOUBLE, 6) AS revenue_share,
           round(cum::DOUBLE / grand::DOUBLE, 6) AS cum_share
    FROM cm, g
    """,
)
def q_orders_pareto(spark, sf_dir):
    """Revenue-concentration (Pareto) curve: customers ranked by exact
    decimal revenue into deciles, shares cumulating from the top —
    the 'top 10% produce X%' number every revenue dashboard leads
    with; all windows order key- or tile-cardinality tables."""
    return aggregates.pareto_concentration(_t(spark, sf_dir, "orders"))


# ------------------------------------------- outliers / dispersion / funnel

from data_pipeline2_spark.operators import similarity  # noqa: E402
from data_pipeline2_spark.registry.curation_r5 import (  # noqa: E402
    _EMB_EXPAND,
    _V_SUM,
    _V_SUMSQ,
)


@_register(
    "embedding_zscore_outliers",
    f"""
    WITH ex AS ({_EMB_EXPAND}
    ), st AS (
      SELECT i, count(*) AS n, {_V_SUM} AS s, {_V_SUMSQ} AS ss
      FROM ex GROUP BY i
    ), ms AS (
      SELECT i, round(s / n, 6) AS m,
             round(ss / n - (s / n) * (s / n), 6) AS var
      FROM st
    ), terms AS (
      SELECT ex.vec_id,
             CAST(round(CASE WHEN ms.var > 0
                    THEN (ex.v - ms.m) * (ex.v - ms.m) / ms.var
                    ELSE 0.0 END, 12) AS DECIMAL(28,12)) AS t
      FROM ex JOIN ms USING (i)
    )
    SELECT vec_id, round(CAST(sum(t) AS DOUBLE), 6) AS score,
           round(CAST(sum(t) AS DOUBLE), 6) > 110.0 AS outlier
    FROM terms GROUP BY vec_id
    """,
)
def q_embedding_zscore_outliers(spark, sf_dir):
    """Diagonal-Mahalanobis embedding outlier score per vector
    (Σ z_i² against the corpus per-dimension moments) — the
    embedding-batch quality gate; composes embedding_dim_stats'
    rounded moments so both engines standardize identically."""
    return similarity.embedding_zscore_outliers(
        _t(spark, sf_dir, "embeddings")
    )


@_register(
    "events_burstiness",
    """
    WITH c AS (
      SELECT user_id AS key, date_trunc('hour', ts) AS b, count(*) AS x
      FROM events GROUP BY 1, 2
    ), a AS (
      SELECT key, count(*) AS n, sum(x) AS s, sum(x * x) AS ss
      FROM c GROUP BY key
    )
    SELECT key AS user_id,
           CAST(n AS BIGINT) AS n_buckets,
           round(s / n, 6) AS mean_rate,
           round((ss / n - (s / n) * (s / n)) / (s / n), 6) AS fano,
           round((ss / n - (s / n) * (s / n)) / (s / n), 6) > 2.0
             AS bursty
    FROM a
    """,
)
def q_events_burstiness(spark, sf_dir):
    """Per-user Fano factor (variance/mean of hourly rates): Poisson
    arrivals sit near 1, schedulers collapse toward 0, bursty scraping
    exceeds the threshold — the dispersion bot signal next to
    events_type_entropy's variety signal; exact integer sums under
    fixed-order double arithmetic."""
    return aggregates.burstiness(_t(spark, sf_dir, "events"))


@_register(
    "events_conversion_latency",
    """
    WITH ff AS (
      SELECT user_id AS key, min(ts) AS f FROM events
      WHERE event_type = 'view' GROUP BY 1
    ), conv AS (
      SELECT ff.key, min(e.ts) AS c, min(ff.f) AS f0
      FROM ff JOIN events e
        ON e.user_id = ff.key AND e.event_type = 'purchase'
       AND e.ts >= ff.f
      GROUP BY ff.key
    ), lat AS (
      SELECT key, (epoch_us(c) - epoch_us(f0)) / 1000000.0 AS lat
      FROM conv
    ), agg AS (
      SELECT count(*) AS n_converted,
             round(quantile_cont(lat, 0.5), 6) AS median_latency_sec,
             round(quantile_cont(lat, 0.9), 6) AS p90_latency_sec
      FROM lat
    ), nu AS (SELECT count(*) AS n_users FROM ff)
    SELECT CAST(nu.n_users AS BIGINT) AS n_users,
           CAST(agg.n_converted AS BIGINT) AS n_converted,
           round(agg.n_converted / nu.n_users, 6) AS conv_rate,
           agg.median_latency_sec, agg.p90_latency_sec
    FROM agg, nu
    """,
)
def q_events_conversion_latency(spark, sf_dir):
    """Funnel latency: first 'view' → first at-or-after 'purchase' per
    user, exact microsecond differences, exact percentiles — how long
    conversion takes, next to events_funnel's who-converts count."""
    return aggregates.conversion_latency(_t(spark, sf_dir, "events"))
