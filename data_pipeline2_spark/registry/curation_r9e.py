"""Round-9 registry keys, part 5 (session 3): governance, behavioral
analytics, corpus diagnostics, and the streaming/LM completions —

- `t_closeness`: the third privacy audit (Li et al. 2007), closing the
  k-anonymity → ℓ-diversity → t-closeness ladder: per-class ordered
  EMD with exact BIGINT cumulative differences, ONE closing division.
- `events_lag_autocorr`: per-user lag-1 Pearson autocorrelation of
  hourly counts — the serial-correlation bot signature next to
  events_burstiness's Fano dispersion; exact integer numerator
  exported.
- `curriculum_order`: Bengio 2009 easy-first staging (distinct-score
  cumulative buckets + hash-sharded salted order — no corpus sort).
- `stream_tumbling_upsert`: streaming window agg value-oracled END TO
  END (availableNow micro-batches → update-mode rows → foreachBatch
  MERGE → readback vs one batch GROUP BY).
- `kneser_ney_logprob`: interpolated KN bigram LM on the train/held
  split (continuation probabilities, D = 0.75) — full value replay.
- `zipf_fit` / `heaps_fit`: corpus-health regressions (rank-frequency
  slope; vocabulary-growth exponent) in the exact-BIGINT OLS
  discipline; heaps checkpoints are VALUE-based, never rank-based.
- `texttiling_boundaries`: Hearst 1997 topic segmentation with an
  integer-exact boundary rule.
- `phonetic_vocab_groups`: Russell 1918 Soundex blocking census
  (RE2-safe oracle collapse via log-halving replaces).
- `corpus_datasheet`: the Gebru et al. 2018 one-row release artifact.

Reference anchors: SURVEY §2.9/§2.10; every key extends an engine
family earlier rounds established, each with a full DuckDB value
oracle.
"""

from __future__ import annotations

from data_pipeline2_spark.operators import aggregates, governance, textanalysis
from data_pipeline2_spark.registry._core import _register, _run_dir, _t

_TCLOSE_SQL = """
    WITH base AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(floor(c_acctbal / 2000) AS BIGINT) AS v
      FROM customer WHERE c_acctbal IS NOT NULL
    ), gv AS (SELECT v, count(*) AS g FROM base GROUP BY v),
    cv AS (
      SELECT c_nationkey, c_mktsegment, v, count(*) AS c
      FROM base GROUP BY 1, 2, 3
    ), cls AS (
      SELECT c_nationkey, c_mktsegment, sum(c)::BIGINT AS n
      FROM cv GROUP BY 1, 2
    ), tot AS (
      SELECT sum(g)::BIGINT AS n_total, count(*)::BIGINT AS m FROM gv
    ), grid AS (
      SELECT cls.c_nationkey, cls.c_mktsegment, cls.n, gv.v, gv.g,
             coalesce(cv.c, 0) AS c
      FROM cls CROSS JOIN gv
      LEFT JOIN cv ON cv.c_nationkey = cls.c_nationkey
                  AND cv.c_mktsegment = cls.c_mktsegment
                  AND cv.v = gv.v
    ), walk AS (
      SELECT c_nationkey, c_mktsegment, n,
             sum(c) OVER wd AS p, sum(g) OVER wd AS q,
             row_number() OVER wd AS i, n_total, m
      FROM grid CROSS JOIN tot
      WINDOW wd AS (PARTITION BY c_nationkey, c_mktsegment ORDER BY v)
    ), f AS (
      SELECT c_nationkey, c_mktsegment, n, n_total, m,
             sum(CASE WHEN i < m THEN abs(p * n_total - q * n)
                      ELSE 0 END)::BIGINT AS emd_num
      FROM walk GROUP BY 1, 2, 3, 4, 5
    ), g AS (
      SELECT c_nationkey, c_mktsegment, n, emd_num,
             CASE WHEN m > 1
                  THEN round(emd_num::DOUBLE
                       / ((m - 1)::DOUBLE * n::DOUBLE * n_total::DOUBLE),
                       6)
                  ELSE 0.0 END AS emd
      FROM f
    )
    SELECT c_nationkey, c_mktsegment, n, emd_num, emd,
           emd <= 0.2 AS t_close
    FROM g
    """


@_register("t_closeness", _TCLOSE_SQL)
def q_t_closeness(spark, sf_dir):
    """t-closeness over the (nation, market-segment) quasi tuple with
    the bucketed account balance as the ordered sensitive attribute —
    the same fixture as the k_anonymity/l_diversity keys, so the three
    audits form one comparable ladder."""
    from pyspark.sql import functions as F

    cust = _t(spark, sf_dir, "customer").withColumn(
        "__sens",
        F.floor(F.col("c_acctbal") / F.lit(2000.0)).cast("long"),
    )
    return governance.t_closeness_audit(
        cust, ["c_nationkey", "c_mktsegment"], "__sens", t=0.2
    )


_AUTOCORR_SQL = """
    WITH c AS (
      SELECT user_id AS k,
             CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h,
             count(*)::BIGINT AS x
      FROM events GROUP BY 1, 2
    ), p AS (
      SELECT k, h, x, lead(h) OVER wd AS h2, lead(x) OVER wd AS y
      FROM c WINDOW wd AS (PARTITION BY k ORDER BY h)
    ), q AS (SELECT k, x, y FROM p WHERE h2 = h + 1),
    a AS (
      -- inner sums kept exact (no ::BIGINT narrowing), factors
      -- decimal-cast before the product — mirrors the Spark side's
      -- DECIMAL(38,0) accumulation (ADVICE r10: wrap-vs-raise class)
      SELECT k, count(*)::BIGINT AS n_pairs,
             sum(x::DECIMAL(38,0)) AS sx, sum(y::DECIMAL(38,0)) AS sy,
             sum(x::DECIMAL(38,0) * y::DECIMAL(38,0)) AS sxy,
             sum(x::DECIMAL(38,0) * x::DECIMAL(38,0)) AS sxx,
             sum(y::DECIMAL(38,0) * y::DECIMAL(38,0)) AS syy
      FROM q GROUP BY k
    )
    SELECT k AS user_id, n_pairs,
           CASE WHEN abs(n_pairs::DECIMAL(38,0) * sxy::DECIMAL(38,0)
                        - sx::DECIMAL(38,0) * sy::DECIMAL(38,0))
                     <= 9223372036854775807
                THEN (n_pairs::DECIMAL(38,0) * sxy::DECIMAL(38,0)
                      - sx::DECIMAL(38,0) * sy::DECIMAL(38,0))::BIGINT
           END AS num_scaled,
           CASE WHEN n_pairs >= 3
                     AND (n_pairs::DECIMAL(38,0) * sxx::DECIMAL(38,0)
                          - sx::DECIMAL(38,0) * sx::DECIMAL(38,0)) > 0
                     AND (n_pairs::DECIMAL(38,0) * syy::DECIMAL(38,0)
                          - sy::DECIMAL(38,0) * sy::DECIMAL(38,0)) > 0
                THEN round((n_pairs::DECIMAL(38,0) * sxy::DECIMAL(38,0)
                        - sx::DECIMAL(38,0) * sy::DECIMAL(38,0))::DOUBLE
                     / sqrt((n_pairs::DECIMAL(38,0) * sxx::DECIMAL(38,0)
                        - sx::DECIMAL(38,0) * sx::DECIMAL(38,0))::DOUBLE
                          * (n_pairs::DECIMAL(38,0) * syy::DECIMAL(38,0)
                        - sy::DECIMAL(38,0) * sy::DECIMAL(38,0))::DOUBLE),
                     6)
           END AS autocorr
    FROM a
    """


@_register("events_lag_autocorr", _AUTOCORR_SQL)
def q_events_lag_autocorr(spark, sf_dir):
    return aggregates.lag_autocorr(_t(spark, sf_dir, "events"))


_CURR_SQL = """
    WITH t AS (
      SELECT doc_id,
             CASE WHEN len(trim(text, ' ')) = 0 THEN []
                  ELSE regexp_split_to_array(trim(text, ' '), '\\s+')
             END AS ws
      FROM documents WHERE text IS NOT NULL
    ), sc AS (
      SELECT doc_id,
             CAST(floor((1000 * nc)::DOUBLE / nw::DOUBLE) AS BIGINT)
               AS difficulty_scaled
      FROM (SELECT doc_id, len(ws) AS nw,
                   coalesce(list_aggregate(
                     list_transform(ws, x -> len(x)), 'sum'), 0) AS nc
            FROM t)
      WHERE nw > 0
    ), cnt AS (
      SELECT difficulty_scaled, count(*) AS c FROM sc GROUP BY 1
    ), cum AS (
      SELECT difficulty_scaled,
             sum(c) OVER (ORDER BY difficulty_scaled
                          ROWS UNBOUNDED PRECEDING) AS cum,
             (SELECT sum(c) FROM cnt) AS total
      FROM cnt
    ), st AS (
      SELECT difficulty_scaled,
             CASE WHEN 3 * cum <= total THEN 1
                  WHEN 3 * cum <= 2 * total THEN 2
                  ELSE 3 END AS stage
      FROM cum
    ), f AS (
      SELECT sc.doc_id, sc.difficulty_scaled, st.stage,
             CAST(CAST('0x' || substring(
                    md5('currshard' || '|' || sc.doc_id::VARCHAR),
                    1, 15) AS BIGINT) % 8 AS INT) AS shard
      FROM sc JOIN st USING (difficulty_scaled)
    )
    SELECT doc_id, difficulty_scaled, CAST(stage AS INT) AS stage, shard,
           CAST(row_number() OVER (
                  PARTITION BY stage, shard
                  ORDER BY md5('curr' || '|' || doc_id::VARCHAR), doc_id)
                AS INT) AS seq
    FROM f
    """


@_register("curriculum_order", _CURR_SQL)
def q_curriculum_order(spark, sf_dir):
    from data_pipeline2_spark.operators import sampling

    return sampling.curriculum_order(_t(spark, sf_dir, "documents"))


_STREAM_TUMBLING_SQL = """
    SELECT date_trunc('hour', ts) AS wstart, event_type,
           count(*)::BIGINT AS n_events
    FROM events GROUP BY 1, 2
    """


@_register("stream_tumbling_upsert", _STREAM_TUMBLING_SQL)
def q_stream_tumbling_upsert(spark, sf_dir):
    """Streaming windowed aggregation, END TO END through the real
    runtime: events replay as a 3-file feed, readStream + availableNow
    (maxFilesPerTrigger=1 → three real micro-batches) runs the tumbling
    hour/event_type count in UPDATE mode, and each micro-batch's
    touched-window rows MERGE into a parquet table via upsert_sink —
    the continuously maintained materialized aggregate
    (cdc_upsert_stream's pattern applied to the window-agg path, so the
    stream/batch tumbling parity that was pytest-only becomes a driver
    value oracle). Update-mode rows carry the key's new CUMULATIVE
    count, so sequential merges leave exactly the batch answer
    regardless of file order; the final table reads back as
    (wstart, event_type, n_events) and the oracle recomputes it in one
    GROUP BY."""
    import os

    from data_pipeline2_spark.streaming import events as sev

    ev = _t(spark, sf_dir, "events").select("event_id", "ts", "event_type")
    tmp = _run_dir("stumb")
    feed = os.path.join(tmp, "feed")
    table = os.path.join(tmp, "table")
    ckpt = os.path.join(tmp, "ckpt")
    from pyspark.sql import functions as F

    # pmod, not %: negative event ids must land in SOME feed file
    for p in range(3):
        ev.filter(F.pmod(F.col("event_id"), F.lit(3)) == p).coalesce(
            1
        ).write.mode("append").parquet(feed)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    agg = (
        stream.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("wstart"), "event_type", "n_events"
        )
        # merge_upsert's key equality is null-UNSAFE (a NULL key would
        # insert next to its stale row instead of replacing it), so the
        # MERGE keys are sentinel-coalesced copies and the nullable
        # originals ride along as payload
        .select(
            "wstart",
            "event_type",
            "n_events",
            F.coalesce(
                F.col("wstart").cast("string"), F.lit("\x00ts")
            ).alias("__wk"),
            F.coalesce(F.col("event_type"), F.lit("\x00et")).alias(
                "__ek"
            ),
            F.lit("U").alias("op"),
            # constant ts: each update-mode batch carries one row per
            # key, so cross-batch ordering is the sequential merge
            F.lit(0).cast("long").alias("change_ts"),
        )
    )
    q = sev.upsert_sink(
        agg, table, ckpt, ["__wk", "__ek"], output_mode="update"
    )
    q.awaitTermination()
    return spark.read.parquet(table).select(
        "wstart", "event_type", "n_events"
    )


def _kn_sql() -> str:
    from data_pipeline2_spark.registry.curation_r5 import _WS_LOWER

    scale = "10000000000.0"
    pc = "(coalesce(nbw.nb, 0) + 1)::DOUBLE / (tv.t + tv.v + 1)::DOUBLE"
    return f"""
    WITH t AS (
      SELECT doc_id, {_WS_LOWER} AS ws
      FROM documents WHERE text IS NOT NULL
    ), tr AS (
      SELECT ws FROM t WHERE ((doc_id % 2) + 2) % 2 = 0
    ), bi AS MATERIALIZED (
      SELECT w1, w2, count(*) AS c12
      FROM (SELECT ws[i] AS w1, ws[i+1] AS w2
            FROM (SELECT ws, unnest(generate_series(1, len(ws) - 1)) AS i
                  FROM tr WHERE len(ws) >= 2))
      GROUP BY 1, 2
    ), ctx AS (
      SELECT w1, sum(c12) AS c1, count(*) AS nfw FROM bi GROUP BY w1
    ), nbw AS (
      SELECT w2, count(*) AS nb FROM bi GROUP BY w2
    ), tv AS (
      SELECT (SELECT count(*) FROM bi) AS t,
             (SELECT count(DISTINCT w)
              FROM (SELECT unnest(ws) AS w FROM tr)) AS v
    ), held AS (
      SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2
      FROM (SELECT doc_id, ws,
                   unnest(generate_series(1, len(ws) - 1)) AS i
            FROM t WHERE ((doc_id % 2) + 2) % 2 = 1 AND len(ws) >= 2)
    ), terms AS (
      SELECT h.doc_id,
        CASE WHEN bi.c12 IS NOT NULL THEN 2
             WHEN ctx.c1 IS NOT NULL THEN 1 ELSE 0 END AS lvl,
        CAST(floor(ln(
          CASE WHEN ctx.c1 IS NOT NULL
               THEN (greatest(coalesce(bi.c12, 0)::DOUBLE - 0.75, 0.0)
                     + 0.75 * ctx.nfw::DOUBLE * {pc})
                    / ctx.c1::DOUBLE
               ELSE {pc}
          END) * {scale}) AS BIGINT) AS term
      FROM held h
      LEFT JOIN bi ON bi.w1 = h.w1 AND bi.w2 = h.w2
      LEFT JOIN ctx ON ctx.w1 = h.w1
      LEFT JOIN nbw ON nbw.w2 = h.w2
      CROSS JOIN tv
    )
    SELECT doc_id, count(*)::BIGINT AS n_bigrams,
           sum((lvl = 2)::INT)::BIGINT AS hits_bigram,
           sum((lvl = 1)::INT)::BIGINT AS hits_context,
           sum((lvl = 0)::INT)::BIGINT AS misses,
           sum(term)::BIGINT AS logprob_sum_scaled,
           round(sum(term) / {scale} / count(*), 6) AS avg_logprob
    FROM terms GROUP BY doc_id
    """


@_register("kneser_ney_logprob", _kn_sql())
def q_kneser_ney_logprob(spark, sf_dir):
    from data_pipeline2_spark.operators import quality

    return quality.kneser_ney_logprob(_t(spark, sf_dir, "documents"))


def _zipf_sql(top_ranks: int = 500) -> str:
    from data_pipeline2_spark.registry.curation_r5 import _WS_LOWER

    dec = "DECIMAL(38,0)"
    num = f"(n::{dec} * sxy::{dec} - sx::{dec} * sy::{dec})"
    denx = f"(n::{dec} * sxx::{dec} - sx::{dec} * sx::{dec})"
    deny = f"(n::{dec} * syy::{dec} - sy::{dec} * sy::{dec})"
    slope_d = f"({num}::DOUBLE / {denx}::DOUBLE)"
    return f"""
    WITH t AS (
      SELECT source, {_WS_LOWER} AS ws
      FROM documents WHERE text IS NOT NULL
    ), counts AS (
      SELECT source, w, count(*) AS c
      FROM (SELECT source, unnest(ws) AS w FROM t) GROUP BY 1, 2
    ), ranked AS (
      SELECT source,
             CAST(floor(ln(rank::DOUBLE) * 1000000.0) AS BIGINT) AS x,
             CAST(floor(ln(c::DOUBLE) * 1000000.0) AS BIGINT) AS y
      FROM (SELECT source, c,
                   row_number() OVER (
                     PARTITION BY source ORDER BY c DESC, w) AS rank
            FROM counts)
      WHERE rank <= {top_ranks}
    ), a AS (
      SELECT source, count(*)::BIGINT AS n,
             sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
             sum(x * y)::BIGINT AS sxy, sum(x * x)::BIGINT AS sxx,
             sum(y * y)::BIGINT AS syy
      FROM ranked GROUP BY source
    )
    SELECT source, n AS n_ranks,
           CASE WHEN n >= 2 AND {denx} <> 0
                THEN round({slope_d}, 6) END AS slope,
           CASE WHEN n >= 2 AND {denx} <> 0
                THEN round((sy::DOUBLE - {slope_d} * sx::DOUBLE)
                           / n::DOUBLE / 1000000.0, 6) END AS intercept,
           CASE WHEN n >= 2 AND {denx} <> 0 AND {deny} <> 0
                THEN round(({num}::DOUBLE * {num}::DOUBLE)
                           / ({denx}::DOUBLE * {deny}::DOUBLE), 6)
           END AS r2
    FROM a
    """


@_register("zipf_fit", _zipf_sql())
def q_zipf_fit(spark, sf_dir):
    return textanalysis.zipf_fit(_t(spark, sf_dir, "documents"))


def _texttiling_sql(k: int = 10, b: int = 2, pw: int = 3) -> str:
    from data_pipeline2_spark.registry.curation_r5 import (
        _WS_LOWER,
        _md5_60,
    )

    return f"""
    WITH t AS (
      SELECT doc_id, {_WS_LOWER} AS ws
      FROM documents WHERE text IS NOT NULL
    ), tok AS (
      SELECT doc_id, unnest(ws) AS w,
             unnest(generate_series(0, len(ws) - 1)) AS p,
             len(ws) AS nt
      FROM t
    ), st AS (
      SELECT doc_id, (nt // {k})::INT AS n_sents, (p // {k})::INT AS s,
             {_md5_60("w")} AS tt, count(*) AS c
      FROM tok WHERE (p // {k}) < (nt // {k})
      GROUP BY 1, 2, 3, 4
    ), sides AS (
      SELECT doc_id, n_sents, tt, c, s + i AS g, 'L' AS side
      FROM st, (SELECT unnest(generate_series(1, {b})) AS i)
      UNION ALL
      SELECT doc_id, n_sents, tt, c, s - i + 1 AS g, 'R' AS side
      FROM st, (SELECT unnest(generate_series(1, {b})) AS i)
    ), j AS (
      SELECT doc_id, g, tt,
             coalesce(sum(CASE WHEN side = 'L' THEN c END), 0) AS cl,
             coalesce(sum(CASE WHEN side = 'R' THEN c END), 0) AS cr
      FROM sides WHERE g >= {b} AND g <= n_sents - {b}
      GROUP BY 1, 2, 3
    ), sims AS (
      SELECT doc_id, g, sum(cl * cr)::BIGINT AS dot,
             sum(cl * cl)::BIGINT AS nl, sum(cr * cr)::BIGINT AS nr
      FROM j GROUP BY 1, 2
    ), sc AS (
      SELECT doc_id, g,
             CASE WHEN nl > 0 AND nr > 0
                  THEN CAST(floor(dot::DOUBLE
                         / sqrt(nl::DOUBLE * nr::DOUBLE)
                         * 1000000.0) AS BIGINT)
                  ELSE 0 END AS sim
      FROM sims
    ), dep AS (
      SELECT doc_id, g, sim,
        (greatest(coalesce(max(sim) OVER (
             PARTITION BY doc_id ORDER BY g
             ROWS BETWEEN {pw} PRECEDING AND 1 PRECEDING), sim)
           - sim, 0)
         + greatest(coalesce(max(sim) OVER (
             PARTITION BY doc_id ORDER BY g
             ROWS BETWEEN 1 FOLLOWING AND {pw} FOLLOWING), sim)
           - sim, 0))::BIGINT AS depth
      FROM sc
    ), bd AS (
      SELECT doc_id, g, depth,
             depth * count(*) OVER (PARTITION BY doc_id)
               > sum(depth) OVER (PARTITION BY doc_id) AS is_boundary
      FROM dep
    )
    SELECT doc_id, count(*)::BIGINT AS n_gaps,
           sum(is_boundary::INT)::BIGINT AS n_boundaries,
           sum(CASE WHEN is_boundary THEN g ELSE 0 END)::BIGINT
             AS boundary_gap_sum,
           sum(CASE WHEN is_boundary THEN g * g ELSE 0 END)::BIGINT
             AS boundary_gap_sq_sum,
           max(depth)::BIGINT AS max_depth_scaled
    FROM bd GROUP BY doc_id
    """


@_register("texttiling_boundaries", _texttiling_sql())
def q_texttiling_boundaries(spark, sf_dir):
    return textanalysis.texttiling_boundaries(_t(spark, sf_dir, "documents"))


def _heaps_sql(C: int = 10) -> str:
    from data_pipeline2_spark.registry.curation_r5 import _WS_LOWER

    dec = "DECIMAL(38,0)"
    num = f"(n::{dec} * sxy::{dec} - sx::{dec} * sy::{dec})"
    denx = f"(n::{dec} * sxx::{dec} - sx::{dec} * sx::{dec})"
    deny = f"(n::{dec} * syy::{dec} - sy::{dec} * sy::{dec})"
    slope_d = f"({num}::DOUBLE / {denx}::DOUBLE)"
    return f"""
    WITH t AS (
      SELECT doc_id, {_WS_LOWER} AS ws
      FROM documents WHERE text IS NOT NULL
    ), tok AS (SELECT doc_id, unnest(ws) AS w FROM t),
    b AS (SELECT min(doc_id) AS lo, max(doc_id) AS hi FROM tok),
    fd AS (SELECT w, min(doc_id) AS fdoc FROM tok GROUP BY w),
    dt AS (SELECT doc_id, count(*) AS ntok FROM tok GROUP BY doc_id),
    thr AS (
      SELECT i, lo + CAST(ceil(i * (hi - lo) / {C}.0) AS BIGINT) AS th
      FROM (SELECT unnest(generate_series(1, {C})) AS i) CROSS JOIN b
    ), pts AS (
      SELECT (SELECT coalesce(sum(ntok), 0)::BIGINT FROM dt
              WHERE dt.doc_id <= thr.th) AS nn,
             (SELECT count(*)::BIGINT FROM fd
              WHERE fd.fdoc <= thr.th) AS vv
      FROM thr
    ), ip AS (
      SELECT nn, vv,
             CAST(floor(ln(nn::DOUBLE) * 1000000.0) AS BIGINT) AS x,
             CAST(floor(ln(vv::DOUBLE) * 1000000.0) AS BIGINT) AS y
      FROM pts WHERE nn > 0 AND vv > 0
    ), a AS (
      SELECT count(*)::BIGINT AS n,
             max(nn)::BIGINT AS n_tokens_total,
             max(vv)::BIGINT AS vocab_total,
             sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
             sum(x * y)::BIGINT AS sxy, sum(x * x)::BIGINT AS sxx,
             sum(y * y)::BIGINT AS syy
      FROM ip
    )
    SELECT n AS n_checkpoints, n_tokens_total, vocab_total,
           CASE WHEN n >= 2 AND {denx} <> 0
                THEN round({slope_d}, 6) END AS beta,
           CASE WHEN n >= 2 AND {denx} <> 0
                THEN round((sy::DOUBLE - {slope_d} * sx::DOUBLE)
                           / n::DOUBLE / 1000000.0, 6) END AS ln_k,
           CASE WHEN n >= 2 AND {denx} <> 0 AND {deny} <> 0
                THEN round(({num}::DOUBLE * {num}::DOUBLE)
                           / ({denx}::DOUBLE * {deny}::DOUBLE), 6)
           END AS r2
    FROM a
    """


@_register("heaps_fit", _heaps_sql())
def q_heaps_fit(spark, sf_dir):
    return textanalysis.heaps_fit(_t(spark, sf_dir, "documents"))


def _soundex_sql_expr(col: str) -> str:
    """The soundex() Catalyst chain replayed for RE2: the adjacent-code
    collapse uses log-halving replace passes (5 passes cover runs up to
    32 > the 30-char eligibility cap) because RE2 has no backrefs."""
    from data_pipeline2_spark.operators.textanalysis import _SOUNDEX_MAP

    expr = (
        f"replace(translate({col}, 'abcdefghijklmnopqrstuvwxyz', "
        f"'{_SOUNDEX_MAP}'), '9', '')"
    )
    for _ in range(5):
        for d in "123456":
            expr = f"replace({expr}, '{d}{d}', '{d}')"
    return (
        f"upper(substring({col}, 1, 1)) || rpad(substring(replace("
        f"CASE WHEN substring({col}, 1, 1) IN ('h', 'w') THEN {expr} "
        f"ELSE substring({expr}, 2) END, '0', ''), 1, 3), 3, '0')"
    )


def _phonetic_sql() -> str:
    from data_pipeline2_spark.registry.curation_r5 import _WS_LOWER

    return f"""
    WITH t AS (
      SELECT {_WS_LOWER} AS ws
      FROM documents WHERE text IS NOT NULL
    ), vocab AS (
      SELECT w, count(*) AS c
      FROM (SELECT unnest(ws) AS w FROM t)
      WHERE regexp_matches(w, '^[a-z]{{1,30}}$')
      GROUP BY w
    ), coded AS (
      SELECT w, c, {_soundex_sql_expr("w")} AS soundex FROM vocab
    ), ranked AS (
      SELECT soundex, w, c,
             row_number() OVER (
               PARTITION BY soundex ORDER BY c DESC, w) AS rn
      FROM coded
    )
    SELECT soundex, count(*)::BIGINT AS n_variants,
           sum(c)::BIGINT AS total_occurrences,
           string_agg(w, '|' ORDER BY rn) FILTER (WHERE rn <= 5)
             AS variants_sample,
           count(*) >= 2 AS variant_candidate
    FROM ranked GROUP BY soundex
    """


@_register("phonetic_vocab_groups", _phonetic_sql())
def q_phonetic_vocab_groups(spark, sf_dir):
    return textanalysis.phonetic_vocab_groups(
        _t(spark, sf_dir, "documents")
    )


def _datasheet_sql() -> str:
    from data_pipeline2_spark.registry.curation_r5 import _WS_LOWER, _WS_RAW

    scale = "10000000000.0"
    sha = (
        "sha256(lower(regexp_replace(trim(text, ' '), '\\s+', ' ', 'g')))"
    )
    return f"""
    WITH d AS (
      SELECT doc_id, text,
             CASE WHEN text IS NULL THEN NULL
                  ELSE len({_WS_RAW}) END AS ntok
      FROM documents
    ), ds AS (
      SELECT count(*)::BIGINT AS n_docs,
             coalesce(sum((text IS NULL)::INT), 0)::BIGINT AS n_null_text,
             coalesce(sum((text IS NOT NULL AND ntok = 0)::INT), 0)::BIGINT
               AS n_blank,
             coalesce(sum(ntok), 0)::BIGINT AS n_tokens,
             round(avg(ntok), 6) AS mean_tokens,
             round(quantile_cont(ntok, 0.5), 6) AS p50_tokens,
             round(quantile_cont(ntok, 0.9), 6) AS p90_tokens
      FROM d
    ), v AS (
      SELECT count(*)::BIGINT AS vocab_size,
             round(coalesce(sum((c = 1)::INT), 0)
                   / greatest(count(*), 1), 6) AS hapax_frac
      FROM (SELECT w, count(*) AS c
            FROM (SELECT unnest(ws) AS w
                  FROM (SELECT {_WS_LOWER} AS ws FROM documents
                        WHERE text IS NOT NULL))
            GROUP BY w)
    ), dp AS (
      SELECT round(coalesce(sum(CASE WHEN n > 1 THEN n END), 0)
                   / greatest(coalesce(sum(n), 0), 1), 6) AS dup_doc_frac
      FROM (SELECT {sha} AS sha, count(*) AS n
            FROM documents WHERE text IS NOT NULL GROUP BY 1)
    ), lc AS (
      SELECT lang, count(*) AS c FROM documents GROUP BY lang
    ), lt AS (SELECT sum(c) AS tot FROM lc),
    le AS (
      SELECT count(*)::BIGINT AS n_langs,
             round(-sum(CAST(floor(ln(c::DOUBLE / tot::DOUBLE)
                                   * {scale}) AS BIGINT) * c)
                   / {scale} / min(tot), 6) AS lang_entropy
      FROM lc CROSS JOIN lt
    )
    SELECT ds.*, v.*, dp.*, le.*
    FROM ds CROSS JOIN v CROSS JOIN dp CROSS JOIN le
    """


@_register("corpus_datasheet", _datasheet_sql())
def q_corpus_datasheet(spark, sf_dir):
    from data_pipeline2_spark.operators import curation

    return curation.corpus_datasheet(_t(spark, sf_dir, "documents"))
