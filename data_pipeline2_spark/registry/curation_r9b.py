"""Round-9 registry keys, part 2: the curation-recipe completions a
100 TB pretraining run still reads off the published pipelines —

- `block_dedup_keep_first`: Dolma-style paragraph dedup re-expressed
  at fixed-width token-block granularity with POSITIONAL keep-first
  semantics (which occurrence survives is part of the contract,
  pinned by a position-weighted checksum) — the cheap exact arm
  between `dedup_exact` (whole-doc) and `exact_substring_spans`
  (50-token overlapping spans).
- `stupid_backoff_logprob`: Brants et al. 2007 Stupid Backoff trigram
  scoring with a genuine train/held-out split (fit on even pmod
  residues, score odd), the published distributed-LM scheme whose
  counts-table layout IS the Spark plan; ~60% of held-out trigrams
  back off at sf0.01, so all three branches are exercised and
  value-checked.
- `perplexity_buckets`: CCNet (Wenzek et al. 2020) head/middle/tail
  corpus split by LM score, bucketed per integer score VALUE through
  a distinct-score cumulative window — exact integer thirds without a
  corpus-wide row sort.
- `blocklist_filter`: the C4 §2.2 wordlist gate as a pure map-only
  Catalyst filter (zero exchanges; the big-lexicon form is a
  broadcast semi-join, same no-corpus-shuffle shape).

Every fit/count table derives deterministically from the lake, so the
DuckDB oracles replay full values (counts, integerized log terms,
checksums) — no rows-only concessions. Reference anchors: SURVEY §2.10
(dedup / text-analysis for training data) and BASELINE.json's
LLM-data-pipeline mandate; the reference itself has no LM-filter
surface (its dedup is whole-doc SHA in ingestion_service.py), so these
extend the north star exactly as rounds 5–9 did.
"""

from __future__ import annotations

from data_pipeline2_spark.operators import quality
from data_pipeline2_spark.operators.quality import _SB_LOG_ALPHA
from data_pipeline2_spark.registry._core import _register, _t
from data_pipeline2_spark.registry.curation_r5 import (
    _WS_LOWER,
    _md5_60,
)

_SCALE = "10000000000.0"  # quality._LOGPROB_SCALE as a double literal


_BLOCK_SQL = f"""
    WITH t AS (
      SELECT doc_id, {_WS_LOWER} AS ws
      FROM documents WHERE text IS NOT NULL
    ), blocks AS (
      SELECT doc_id, (i - 1) // 10 AS block_idx,
             {_md5_60("array_to_string(ws[i:i+9], ' ')")} AS blk_h
      FROM (SELECT doc_id, ws,
                   unnest(generate_series(1, len(ws) - 9, 10)) AS i
            FROM t WHERE len(ws) >= 10)
    ), pos AS (
      SELECT *, doc_id * 1000000 + block_idx AS p FROM blocks
    ), first AS (
      SELECT blk_h, min(p) AS keep_p FROM pos GROUP BY blk_h
    ), flagged AS (
      SELECT pos.*, (p = keep_p) AS kept
      FROM pos JOIN first USING (blk_h)
    )
    SELECT doc_id, count(*)::BIGINT AS n_blocks,
           sum(kept::INT)::BIGINT AS kept_blocks,
           (count(*) - sum(kept::INT))::BIGINT AS dropped_blocks,
           ((count(*) - sum(kept::INT)) * 10)::BIGINT AS tokens_removed,
           sum(CASE WHEN kept
                    THEN (blk_h % 4294967296) * (block_idx + 1)
                    ELSE 0 END)::BIGINT AS kept_checksum
    FROM flagged GROUP BY doc_id
    """


@_register("block_dedup_keep_first", _BLOCK_SQL)
def q_block_dedup_keep_first(spark, sf_dir):
    return quality.block_dedup_keep_first(_t(spark, sf_dir, "documents"))


_SB_SQL = f"""
    WITH t AS (
      SELECT doc_id, {_WS_LOWER} AS ws
      FROM documents WHERE text IS NOT NULL
    ), tr AS (
      SELECT ws FROM t WHERE ((doc_id % 2) + 2) % 2 = 0
    ), uni AS (
      SELECT w, count(*) AS c
      FROM (SELECT unnest(ws) AS w FROM tr) GROUP BY w
    ), nv AS (SELECT sum(c) AS n, count(*) AS v FROM uni),
    bi AS (
      SELECT w1, w2, count(*) AS c
      FROM (SELECT ws[i] AS w1, ws[i+1] AS w2
            FROM (SELECT ws, unnest(generate_series(1, len(ws)-1)) AS i
                  FROM tr WHERE len(ws) >= 2))
      GROUP BY w1, w2
    ), tri AS (
      SELECT w1, w2, w3, count(*) AS c
      FROM (SELECT ws[i] AS w1, ws[i+1] AS w2, ws[i+2] AS w3
            FROM (SELECT ws, unnest(generate_series(1, len(ws)-2)) AS i
                  FROM tr WHERE len(ws) >= 3))
      GROUP BY w1, w2, w3
    ), held AS (
      SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2, ws[i+2] AS w3
      FROM (SELECT doc_id, ws,
                   unnest(generate_series(1, len(ws)-2)) AS i
            FROM t WHERE ((doc_id % 2) + 2) % 2 = 1 AND len(ws) >= 3)
    ), terms AS (
      SELECT h.doc_id,
        CASE WHEN tri.c IS NOT NULL THEN 3
             WHEN b23.c IS NOT NULL THEN 2 ELSE 1 END AS lvl,
        CAST(floor(
          CASE WHEN tri.c IS NOT NULL
               THEN ln(tri.c::DOUBLE / b12.c::DOUBLE)
               WHEN b23.c IS NOT NULL
               THEN {_SB_LOG_ALPHA!r} + ln(b23.c::DOUBLE / u2.c::DOUBLE)
               ELSE {_SB_LOG_ALPHA!r} + {_SB_LOG_ALPHA!r}
                    + ln((coalesce(u3.c, 0) + 1)::DOUBLE
                         / (nv.n + nv.v)::DOUBLE)
          END * {_SCALE}) AS BIGINT) AS term
      FROM held h
      LEFT JOIN tri ON tri.w1 = h.w1 AND tri.w2 = h.w2 AND tri.w3 = h.w3
      LEFT JOIN bi b23 ON b23.w1 = h.w2 AND b23.w2 = h.w3
      LEFT JOIN bi b12 ON b12.w1 = h.w1 AND b12.w2 = h.w2
      LEFT JOIN uni u2 ON u2.w = h.w2
      LEFT JOIN uni u3 ON u3.w = h.w3
      CROSS JOIN nv
    )
    SELECT doc_id, count(*)::BIGINT AS n_trigrams,
           sum((lvl = 3)::INT)::BIGINT AS hits3,
           sum((lvl = 2)::INT)::BIGINT AS hits2,
           sum((lvl = 1)::INT)::BIGINT AS hits1,
           sum(term)::BIGINT AS logprob_sum_scaled,
           round(sum(term) / {_SCALE} / count(*), 6) AS avg_logprob
    FROM terms GROUP BY doc_id
    """


@_register("stupid_backoff_logprob", _SB_SQL)
def q_stupid_backoff_logprob(spark, sf_dir):
    return quality.stupid_backoff_logprob(_t(spark, sf_dir, "documents"))


_PPL_SQL = f"""
    WITH toks AS (
      SELECT doc_id, unnest({_WS_LOWER}) AS w
      FROM documents WHERE text IS NOT NULL
    ), counts AS (SELECT w, count(*) AS c FROM toks GROUP BY w),
    tot AS (SELECT sum(c) AS total FROM counts),
    terms AS (
      SELECT doc_id,
             CAST(floor(ln(c::DOUBLE / total::DOUBLE) * {_SCALE})
                  AS BIGINT) AS term
      FROM toks JOIN counts USING (w) CROSS JOIN tot
    ), perdoc AS (
      SELECT doc_id, count(*)::BIGINT AS n_tokens,
             sum(term)::BIGINT AS s
      FROM terms GROUP BY doc_id
    ), scored AS (
      SELECT doc_id, n_tokens,
             CAST(floor((s::DOUBLE / n_tokens::DOUBLE) / 10000.0)
                  AS BIGINT) AS score_scaled
      FROM perdoc
    ), sc AS (
      SELECT score_scaled, count(*) AS c FROM scored GROUP BY 1
    ), cum AS (
      SELECT score_scaled,
             sum(c) OVER (ORDER BY score_scaled DESC
                          ROWS UNBOUNDED PRECEDING) AS cum,
             (SELECT sum(c) FROM sc) AS total
      FROM sc
    ), buckets AS (
      SELECT score_scaled,
             CASE WHEN 3 * cum <= total THEN 'head'
                  WHEN 3 * cum <= 2 * total THEN 'middle'
                  ELSE 'tail' END AS ppl_bucket
      FROM cum
    )
    SELECT doc_id, n_tokens, score_scaled, ppl_bucket
    FROM scored JOIN buckets USING (score_scaled)
    """


@_register("perplexity_buckets", _PPL_SQL)
def q_perplexity_buckets(spark, sf_dir):
    return quality.perplexity_buckets(_t(spark, sf_dir, "documents"))


_BLOCKLIST_SQL = f"""
    WITH t AS (
      SELECT doc_id, {_WS_LOWER} AS ws
      FROM documents WHERE text IS NOT NULL
    ), m AS (
      SELECT doc_id, len(ws)::BIGINT AS n_tokens,
             len(list_filter(ws,
                 w -> w IN ('slow', 'big', 'merge')))::BIGINT AS n_blocked
      FROM t
    )
    SELECT doc_id, n_tokens, n_blocked,
           round(n_blocked / greatest(n_tokens, 1), 6) AS blocked_frac,
           (round(n_blocked / greatest(n_tokens, 1), 6) > 0.1) AS blocked
    FROM m
    """


@_register("blocklist_filter", _BLOCKLIST_SQL)
def q_blocklist_filter(spark, sf_dir):
    return quality.blocklist_stats(_t(spark, sf_dir, "documents"))


# UniMax needs the raw (not lowercased) whitespace token COUNT — the
# same fragment mix_token_allocation's oracle uses
_WS_COUNT = (
    "CASE WHEN len(trim(text, ' ')) = 0 THEN 0 "
    "ELSE len(regexp_split_to_array(trim(text, ' '), '\\s+')) END"
)

_UNIMAX_SQL = f"""
    WITH avail AS (
      SELECT source, sum({_WS_COUNT})::BIGINT AS available_tokens
      FROM documents WHERE text IS NOT NULL GROUP BY source
    ), caps AS (
      SELECT source, available_tokens,
             CAST(floor(available_tokens::DOUBLE * 1.0) AS BIGINT)
               AS cap_tokens
      FROM avail
    ), b AS (
      SELECT CAST(floor(sum(available_tokens)::DOUBLE * 0.95) AS BIGINT)
               AS budget
      FROM caps
    ), ranked AS (
      SELECT caps.*, budget,
             row_number() OVER (ORDER BY cap_tokens, source) AS i,
             count(*) OVER () AS n,
             sum(cap_tokens) OVER (ORDER BY cap_tokens, source
                                   ROWS UNBOUNDED PRECEDING) AS cum
      FROM caps CROSS JOIN b
    ), flagged AS (
      SELECT *,
             (cap_tokens * (n - i + 1) + (cum - cap_tokens)) <= budget
               AS capped
      FROM ranked
    ), ks AS (
      SELECT max(CASE WHEN capped THEN i ELSE 0 END) AS k,
             max(CASE WHEN capped THEN cum ELSE 0 END) AS sk
      FROM flagged
    ), alloc AS (
      SELECT source, available_tokens, cap_tokens, capped,
             CASE WHEN capped THEN cap_tokens
                  WHEN n > k THEN CAST((budget - sk) // (n - k) AS BIGINT)
                  ELSE 0 END AS alloc_tokens
      FROM flagged CROSS JOIN ks
    )
    SELECT source, available_tokens, cap_tokens,
           alloc_tokens::BIGINT AS alloc_tokens,
           round(alloc_tokens::DOUBLE
                 / greatest(available_tokens, 1)::DOUBLE, 6) AS epochs,
           capped
    FROM alloc
    """


@_register("unimax_allocation", _UNIMAX_SQL)
def q_unimax_allocation(spark, sf_dir):
    from data_pipeline2_spark.operators import sampling

    return sampling.unimax_allocation(_t(spark, sf_dir, "documents"))


@_register(
    "l_diversity",
    """
    SELECT c_nationkey, c_mktsegment, CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT CAST(floor(c_acctbal / 2000) AS BIGINT))
                AS BIGINT) AS n_sensitive_distinct,
           count(DISTINCT CAST(floor(c_acctbal / 2000) AS BIGINT)) >= 5
             AS l_diverse
    FROM customer GROUP BY 1, 2
    """,
)
def q_l_diversity(spark, sf_dir):
    """ℓ-diversity audit over the (nation, market-segment) quasi tuple
    with the bucketed account balance as the sensitive attribute (the
    k_anonymity fixture upgraded per Machanavajjhala et al. 2007): a
    class where every member falls in one balance band leaks the band
    even at k >= 5."""
    from pyspark.sql import functions as F

    from data_pipeline2_spark.operators import governance

    cust = _t(spark, sf_dir, "customer").withColumn(
        "__sens",
        F.floor(F.col("c_acctbal") / F.lit(2000.0)).cast("long"),
    )
    return governance.l_diversity_audit(
        cust, ["c_nationkey", "c_mktsegment"], "__sens", l=5
    )


_MANIFEST_SQL = """
    SELECT CAST(((doc_id % 8) + 8) % 8 AS INT) AS shard,
           count(*)::BIGINT AS n_docs,
           sum(CASE WHEN text IS NULL THEN 0
                    WHEN len(trim(text, ' ')) = 0 THEN 0
                    ELSE len(regexp_split_to_array(trim(text, ' '),
                                                   '\\s+')) END
              )::BIGINT AS n_tokens,
           sum(CASE WHEN text IS NULL THEN 0
                    ELSE strlen(text) END)::BIGINT AS n_bytes,
           sum(CASE WHEN text IS NULL THEN 0
                    ELSE CAST('0x' || substring(md5(text), 1, 15) AS BIGINT)
                         % 4294967296 END)::BIGINT AS content_checksum,
           min(doc_id) AS min_doc_id,
           max(doc_id) AS max_doc_id
    FROM documents GROUP BY 1
    """


@_register("shard_manifest", _MANIFEST_SQL)
def q_shard_manifest(spark, sf_dir):
    from data_pipeline2_spark.operators import writers

    return writers.shard_manifest(_t(spark, sf_dir, "documents"))
