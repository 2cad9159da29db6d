"""Round-9 registry keys, part 3: sketch, apply-step, and collocation
completions for the training-data-pipeline surface —

- `cms_frequency_eval`: Count-Min sketch (Cormode & Muthukrishnan
  2005) frequency estimation with the one-sided error MEASURED per
  probe word (the winnow_span_recall_eval discipline) — the mergeable
  fixed-size frequency sketch that completes the engine's sketch
  family (HLL, KMV, Misra-Gries).
- `strip_repeated_lines`: the APPLY step of the Gopher duplicate-line
  signal — intra-document keep-first line dedup as ONE zero-exchange
  Catalyst projection.
- `pmi_collocations`: Church & Hanks 1990 pointwise mutual information
  over the term_cooccurrence window pairs — collocation mining with
  the floor-integerized-log discipline and a min-count floor.

All three replay fully in DuckDB (the md5-60 hash family, list
lambdas, and one pinned-order ln per row). Reference anchors:
SURVEY §2.10's text-analysis mandate; the reference itself has no
sketch/collocation surface, so these extend the north star exactly as
rounds 5-9 did.
"""

from __future__ import annotations

from data_pipeline2_spark.operators import quality, textanalysis
from data_pipeline2_spark.registry._core import _register, _t
from data_pipeline2_spark.registry.curation_r5 import _WS_LOWER, _md5_60

_SCALE = "10000000000.0"  # the engine-wide integerized-log scale


_CMS_SQL = f"""
    WITH t AS (
      SELECT doc_id, {_WS_LOWER} AS ws
      FROM documents WHERE text IS NOT NULL
    ), toks AS (SELECT unnest(ws) AS w FROM t),
    counts AS (SELECT w, count(*) AS c FROM toks GROUP BY w),
    js AS (SELECT unnest(generate_series(0, 3)) AS row_j),
    sk AS (
      SELECT row_j,
             {_md5_60("row_j::VARCHAR || '|' || w")} % 1024
               AS bucket,
             sum(c) AS bc
      FROM counts CROSS JOIN js GROUP BY 1, 2
    ), probes AS (
      SELECT w, c FROM counts ORDER BY c DESC, w LIMIT 20
    ), est AS (
      SELECT p.w, p.c, min(sk.bc) AS e
      FROM probes p CROSS JOIN js
      JOIN sk ON sk.row_j = js.row_j
             AND sk.bucket =
                 {_md5_60("js.row_j::VARCHAR || '|' || p.w")} % 1024
      GROUP BY p.w, p.c
    )
    SELECT w AS word, c::BIGINT AS exact_c, e::BIGINT AS cms_est,
           (e - c)::BIGINT AS overestimate
    FROM est
    """


@_register("cms_frequency_eval", _CMS_SQL)
def q_cms_frequency_eval(spark, sf_dir):
    return textanalysis.cms_frequency_eval(_t(spark, sf_dir, "documents"))


_STRIP_LINES_SQL = f"""
    WITH t AS (
      SELECT doc_id,
             list_transform(
               list_filter(regexp_split_to_array(text, '\\r?\\n'),
                           x -> len(trim(x, ' ')) > 0),
               x -> trim(x, ' ')) AS l
      FROM documents WHERE text IS NOT NULL
    ), k AS (
      SELECT doc_id, l,
             list_filter(l, (x, i) -> list_position(l, x) = i) AS kept
      FROM t
    )
    SELECT doc_id,
           len(l)::BIGINT AS n_lines,
           len(kept)::BIGINT AS kept_lines,
           (len(l) - len(kept))::BIGINT AS removed_lines,
           (coalesce(list_aggregate(list_transform(l, x -> len(x)),
                                    'sum'), 0)
            - coalesce(list_aggregate(list_transform(kept, x -> len(x)),
                                      'sum'), 0))::BIGINT AS chars_removed,
           coalesce(list_aggregate(
             list_transform(kept, (x, i) ->
               ({_md5_60('x')} % 4294967296) * i),
             'sum'), 0)::BIGINT AS kept_checksum
    FROM k
    """


@_register("strip_repeated_lines", _STRIP_LINES_SQL)
def q_strip_repeated_lines(spark, sf_dir):
    return quality.strip_repeated_lines(_t(spark, sf_dir, "documents"))


_PMI_SQL = f"""
    WITH t AS (
      SELECT doc_id, {_WS_LOWER} AS ws
      FROM documents WHERE text IS NOT NULL
    ), toks AS (
      SELECT doc_id, unnest(ws) AS w,
             unnest(generate_series(1, len(ws))) AS p
      FROM t
    ), uni AS (SELECT w, count(*) AS cw FROM toks GROUP BY w),
    nt AS (SELECT sum(cw) AS n_tok FROM uni),
    pr AS (
      SELECT least(a.w, b.w) AS w1, greatest(a.w, b.w) AS w2,
             count(*) AS pairs
      FROM toks a JOIN toks b
        ON a.doc_id = b.doc_id AND b.p > a.p AND b.p <= a.p + 2
      GROUP BY 1, 2
    ), np AS (SELECT sum(pairs) AS n_pairs FROM pr),
    scored AS (
      SELECT w1, w2, pairs::BIGINT AS pairs,
             CAST(floor(ln((pairs::DOUBLE * n_tok::DOUBLE * n_tok::DOUBLE)
                           / (n_pairs::DOUBLE * u1.cw::DOUBLE
                              * u2.cw::DOUBLE))
                        * {_SCALE}) AS BIGINT) AS pmi_scaled
      FROM pr
      JOIN uni u1 ON u1.w = pr.w1
      JOIN uni u2 ON u2.w = pr.w2
      CROSS JOIN nt CROSS JOIN np
      WHERE pairs >= 5
    )
    SELECT w1, w2, pairs, pmi_scaled
    FROM scored ORDER BY pmi_scaled DESC, w1, w2 LIMIT 50
    """


@_register("pmi_collocations", _PMI_SQL)
def q_pmi_collocations(spark, sf_dir):
    return textanalysis.pmi_collocations(_t(spark, sf_dir, "documents"))
