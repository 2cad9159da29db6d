"""Round-8 registry keys: exact-substring dedup at the published
50-token standard.

Reference anchors: BASELINE.json north_star's dedup mandate; Lee et
al. 2022 (arXiv:2107.06499) define the 50-token exact-substring
criterion this family implements at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401

from data_pipeline2_spark.operators import dedup
from data_pipeline2_spark.registry._core import _register, _t

_ESS_N = 50
_ESS_CAP = 16


@_register(
    "exact_substring_spans",
    f"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS ws
      FROM documents WHERE text IS NOT NULL AND len(trim(text)) > 0
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
    )
    SELECT doc_a, doc_b,
           CAST(min(pa) AS INT) AS a_start,
           CAST(min(pb) AS INT) AS b_start,
           CAST(max(pa) - min(pa) + {_ESS_N} AS INT) AS span_tokens
    FROM isl GROUP BY doc_a, doc_b, diag, grp
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
