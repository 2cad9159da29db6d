"""Round-9 registry keys, part 6: the unigram-LM tokenizer (Kudo 2018,
SentencePiece's model) — completing the tokenizer triad next to
`bpe_tokenize` (merge ranks, invariant-gated) and `wordpiece_tokenize`
(greedy longest-match, fully replayed): Viterbi segmentation over
integerized piece log-probabilities with ONE EM round, every step
value-replayed in SQL.

The oracle is the engine's largest trajectory replay: seed piece
scores from capped-word substring counts, a 12-step unrolled Viterbi
DP over the train words, a 12-step backpointer walk to recover the
winning segmentation (the E-step), an add-one M-step recount, and a
second unrolled Viterbi over the held-out vocabulary carrying
(score, n_pieces, checksum) state. All Viterbi maxima are exact
BIGINT comparisons (floor-integerized ln), so the argmax — and
therefore WHICH segmentation wins — is engine-portable; ties break to
the smallest split point (longest final piece), pinned on both sides.
"""

from __future__ import annotations

from data_pipeline2_spark.operators import tokenizer
from data_pipeline2_spark.registry._core import _register, _t
from data_pipeline2_spark.registry.curation_r5 import _WS_LOWER, _md5_60

_SCALE = "10000000000.0"


def _h32(e: str) -> str:
    return f"({_md5_60(e)} % 4294967296)"


def _ulm_sql(
    max_piece: int = tokenizer.ULM_MAX_PIECE,
    max_word: int = tokenizer.ULM_MAX_WORD,
    max_words: int = tokenizer.ULM_MAX_WORDS,
) -> str:
    mp, mw = max_piece, max_word
    # ---- DP-1 over capped train words (score + backpointer) ----
    dp1 = []
    for j in range(1, mw + 1):
        dp1.append(f"""
    c1_{j} AS (
      SELECT a.w, a.j AS i,
             substring(a.w, a.j + 1, {j} - a.j) AS body, a.sc
      FROM a{j - 1} a JOIN tws tw2 ON tw2.w = a.w
      WHERE a.j BETWEEN {j} - {mp} AND {j} - 1 AND tw2.lw >= {j}
    ), m1_{j} AS (
      SELECT c.w, c.i, c.body, c.sc + p.s AS nsc,
             row_number() OVER (
               PARTITION BY c.w
               ORDER BY c.sc + p.s DESC, c.i ASC) AS rn
      FROM c1_{j} c JOIN p0 p ON p.body = c.body
    ), d1_{j} AS MATERIALIZED (
      SELECT w, {j} AS j, nsc AS sc, i AS bi, body AS bp
      FROM m1_{j} WHERE rn = 1
    ), a{j} AS MATERIALIZED (
      SELECT w, j, sc FROM a{j - 1}
      UNION ALL SELECT w, j, sc FROM d1_{j}
    )""")
    bps_union = " UNION ALL ".join(
        f"SELECT w, j, bi, bp FROM d1_{j}" for j in range(1, mw + 1)
    )
    # ---- backpointer walk (E-step segmentations) ----
    walk = []
    for k in range(1, mw + 1):
        walk.append(f"""
    u{k} AS MATERIALIZED (
      SELECT u.w, u.c, b.bi AS j, b.bp AS piece
      FROM u{k - 1} u JOIN bps b ON b.w = u.w AND b.j = u.j
      WHERE u.j > 0
    )""")
    uses_union = " UNION ALL ".join(
        f"SELECT c, piece FROM u{k}" for k in range(1, mw + 1)
    )
    # ---- DP-2 over held-out distinct words (score, np, cksum) ----
    piece_h = _h32("c.body")
    dp2 = []
    for j in range(1, mw + 1):
        dp2.append(f"""
    c2_{j} AS (
      SELECT g.w, g.j AS i,
             substring(g.w, g.j + 1, {j} - g.j) AS body,
             g.sc, g.np, g.ck
      FROM g{j - 1} g JOIN dws dw2 ON dw2.w = g.w
      WHERE g.j BETWEEN {j} - {mp} AND {j} - 1 AND dw2.lw >= {j}
    ), m2_{j} AS (
      SELECT c.w, c.i, c.body, c.sc + p.s AS nsc,
             c.np + 1 AS nnp,
             c.ck + {piece_h} * (c.np + 1) AS nck,
             row_number() OVER (
               PARTITION BY c.w
               ORDER BY c.sc + p.s DESC, c.i ASC) AS rn
      FROM c2_{j} c JOIN p1 p ON p.body = c.body
    ), d2_{j} AS MATERIALIZED (
      SELECT w, {j} AS j, nsc AS sc, nnp AS np, nck AS ck
      FROM m2_{j} WHERE rn = 1
    ), g{j} AS MATERIALIZED (
      SELECT w, j, sc, np, ck FROM g{j - 1}
      UNION ALL SELECT w, j, sc, np, ck FROM d2_{j}
    )""")
    return f"""
    WITH tr AS (
      SELECT {_WS_LOWER} AS ws FROM documents
      WHERE text IS NOT NULL AND ((doc_id % 2) + 2) % 2 = 0
    ), tw AS MATERIALIZED (
      SELECT w, count(*) AS c
      FROM (SELECT unnest(ws) AS w FROM tr) WHERE w <> ''
      GROUP BY w ORDER BY count(*) DESC, w LIMIT {max_words}
    ), sub AS MATERIALIZED (
      SELECT piece, sum(c) AS cnt
      FROM (SELECT substring(w, i, l) AS piece, c
            FROM (SELECT w, c, unnest(generate_series(1, len(w))) AS i
                  FROM tw),
                 (SELECT unnest(generate_series(1, {mp})) AS l)
            WHERE i + l - 1 <= len(w))
      GROUP BY piece
    ), tot0 AS (SELECT sum(cnt) AS t0 FROM sub),
    p0 AS MATERIALIZED (
      SELECT piece AS body,
             CAST(floor(ln(cnt::DOUBLE / t0::DOUBLE) * {_SCALE})
                  AS BIGINT) AS s
      FROM sub CROSS JOIN tot0
    ), tws AS MATERIALIZED (
      SELECT w, c, len(w) AS lw FROM tw WHERE len(w) <= {mw}
    ), a0 AS MATERIALIZED (
      SELECT w, 0 AS j, CAST(0 AS BIGINT) AS sc FROM tws
    ),{",".join(dp1)},
    bps AS MATERIALIZED ({bps_union}),
    u0 AS (SELECT w, c, lw AS j FROM tws),{",".join(walk)},
    uses AS (
      SELECT piece, sum(c) AS u FROM ({uses_union}) GROUP BY piece
    ), cnt1 AS (
      SELECT p0.body, coalesce(uses.u, 0) + 1 AS cnt
      FROM p0 LEFT JOIN uses ON uses.piece = p0.body
    ), tot1 AS (SELECT sum(cnt) AS t1 FROM cnt1),
    p1 AS MATERIALIZED (
      SELECT body,
             CAST(floor(ln(cnt::DOUBLE / t1::DOUBLE) * {_SCALE})
                  AS BIGINT) AS s
      FROM cnt1 CROSS JOIN tot1
    ), sc AS (
      SELECT doc_id, {_WS_LOWER} AS ws FROM documents
      WHERE text IS NOT NULL AND ((doc_id % 2) + 2) % 2 = 1
    ), docw AS MATERIALIZED (
      SELECT doc_id, unnest(ws) AS w,
             unnest(generate_series(1, len(ws))) AS p
      FROM sc
    ), dwall AS MATERIALIZED (SELECT DISTINCT w FROM docw),
    dws AS MATERIALIZED (
      SELECT w, len(w) AS lw FROM dwall
      WHERE len(w) >= 1 AND len(w) <= {mw}
    ), g0 AS MATERIALIZED (
      SELECT w, 0 AS j, CAST(0 AS BIGINT) AS sc, 0 AS np,
             CAST(0 AS BIGINT) AS ck
      FROM dws
    ),{",".join(dp2)},
    fin AS (
      SELECT g.w, g.sc, g.np, g.ck
      FROM g{mw} g JOIN dws d ON d.w = g.w AND g.j = d.lw
    ), pw AS (
      SELECT d.w,
             CASE WHEN fin.w IS NULL THEN 1 ELSE fin.np END AS n_pieces,
             (fin.w IS NULL) AS unk,
             CASE WHEN fin.w IS NULL THEN {_h32("'[UNK]'")}
                  ELSE fin.ck % 4294967296 END AS wcksum,
             CASE WHEN fin.w IS NULL THEN 0 ELSE fin.sc END AS wlog
      FROM dws d LEFT JOIN fin ON fin.w = d.w
      UNION ALL
      SELECT w, 1, true, {_h32("'[UNK]'")}, 0
      FROM dwall WHERE len(w) = 0 OR len(w) > {mw}
    ), perdoc AS (
      SELECT d.doc_id,
             count(*) AS n_words,
             sum(unk::INT) AS n_unk_words,
             sum(n_pieces) AS n_pieces,
             sum(wlog) AS logprob_sum_scaled,
             sum((wcksum * p) % 4294967296) AS ulm_checksum
      FROM docw d JOIN pw USING (w) GROUP BY d.doc_id
    )
    SELECT sc.doc_id,
           coalesce(n_words, 0)::BIGINT AS n_words,
           coalesce(n_unk_words, 0)::BIGINT AS n_unk_words,
           coalesce(n_pieces, 0)::BIGINT AS n_pieces,
           coalesce(logprob_sum_scaled, 0)::BIGINT AS logprob_sum_scaled,
           coalesce(ulm_checksum, 0)::BIGINT AS ulm_checksum
    FROM sc LEFT JOIN perdoc USING (doc_id)
    """


@_register("unigram_lm_tokenize", _ulm_sql())
def q_unigram_lm_tokenize(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    scores = tokenizer.unigram_lm_fit(docs)
    return tokenizer.unigram_lm_tokenize_stats(docs, scores)


def _benford_sql() -> str:
    grid = ", ".join(
        f"({d}, {p})" for d, p in sorted(
            __import__(
                "data_pipeline2_spark.operators.aggregates",
                fromlist=["BENFORD_PPM"],
            ).BENFORD_PPM.items()
        )
    )
    return f"""
    WITH obs AS (
      SELECT CAST(substring(cents::VARCHAR, 1, 1) AS INT) AS digit,
             count(*) AS observed
      FROM (SELECT abs(CAST(CAST(value AS DECIMAL(25,2)) * 100 AS BIGINT))
                     AS cents
            FROM events WHERE value IS NOT NULL)
      WHERE cents > 0 GROUP BY 1
    ), grid(digit, benford_ppm) AS (VALUES {grid}),
    tot AS (SELECT coalesce(sum(observed), 0)::BIGINT AS n_total FROM obs),
    j AS (
      SELECT g.digit, coalesce(o.observed, 0)::BIGINT AS observed,
             g.benford_ppm::BIGINT AS benford_ppm, tot.n_total
      FROM grid g LEFT JOIN obs o ON o.digit = g.digit CROSS JOIN tot
    )
    SELECT digit, observed, n_total,
           ((observed * 1000000) // greatest(n_total, 1))::BIGINT
             AS observed_ppm,
           benford_ppm,
           abs((observed * 1000000) // greatest(n_total, 1)
               - benford_ppm)::BIGINT AS dev_ppm,
           abs((observed * 1000000) // greatest(n_total, 1)
               - benford_ppm) > 30000 AS suspicious
    FROM j
    """


@_register("events_benford", _benford_sql())
def q_events_benford(spark, sf_dir):
    from data_pipeline2_spark.operators import aggregates

    return aggregates.benford_digit_test(_t(spark, sf_dir, "events"))
