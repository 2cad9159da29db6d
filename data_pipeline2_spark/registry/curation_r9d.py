"""Round-9 registry keys, part 4: the tokenizer-apply and graded
retrieval-eval completions —

- `wordpiece_tokenize`: the WordPiece greedy longest-match-first apply
  step (Wu et al. 2016 / BERT's tokenization.py) with a genuine
  train/held-out split: the piece vocabulary derives DETERMINISTICALLY
  from the even-residue half's corpus aggregates (frequent whole
  words / prefixes / suffixes + full char coverage), the odd half is
  tokenized, and held-out chars the train split never produced UNK the
  word — BERT's exact failure contract. Unlike `bpe_tokenize` (whose
  merge loop is invariant-gated), the WHOLE pipeline here replays in
  SQL: the greedy match unrolls as 16 bounded CTE steps (each consumes
  >= 1 char; words past 16 chars are UNK by the cap, so the unroll is
  total) with an EQUI match join — 8 candidate substrings per state
  against the (body, blen, kind) vocab table.
- `retrieval_ndcg`: graded-relevance nDCG@10 (Järvelin & Kekäläinen
  2002) over the label ground truth — rel 2 = same label, rel 1 =
  adjacent label, gain 3/1/0; the log2 discount table is computed once
  in Python and embedded as integer literals in BOTH engines, so DCG
  and the closed-form ideal DCG are exact BIGINTs.

Reference anchors: SURVEY §2.10 (tokenization for training data) and
§2.6 (similarity-search evaluation); the reference delegates both to
hosted models (docling_service.py:212-236), which rounds 5-9 already
re-derive as corpus-trained seams.
"""

from __future__ import annotations

from data_pipeline2_spark.operators import similarity, tokenizer
from data_pipeline2_spark.registry._core import _cos_sql, _register, _t
from data_pipeline2_spark.registry.curation_r5 import _WS_LOWER, _md5_60


def _h32(e: str) -> str:
    # the engine-wide 60-bit fragment (curation_r5), reduced to 32 bits
    return f"({_md5_60(e)} % 4294967296)"


def _wordpiece_sql(
    min_count: int = tokenizer.WP_MIN_COUNT,
    max_piece: int = tokenizer.WP_MAX_PIECE,
    max_word: int = tokenizer.WP_MAX_WORD,
) -> str:
    steps = []
    for i in range(1, max_word + 1):
        prev = f"s{i - 1}"
        piece_repr = (
            "CASE WHEN s.pos = 1 THEN substring(s.w, s.pos, m.mlen) "
            "ELSE '##' || substring(s.w, s.pos, m.mlen) END"
        )
        steps.append(f"""
    c{i} AS MATERIALIZED (
      SELECT s.w, s.pos, L, substring(s.w, s.pos, L) AS cand
      FROM {prev} s CROSS JOIN ls
      WHERE NOT s.unk AND s.pos <= len(s.w)
        AND s.pos + L - 1 <= len(s.w)
    ), m{i} AS MATERIALIZED (
      SELECT c.w, max(c.L) AS mlen
      FROM c{i} c JOIN vocab v
        ON v.body = c.cand AND v.blen = c.L
       AND v.kind = CASE WHEN c.pos = 1 THEN 'init' ELSE 'cont' END
      GROUP BY c.w
    ), s{i} AS MATERIALIZED (
      SELECT s.w, s.pos, s.cksum, s.np, s.unk
      FROM {prev} s WHERE s.unk OR s.pos > len(s.w)
      UNION ALL
      SELECT s.w, s.pos + m.mlen,
             s.cksum + {_h32(piece_repr)} * (s.np + 1),
             s.np + 1, false
      FROM {prev} s JOIN m{i} m USING (w)
      WHERE NOT s.unk AND s.pos <= len(s.w)
      UNION ALL
      SELECT s.w, s.pos, s.cksum, s.np, true
      FROM {prev} s ANTI JOIN m{i} m USING (w)
      WHERE NOT s.unk AND s.pos <= len(s.w)
    )""")
    step_sql = ",".join(steps)
    return f"""
    WITH tr AS (
      SELECT {_WS_LOWER} AS ws FROM documents
      WHERE text IS NOT NULL AND ((doc_id % 2) + 2) % 2 = 0
    ), wc AS MATERIALIZED (
      -- empty-string tokens (tab-only text) carry no pieces, matching
      -- the engine's wordpiece_vocab filter
      SELECT w, count(*) AS c
      FROM (SELECT unnest(ws) AS w FROM tr) WHERE w <> '' GROUP BY w
    ), whole AS (
      SELECT w AS body, 'init' AS kind FROM wc
      WHERE c >= {min_count} AND len(w) <= {max_piece}
    ), aff AS (
      SELECT w, c,
             unnest(generate_series(2, least({max_piece}, len(w) - 1)))
               AS j
      FROM wc WHERE len(w) >= 3
    ), pref AS (
      SELECT substring(w, 1, j) AS body, 'init' AS kind
      FROM aff GROUP BY 1 HAVING sum(c) >= {min_count}
    ), suf AS (
      SELECT substring(w, len(w) - j + 1, j) AS body, 'cont' AS kind
      FROM aff GROUP BY 1 HAVING sum(c) >= {min_count}
    ), chars AS (
      SELECT DISTINCT substring(w, i, 1) AS body
      FROM (SELECT w, unnest(generate_series(1, len(w))) AS i FROM wc)
    ), vocab AS MATERIALIZED (
      SELECT DISTINCT kind, body, len(body) AS blen FROM (
        SELECT body, kind FROM whole
        UNION ALL SELECT body, kind FROM pref
        UNION ALL SELECT body, kind FROM suf
        UNION ALL SELECT body, 'init' FROM chars
        UNION ALL SELECT body, 'cont' FROM chars)
    ), ls AS (SELECT unnest(generate_series(1, {max_piece})) AS L),
    sc AS (
      SELECT doc_id, {_WS_LOWER} AS ws FROM documents
      WHERE text IS NOT NULL AND ((doc_id % 2) + 2) % 2 = 1
    ), docw AS MATERIALIZED (
      SELECT doc_id, unnest(ws) AS w,
             unnest(generate_series(1, len(ws))) AS p
      FROM sc
    ), dw AS MATERIALIZED (SELECT DISTINCT w FROM docw),
    s0 AS MATERIALIZED (
      SELECT w, 1 AS pos, CAST(0 AS BIGINT) AS cksum, 0 AS np,
             -- empty-string words (the split contract's artifact on
             -- tab-only text) are UNK, mirroring _wp_match's `not word`
             (len(w) > {max_word} OR len(w) = 0) AS unk
      FROM dw
    ),{step_sql},
    pw AS (
      SELECT w,
             CASE WHEN unk THEN 1 ELSE np END AS n_pieces,
             unk,
             CASE WHEN unk THEN {_h32("'[UNK]'")}
                  ELSE cksum % 4294967296 END AS wcksum
      FROM s{max_word}
    ), perdoc AS (
      SELECT d.doc_id,
             count(*) AS n_words,
             sum(unk::INT) AS n_unk_words,
             sum(n_pieces) AS n_pieces,
             sum((wcksum * p) % 4294967296) AS wp_checksum
      FROM docw d JOIN pw USING (w) GROUP BY d.doc_id
    )
    SELECT sc.doc_id,
           coalesce(n_words, 0)::BIGINT AS n_words,
           coalesce(n_unk_words, 0)::BIGINT AS n_unk_words,
           coalesce(n_pieces, 0)::BIGINT AS n_pieces,
           coalesce(wp_checksum, 0)::BIGINT AS wp_checksum
    FROM sc LEFT JOIN perdoc USING (doc_id)
    """


@_register("wordpiece_tokenize", _wordpiece_sql())
def q_wordpiece_tokenize(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    init, cont = tokenizer.wordpiece_vocab(docs)
    return tokenizer.wordpiece_tokenize_stats(docs, init, cont)


def _ndcg_sql(k: int = 10) -> str:
    disc, cum = similarity._ndcg_discounts(k)
    disc_sql = "[" + ", ".join(str(d) for d in disc) + "]"
    cum_sql = "[" + ", ".join(str(c) for c in cum) + "]"
    return f"""
    WITH emb AS (SELECT vec_id, embedding, label FROM embeddings),
    q AS (
      SELECT label AS qlabel, min(vec_id) AS qid FROM emb GROUP BY label
    ), qv AS (
      SELECT q.qid, q.qlabel, e.embedding AS qvec
      FROM q JOIN emb e ON e.vec_id = q.qid
    ), s AS (
      SELECT qv.qid, qv.qlabel, e.vec_id,
             CASE WHEN e.label = qv.qlabel THEN 2
                  WHEN abs(e.label - qv.qlabel) = 1 THEN 1
                  ELSE 0 END AS rel,
             round({_cos_sql("e.embedding", "qv.qvec")}, 6) AS score
      FROM emb e CROSS JOIN qv
      WHERE e.vec_id <> qv.qid
    ), r AS (
      SELECT qid, qlabel, rel,
             row_number() OVER (
               PARTITION BY qid ORDER BY score DESC, vec_id) AS rank
      FROM s
    ), dcg AS (
      SELECT qid, qlabel,
             sum((CASE rel WHEN 2 THEN 3 WHEN 1 THEN 1 ELSE 0 END)::BIGINT
                 * {disc_sql}[rank])::BIGINT AS dcg_scaled
      FROM r WHERE rank <= {k} GROUP BY qid, qlabel
    ), gc AS (
      SELECT qid, sum((rel = 2)::INT)::BIGINT AS n_rel2,
             sum((rel = 1)::INT)::BIGINT AS n_rel1
      FROM s GROUP BY qid
    ), f AS (
      SELECT dcg.qid, dcg.qlabel, gc.n_rel2, gc.n_rel1, dcg.dcg_scaled,
             (3 * {cum_sql}[CAST(least(gc.n_rel2, {k}) AS INT) + 1]
              + ({cum_sql}[CAST(least(gc.n_rel2 + gc.n_rel1, {k}) AS INT)
                           + 1]
                 - {cum_sql}[CAST(least(gc.n_rel2, {k}) AS INT) + 1])
             )::BIGINT AS idcg_scaled
      FROM dcg JOIN gc USING (qid)
    )
    SELECT qid, qlabel, n_rel2, n_rel1, dcg_scaled, idcg_scaled,
           round(CASE WHEN idcg_scaled > 0
                      THEN dcg_scaled::DOUBLE / idcg_scaled::DOUBLE
                      ELSE NULL END, 6) AS ndcg_at_k
    FROM f
    """


@_register("retrieval_ndcg", _ndcg_sql())
def q_retrieval_ndcg(spark, sf_dir):
    return similarity.retrieval_ndcg(_t(spark, sf_dir, "embeddings"), k=10)
