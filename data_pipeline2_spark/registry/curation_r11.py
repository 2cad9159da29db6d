"""Registry part-module, round 11 — see registry/__init__.py.

- `semantic_search_e2e`: the composed SERVING lifecycle (ingest →
  sentence-chunk → cache-aside embed → index → cosine top-k serve →
  search-cache key) as ONE oracled census key (VERDICT r10 item 2),
  mirroring round 10's `training_pipeline_e2e` for the curation spine.
  The oracle replays every stage in DuckDB — including a BIT-IDENTICAL
  SQL replay of the sha256-seeded hash embedder (power-of-two /32768
  arithmetic, sequential float64 norm, one float32 cast), so the serve
  row's `detail` checksum pins the actual ranked answer, and the
  cache-aside stage's hit/miss counts pin the anti-join.

Reference anchors: document_processor.py:96-132 (process → chunk),
embedding_service.py:141-214 (cache-aside + batch generate),
vector_storage.py:69-100 (cosine kNN), search_cache.py:18-33 (request
key) — the lifecycle SURVEY §3.3 documents, composed.
"""

from __future__ import annotations

from data_pipeline2_spark.operators import serving_e2e
from data_pipeline2_spark.registry._core import _cos_sql, _register, _t


def _hash_embed_ctes(prefix: str, src: str, dim: int = 64) -> str:
    """CTE fragment replaying embedding.hash_embed_one over `src`
    (chunk_id, content) → `{prefix}vec` (chunk_id, e float32-list).

    Bit-exact by construction: sha256(content || '|' || counter) hex →
    16-bit big-endian pairs → v = n/32768 - 1 (exact: 32768 is a power
    of two) → norm = sqrt of the SEQUENTIAL float64 sum of squares
    (list_aggregate 'sum' folds in list order, matching Python's
    left-to-right sum) → IEEE divide → one float32 cast, identical to
    ArrayType(FloatType()) serialization. Verified bit-identical
    against hash_embed_one in tests/test_serving_e2e.py."""
    if dim % 16 != 0:
        raise ValueError(f"dim must be a multiple of 16, got {dim}")
    n_dig = dim // 16
    return f"""
    {prefix}comp AS (
      SELECT chunk_id, c, i,
             CAST(('0x' || substring(sha256(content || '|' || c::VARCHAR),
                  (i-1)*4 + 1, 4)) AS BIGINT) / 32768.0 - 1.0 AS v
      FROM {src},
           (SELECT unnest(generate_series(0, {n_dig - 1})) AS c),
           (SELECT unnest(generate_series(1, 16)) AS i)
    ),
    {prefix}raw AS (
      SELECT chunk_id, list(v ORDER BY c, i) AS raw
      FROM {prefix}comp GROUP BY chunk_id
    ),
    {prefix}vec AS MATERIALIZED (
      SELECT chunk_id,
             list_transform(raw, x -> CAST(x / sqrt(list_aggregate(
               list_transform(raw, y -> y * y), 'sum')) AS FLOAT)) AS e
      FROM {prefix}raw
    )"""


def _sem_e2e_sql(
    query_text: str = serving_e2e.QUERY_TEXT,
    chunk_chars: int = 500,
    cache_mod: int = 3,
    k: int = 10,
    dim: int = 64,
) -> str:
    m = int(cache_mod)
    cached = f"(((doc_id % {m}) + {m}) % {m}) = 0"  # pmod parity
    q = query_text.replace("'", "''")
    tag = serving_e2e.CACHE_TAG
    return f"""
    WITH cb AS (
      SELECT doc_id,
             regexp_extract_all(text, '[^.!?]+[.!?]+') AS sents,
             CASE WHEN len(trim(text, ' ')) = 0 THEN []
                  ELSE regexp_split_to_array(trim(text, ' '), '\\s+')
             END AS toks
      FROM documents
    ), cu AS (
      SELECT doc_id, unnest(us) AS unit, generate_subscripts(us, 1) AS upos
      FROM (SELECT doc_id,
                   CASE WHEN len(sents) > 0
                        THEN list_transform(sents, s -> trim(s,
                          ' '||chr(9)||chr(10)||chr(13)||chr(12)||chr(11)))
                        ELSE toks END AS us
            FROM cb)
    ), cbk AS (
      SELECT doc_id, unit, upos,
             CAST(floor((sum(length(unit) + 1) OVER (PARTITION BY doc_id
                    ORDER BY upos ROWS UNBOUNDED PRECEDING) - 1)
                  / {chunk_chars}.0) AS INT) AS pos
      FROM cu
    ), chunks AS MATERIALIZED (
      SELECT doc_id, pos,
             doc_id::VARCHAR || '-' || pos::VARCHAR AS chunk_id,
             string_agg(unit, ' ' ORDER BY upos) AS content
      FROM cbk GROUP BY doc_id, pos
    ), nb AS MATERIALIZED (
      -- embeddable = contains a non-whitespace char (the provider's
      -- python strip() blank test; see the embed_provider oracle)
      SELECT doc_id, chunk_id, content FROM chunks
      WHERE regexp_replace(content, '\\s', '', 'g') <> ''
    ),
    {_hash_embed_ctes('e', 'nb', dim)},
    qsrc AS (SELECT '__query__' AS chunk_id, '{q}' AS content),
    {_hash_embed_ctes('q', 'qsrc', dim)},
    scored AS (
      SELECT v.chunk_id, round({_cos_sql('v.e', 'qq.e')}, 6) AS score
      FROM evec v, qvec qq
    ), topk AS MATERIALIZED (
      SELECT chunk_id, score, rank FROM (
        SELECT chunk_id, score,
               row_number() OVER (ORDER BY score DESC, chunk_id) AS rank
        FROM scored)
      WHERE rank <= {k}
    ), chk AS (
      SELECT count(*)::BIGINT AS c,
             CAST('0x' || substring(md5(coalesce(string_agg(
                  lpad(rank::VARCHAR, 4, '0') || ':' || chunk_id || ':' ||
                  CAST(floor(score * 1000000.0 + 0.5) AS BIGINT)::VARCHAR,
                  '|' ORDER BY rank), '')), 1, 15) AS BIGINT) AS d
      FROM topk
    ), ck AS (
      SELECT CAST('0x' || substring(md5(sha256(concat_ws('|',
               '{tag}', 'hash64', '{q}', '{k}'))), 1, 15) AS BIGINT) AS d
    ),
    c1 AS (SELECT count(*)::BIGINT AS c FROM documents),
    c2 AS (SELECT count(*)::BIGINT AS c FROM chunks),
    c3 AS (SELECT count(*)::BIGINT AS c FROM nb WHERE {cached}),
    c4p AS (SELECT count(*)::BIGINT AS c FROM chunks
            WHERE chunk_id NOT IN
              (SELECT chunk_id FROM nb WHERE {cached})),
    c5i AS (SELECT count(*)::BIGINT AS c FROM nb),
    c5d AS (SELECT count(DISTINCT chunk_id)::BIGINT AS c FROM nb)
    SELECT CAST(1 AS INT) AS stage_idx, 'ingest' AS stage,
           c1.c AS rows_in, c1.c AS rows_out,
           CAST(NULL AS BIGINT) AS detail FROM c1
    UNION ALL SELECT 2, 'chunk', c1.c, c2.c, NULL FROM c1, c2
    UNION ALL SELECT 3, 'cache_lookup', c2.c, c3.c, NULL FROM c2, c3
    UNION ALL SELECT 4, 'embed_miss', c4p.c, c5i.c - c3.c, NULL
              FROM c4p, c5i, c3
    UNION ALL SELECT 5, 'index', c5i.c, c5d.c, NULL FROM c5i, c5d
    UNION ALL SELECT 6, 'serve', CAST({k} AS BIGINT), chk.c, chk.d FROM chk
    UNION ALL SELECT 7, 'search_cache', CAST(1 AS BIGINT),
              CAST(1 AS BIGINT), ck.d FROM ck
    """


@_register("semantic_search_e2e", _sem_e2e_sql())
def q_semantic_search_e2e(spark, sf_dir):
    """The serving lifecycle as a 7-row per-stage census — proves the
    serving operators COMPOSE (chunk store → embedding cache-aside →
    vector index → ranked kNN answer → request cache key), with the
    ranked answer itself value-checked via the serve row's checksum."""
    return serving_e2e.semantic_search_census(
        _t(spark, sf_dir, "documents")
    )
