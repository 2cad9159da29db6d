"""The composed SERVING lifecycle as ONE oracled operator.

`training_pipeline_e2e` (operators/pipeline_e2e.py) proved the CURATION
spine composes; this module gives the reference's actual query-serving
lifecycle the same one-green-row treatment (VERDICT r10 item 2):

  ingest documents → sentence-chunk → embed with CACHE-ASIDE (probe the
  embedding cache, compute only the misses, union) → index the vectors →
  serve a cosine top-k request → derive the request's search-cache key.

Reference parity: document_processor.py:96-132 (submit → process →
chunk), embedding_service.py:141-181 (`_generate_single_embedding`
probe/miss/store cache-aside) and 183-214 (batch generate returns only
successes), vector_storage.py:69-100 (ES script_score cosine kNN),
search_cache.py:18-33 (sha256 request key) — each stage re-expressed as
the native Spark plan its solo registry key already proved, then run as
ONE composition with inter-stage row accounting.

The census is fully value-checked in DuckDB, including the float path:
the deterministic hash embedder (sha256-seeded bytes → [-1,1) doubles →
L2-normalize → float32) replays BIT-IDENTICALLY in SQL — exact `/32768`
power-of-two arithmetic, a sequential float64 list-sum for the norm,
IEEE sqrt/divide, one float32 cast — so the serve stage's ranking
checksum pins the actual top-k answer (rank, chunk id, and the rounded
score integerized at 1e6), not just its row count.

Scale shape: the three frames a production serving system PERSISTS
anyway are the three frames materialized here (eager localCheckpoint) —
the chunk store (reference: chunks in ES), the embedding cache
(reference: Redis), and the vector index (reference: ES dense_vector).
Each downstream stage reads those materializations instead of
re-executing upstream trees. Cache probe and miss-complement are
id-keyed semi/anti joins; the kNN is the broadcast-query map-side scan
knn_cosine already budgets (the corpus never shuffles); the census is
one-row aggregates cross-joined and unpivoted — nothing corpus-sized
survives. At 100 TB the materializations ARE the product (the serving
store), not overhead; their write cost is the write_embeddings /
cache_write_ttl budget the member keys document.
"""

from __future__ import annotations

import struct

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_pipeline2_spark.operators import chunking, embedding, similarity
from data_pipeline2_spark.plans.partitioning import adaptive_key_join
from data_pipeline2_spark.plans.materialize import materialize, materialize_lazy

#: the fixed serving request the composed key replays on both engines
QUERY_TEXT = "similarity search over document chunks."
CACHE_TAG = "semantic_search_e2e"


def _f32(xs: list[float]) -> list[float]:
    """Round-trip through float32 — the query embeds through the same
    provider that produced the index vectors (ArrayType(FloatType())),
    so its components must carry float32 precision, not float64."""
    return [struct.unpack("<f", struct.pack("<f", v))[0] for v in xs]


def semantic_search_frames(
    documents: DataFrame,
    query_text: str = QUERY_TEXT,
    chunk_chars: int = 500,
    cache_mod: int = 3,
    k: int = 10,
    dim: int = embedding.DEFAULT_DIM,
) -> dict[str, DataFrame]:
    """Run the serving composition and return every stage frame:
    {docs, chunks, cache, hits, pending, index, ranked} — the single
    source of truth both `semantic_search_census` (the oracled census)
    and examples/semantic_search_pipeline.py consume.

    Stages:

    1. ingest       — the raw document lake.
    2. chunk        — sentence-pack at `chunk_chars` (the reference's
       500-char default), persisted as the chunk store.
    3. cache_lookup — the embedding cache holds the chunks of docs with
       pmod(doc_id, `cache_mod`) == 0 (a deterministic stand-in for
       "embedded by earlier requests"); probe = semi-join of cache
       against the requested chunk ids.
    4. embed_miss   — the anti-join complement embeds fresh through the
       hash provider (blank chunks drop: provider skip-and-continue).
    5. index        — cache hits ∪ fresh = the vector index; must cover
       every embeddable chunk exactly once (the census compares the
       union's size against its distinct-key count).
    6. serve        — cosine top-`k` for the embedded `query_text`
       (broadcast scalar query; ranked by rounded score desc, chunk_id
       asc — the deterministic tiebreak every knn key uses).
    7. search_cache — the request's deterministic cache key
       (search_cache.py parity).
    """
    docs = documents
    # stage 2: the chunk store — materialized once (8-byte ids plus
    # content; the reference persists exactly this table in ES)
    chunks = chunking.chunk_sentence(docs, chunk_chars).transform(
        materialize
    )
    # stage 3: the pre-existing embedding cache (deterministic fixture:
    # prior requests covered the pmod-class docs), materialized — this
    # is the Redis tier, persisted by definition. Lazy (r13): its first
    # full read is the miss-set guard job inside adaptive_key_join
    # (sequential, single consumer at that point), so the cache embeds
    # as a side effect of that job instead of a dedicated eager one;
    # chunks and index stay EAGER because they are read by concurrent
    # stages of one downstream job, where lazy first-touch would race
    # into transient duplicate compute of the chunk/embed passes.
    cache = embedding.embed_chunks(
        chunks.filter(F.pmod(F.col("doc_id"), F.lit(cache_mod)) == 0),
        text_col="content",
        id_col="chunk_id",
        dim=dim,
    ).transform(materialize_lazy)
    hits = cache.join(chunks.select("chunk_id"), "chunk_id", "left_semi")
    # id-only anti join + adaptively-broadcast semi fetch, so chunk
    # CONTENT never shuffles (the embed_incremental r11 contract — see
    # the operator's comment; caught by this key's x100 scale gate).
    # Sized like the operator itself (r12): past the key limit the
    # fetch degrades to a shuffle join instead of OOMing the driver.
    miss_ids = chunks.select("chunk_id").join(
        cache.select("chunk_id"), "chunk_id", "left_anti"
    )
    pending = adaptive_key_join(chunks, miss_ids, "chunk_id")
    # stages 4+5: cache-aside split computed ONCE (r12) — the census
    # frames above ARE the probe, so the index is built directly as
    # hits ∪ embed(pending) instead of calling embed_incremental,
    # which would redo the same anti join, guard count, and content
    # fetch a second time per request (value-identical: the operator's
    # own pin test_cache_aside_identical_to_fresh covers the
    # equivalence; embed_incremental remains the standalone operator
    # surface and its own registry key)
    fresh = embedding.embed_chunks(
        pending, text_col="content", id_col="chunk_id", dim=dim
    )
    index = (
        hits.select("chunk_id", "provider", "embedding")
        .unionByName(fresh)
        .transform(materialize)
    )
    # stage 6: the query embeds through the same provider (float32),
    # then broadcast cosine top-k over the index
    qvec = _f32(embedding.hash_embed_one(query_text, dim))
    topk = similarity.knn_cosine(index, qvec, k=k, id_col="chunk_id")
    # rank the (<= k)-row result — a single-partition window over the
    # already-limited frame, not a corpus sort
    w = Window.orderBy(F.desc("score"), F.col("chunk_id"))
    ranked = topk.select(
        F.row_number().over(w).alias("rank"), "chunk_id", "score"
    )
    return {
        "docs": docs,
        "chunks": chunks,
        "cache": cache,
        "hits": hits,
        "pending": pending,
        "index": index,
        "ranked": ranked,
    }


def ranking_checksum(ranked: DataFrame) -> Column:
    """Exact BIGINT fingerprint of a ranked result: md5-60 over the
    '|'-joined 'rank:chunk_id:score_1e6' items in rank order. The
    fixed-width rank prefix makes lexicographic array_sort equal rank
    order, so no collect_list ordering assumption is needed; the score
    enters integerized (floor(score*1e6 + 0.5) of the already-rounded
    double — identical on both engines by IEEE determinism)."""
    item = F.concat_ws(
        ":",
        F.lpad(F.col("rank").cast("string"), 4, "0"),
        F.col("chunk_id"),
        F.floor(F.col("score") * F.lit(1000000.0) + F.lit(0.5)).cast(
            "string"
        ),
    )
    joined = F.array_join(F.array_sort(F.collect_list(item)), "|")
    return F.conv(F.substring(F.md5(joined), 1, 15), 16, 10).cast("long")


def semantic_search_census(documents: DataFrame, **kw) -> DataFrame:
    """The serving composition as a 7-row per-stage census (stage_idx,
    stage, rows_in, rows_out, detail) — the driver-oracled export. The
    serve row's `detail` is the ranking checksum (the actual answer,
    value-checked); the search_cache row's `detail` fingerprints the
    request's sha256 cache key. See `semantic_search_frames`."""
    return census_from_frames(
        semantic_search_frames(documents, **kw),
        query_text=kw.get("query_text", QUERY_TEXT),
        k=kw.get("k", 10),
    )


def census_from_frames(
    fr: dict[str, DataFrame], query_text: str = QUERY_TEXT, k: int = 10
) -> DataFrame:
    """Census over ALREADY-BUILT stage frames (same contract as
    pipeline_e2e.census_from_frames — the example builds frames once
    and reuses them for both narration and census)."""

    # census counts as ONE union of TAG ROWS + a single global
    # conditional-count aggregate (r12, guide §2.4 — see
    # pipeline_e2e.census_from_frames for the full rationale): the
    # 6-deep crossJoin chain planned as serialized
    # BroadcastNestedLoopJoin broadcast rounds; per-leg aggregates
    # still paid 6 single-partition exchanges = 6 AQE stage rounds.
    # Tag rows make the single-partition merge the assembly's only
    # exchange (no hash shuffle — exchange budget unchanged); measured
    # census action 1.73 s -> ~1.2 s on this operator. The ranked leg
    # keeps its aggregate form (its d6 checksum is not a count) and
    # joins the count row through ONE one-row crossJoin; c5d's
    # distinct applies BEFORE tagging (count_distinct of a non-null
    # key == count of the distinct set); a frame with zero rows
    # contributes zero tags and counts to 0, exactly as its
    # empty-frame aggregate did.
    def _tag(df: DataFrame, name: str) -> DataFrame:
        return df.select(F.lit(name).alias("k"))

    cache_key = similarity.search_cache_key(
        F.lit("hash64"), F.lit(query_text), F.lit(k), F.lit(CACHE_TAG)
    )
    rows = (
        _tag(fr["docs"], "c1")
        .unionByName(_tag(fr["chunks"], "c2"))
        .unionByName(_tag(fr["hits"], "c3"))
        .unionByName(_tag(fr["pending"], "c4p"))
        .unionByName(_tag(fr["index"], "c5i"))
        .unionByName(
            # null-excluding filter replicates count(DISTINCT chunk_id)
            _tag(
                fr["index"]
                .where(F.col("chunk_id").isNotNull())
                .select("chunk_id")
                .distinct(),
                "c5d",
            )
        )
    )
    counts_row = rows.groupBy().agg(
        *[
            F.count(F.when(F.col("k") == name, F.lit(1)))
            .cast("long")
            .alias(name)
            for name in ["c1", "c2", "c3", "c4p", "c5i", "c5d"]
        ]
    )
    ranked_row = fr["ranked"].agg(
        F.count(F.lit(1)).cast("long").alias("c6"),
        ranking_checksum(fr["ranked"]).alias("d6"),
    )
    row = counts_row.crossJoin(ranked_row).withColumn(
        "d7",
        F.conv(F.substring(F.md5(cache_key), 1, 15), 16, 10).cast("long"),
    )
    return row.selectExpr(
        f"""stack(7,
          1, 'ingest',       c1, c1,        CAST(NULL AS BIGINT),
          2, 'chunk',        c1, c2,        CAST(NULL AS BIGINT),
          3, 'cache_lookup', c2, c3,        CAST(NULL AS BIGINT),
          4, 'embed_miss',   c4p, c5i - c3, CAST(NULL AS BIGINT),
          5, 'index',        c5i, c5d,      CAST(NULL AS BIGINT),
          6, 'serve',        CAST({int(k)} AS BIGINT), c6, d6,
          7, 'search_cache', CAST(1 AS BIGINT), CAST(1 AS BIGINT), d7
        ) AS (stage_idx, stage, rows_in, rows_out, detail)"""
    )
