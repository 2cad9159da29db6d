"""semantic_search_e2e semantic tests on a constructed micro-corpus:
every stage of the serving composition must act at least once (cache
hit, cache miss, blank-chunk drop, multi-chunk doc, exactly-once index
coverage) and the serve checksum must pin the actual ranked answer.
Value parity vs the stage-replaying DuckDB oracle is covered by
test_oracle_parity + the lake gates; this file also pins the oracle's
load-bearing novelty — the BIT-IDENTICAL SQL replay of the float32
hash embedder — directly against the Python implementation.
"""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from data_pipeline2_spark.operators import serving_e2e
from data_pipeline2_spark.operators.embedding import hash_embed_one

# doc 0: three sentences that pack into ONE 500-char chunk; cache class
# (0 % 3 == 0) -> its chunk is a cache HIT.
# doc 1: long enough to split into MULTIPLE chunks; not in the cache
# class -> every chunk is a MISS embedded fresh.
# doc 3: cache class again (3 % 3 == 0) -> second hit path.
# doc 4: punctuation-only text -> chunks to "." and embeds; NOTE the
# provider's blank-drop seam is structurally unreachable through
# chunk_sentence (units are trimmed non-empty, so content always
# carries a non-whitespace char) — both engines agree by construction,
# and the census's embed_miss/index rows pin that.
# doc 5: NULL text -> zero chunks.
_LONG = " ".join(
    f"Sentence number {i} of the long archival report describes the "
    f"survey grid in exhaustive detail." for i in range(12)
)
_ROWS = [
    (0, "The harbor light failed at dusk. Crews rowed out with spare "
        "lamps. The channel stayed open all night."),
    (1, _LONG),
    (3, "A short cached bulletin about tide tables."),
    (4, " . "),
    (5, None),
]


@pytest.fixture(scope="module")
def micro(spark):
    return spark.createDataFrame(
        _ROWS, "doc_id long, text string"
    ).withColumn("n_chars", F.coalesce(F.length("text"), F.lit(0)).cast("long"))


def test_embedder_sql_replay_bit_identical(duck):
    """The oracle's `_hash_embed_ctes` fragment must reproduce
    hash_embed_one's float32 output bit-for-bit — the contract the
    whole serve-stage value check stands on."""
    from data_pipeline2_spark.registry.curation_r11 import _hash_embed_ctes

    texts = [
        "hello world.",
        "The quick brown fox! Jumps over 12 lazy dogs?",
        "x",
        "  leading and trailing  ",
        "unicode é  text",
        serving_e2e.QUERY_TEXT,
    ]
    sql = f"""
    WITH src AS (
      SELECT row_number() OVER ()::VARCHAR AS chunk_id, t.content
      FROM (SELECT unnest($texts) AS content) t
    ),
    {_hash_embed_ctes('e', 'src')}
    SELECT chunk_id, e FROM evec
    """
    got = {
        int(cid): vec for cid, vec in duck.execute(sql, {"texts": texts}).fetchall()
    }
    assert len(got) == len(texts)
    for idx, text in enumerate(texts, start=1):
        py = hash_embed_one(text)
        db = got[idx]
        assert len(db) == 64
        for a, b in zip(py, db):
            assert struct.pack("<f", a) == struct.pack("<f", b), text


def test_census_accounting(micro):
    rows = {
        r["stage"]: r
        for r in serving_e2e.semantic_search_census(micro, k=3).collect()
    }
    assert len(rows) == 7
    assert rows["ingest"]["rows_in"] == rows["ingest"]["rows_out"] == 5
    assert rows["chunk"]["rows_in"] == 5
    n_chunks = rows["chunk"]["rows_out"]
    # doc 5 chunks to nothing; doc 1 to several; 0/3/4 to one each
    assert n_chunks >= 5
    # cache = embeddable chunks of docs 0 and 3 (one each)
    assert rows["cache_lookup"]["rows_in"] == n_chunks
    assert rows["cache_lookup"]["rows_out"] == 2
    # misses = everything else; every miss embeds (no blank chunks —
    # see the fixture note)
    assert rows["embed_miss"]["rows_in"] == n_chunks - 2
    assert rows["embed_miss"]["rows_out"] == n_chunks - 2
    # index covers every embeddable chunk exactly once
    assert rows["index"]["rows_in"] == n_chunks
    assert rows["index"]["rows_out"] == n_chunks
    assert rows["serve"]["rows_in"] == 3
    assert rows["serve"]["rows_out"] == 3
    assert rows["serve"]["detail"] is not None
    assert rows["search_cache"]["detail"] is not None
    # stages 1-5 carry no checksum
    assert rows["chunk"]["detail"] is None


def test_serve_checksum_pins_ranking(micro):
    """The checksum must be derived from the ranked answer: recompute
    it by hand from the ranked frame and from a k-1 request (different
    ranking -> different checksum)."""
    import hashlib

    fr = serving_e2e.semantic_search_frames(micro, k=3)
    ranked = sorted(
        fr["ranked"].collect(), key=lambda r: r["rank"]
    )
    items = [
        f"{r['rank']:04d}:{r['chunk_id']}:"
        f"{int((r['score'] * 1000000.0 + 0.5) // 1)}"
        for r in ranked
    ]
    expect = int(
        hashlib.md5("|".join(items).encode()).hexdigest()[:15], 16
    )
    rows = {
        r["stage"]: r
        for r in serving_e2e.semantic_search_census(micro, k=3).collect()
    }
    assert rows["serve"]["detail"] == expect
    rows2 = {
        r["stage"]: r
        for r in serving_e2e.semantic_search_census(micro, k=2).collect()
    }
    assert rows2["serve"]["detail"] != expect


def test_cache_aside_identical_to_fresh(micro):
    """Cache-aside is a physical strategy, not a semantic one: vectors
    served from the cache must equal fresh computation (deterministic
    provider), so the index is independent of the cache split."""
    fr = serving_e2e.semantic_search_frames(micro, k=3)
    from data_pipeline2_spark.operators import embedding

    fresh = embedding.embed_chunks(
        fr["chunks"], text_col="content", id_col="chunk_id"
    )
    a = {r["chunk_id"]: r["embedding"] for r in fr["index"].collect()}
    b = {r["chunk_id"]: r["embedding"] for r in fresh.collect()}
    assert a == b


def test_census_schema_stable_on_empty(spark):
    empty = spark.createDataFrame([], "doc_id long, text string, n_chars long")
    rows = serving_e2e.semantic_search_census(empty).collect()
    assert len(rows) == 7
    by = {r["stage"]: r for r in rows}
    assert by["ingest"]["rows_out"] == 0
    assert by["serve"]["rows_out"] == 0
    # empty ranking still fingerprints deterministically (md5 of "")
    assert by["serve"]["detail"] is not None


def test_pending_content_fetch_is_broadcast(spark):
    """The r11 content-shuffle contract, pinned in CI: the join that
    fetches miss CONTENT must be a broadcast semi join (BuildRight on
    the pinned miss-id set) — a refactor that lets the content-bearing
    chunk frame back into a sort-merge anti/semi join re-ships text
    through the exchange at scale (measured 260x shuffle at x100
    before the fix)."""
    from data_pipeline2_spark.sources.parquet import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    fr = serving_e2e.semantic_search_frames(docs)
    plan = fr["pending"]._jdf.queryExecution().executedPlan().toString()
    semi_lines = [
        l for l in plan.splitlines() if "LeftSemi" in l and "Join" in l
    ]
    assert semi_lines, plan
    assert all("BroadcastHashJoin" in l for l in semi_lines), semi_lines
