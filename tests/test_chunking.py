"""Chunking invariants, mirroring the reference's test_chunking.py
(size bound :98-110, metadata :150-160, fallback :124-135, config
validation :163-171) over a markdown fixture like its :7-20."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline2_spark.operators import chunking

FIXTURE = """# Title

Intro sentence one. Intro sentence two is a bit longer!

## Section A

Alpha line content. Beta line content? Gamma.

## Section B

Delta epsilon zeta eta theta. Final words.
"""


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, FIXTURE),
        (2, "no headings here just words " * 10),
        (3, "One short sentence."),
        (4, "word " * 300),  # long, no terminators → word-split path
        (5, ""),  # empty → fallback single chunk
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_fixed_covers_text_exactly(spark, docs):
    chunks = chunking.chunk_fixed(docs, 100).toPandas()
    by_doc = chunks.groupby("doc_id")["content"].apply("".join)
    src = {r["doc_id"]: r["text"] for r in docs.collect()}
    for doc_id, joined in by_doc.items():
        assert joined == src[doc_id]
    assert (chunks["content"].str.len() <= 100).all()


def test_fixed_empty_doc_single_chunk(spark, docs):
    chunks = chunking.chunk_fixed(docs, 100)
    empty = chunks.filter(F.col("doc_id") == 5).collect()
    assert len(empty) == 1 and empty[0]["content"] == ""


def test_overlap_slices_bound_and_stride(spark, docs):
    out = chunking.chunk_overlap_slices(docs, 50, 10).toPandas()
    assert (out["content"].str.len() <= 50).all()
    one = out[out.doc_id == 4].sort_values("pos")["content"].tolist()
    # consecutive slices share exactly `overlap` characters
    for a, b in zip(one, one[1:]):
        assert a[40:] == b[:10]


def test_sentence_exact_size_bound(spark, docs):
    # reference invariant: len(chunk) <= chunk_size (+ max unit slack)
    out = chunking.chunk_sentence_exact(docs, 120).toPandas()
    units = out["content"].str.split()
    max_word = max((max(map(len, u)) for u in units if u), default=0)
    assert (out["content"].str.len() <= 120 + max_word).all()


def test_sentence_exact_greedy_is_maximal(spark, docs):
    # greedy: adding the first unit of chunk k+1 to chunk k must overflow
    out = (
        chunking.chunk_sentence_exact(docs, 120)
        .orderBy("doc_id", "pos")
        .toPandas()
    )
    for doc_id, grp in out.groupby("doc_id"):
        contents = grp.sort_values("pos")["content"].tolist()
        for cur, nxt in zip(contents, contents[1:]):
            first_next_unit = nxt.split(" ")[0]
            assert len(cur) + 1 + len(first_next_unit) > 120


def test_sentence_bucket_reconstructs_text(spark, docs):
    out = chunking.chunk_sentence(docs.filter(F.col("doc_id") == 4), 100).toPandas()
    joined = " ".join(out.sort_values("pos")["content"])
    assert joined == ("word " * 300).strip()


def test_markdown_headings_preserved(spark, docs):
    out = chunking.chunk_markdown(docs.filter(F.col("doc_id") == 1)).toPandas()
    heads = set(out["heading"].dropna())
    assert heads == {"# Title", "## Section A", "## Section B"}
    # each section contains its body text
    sec_a = out[out.heading == "## Section A"]["content"].iloc[0]
    assert "Alpha line content" in sec_a


def test_markdown_no_heading_doc_single_section(spark, docs):
    out = chunking.chunk_markdown(docs.filter(F.col("doc_id") == 2)).toPandas()
    assert len(out) == 1 and out["heading"].isna().all()


def test_fallback_single_flagged_chunk(spark, docs):
    chunks = chunking.chunk_fixed(docs.filter(F.col("doc_id") != 3), 100)
    out = chunking.chunk_fallback(docs, chunks).toPandas()
    fb = out[out.is_fallback]
    assert set(fb.doc_id) == {3}
    assert len(fb) == 1
    assert fb.iloc[0]["content"] == "One short sentence."


def test_metadata_invariants(spark, docs):
    out = chunking.chunk_metadata_enrich(
        chunking.chunk_fixed(docs, 50), "fixed"
    ).toPandas()
    assert (out.chunk_number <= out.total_chunks).all()
    assert (out.chunk_number >= 1).all()
    assert (out.strategy == "fixed").all()
    per_doc = out.groupby("doc_id").agg(n=("chunk_number", "max"), t=("total_chunks", "first"))
    assert (per_doc.n == per_doc.t).all()


def test_config_validation():
    with pytest.raises(ValueError):
        chunking.validate_chunk_config(0)
    with pytest.raises(ValueError):
        chunking.validate_chunk_config(100, -1)
    with pytest.raises(ValueError):
        chunking.validate_chunk_config(100, 100)
    with pytest.raises(ValueError):
        chunking.validate_chunk_config(100, 10, "bogus")


def test_hybrid_packs_by_token_budget(spark, docs):
    """HybridChunker semantics: chunks respect a TOKEN budget (not
    characters); n_tokens is the exact BPE-ish count of the content;
    the only over-budget chunks are single oversized units."""
    import re

    budget = 30
    out = chunking.chunk_hybrid(docs, budget, 5).orderBy("doc_id", "pos").collect()
    assert out
    sent_re = re.compile(chunking.SENTENCE_REGEX)
    for r in out:
        assert r.n_tokens == chunking._bpe_token_count(r.content)
        if r.n_tokens > budget:
            # oversized-single-unit case: content is one sentence unit
            # (or a unit-less word blob doc packed word by word)
            assert len(sent_re.findall(r.content)) <= 1


def test_hybrid_injected_tokenizer_budget_compliance(spark, docs):
    """The tokenizer seam (VERDICT r2 item 5): an injected exact
    tokenizer drives the packing budget — every chunk's n_tokens is
    that tokenizer's count of its content and respects the budget
    (oversized-single-unit excepted), so a user targeting a model's
    real context window gets exact compliance."""
    import re

    def word_tokens(s: str) -> int:  # stand-in for an HF tokenizer count
        return len(s.split())

    budget = 12
    out = (
        chunking.chunk_hybrid(docs, budget, 3, token_count=word_tokens)
        .orderBy("doc_id", "pos")
        .collect()
    )
    assert out
    sent_re = re.compile(chunking.SENTENCE_REGEX)
    default = chunking.chunk_hybrid(docs, budget, 3).orderBy("doc_id", "pos").collect()
    for r in out:
        assert r.n_tokens == word_tokens(r.content)
        if r.n_tokens > budget:
            assert len(sent_re.findall(r.content)) <= 1
    # the injected tokenizer actually changed the packing (word counts
    # differ from BPE-ish counts), so the seam is live, not decorative
    assert [(r.doc_id, r.pos, r.content) for r in out] != [
        (r.doc_id, r.pos, r.content) for r in default
    ]


def test_hybrid_overlap_carries_trailing_sentences(spark):
    """With overlap > 0, each next chunk starts with the trailing
    sentence(s) of its predecessor (token-bounded carry)."""
    sents = [f"Sentence number {i} right here." for i in range(12)]
    docs = spark.createDataFrame([(1, " ".join(sents))], "doc_id long, text string")
    # each sentence is 9 BPE-ish tokens; overlap 10 carries exactly one
    with_ov = chunking.chunk_hybrid(docs, 20, 10).orderBy("pos").collect()
    no_ov = chunking.chunk_hybrid(docs, 20, 0).orderBy("pos").collect()
    assert len(with_ov) >= 2
    for prev, nxt in zip(with_ov, with_ov[1:]):
        # the chunk's first sentence is the carried suffix of prev
        assert nxt.content.split(".")[0] + "." in prev.content
    # overlap must add coverage, never lose it: all source sentences
    # appear in order in both variants
    for out in (with_ov, no_ov):
        joined = " ".join(r.content for r in out)
        for s in sents:
            assert s in joined


def test_hybrid_keeps_trailing_unterminated_fragment(spark):
    """HybridChunker is lossless: text after the last sentence
    terminator must land in a chunk, not vanish (chunk_sentence keeps
    the reference packer's drop semantics; hybrid must not)."""
    docs = spark.createDataFrame(
        [(1, "First sentence here. trailing fragment with no period")],
        "doc_id long, text string",
    )
    out = chunking.chunk_hybrid(docs, 100, 0).collect()
    joined = " ".join(r.content for r in out)
    assert "trailing fragment with no period" in joined
    assert "First sentence here." in joined


def test_hybrid_deterministic(spark, docs):
    a = chunking.chunk_hybrid(docs, 40, 10).orderBy("doc_id", "pos").collect()
    b = chunking.chunk_hybrid(docs, 40, 10).orderBy("doc_id", "pos").collect()
    assert a == b


def test_fixed_chunker_unicode_reconstruction(spark):
    # CJK + emoji: Spark length/substring count UTF-16 code units, so
    # surrogate-pair emoji occupy 2 units — slices may split a pair at a
    # boundary, but concatenation must still reconstruct the original
    rows = [
        (1, "中文文本处理测试，分块器必须正确。" * 10),
        (2, "mixed 中文 and ascii words " * 8),
        (3, "emoji 🚀🔥🎉 payload " * 12),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    chunks = chunking.chunk_fixed(docs, 7).toPandas()
    src = {r["doc_id"]: r["text"] for r in docs.collect()}
    for doc_id, grp in chunks.groupby("doc_id"):
        joined = "".join(grp.sort_values("pos")["content"])
        assert joined == src[doc_id]


def test_sentence_udtf_lateral_join(spark):
    from data_pipeline2_spark.operators.chunking import sentence_udtf_class

    spark.udtf.register("split_sentences", sentence_udtf_class())
    df = spark.createDataFrame(
        [(1, "One. Two! Three?"), (2, "no terminator"), (3, None)],
        "doc_id long, text string",
    )
    df.createOrReplaceTempView("udtf_docs")
    rows = spark.sql(
        """
        SELECT d.doc_id, s.pos, s.sentence
        FROM udtf_docs d, LATERAL split_sentences(d.text) s
        ORDER BY d.doc_id, s.pos
        """
    ).collect()
    assert [(r.doc_id, r.pos, r.sentence) for r in rows] == [
        (1, 0, "One."),
        (1, 1, "Two!"),
        (1, 2, "Three?"),
    ]
    # matches the Catalyst sentences() splitter on the same input
    from data_pipeline2_spark.functions.text import sentences
    import pyspark.sql.functions as F

    cat = (
        df.filter(F.col("doc_id") == 1)
        .select(F.explode(sentences(F.col("text"))).alias("s"))
        .collect()
    )
    assert [c.s.strip() for c in cat] == ["One.", "Two!", "Three?"]


def test_hybrid_leading_terminator_no_duplication(spark):
    """Text starting with a bare terminator must not re-append the whole
    document as a phantom tail unit (each sentence packed exactly once
    when overlap=0)."""
    docs = spark.createDataFrame(
        [(1, "! Hello there. Bye bye now.")], "doc_id long, text string"
    )
    out = chunking.chunk_hybrid(docs, 100, 0).collect()
    joined = " ".join(r.content for r in out)
    assert joined.count("Hello there.") == 1
    assert joined.count("Bye bye now.") == 1
