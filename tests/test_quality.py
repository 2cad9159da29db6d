"""Planted-fixture value tests for the round-5 quality/corpus operators."""

import pytest

from data_pipeline2_spark.operators import quality


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


GOOD = (
    "The quick brown fox jumps over the lazy dog and runs far away. "
    "It is a fine day to be out in the field with friends and family. "
) * 3  # ~78 words, all rules pass


def test_gopher_quality_planted(spark):
    rows = [
        (1, GOOD),
        (2, "short text only"),  # < 50 words
        (3, "- one\n- two\n- three"),  # all bullet lines
        (4, "### " * 60),  # symbol-heavy, no stopwords
        (5, None),  # dropped
    ]
    out = {
        r.doc_id: r
        for r in quality.gopher_quality(_docs(spark, rows)).collect()
    }
    assert set(out) == {1, 2, 3, 4}
    assert out[1].gopher_pass is True
    assert out[1].stopword_hits >= 2 and out[1].alpha_word_frac == 1.0
    assert out[2].gopher_pass is False and out[2].n_words == 3
    assert out[3].bullet_line_frac == 1.0 and out[3].gopher_pass is False
    assert out[4].symbol_word_ratio >= 1.0 and out[4].gopher_pass is False


def test_gopher_ellipsis_and_mean_len(spark):
    rows = [(1, "waiting...\nstill waiting...\ndone now.")]
    r = quality.gopher_quality(_docs(spark, rows)).collect()[0]
    assert r.ellipsis_line_frac == pytest.approx(2 / 3, abs=1e-6)
    assert r.n_words == 5


def test_c4_quality_planted(spark):
    rows = [
        (1, "This is a good first sentence here. And a second one too. "
            "Finally a third sentence appears."),
        (2, "Lorem ipsum dolor sit amet. More words here now. Third one."),
        (3, "function f() { return 1; } enable javascript to view"),
        (4, "one line no punct"),
    ]
    out = {r.doc_id: r for r in quality.c4_quality(_docs(spark, rows)).collect()}
    assert out[1].c4_pass is True and out[1].n_sentences == 3
    assert out[2].has_lorem_ipsum is True and out[2].c4_pass is False
    assert out[3].has_brace is True and out[3].n_javascript_lines == 1
    assert out[4].n_sentences == 0 and out[4].term_punct_line_frac == 0.0


def test_dup_line_stats_planted(spark):
    text = "alpha beta\nunique one\nalpha beta\nalpha beta\nanother line"
    out = quality.dup_line_stats(_docs(spark, [(1, text)])).collect()[0]
    # 5 lines, 'alpha beta' x3 -> 2 repeat occurrences
    assert out.n_lines == 5
    assert out.dup_line_frac == pytest.approx(2 / 5, abs=1e-6)
    # chars: 3*10 + 10 + 12 = 52; dup chars = 2*10
    assert out.dup_line_char_frac == pytest.approx(20 / 52, abs=1e-6)


def test_url_stats_planted(spark):
    rows = [
        (1, "see https://example.com/x and http://a.b now"),
        (2, "no links at all"),
    ]
    out = {r.doc_id: r for r in quality.url_stats(_docs(spark, rows)).collect()}
    assert out[1].n_urls == 2 and out[1].has_url is True
    assert out[1].url_char_frac > 0.4
    assert out[2].n_urls == 0 and out[2].url_char_frac == 0.0


def test_token_rarity_planted(spark):
    rows = [
        (1, "common common common rareword"),
        (2, "common common othertoken"),
    ]
    out = {
        r.doc_id: r for r in quality.token_rarity(_docs(spark, rows)).collect()
    }
    # 'common' appears 5x; 'rareword'/'othertoken' once each (<=2 -> rare)
    assert out[1].n_tokens == 4 and out[1].freq_sum == 3 * 5 + 1
    assert out[1].rare_tokens == 1
    assert out[2].rare_frac == pytest.approx(1 / 3, abs=1e-6)


def test_vocab_stats_planted(spark):
    rows = [(1, "a a b c"), (2, "a d")]
    r = quality.vocab_stats(_docs(spark, rows)).collect()[0]
    assert r.total_tokens == 6 and r.vocab_size == 4
    assert r.hapax_count == 3  # b, c, d
    assert r.hapax_frac == 0.75


def test_source_overlap_planted(spark):
    base = "one two three four five six"
    rows = [
        (1, base, "A"),
        (2, base + " seven eight", "B"),  # contains all of A's shingles
        (3, "totally different words here now", "C"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {
        (r.source_a, r.source_b): r
        for r in quality.source_overlap(df).collect()
    }
    ab = out[("A", "B")]
    assert ab.containment_a == 1.0  # A fully contained in B
    assert ab.n_b == ab.n_a + 2
    assert ("A", "C") not in out and ("B", "C") not in out  # zero overlap


def test_quality_filters_are_map_side(spark):
    """gopher/c4/url metrics must not shuffle: single-stage plans."""
    df = _docs(spark, [(1, GOOD)])
    for op in (quality.gopher_quality, quality.c4_quality, quality.url_stats):
        plan = op(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"{op.__name__} shuffles: {plan}"


def test_heavy_hitters_sketch_matches_exact(spark):
    """Space-saving candidates + exact verify == the exact threshold
    answer, under a tiny candidate cap and many partitions (stress the
    no-false-negative guarantee)."""
    from data_pipeline2_spark.operators.textanalysis import (
        heavy_hitters_sketch,
    )

    # zipf-ish corpus: 'hot' dominates, 'warm' passes phi=10, rest don't
    rows = [(i, "hot " * 30 + "warm " * 12 + f"cold{i} unique{i}")
            for i in range(20)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string"
    ).repartition(16)
    out = heavy_hitters_sketch(df, phi=10, candidate_cap=16)
    got = {r.term: r.occurrences for r in out.collect()}
    n = 20 * 44
    assert got == {"hot": 600, "warm": 240}
    assert all(c * 10 > n for c in got.values())


def test_gopher_c4_handle_crlf_lines(spark):
    """CRLF corpora: a trailing \\r must not defeat the line-suffix
    rules (ellipsis-ended, terminal-punctuation)."""
    crlf = "waiting...\r\nstill waiting...\r\ngood sentence here.\r\n"
    g = quality.gopher_quality(_docs(spark, [(1, crlf)])).collect()[0]
    assert g.ellipsis_line_frac == pytest.approx(2 / 3, abs=1e-6)
    crlf2 = "ends with period.\r\nno trailing punct\r\n"
    c = quality.c4_quality(_docs(spark, [(1, crlf2)])).collect()[0]
    assert c.n_lines == 2
    assert c.term_punct_line_frac == pytest.approx(1 / 2, abs=1e-6)


def test_curation_report_single_scan_and_values(spark):
    """The fused report must match the composed per-doc operators and
    keep the one-scan plan shape (no joins, <=1 exchange)."""
    rows = [
        (1, GOOD, "A"),
        (2, "short", "A"),
        (3, None, "A"),
        (4, GOOD, "B"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    rep = {r.source: r for r in quality.curation_report(df).collect()}
    assert rep["A"].n_docs == 3 and rep["A"].n_null_text == 1
    assert rep["A"].gopher_pass_rate == 0.5  # GOOD passes, 'short' fails
    assert rep["B"].gopher_pass_rate == 1.0
    assert 0.0 < rep["A"].mean_quality <= 1.0
    plan = quality.curation_report(df)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # fused, not three operators joined
    n_ex = plan.count("Exchange hashpartitioning") + plan.count(
        "Exchange rangepartitioning"
    )
    assert n_ex <= 1
