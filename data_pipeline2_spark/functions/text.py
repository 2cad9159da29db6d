"""Text expression helpers shared by chunking / dedup / text-analysis.

All pure Catalyst expressions (JVM-side). Tokenization is defined once
here so every operator (and its DuckDB oracle) agrees on word
boundaries: split on runs of whitespace after trim.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# the reference's sentence regex (docling_service.py:103), sans capture
# group: one or more non-terminators followed by one or more terminators.
SENTENCE_REGEX = r"[^.!?]+[.!?]+"

# The engine's whitespace definition is ASCII everywhere: JVM regex \s
# ([ \t\n\x0B\f\r]) and RE2 \s in the DuckDB oracles are ASCII-only, so
# Python seams must not silently widen whitespace to Unicode (str.strip()
# / str.split() / re's default \s also cover \xa0,  , 　, ... —
# the ADVICE r8 divergence class). Every Python-side strip/split in an
# oracled operator pins to this set (or passes re.ASCII).
ASCII_WS = " \t\n\r\x0b\x0c"


def tokens(text: Column) -> Column:
    """array<string> of whitespace-delimited tokens; [] for blank text."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def sentences(text: Column) -> Column:
    """array<string> of sentences per the reference regex; [] if none."""
    return F.regexp_extract_all(text, F.lit(SENTENCE_REGEX), 0)


def normalized(text: Column) -> Column:
    """Whitespace-collapsed, lowercased content — dedup/fingerprint key."""
    return F.lower(F.regexp_replace(F.trim(text), r"\s+", " "))


def content_hash(text: Column) -> Column:
    """sha256 hex of normalized content (exact-dedup key).

    The reference uses sha256 for its deterministic search-cache keys
    (search_cache.py:18-33); same primitive here.
    """
    return F.sha2(normalized(text), 256)


def word_ngrams(text: Column, n: int) -> Column:
    """array<string> of word n-gram shingles ('w1 w2 w3').

    Built by zipping the token array with its own n−1 shifted slices
    rather than transform-over-positions: zip_with evaluates each array
    argument ONCE per row, while the old per-position lambda captured
    `toks` (a split) and re-evaluated it for EVERY position —
    O(len²/doc), measured 6.3× slower at a 26M-shingle corpus
    (106 → 17 s; BENCH_NOTES round 9b). Output identical, including
    the <n-token empty-array contract."""
    toks = tokens(text)
    cnt = F.size(toks)
    z = toks
    for k in range(1, n):
        shifted = F.slice(toks, k + 1, F.greatest(cnt - k, F.lit(0)))
        z = F.zip_with(z, shifted, lambda x, y: F.concat_ws(" ", x, y))
    out = F.slice(z, 1, F.greatest(cnt - (n - 1), F.lit(0)))
    return F.when(cnt < n, F.array().cast("array<string>")).otherwise(out)


def array_pairs(arr: Column, a_name: str = "a", b_name: str = "b") -> Column:
    """All (arr[i], arr[j]) struct pairs with i < j, generated INSIDE
    the row — the map-side combinator behind market-basket pair mining
    and cross-source shingle overlap (no self-join, no extra shuffle).
    Pass a sorted array to get pairs ordered a < b."""
    return F.flatten(
        F.transform(
            arr,
            lambda x, i: F.transform(
                F.slice(arr, i + 2, F.size(arr)),
                lambda y: F.struct(x.alias(a_name), y.alias(b_name)),
            ),
        )
    )
