"""Real byte-pair-encoding subword tokenizer — train + apply.

The reference delegates token counting to docling's HF tokenizer
(doc_pipeline/services/docling_service.py:212-236, model
BAAI/bge-small-en-v1.5 per config/settings.py:50); the engine's
chunkers use a deterministic estimator plus an injection seam. This
module supplies the third option: an actual BPE learned FROM the
corpus, no external model file.

Scale shape (the standard two-phase tokenizer pattern):
- `bpe_train` is driver-side on a BOUNDED word-frequency table — the
  distributed part is one groupBy over exploded words (shuffle =
  distinct words, not text), then the merge loop runs over at most
  `max_words` (freq, word) pairs in numpy-free pure Python: the same
  train-on-aggregates economics as the IVF/PQ fits (Sennrich et al.
  2016 — the algorithm is public).
- `bpe_tokenize` broadcasts the merge ranks (a dict of string pairs —
  KBs) and applies them per Arrow batch via mapInPandas: map-only over
  the corpus, no shuffle.

Correctness gate: BPE merges only ever CONCATENATE adjacent pieces of
the original word, so ''.join(tokens of word) == word exactly — the
`reconstructed_ok` invariant a SQL oracle can assert as constant true
while the merge table itself stays non-SQL-replayable.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ASCII whitespace ONLY — matching Spark's Java \s (bpe_train's split)
# and the DuckDB oracle's RE2 \s exactly; Python's Unicode-aware \S
# would split on U+00A0 etc. where the other two engines do not.
_WORD_RE = re.compile(r"[^ \t\n\r\f\v]+")
# End-of-word sentinel: a space can never appear inside a \\S+ word,
# so it is unambiguous; merges keep it as the suffix of the final
# piece.
END = " "
_TOKENIZE_SCHEMA = (
    "doc_id long, n_words long, n_word_chars long, n_tokens long, "
    "reconstructed_ok boolean, max_token_chars int"
)


def _words(text: str) -> list[str]:
    return _WORD_RE.findall(text.lower())


def bpe_train(
    documents: DataFrame,
    n_merges: int = 200,
    max_words: int = 20000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> list[tuple[str, str]]:
    """Learn `n_merges` BPE merges from the corpus word-frequency table.

    → ordered merge list [(left, right), ...] (rank = position).
    The frequency table is capped at the `max_words` most frequent
    words (deterministic ties by word) — the bounded driver artifact.
    """
    rows = (
        documents.select(
            F.explode(
                F.split(
                    F.lower(F.trim(F.col(text_col).cast("string"))), r"\s+"
                )
            ).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.col("w"))
        .limit(max_words)
        .collect()
    )
    vocab = {}
    for r in rows:
        pieces = tuple(r["w"].replace(END, "")) + (END,)
        if len(pieces) > 1:
            vocab[pieces] = vocab.get(pieces, 0) + int(r["n"])
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_freq: dict[tuple[str, str], int] = {}
        for pieces, n in vocab.items():
            for a, b in zip(pieces, pieces[1:]):
                pair_freq[(a, b)] = pair_freq.get((a, b), 0) + n
        if not pair_freq:
            break
        # deterministic: max frequency, ties by lexicographic pair
        best = max(pair_freq.items(), key=lambda kv: (kv[1], kv[0]))[0]
        if pair_freq[best] < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab = {}
        for pieces, n in vocab.items():
            out, i = [], 0
            while i < len(pieces):
                if (
                    i + 1 < len(pieces)
                    and pieces[i] == best[0]
                    and pieces[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(pieces[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + n
        vocab = new_vocab
    return merges


def _apply_merges(word: str, ranks: dict) -> list[str]:
    pieces = list(word) + [END]
    while len(pieces) > 1:
        best_rank, best_i = None, None
        for i, (a, b) in enumerate(zip(pieces, pieces[1:])):
            r = ranks.get((a, b))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        pieces[best_i : best_i + 2] = [pieces[best_i] + pieces[best_i + 1]]
    if pieces and pieces[-1] == END:
        pieces = pieces[:-1]
    elif pieces and pieces[-1].endswith(END):
        pieces[-1] = pieces[-1][: -len(END)]
    return [p for p in pieces if p]


def bpe_tokenize_stats(
    documents: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenize every document with the learned merges and reduce to
    driver-hashable invariants → (doc_id, n_words, n_word_chars,
    n_tokens, reconstructed_ok, max_token_chars).

    `reconstructed_ok`: for every word, ''.join(its tokens) == the
    normalized word — BPE merges can only concatenate, so any slicing /
    rank-ordering / sentinel bug breaks equality. `n_tokens <= total
    chars` and `n_tokens >= n_words` hold by construction and are
    enforced downstream by the oracle-checkable booleans in the
    registry query.
    """
    ranks = {pair: i for i, pair in enumerate(merges)}

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, text in zip(pdf["doc_id"], pdf["__text"]):
                words = _words(text or "")
                n_tok = 0
                ok = True
                longest = 0
                n_chars = 0
                for w in words:
                    n_chars += len(w)
                    toks = _apply_merges(w, ranks)
                    n_tok += len(toks)
                    if "".join(toks) != w:
                        ok = False
                    for t in toks:
                        longest = max(longest, len(t))
                rows.append(
                    (int(did), len(words), n_chars, n_tok, ok, longest)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_words", "n_word_chars", "n_tokens",
                    "reconstructed_ok", "max_token_chars",
                ],
            )

    return documents.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(text_col).cast("string").alias("__text"),
    ).mapInPandas(stats, _TOKENIZE_SCHEMA)
