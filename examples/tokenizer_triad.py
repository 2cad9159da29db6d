#!/usr/bin/env python3
"""The corpus-trained tokenizer triad, side by side — BPE (Sennrich
2016, merge ranks), WordPiece (Wu 2016, greedy longest-match), and the
SentencePiece unigram LM (Kudo 2018, Viterbi over piece
log-probabilities) — all fitted FROM the corpus with no external model
file, then applied distributedly, with per-tokenizer compression
reported on the held-out half.

Run: python examples/tokenizer_triad.py [sf_dir]
Default: /root/testdata/sf0.01
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main(sf_dir: str):
    from data_pipeline2_spark.operators import tokenizer
    from data_pipeline2_spark.session import get_spark
    from data_pipeline2_spark.sources.parquet import load_table

    spark = get_spark("dp2s-tokenizers")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")

    # --- BPE: merge ranks learned on the word-frequency table ---
    merges = tokenizer.bpe_train(docs, n_merges=200)
    bpe = tokenizer.bpe_tokenize_stats(docs, merges).agg(
        F.sum("n_words").alias("words"),
        F.sum("n_tokens").alias("pieces"),
        F.min("reconstructed_ok").alias("lossless"),
    ).collect()[0]
    print(
        f"BPE        merges={len(merges):>5}  words={bpe['words']:>8} "
        f"pieces={bpe['pieces']:>8}  pieces/word="
        f"{bpe['pieces'] / max(bpe['words'], 1):.3f}  "
        f"lossless={bpe['lossless']}"
    )

    # --- WordPiece: vocab from train residues, held-out apply ---
    init, cont = tokenizer.wordpiece_vocab(docs)
    wp = tokenizer.wordpiece_tokenize_stats(docs, init, cont).agg(
        F.sum("n_words").alias("words"),
        F.sum("n_pieces").alias("pieces"),
        F.sum("n_unk_words").alias("unk"),
    ).collect()[0]
    print(
        f"WordPiece  vocab={len(init) + len(cont):>6}  "
        f"words={wp['words']:>8} pieces={wp['pieces']:>8}  "
        f"pieces/word={wp['pieces'] / max(wp['words'], 1):.3f}  "
        f"unk={wp['unk']}"
    )

    # --- Unigram LM: one EM round, Viterbi apply ---
    scores = tokenizer.unigram_lm_fit(docs)
    ulm = tokenizer.unigram_lm_tokenize_stats(docs, scores).agg(
        F.sum("n_words").alias("words"),
        F.sum("n_pieces").alias("pieces"),
        F.sum("n_unk_words").alias("unk"),
        F.sum("logprob_sum_scaled").alias("lp"),
    ).collect()[0]
    print(
        f"UnigramLM  pieces={len(scores):>5}  words={ulm['words']:>8} "
        f"pieces={ulm['pieces']:>8}  pieces/word="
        f"{ulm['pieces'] / max(ulm['words'], 1):.3f}  unk={ulm['unk']}  "
        f"held-out logprob={ulm['lp'] / 1e10:.1f}"
    )
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
