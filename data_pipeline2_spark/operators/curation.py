"""Corpus curation — the standard pretraining filter chain as ONE plan.

Composes the per-document text operators (quality features, language
ID, PII redaction, token budget) as column expressions over a single
scan, plus exact dedup as the only shuffle. This is the shape that
matters at 100 TB: a naive composition joins quality_score(docs),
lang_id(docs) and pii_redact(docs) on doc_id — three extra scans and
three extra shuffles for work that is per-row arithmetic. Here Catalyst
sees one Project over one scan, keeps everything in whole-stage
codegen, and pushes the quality/language/budget gates into the same
stage; the exact-dedup keeper set (hash-groupBy on a 64-hex key +
semi-join) is the only data movement.

Reference parity: the reference has no curation pass (its pipeline is
ingest→chunk→embed, document_processor.py:96-132); this is the
north-star LLM-data-pipeline surface mandated by BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_pipeline2_spark.operators import dedup
from data_pipeline2_spark.operators.textanalysis import (
    lang_pred_cols,
    pii_redact_col,
    quality_feature_cols,
)


def curate_corpus(
    documents: DataFrame,
    min_quality: float = 0.7,
    langs: tuple[str, ...] = ("en",),
    min_tokens: int = 5,
    max_tokens: int = 5000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Curated corpus → (doc_id, lang_pred, quality, n_tokens,
    text_redacted): exact-dedup keepers that pass the quality score,
    language allowlist and token budget, with PII redacted.

    Gates evaluate on the ORIGINAL text (redaction placeholders would
    perturb token counts and ratios); redaction applies to survivors
    only in the emitted column — Catalyst's lazy projection means the
    redaction regexes never run for filtered-out rows.
    """
    t = F.col(text_col)
    feats = quality_feature_cols(t)
    pred, _best = lang_pred_cols(t)
    kept = dedup.dedup_exact_drop(documents, id_col, text_col)
    return (
        kept.select(
            F.col(id_col).alias("doc_id"),
            pred.alias("lang_pred"),
            feats["quality"].alias("quality"),
            feats["n_tokens"].alias("n_tokens"),
            pii_redact_col(t).alias("text_redacted"),
        )
        .filter(
            (F.col("quality") >= min_quality)
            & F.col("lang_pred").isin(*langs)
            & F.col("n_tokens").between(min_tokens, max_tokens)
        )
    )


def decontaminate_semantic(
    corpus_emb: DataFrame,
    eval_emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    eval_id_col: str = "vec_id",
    eval_vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-space benchmark decontamination →
    (vec_id, max_sim, nearest_eval_id, contaminated).

    Complements the 5-gram lexical pass (decontaminate): paraphrased or
    reformatted eval leakage that shares no exact n-grams still sits
    next to the eval point in embedding space. Every corpus vector is
    scored against the broadcast eval set (eval sets are thousands of
    rows — driver-scale); max-sim + argmax come from one max_by over
    the crossJoin, so the corpus never shuffles and the output is one
    row per corpus doc. Ties break toward the smaller eval id for
    engine-portable determinism.
    """
    from data_pipeline2_spark.functions.vectors import cosine_similarity

    ev = eval_emb.select(
        F.col(eval_id_col).alias("__eid"), F.col(eval_vec_col).alias("__evec")
    )
    scored = corpus_emb.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("__v")
    ).crossJoin(F.broadcast(ev)).select(
        "vec_id",
        "__eid",
        F.round(cosine_similarity(F.col("__v"), F.col("__evec")), 6).alias(
            "__sim"
        ),
    )
    agg = scored.groupBy("vec_id").agg(
        F.max("__sim").alias("max_sim"),
        F.min_by("__eid", F.struct(-F.col("__sim"), F.col("__eid"))).alias(
            "nearest_eval_id"
        ),
    )
    return agg.select(
        "vec_id",
        "max_sim",
        "nearest_eval_id",
        (F.col("max_sim") >= F.lit(threshold)).alias("contaminated"),
    )
