"""Round-7 registry keys: banding-recall eval for the aHash near-dup
join, plus the round's new operator surface.

Reference parity: the reference's media-asset near-dup path is the
ES `dense_vector` script-score (services/search_service.py) — the
banded Hamming join re-expresses that as a Spark-native LSH; the eval
here is the measured counterpart of its recall claims.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline2_spark.operators import multimodal
from data_pipeline2_spark.registry._core import _register, _t
from data_pipeline2_spark.registry.curation_r6 import _AHASH_PX_CTES

# Eval threshold: deliberately ABOVE the pigeonhole-complete regime
# (bands-1 = 7) so the recorded curve shows where banded recall decays
# — the number a media-lake operator needs before widening a dedup
# threshold past the guarantee.
_BAND_EVAL_MAX_HAMMING = 24


@_register(
    "image_ahash_band_eval",
    f"""
    WITH {_AHASH_PX_CTES},
    bnd AS (
      SELECT asset_id, k,
             CASE WHEN k < 4 THEN (hash_lo >> (k * 8)) & 255
                  ELSE (hash_hi >> ((k - 4) * 8)) & 255 END AS bv
      FROM hashes, generate_series(0, 7) AS t(k)
    ), cand AS (
      SELECT DISTINCT a.asset_id AS id_a, b.asset_id AS id_b
      FROM bnd a JOIN bnd b
        ON a.k = b.k AND a.bv = b.bv AND a.asset_id < b.asset_id
    ), allp AS (
      SELECT a.asset_id AS id_a, b.asset_id AS id_b,
             CAST(bit_count(xor(a.hash_hi, b.hash_hi))
                  + bit_count(xor(a.hash_lo, b.hash_lo)) AS INT) AS hamming
      FROM hashes a JOIN hashes b ON a.asset_id < b.asset_id
    ), tru AS (
      SELECT hamming, count(*) AS n_true FROM allp
      WHERE hamming <= {_BAND_EVAL_MAX_HAMMING} GROUP BY hamming
    ), fnd AS (
      SELECT p.hamming, count(*) AS n_found
      FROM allp p JOIN cand c ON p.id_a = c.id_a AND p.id_b = c.id_b
      WHERE p.hamming <= {_BAND_EVAL_MAX_HAMMING} GROUP BY p.hamming
    )
    SELECT t.hamming, t.n_true,
           COALESCE(f.n_found, 0)::BIGINT AS n_found,
           round(COALESCE(f.n_found, 0) / t.n_true, 6) AS recall
    FROM tru t LEFT JOIN fnd f USING (hamming)
    """,
)
def q_image_ahash_band_eval(spark, sf_dir):
    """Banded-join recall vs exact all-pairs ground truth, per Hamming
    distance (the dedup_lsh_eval mold for the image path): recall is
    1.0 for d <= 7 by pigeonhole, measured (not asserted) for
    8 <= d <= 24. Ground truth uses the exact=True crossJoin —
    fixture-scale-only by construction; the banded candidate set is
    the exported production plan."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 120)
    hashes = multimodal.image_ahash(
        multimodal.gif_assets(docs), codec="gif"
    )
    truth = multimodal.ahash_dup_pairs(
        hashes, max_hamming=_BAND_EVAL_MAX_HAMMING, exact=True
    )
    banded = multimodal.ahash_dup_pairs(
        hashes, max_hamming=_BAND_EVAL_MAX_HAMMING
    )
    tc = truth.groupBy("hamming").agg(F.count(F.lit(1)).alias("n_true"))
    fc = banded.groupBy("hamming").agg(F.count(F.lit(1)).alias("n_found"))
    return tc.join(fc, "hamming", "left").select(
        "hamming",
        "n_true",
        F.coalesce(F.col("n_found"), F.lit(0)).cast("long").alias("n_found"),
        F.round(
            F.coalesce(F.col("n_found"), F.lit(0)) / F.col("n_true"), 6
        ).alias("recall"),
    )
