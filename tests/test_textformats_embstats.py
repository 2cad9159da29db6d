"""Round-5 batch D tests: interchange roundtrips, embedding stats/SQ8/PCA."""

import pytest

from pyspark.sql import functions as F


ADVERSARIAL_DOCS = [
    (1, 'line one\nline "two" with, commas\n\ttabbed', "en", "s1", 40),
    (2, None, "de", "s1", 0),                      # NULL text survives
    (3, "", "fr", None, 0),                        # empty string != NULL
    (4, 'quotes "" doubled, trailing newline\n', "en", "s2", 36),
    (5, "unicode: café — 中文 \U0001f600", "und", "s2", 20),
]
SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


@pytest.mark.parametrize("fmt", ["jsonl", "csv"])
def test_format_roundtrip_lossless(spark, tmp_path, fmt):
    from data_pipeline2_spark.sources import text_formats as tf

    docs = spark.createDataFrame(ADVERSARIAL_DOCS, SCHEMA)
    path = str(tmp_path / fmt)
    if fmt == "jsonl":
        tf.write_jsonl(docs, path)
        back = tf.read_jsonl(spark, path, SCHEMA)
    else:
        tf.write_csv(docs, path)
        back = tf.read_csv(spark, path, SCHEMA)
    want = {r.doc_id: r for r in docs.collect()}
    got = {r.doc_id: r for r in back.collect()}
    assert set(got) == set(want)
    for k in want:
        assert got[k].text == want[k].text, (fmt, k)
        assert got[k].lang == want[k].lang
        assert got[k].source == want[k].source
        assert got[k].n_chars == want[k].n_chars


def test_csv_roundtrip_distinguishes_null_from_empty(spark, tmp_path):
    from data_pipeline2_spark.sources import text_formats as tf

    docs = spark.createDataFrame(ADVERSARIAL_DOCS, SCHEMA)
    path = str(tmp_path / "nullcsv")
    tf.write_csv(docs, path)
    back = {r.doc_id: r.text
            for r in tf.read_csv(spark, path, SCHEMA).collect()}
    assert back[2] is None
    assert back[3] == ""


def test_csv_write_rejects_sentinel_valued_cell(spark, tmp_path):
    """A real cell equal to CSV_NULL_SENTINEL would silently read back
    as NULL (ADVICE r5) — the writer's sentinel check fails fast."""
    from data_pipeline2_spark.sources import text_formats as tf

    rows = [(1, tf.CSV_NULL_SENTINEL, "en", "s1", 5)]
    docs = spark.createDataFrame(rows, SCHEMA)
    with pytest.raises(ValueError, match="NULL sentinel"):
        tf.write_csv(docs, str(tmp_path / "bad"))
    # opt-out still writes (documented hazard)
    tf.write_csv(docs, str(tmp_path / "bad"), check_sentinel=False)


def test_embedding_dim_stats_values(spark):
    from data_pipeline2_spark.operators.similarity import embedding_dim_stats

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [3.0, 0.0]), (3, [5.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    out = {r.pos: r for r in embedding_dim_stats(df).collect()}
    assert out[0].n == 3 and out[0].mean_v == 3.0
    assert out[0].var_v == pytest.approx(8 / 3, abs=1e-6)
    assert out[1].mean_v == 0.0 and out[1].var_v == 0.0  # dead dim


def test_quantize_int8_bound_and_constant_dim(spark):
    from data_pipeline2_spark.operators.similarity import quantize_int8

    df = spark.createDataFrame(
        [(i, [float(i), 7.0]) for i in range(10)],
        "vec_id long, embedding array<float>",
    )
    out = {r.vec_id: r for r in quantize_int8(df).collect()}
    assert all(r.within_bound for r in out.values())
    assert all(r.n_dims == 2 for r in out.values())
    # dim0 spans [0,9]: vec 0 -> code 0, vec 9 -> code 255 (+ const dim 0)
    assert out[0].code_sum == 0
    assert out[9].code_sum == 255


def test_pca_project_variance_ordering_and_bessel(spark):
    import numpy as np

    from data_pipeline2_spark.operators.similarity import pca_project

    rng = np.random.RandomState(7)
    # anisotropic cloud: dim0 dominates, then dim1, then noise
    x = rng.randn(200, 6) * np.array([10.0, 3.0, 1.0, 0.1, 0.1, 0.1])
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<float>",
    )
    rows = pca_project(df, k=3, sample_cap=200).collect()
    assert all(r.bessel_ok for r in rows)
    proj = np.array([r.proj for r in rows])
    variances = proj.var(axis=0)
    assert variances[0] > variances[1] > variances[2]
    assert variances[0] == pytest.approx(x.var(axis=0)[0], rel=0.3)


def test_pca_project_truncates_k_to_rank(spark):
    """Requesting more components than min(rows, dims) truncates, and
    the stamped k equals the actual projection length."""
    from data_pipeline2_spark.operators.similarity import pca_project

    df = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0]), (2, [2.0, 1.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    rows = pca_project(df, k=5, sample_cap=10).collect()
    for r in rows:
        assert r.k == len(r.proj) == 2  # rank = min(2 rows, 3 dims)
        assert r.bessel_ok
