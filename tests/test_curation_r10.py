"""training_pipeline_e2e semantic tests on a constructed micro-corpus:
every stage of the composition must act at least once and the census
accounting (rows_in chaining, per-stage drop reasons) must match the
hand-derived expectation. Value parity vs the stage-replaying DuckDB
oracle is covered by test_oracle_parity + the lake gates.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from data_pipeline2_spark.operators import pipeline_e2e

# 20 clearly-distinct good docs: ids 0..19 become the eval suite (the
# 20 lowest surviving ids). Distinct leading words keep their 5-gram
# sets disjoint so none of them contaminates another.
_EVAL_WORDS = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
    "oscar", "papa", "quebec", "romeo", "sierra", "tango",
]


def _good(w: str) -> str:
    return (
        f"The {w} expedition crossed the northern ridge before dawn. "
        f"Every {w} journal entry recorded clear weather and steady "
        f"progress toward the {w} summit camp."
    )


_NEAR_A = (
    "Measured rainfall totals across the coastal basin exceeded the "
    "seasonal average for a third consecutive year according to the "
    "survey published on Friday morning."
)
# one word changed ("Friday" -> "Monday"): trigram Jaccard ~0.9, far
# above the 0.6 gate; LSH candidacy verified empirically below (the
# hash family is fixed literals, so candidacy is deterministic forever)
_NEAR_B = _NEAR_A.replace("Friday", "Monday")

_ROWS = (
    [(i, _good(_EVAL_WORDS[i]), "en", "micro", None) for i in range(20)]
    # id 20: verbatim copy of eval doc 0 -> 100% 5-gram overlap ->
    # dropped at decontamination
    + [(20, _good(_EVAL_WORDS[0]), "en", "micro", None)]
    # ids 21/22: byte-identical text -> exact dedup keeps 21
    + [
        (21, "Identical archival record retained for provenance checks.",
         "en", "micro", None),
        (22, "Identical archival record retained for provenance checks.",
         "en", "micro", None),
    ]
    # ids 23/24: near-duplicates -> MinHash pair -> CC keeps 23
    + [(23, _NEAR_A, "en", "micro", None), (24, _NEAR_B, "en", "micro", None)]
    # id 25: digits-only -> quality < 0.5 -> dropped at the gate
    + [(25, "1 2 3 4 5 6 7 8 9 0", "en", "micro", None)]
    # id 26: NULL text -> quality NULL -> dropped at the gate
    + [(26, None, "en", "micro", None)]
    # id 27: ordinary unique survivor
    + [(27, "A single uneventful bulletin about harbor maintenance "
            "schedules closed the week.", "en", "micro", None)]
)


@pytest.fixture(scope="module")
def micro(spark):
    df = spark.createDataFrame(
        [(i, t, l, s, None) for i, t, l, s, _ in _ROWS],
        "doc_id long, text string, lang string, source string, pad string",
    ).select(
        "doc_id", "text", "lang", "source",
        F.coalesce(F.length("text"), F.lit(0)).cast("long").alias("n_chars"),
    )
    return df


def _split_of(doc_id: int, salt: str = "e2e") -> str:
    p = hashlib.md5(f"{salt}|{doc_id}".encode()).hexdigest()[:2]
    if p < "e6":
        return "train"
    if p < "f3":
        return "val"
    return "test"


def test_census_accounting(micro):
    rows = {
        r["stage"]: r
        for r in pipeline_e2e.training_pipeline_census(micro).collect()
    }
    assert len(rows) == 8
    # stage chaining: rows_in of each doc-grain stage = prior rows_out
    assert rows["ingest"]["rows_in"] == rows["ingest"]["rows_out"] == 28
    assert rows["quality_filter"]["rows_in"] == 28
    # 25 (digits) and 26 (NULL) drop at the quality gate
    assert rows["quality_filter"]["rows_out"] == 26
    assert rows["decontaminate"]["rows_in"] == 26
    # 20 eval docs leave the corpus + id 20 is contaminated
    assert rows["decontaminate"]["rows_out"] == 5
    assert rows["dedup_exact"]["rows_in"] == 5
    # id 22 is an exact duplicate of 21
    assert rows["dedup_exact"]["rows_out"] == 4
    assert rows["dedup_near"]["rows_in"] == 4
    # id 24 is a near-duplicate of 23 (verifies LSH candidacy too)
    assert rows["dedup_near"]["rows_out"] == 3
    # survivors 21/23/27 are all single-chunk at the 400-char budget
    assert rows["chunk"]["rows_in"] == 3
    assert rows["chunk"]["rows_out"] == 3
    # per-split packing: every survivor's est_tokens ~ tens, so each
    # populated split holds exactly one sequence
    expected_seqs = len({_split_of(i) for i in (21, 23, 27)})
    assert rows["pack_split"]["rows_in"] == 3
    assert rows["pack_split"]["rows_out"] == expected_seqs
    # all five expectation checks pass on the packed table
    assert rows["expect_gate"]["rows_in"] == pipeline_e2e.N_GATE_CHECKS
    assert rows["expect_gate"]["rows_out"] == pipeline_e2e.N_GATE_CHECKS


def test_census_schema_stable_on_empty(spark):
    empty = spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars long"
    )
    rows = pipeline_e2e.training_pipeline_census(empty).collect()
    assert len(rows) == 8
    by = {r["stage"]: r for r in rows}
    assert by["ingest"]["rows_out"] == 0
    # row_count_between(1, ...) must FAIL on an empty sequence table
    assert by["expect_gate"]["rows_out"] == pipeline_e2e.N_GATE_CHECKS - 1


# --------------------------------------------------- ivf_index_stream


def test_ivf_stream_layout_partitioned_and_retry_safe(spark, tmp_path):
    import os

    from pyspark.sql import functions as F

    from data_pipeline2_spark.operators import similarity
    from data_pipeline2_spark.sources.parquet import load_table
    from data_pipeline2_spark.streaming import stateful

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "embedding"
    )
    cents, _ = similarity._kmeans_trajectory(emb, 8, 2, "vec_id", "embedding")
    feed = str(tmp_path / "feed")
    layout = str(tmp_path / "layout")
    for p in range(3):
        emb.filter(F.pmod(F.col("vec_id"), F.lit(3)) == p).coalesce(
            1
        ).write.mode("append").parquet(feed)
    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    q = stateful.index_vectors_stream(
        stream, layout, str(tmp_path / "ckpt"), cents
    )
    q.awaitTermination()

    # physically partitioned by cell: probes prune at the file level
    cells = [d for d in os.listdir(layout) if d.startswith("cell=")]
    assert len(cells) >= 2
    # three real micro-batches reached the sink
    raw = spark.read.parquet(layout)
    assert raw.select("batch_id").distinct().count() == 3

    out = stateful.load_ivf_layout(spark, layout)
    assert out.count() == emb.count()

    # frozen-codebook incremental assignment == batch assignment
    batch = similarity.ivf_cell_assign(emb, cents)
    assert (
        out.join(batch.withColumnRenamed("cell", "bcell"), "vec_id")
        .filter(F.col("cell") != F.col("bcell"))
        .count()
        == 0
    )

    # a replayed batch (task retry) collapses by key on read-back
    sink = stateful.ivf_layout_sink(layout, cents)
    sink(emb.limit(20), batch_id=99)
    again = stateful.load_ivf_layout(spark, layout)
    assert again.count() == emb.count()


def test_ivf_stream_empty_layout_contract(spark, tmp_path):
    from data_pipeline2_spark.streaming import stateful

    out = stateful.load_ivf_layout(spark, str(tmp_path / "nowhere"))
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["vec_id", "cell"]


def test_ivf_layout_probe_prunes_partitions(spark, tmp_path):
    """The point of partitionBy(cell): a probe that touches n_probe
    cells must read ONLY those cells' files. Pin the partition filter
    in the scan plan so a layout regression (losing the partitioning)
    fails here, not at 100 TB."""
    from pyspark.sql import functions as F

    from data_pipeline2_spark.operators import similarity
    from data_pipeline2_spark.sources.parquet import load_table
    from data_pipeline2_spark.streaming import stateful

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "embedding"
    )
    cents, _ = similarity._kmeans_trajectory(emb, 8, 2, "vec_id", "embedding")
    layout = str(tmp_path / "layout")
    sink = stateful.ivf_layout_sink(layout, cents)
    sink(emb, batch_id=0)

    probe = spark.read.parquet(layout).filter(F.col("cell").isin([0, 1]))
    plan = probe._jdf.queryExecution().executedPlan().toString()
    scan = [l for l in plan.splitlines() if "FileScan" in l or "PartitionFilters" in l]
    assert any("PartitionFilters" in l and "cell" in l for l in plan.splitlines()), scan
    # and the probed rows really are only the two cells
    assert probe.select("cell").distinct().count() <= 2


# -------------------------------------------------- dedup_bbit_minhash


def test_bbit_estimator_semantics(spark):
    """Li & König b=1 estimator on constructed docs: identical texts
    match all 16 low bits (J_hat = 1.0, exact J = 1.0, err 0); the
    estimate is always a multiple of 1/8 after clamping; est_err =
    |jaccard - j_bbit| recomputes from the row's own columns."""
    from data_pipeline2_spark.operators import dedup

    base = (
        "measured rainfall totals across the coastal basin exceeded "
        "the seasonal average for a third consecutive year according "
        "to the survey published on friday morning"
    )
    rows = [
        (1, base), (2, base),                    # identical pair
        (3, base.replace("friday", "monday")),   # near-dup of 1/2
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        (r["doc_a"], r["doc_b"]): r
        for r in dedup.bbit_minhash_pairs(docs).collect()
    }
    assert (1, 2) in out
    r12 = out[(1, 2)]
    assert r12["n_match_bits"] == 16
    assert r12["j_bbit"] == 1.0
    assert r12["jaccard"] == 1.0
    assert r12["est_err"] == 0.0
    for r in out.values():
        assert 0 <= r["n_match_bits"] <= 16
        # clamped estimate on the 1/8 grid
        assert abs(r["j_bbit"] * 8 - round(r["j_bbit"] * 8)) < 1e-9
        assert r["j_bbit"] >= 0.0
        assert abs(r["est_err"] - round(abs(r["jaccard"] - r["j_bbit"]), 6)) < 1e-9


# --------------------------------------------- census property testing


def test_census_invariants_random_corpora(spark):
    """Structural invariants of the per-stage census over randomized
    small corpora (the lake gates cover specific corpora; this covers
    the space): doc-grain stages only ever shrink, rows_in chains
    stage to stage, chunk/pack grains are consistent, and the gate
    reports within [0, N_GATE_CHECKS]. Seeded RNG — deterministic."""
    import random

    rng = random.Random(20260816)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
             "river", "summit", "harbor", "ledger", "meadow", "quarry"]
    for trial in range(3):
        n = rng.randint(3, 28)
        rows = []
        for i in range(n):
            r = rng.random()
            if r < 0.1:
                text = None
            elif r < 0.2:
                text = " ".join(str(rng.randint(0, 9)) for _ in range(8))
            else:
                text = " ".join(
                    rng.choice(words) for _ in range(rng.randint(6, 40))
                ) + "."
            rows.append((i, text))
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        # no n_chars column: exercises the derive path
        by = {
            r["stage"]: r
            for r in pipeline_e2e.training_pipeline_census(docs).collect()
        }
        assert len(by) == 8
        c = {k: by[k]["rows_out"] for k in by}
        assert by["ingest"]["rows_in"] == by["ingest"]["rows_out"] == n
        # doc-grain monotone shrink through the drop stages
        assert n >= c["quality_filter"] >= c["decontaminate"]
        assert c["decontaminate"] >= c["dedup_exact"] >= c["dedup_near"]
        # rows_in chains
        assert by["quality_filter"]["rows_in"] == n
        assert by["decontaminate"]["rows_in"] == c["quality_filter"]
        assert by["dedup_exact"]["rows_in"] == c["decontaminate"]
        assert by["dedup_near"]["rows_in"] == c["dedup_exact"]
        assert by["chunk"]["rows_in"] == c["dedup_near"]
        assert by["pack_split"]["rows_in"] == c["dedup_near"]
        # chunk/pack grains: every surviving doc yields >= 1 chunk, and
        # sequences cannot exceed surviving docs (packing groups them)
        if c["dedup_near"] > 0:
            assert c["chunk"] >= c["dedup_near"]
            assert 1 <= c["pack_split"] <= c["dedup_near"]
        else:
            assert c["chunk"] == 0 and c["pack_split"] == 0
        assert by["expect_gate"]["rows_in"] == pipeline_e2e.N_GATE_CHECKS
        assert 0 <= c["expect_gate"] <= pipeline_e2e.N_GATE_CHECKS
