"""Physical-plan regression tests: the 100 TB design properties.

Correctness tests prove WHAT is computed; these prove HOW — filters
reach the parquet scan, dims broadcast, top-k avoids full sorts,
windows reuse partitioning. A regression here is a scale bug even when
results stay right.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline2_spark import registry

# driver-certification tier (see pytest.ini): -m driver selects the
# fast oracle/contract subset the verify harness runs each round
pytestmark = pytest.mark.driver

SF = "/root/testdata/sf0.001"
QUERIES = registry.queries()


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_point_lookup_filter_pushed_to_scan(spark):
    plan = plan_of(QUERIES["point_lookup_doc"](spark, SF))
    assert "PushedFilters" in plan
    assert "EqualTo(doc_id,42)" in plan.replace(" ", "").replace("`", "") or (
        "EqualTo(doc_id,42)" in plan
    )


def test_scan_prunes_columns(spark):
    # 2-column projection must not read the text column
    df = QUERIES["project_status"](spark, SF)
    plan = plan_of(df)
    scan_line = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "text" not in scan_line
    assert "doc_id" in scan_line and "lang" in scan_line


def test_q5_all_dims_broadcast(spark):
    plan = plan_of(QUERIES["q5_revenue_by_nation"](spark, SF))
    assert plan.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in plan


def test_sort_limit_is_take_ordered(spark):
    plan = plan_of(QUERIES["sort_limit"](spark, SF))
    assert "TakeOrderedAndProject" in plan


def test_q1_has_partial_aggregation(spark):
    plan = plan_of(QUERIES["q1_pricing_summary"](spark, SF))
    assert "partial" in plan.lower()  # map-side combine before shuffle


def test_chunk_enrich_single_shuffle(spark):
    # chunk_fixed repartitions by doc_id; the metadata windows must
    # reuse that partitioning: exactly one round-robin/hash exchange
    plan = plan_of(QUERIES["chunk_metadata_enrich"](spark, SF))
    n_exchange = plan.count("Exchange")
    assert n_exchange <= 2, f"expected <=2 exchanges, plan has {n_exchange}:\n{plan}"


def test_anti_join_stays_anti(spark):
    plan = plan_of(QUERIES["embedding_cache_lookup"](spark, SF))
    assert "LeftAnti" in plan


def test_knn_batch_broadcasts_queries(spark):
    plan = plan_of(QUERIES["knn_batch"](spark, SF))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    # corpus side must NOT shuffle before scoring: the only exchange is
    # the broadcast + the final per-qid window
    assert plan.count("Exchange hashpartitioning") <= 1


def test_semi_join_for_exists(spark):
    plan = plan_of(QUERIES["q4_order_priority"](spark, SF))
    assert "LeftSemi" in plan


def test_events_scan_not_repeated_per_window(spark):
    # sliding windows explode in-plan (no self-union of scans)
    plan = plan_of(QUERIES["events_sliding"](spark, SF))
    assert plan.count("FileScan parquet") == 1


def test_q7_no_sort_merge_at_dim_scale(spark):
    plan = plan_of(QUERIES["q7_volume_shipping"](spark, SF))
    assert plan.count("BroadcastHashJoin") >= 3  # supplier + both nation aliases
    assert "PushedFilters" in plan  # shipdate range reaches the scan


def test_decontaminate_broadcasts_eval_grams(spark):
    plan = plan_of(QUERIES["decontaminate"](spark, SF))
    # the eval-gram index is the broadcast side; corpus text never
    # joins as a shuffled side
    assert "BroadcastHashJoin" in plan


def test_curation_is_single_fused_projection(spark):
    plan = plan_of(QUERIES["corpus_curation"](spark, SF))
    # quality + lang + PII + budget must NOT appear as joins of separate
    # operator outputs: the only join is exact-dedup's semi-join
    assert plan.count("Join") <= 2  # semi join (+ AQE may label broadcast)
    # all three parquet scans belong to dedup (groupBy side, semi side,
    # null-text union branch) — a per-operator-join plan would scan 6x
    assert plan.count("Scan parquet") <= 3


def test_gap_fill_windows_reuse_key_partitioning(spark):
    plan = plan_of(QUERIES["events_gap_fill"](spark, SF))
    # grid join + series agg shuffle; the two LOCF windows must not add
    # exchanges beyond the join/agg ones (they sort within clustering)
    assert plan.count("Exchange") <= 5


def test_bm25_indexed_probe_pushes_term_filter(spark, tmp_path):
    """When the inverted index is a parquet table, the query-term filter
    must reach the postings scan (the probe is an index seek, not a
    corpus scan)."""
    import os

    from data_pipeline2_spark.operators.textanalysis import (
        bm25_search_indexed,
        build_text_index,
    )
    from data_pipeline2_spark.sources.parquet import load_table

    docs = load_table(spark, SF, "documents")
    idx = build_text_index(docs)
    pdir = os.path.join(str(tmp_path), "postings")
    idx["postings"].write.parquet(pdir)
    idx = dict(idx, postings=spark.read.parquet(pdir))
    plan = plan_of(bm25_search_indexed(idx, ["dup", "vector"], k=10))
    # the postings FileScan carries the term IN-filter (plan strings
    # truncate paths, so match the filter itself, not the location)
    scan_lines = [
        l
        for l in plan.splitlines()
        if "FileScan parquet" in l and "term" in l and "tf" in l
    ]
    assert scan_lines, f"no postings scan found:\n{plan}"
    assert any(
        "IN (dup,vector)" in l.replace("`", "") or "In(term" in l.replace("`", "")
        for l in scan_lines
    ), scan_lines


def test_dedup_near_embedding_default_is_not_all_pairs(spark):
    """VERDICT r1 'what's wrong' #1: the no-group default must generate
    candidates via LSH signature buckets (equi-join), never a cartesian
    all-pairs scan. All-pairs stays behind exact=True."""
    from data_pipeline2_spark.operators.dedup import dedup_near_embedding
    from data_pipeline2_spark.sources.parquet import load_table

    emb = load_table(spark, SF, "embeddings")
    plan = plan_of(dedup_near_embedding(emb, threshold=0.35))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    exact_plan = plan_of(dedup_near_embedding(emb, threshold=0.35, exact=True))
    assert (
        "CartesianProduct" in exact_plan
        or "BroadcastNestedLoopJoin" in exact_plan
    )


def test_image_ahash_pairs_default_is_not_all_pairs(spark):
    """VERDICT r6 'what's wrong' #1: the exported aHash near-dup join
    must be the banded LSH equi-join — the O(N^2) crossJoin stays
    behind exact=True (at a media-lake 1e8 images, all-pairs is 1e16
    comparisons regardless of broadcastability)."""
    plan = plan_of(QUERIES["image_ahash_pairs"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    from data_pipeline2_spark.operators.multimodal import (
        ahash_dup_pairs,
        gif_assets,
        image_ahash,
    )
    from data_pipeline2_spark.sources.parquet import load_table

    docs = load_table(spark, SF, "documents").limit(8)
    hashes = image_ahash(gif_assets(docs), codec="gif")
    exact_plan = plan_of(ahash_dup_pairs(hashes, exact=True))
    assert (
        "CartesianProduct" in exact_plan
        or "BroadcastNestedLoopJoin" in exact_plan
    )


def test_conversion_fixture_scan_prunes_to_id_column(spark):
    """The binary-conversion driver query derives payloads from ids —
    its parquet scan must read ONLY doc_id, never drag text/payload
    columns into the mapInPandas stage."""
    plan = plan_of(QUERIES["docling_convert"](spark, SF))
    scan_line = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "doc_id" in scan_line
    assert "text" not in scan_line and "lang" not in scan_line


def test_multimodal_meta_never_reads_payload_bytes(spark):
    """Metadata-only multimodal queries must not deserialize payloads
    beyond the projected columns: the scan reads only what asset_meta
    needs (doc_id + text for the derived fixture payload), and the
    real-decode query's scan reads only doc_id."""
    plan = plan_of(QUERIES["multimodal_decode"](spark, SF))
    scan_line = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "doc_id" in scan_line and "text" not in scan_line


def test_partsupp_family_broadcasts_all_dims(spark):
    """Derived-partsupp TPC-H family (q2/q11/q16/q20): partsupp is the
    only fact-sized side — every dimension (part filter, supplier,
    nation, region, the supplier-count scalar, the national total)
    must broadcast; a SortMergeJoin anywhere means a dim shuffled at
    fact scale."""
    for key in (
        "q2_min_cost_supplier",
        "q16_parts_supplier",
        "q20_potential_promotion",
    ):
        plan = plan_of(QUERIES[key](spark, SF))
        assert "SortMergeJoin" not in plan, f"{key} shuffled a join:\n{plan}"
        assert "BroadcastExchange" in plan, key


def test_q11_single_fact_aggregation(spark):
    """q11: the per-part value aggregate is the ONLY hash shuffle; the
    grand total re-enters as a broadcast single-row aggregate, never a
    second scan-sized exchange."""
    plan = plan_of(QUERIES["q11_important_stock"](spark, SF))
    assert "SortMergeJoin" not in plan
    assert "BroadcastExchange" in plan
    assert plan.count("Exchange hashpartitioning") <= 2


def test_palette_and_gif_decode_scan_only_ids(spark):
    """Pixel-decode fixture queries derive payloads from ids: their
    parquet scans must read ONLY doc_id — dragging text into the
    mapInPandas stage would ship the whole corpus through Arrow."""
    for key in ("multimodal_decode_palette", "multimodal_decode_gif"):
        plan = plan_of(QUERIES[key](spark, SF))
        scan_line = next(l for l in plan.splitlines() if "ReadSchema" in l)
        assert "doc_id" in scan_line, key
        assert "text" not in scan_line, key


def test_decontaminate_bloom_probe_is_vectorized_and_prejoin(spark):
    """The bloom probe must compile to ONE ArrowEvalPython (vectorized
    batch probe, not per-row Python), sitting BELOW the exact-verify
    join so only survivors enter it. No hint forces a broadcast: at
    test scale Catalyst may still broadcast the small eval side — the
    point is the plan stays a hash join either way and the probe
    filter runs first (deeper in the printed tree = later in string)."""
    plan = plan_of(QUERIES["decontaminate_bloom"](spark, SF))
    # 1 probe on the corpus-gram side; InferFiltersFromConstraints may
    # legally clone it onto the eval side too (join-key constraint —
    # true members always pass the bloom, so semantics are unchanged)
    assert 1 <= plan.count("ArrowEvalPython") <= 2
    assert "CartesianProduct" not in plan
    # the verify join appears ABOVE (before, in tree print order) the
    # bloom probe: survivors feed the join, not the other way round
    join_pos = min(
        (plan.find(j) for j in ("SortMergeJoin", "ShuffledHashJoin",
                                "BroadcastHashJoin") if plan.find(j) >= 0),
        default=-1,
    )
    assert 0 <= join_pos < plan.find("ArrowEvalPython")


def test_attribution_join_is_equi_keyed_not_cartesian(spark):
    """The interval self-join must keep user_id as the hash-join key
    with the time bound as a residual condition — never
    BroadcastNestedLoop / CartesianProduct (quadratic in events). The
    event_type filters must reach the parquet scan."""
    plan = plan_of(QUERIES["events_attribution"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan
    assert "EqualTo(event_type,view)" in plan
    assert "EqualTo(event_type,click)" in plan


def test_attribution_last_touch_single_extra_shuffle(spark):
    """Ranking per effect_id adds at most one exchange beyond the
    join's own key shuffles."""
    plan = plan_of(QUERIES["events_attribution_last"](spark, SF))
    assert plan.count("Exchange") <= 4
    assert "CartesianProduct" not in plan


def test_jpeg_decode_scan_only_ids(spark):
    """Fixture generation + decode must prune the documents scan to the
    id column — payload synthesis happens in the UDF, and text/meta
    columns never load."""
    plan = plan_of(QUERIES["multimodal_decode_jpeg"](spark, SF))
    assert "ReadSchema: struct<doc_id:bigint>" in plan


def test_knn_batch_pq_shuffle_carries_candidates_not_corpus(spark):
    """ADC search plan: ONE vectorized python stage (the per-batch
    LUT scoring), no cartesian, and the only wide exchanges operate on
    the (qid, vec_id, adc) candidate rows — never corpus vectors."""
    from data_pipeline2_spark.operators import similarity
    from data_pipeline2_spark.sources.parquet import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, SF, "embeddings")
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    plan = plan_of(similarity.knn_batch_pq(emb, q, k=3, rerank=20))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("MapInPandas") == 1


def test_knn_batch_ivfpq_prunes_before_scoring(spark):
    """IVF-PQ plan: the cell join restricts the corpus BELOW the ADC
    scoring stage (join appears deeper in the tree than MapInPandas),
    so pruning happens before any python stage touches rows."""
    from data_pipeline2_spark.operators import similarity
    from data_pipeline2_spark.sources.parquet import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, SF, "embeddings")
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    plan = plan_of(
        similarity.knn_batch_ivfpq(emb, q, k=3, n_probe=2, rerank=20)
    )
    assert "CartesianProduct" not in plan
    mip = plan.find("MapInPandas")
    assert mip >= 0
    # a join exists below the scoring stage (cell restriction)
    assert "Join" in plan[mip:]


def test_duplicate_ngram_spans_is_take_ordered(spark):
    """Top-spans must be a TakeOrderedAndProject (per-partition heaps +
    driver merge of top rows), never a global sort of every gram."""
    from data_pipeline2_spark.operators import dedup
    from data_pipeline2_spark.sources.parquet import load_table

    docs = load_table(spark, SF, "documents")
    plan = plan_of(dedup.duplicate_ngram_spans(docs))
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_near_dup_stats_single_row_combines_without_cartesian(spark):
    """The three summary aggregates combine via 1x1-row joins — the plan
    must never contain a CartesianProduct over data-sized inputs."""
    from data_pipeline2_spark.operators import dedup
    from data_pipeline2_spark.sources.parquet import load_table

    docs = load_table(spark, SF, "documents")
    plan = plan_of(dedup.near_dup_stats(docs))
    assert "CartesianProduct" not in plan


def test_sessionize_single_exchange(spark):
    """Gap-rule sessionization = one hash exchange on user_id; the lag
    and the running sum share the same window ordering."""
    from data_pipeline2_spark.sources.parquet import load_table
    from data_pipeline2_spark.streaming.events import sessionize

    evt = load_table(spark, SF, "events")
    plan = plan_of(sessionize(evt))
    assert plan.count("Exchange hashpartitioning") == 1


def test_pagerank_no_cartesian_and_broadcast_count(spark):
    """Each PageRank iteration = edge join + aggregation; the node
    count enters via a broadcast single-row aggregate — the plan must
    contain BroadcastNestedLoopJoin only for those 1-row joins and no
    CartesianProduct."""
    from data_pipeline2_spark.operators.dedup import pagerank_pairs

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "doc_a long, doc_b long"
    )
    plan = plan_of(pagerank_pairs(pairs, n_iter=2))
    assert "CartesianProduct" not in plan


def test_term_cooccurrence_single_scan(spark):
    """The lead()-offset formulation must touch the documents scan ONCE
    (the rejected self-join scanned it twice)."""
    from data_pipeline2_spark.operators.textanalysis import term_cooccurrence
    from data_pipeline2_spark.sources.parquet import load_table

    docs = load_table(spark, SF, "documents")
    plan = plan_of(term_cooccurrence(docs))
    assert plan.count("Scan parquet") == 1
