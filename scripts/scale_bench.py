#!/usr/bin/env python3
"""Empirical scale validation (VERDICT r3 item 4): replicate sf0.1 by
FACTOR into a temp lake, run the most expensive operators at both
scales, and record wall + shuffle read/write per query so SCALE.md's
per-family shuffle arithmetic is measured, not just argued.

Replication is scale-faithful, not copy-paste: replicas must not be
near-duplicates of each other or every dedup/LSH candidate set would
explode combinatorially (a 10x copied corpus has 45 exact dups per doc
— that benchmarks the pathological corpus, not the operator). So each
replica perturbs content deterministically:
- documents: every word suffixed with the replica id for r > 0
  (shingle sets fully disjoint across replicas — a cyclic rotation was
  tried first and rejected: rotating a word list preserves ~(1 - n/len)
  of its n-gram shingles, so replicas were near-dups of each other and
  the x10 run measured a pathological 45-dups-per-doc corpus; that
  stress result is recorded in BENCH_NOTES.md);
- embeddings: vector rotated by replica (norms preserved, clusters
  spread);
- orders/lineitem: order keys offset per replica (dims stay fixed, as
  they would at a real 10x: customers/suppliers grow sublinearly);
- events: user_id/event_id offset per replica (10x users, same window
  density per user).

Usage: python scripts/scale_bench.py [--factor 10] [--reps 2]
Prints one JSON line per operator and a markdown table on stderr.

--skew (VERDICT r7 item 3): real 100 TB event data is zipfian, not
uniform — the uniform replica multiplies rows per user evenly, so it
never exercises the "full shuffle on a skewed key" failure class. With
--skew, replicas r >= 1 REMAP their keys onto a geometrically
shrinking prefix of the base key space (user_id % (n_users >> r),
o_custkey % (n_cust >> r)): the hottest users/customers accumulate
events from every replica (the last replica lands ~F*rows/2^(F-1) on
a handful of keys), approximating a zipf head while staying fully
deterministic. Ops run against BOTH the uniform and the skewed x-F
lake in one session, and the report carries skew/uniform wall ratios
per key. --skew also runs the salted-join engagement demo: the same
hot-key join with broadcast + AQE skew handling disabled, plain vs
plans/skew.salted_join, to prove the salted path actually spreads the
hot key rather than just existing.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"
OPS = [
    "dedup_near_minhash",
    "knn_batch_lsh",
    "knn_batch_ivf_exact",
    "knn_batch_ivfpq",
    "chunk_sentence",
    "q5_revenue_by_nation",
    "events_sliding",
    # round-5 additions: the new shuffle-bearing operators
    "market_basket",     # basket arrays -> map-side pair counts
    "token_rarity",      # exploded-token join vs the unigram table
    "source_overlap",    # shingle-grouped source sets, map-side pairs
    "gopher_quality",    # map-only baseline (should scale ~linearly)
    # round-6 additions: the new shuffle-bearing operators (embedding-
    # joined keys like topic_cluster_terms are excluded — the replica
    # multiplies documents/events, not the 500-row embeddings table)
    "ngram_novelty",     # shingle fingerprint first-seen agg + join
    "bigram_logprob",    # uni/bigram tables + per-doc join-aggs
    "fuzzy_join_ed1",    # vocabulary-sized deletion-variant join
    "events_rate_limit", # (user,minute) window + per-user report
    # round-7 additions: the new shuffle-bearing operators
    "char_entropy",          # (doc,char) agg + per-doc rollup
    "events_cusum_drift",    # bucket agg + per-user ordered windows
    "join_interval_overlap", # bucket-banded interval self-join
    "sparse_cosine_topk",    # posting self-join under the df_cap prune
    "rm3_expansion",         # bm25 postings + feedback term weighting
    # (image_ahash_pairs excluded: its registry key pins doc_id < 120,
    # which the id-offset replica scheme never multiplies)
    # round-8 additions
    "exact_substring_spans",  # fingerprint-bucketed span join: the
                              # word-suffixed replicas keep every match
                              # within its replica, so candidate volume
                              # (and the span output) scales ~linearly
    "exact_substring_spans_winnowed",  # winnow-then-verify: only docs
                              # in a winnow-candidate pair emit full
                              # window fingerprints — shuffle should
                              # undercut the exhaustive key's
    # round-8b additions
    "simhash_pairs",          # 64-bit fingerprint agg + banded
                              # multi-index equi-join: 16-bit band
                              # buckets keep fan-out sub-quadratic
    "join_bloom_prefilter",   # bloom probe map-side; shuffle should
                              # carry only the selective survivors
    "simhash_dedup_drop",     # pairs + pointer-doubling CC: rounds
                              # grow O(log diameter), labels join back
    # round-9 additions
    "simhash_pairs_capped",   # the hot-bucket df-cap arm: bucket-count
                              # agg + broadcast cool-list filter on top
                              # of the banded join — shuffle stays the
                              # banded rows
    "cdc_upsert_stream",      # availableNow 3-batch MERGE end-to-end:
                              # per-batch cost = change feed + table
                              # rewrite, the foreachBatch lake pattern
    "semdedup",               # Lloyd's trajectory (O(k·dim) driver
                              # state) + cluster-keyed cosine join
    "quality_classifier_score",  # 3 GD steps = 3 map-only scans + 1-row
                              # aggs; score = map-only projection
    "dsir_weights",           # one bucket agg (n_buckets-bounded
                              # exchange) + map-only integer scoring
    # round-9b additions
    "block_dedup_keep_first", # block fingerprint min-agg + join-back:
                              # shuffle carries ~24 B rows, linear in
                              # full blocks, block text never exchanges
    "stupid_backoff_logprob", # uni/bi/tri counts tables (checkpointed
                              # once) + held-stream count joins — the
                              # Brants 2007 counts-table layout
    "perplexity_buckets",     # unigram per-doc scores (checkpointed) +
                              # distinct-score bucket map broadcast back
    # round-9c/d/e additions
    "cms_frequency_eval",     # ONE corpus word agg; sketch + probe aggs
                              # are vocab/cell-bounded — wall should be
                              # the count agg, shuffle near-flat
    "pmi_collocations",       # doc window + pair agg + broadcast
                              # unigram joins: pair-table shuffle linear
    "strip_repeated_lines",   # zero-exchange map-only baseline (the
                              # gopher_quality control for this round)
    "wordpiece_tokenize",     # distinct-word match + per-doc rollup:
                              # the mapInPandas leg is vocab-bounded,
                              # corpus pays two hash exchanges
    "events_lag_autocorr",    # (key,hour) agg + per-key lead window
    "curriculum_order",       # distinct-difficulty agg (score-bounded)
                              # + per-(stage,shard) seq windows
    "kneser_ney_logprob",     # bigram counts table (checkpointed once)
                              # + held-stream keyed LEFT joins
    "zipf_fit",               # (source, word) agg; regression table
                              # capped at top_ranks per source
    "texttiling_boundaries",  # sent-term agg + gap-side pivot agg +
                              # per-doc windows; fingerprints shuffle,
                              # never token text
    "heaps_fit",              # word->min-doc agg + per-doc token agg;
                              # checkpoint cells single-row
    "phonetic_vocab_groups",  # vocab agg + code window; soundex chain
                              # map-side over the vocab table
    "corpus_datasheet",       # four independent single-row census aggs
    "unigram_lm_tokenize",    # bounded driver fit; distinct-word
                              # Viterbi mapInPandas + per-doc rollup
    # round-10 additions
    "training_pipeline_e2e",  # the composed flagship: stage-survivor id
                              # manifests localCheckpoint (8B/doc); the
                              # member operators' budgets apply stagewise
    "dedup_bbit_minhash",     # signatures+banding as dedup_near_minhash;
                              # b-bit match join ships 16 BITS per doc;
                              # exact verify candidate-bounded
    "ivf_index_stream",       # frozen-codebook streaming cell layout:
                              # fit is the bounded kmeans trajectory,
                              # per-batch assignment map-only vs the
                              # broadcast codebook — shuffle should be
                              # the fit's k x dim partials only
    # round-11 additions
    "semantic_search_e2e",    # the composed serving lifecycle: chunk
                              # store + cache + index materialize once
                              # (localCheckpoint), cache probe/miss are
                              # id-keyed semi/anti joins, serve is the
                              # broadcast-query map-side kNN — the only
                              # corpus shuffles are chunking's doc
                              # grouping and the id joins
    "streaming_search_e2e",   # continuous ingest: per-batch
                              # chunk/embed/assign is row-local map
                              # work; fit is the bounded k x dim
                              # trajectory; serve scans only the
                              # probed cell partitions
]
COPY_TABLES = ["region", "nation", "customer", "supplier", "part"]

# per-user / per-key window operators + the hot-key joins — the ops the
# zipfian replica is built to stress (VERDICT r7 item 3)
SKEW_OPS = [
    "events_lag_autocorr",
    "events_session",
    "events_cusum_drift",
    "events_rate_limit",
    "events_burstiness",
    "cohort_ltv",
]


def build_replica(out_dir: str, factor: int, skew: bool = False) -> None:
    import duckdb

    con = duckdb.connect()
    rep = f"(SELECT unnest(generate_series(0, {factor - 1})) AS r)"

    for t in COPY_TABLES:
        shutil.copy(f"{BASE}/{t}.parquet", f"{out_dir}/{t}.parquet")

    con.sql(
        f"""
        COPY (
          SELECT doc_id + r * (SELECT max(doc_id) + 1 FROM '{BASE}/documents.parquet') AS doc_id,
                 CASE WHEN r = 0 OR text IS NULL OR len(trim(text)) = 0 THEN text
                      ELSE array_to_string(
                        list_transform(ws, w -> w || 'x' || r::VARCHAR), ' ')
                 END AS text,
                 * EXCLUDE (doc_id, text, ws, r)
          FROM (SELECT *, regexp_split_to_array(trim(coalesce(text, '')), '\\s+') AS ws
                FROM '{BASE}/documents.parquet'), {rep}
        ) TO '{out_dir}/documents.parquet' (FORMAT PARQUET)
        """
    )
    con.sql(
        f"""
        COPY (
          SELECT vec_id + r * (SELECT max(vec_id) + 1 FROM '{BASE}/embeddings.parquet') AS vec_id,
                 CASE WHEN r = 0 THEN embedding
                      ELSE embedding[1 + (1 + (r % (len(embedding) - 1))):]
                           || embedding[:(1 + (r % (len(embedding) - 1)))]
                 END AS embedding,
                 * EXCLUDE (vec_id, embedding, r)
          FROM '{BASE}/embeddings.parquet', {rep}
        ) TO '{out_dir}/embeddings.parquet' (FORMAT PARQUET)
        """
    )
    if skew:
        # zipf-ish head: replica r collapses onto the first
        # n_users >> r base users, so user 0..k accumulate events from
        # every replica while the tail keeps the base density
        n_users = con.sql(
            f"SELECT count(DISTINCT user_id) FROM '{BASE}/events.parquet'"
        ).fetchone()[0]
        uid = (
            f"CASE WHEN r = 0 THEN user_id ELSE user_id % "
            f"greatest(1, {n_users} >> least(r, 62)) END"
        )
    else:
        uid = (
            f"user_id + r * (SELECT max(user_id) + 1 "
            f"FROM '{BASE}/events.parquet')"
        )
    con.sql(
        f"""
        COPY (
          SELECT event_id + r * (SELECT max(event_id) + 1 FROM '{BASE}/events.parquet') AS event_id,
                 {uid} AS user_id,
                 * EXCLUDE (event_id, user_id, r)
          FROM '{BASE}/events.parquet', {rep}
        ) TO '{out_dir}/events.parquet' (FORMAT PARQUET)
        """
    )
    step = "(SELECT max(o_orderkey) + 1 FROM '{b}/orders.parquet')".format(b=BASE)
    if skew:
        n_cust = con.sql(
            f"SELECT count(DISTINCT o_custkey) FROM '{BASE}/orders.parquet'"
        ).fetchone()[0]
        ckey = (
            f"CASE WHEN r = 0 THEN o_custkey ELSE o_custkey % "
            f"greatest(1, {n_cust} >> least(r, 62)) END"
        )
    else:
        ckey = "o_custkey"
    con.sql(
        f"""
        COPY (
          SELECT o_orderkey + r * {step} AS o_orderkey,
                 {ckey} AS o_custkey,
                 * EXCLUDE (o_orderkey, o_custkey, r)
          FROM '{BASE}/orders.parquet', {rep}
        ) TO '{out_dir}/orders.parquet' (FORMAT PARQUET)
        """
    )
    con.sql(
        f"""
        COPY (
          SELECT l_orderkey + r * {step} AS l_orderkey,
                 * EXCLUDE (l_orderkey, r)
          FROM '{BASE}/lineitem.parquet', {rep}
        ) TO '{out_dir}/lineitem.parquet' (FORMAT PARQUET)
        """
    )
    con.close()


def _shuffle_totals(spark) -> tuple[int, int]:
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages") as r:
        stages = json.load(r)
    return (
        sum(s.get("shuffleReadBytes", 0) for s in stages),
        sum(s.get("shuffleWriteBytes", 0) for s in stages),
    )


def run(spark, qmap, sf_dir: str, reps: int) -> dict:
    out = {}
    for name in OPS:
        fn = qmap[name]
        best = None
        for _ in range(reps):
            r0, w0 = _shuffle_totals(spark)
            t0 = time.perf_counter()
            try:
                n = fn(spark, sf_dir).count()
            except Exception as exc:  # record scale failures, keep going
                if best is None:  # keep an earlier successful rep
                    best = {"error": str(exc).split("\n")[0][:300]}
                break
            wall = time.perf_counter() - t0
            r1, w1 = _shuffle_totals(spark)
            rec = {
                "wall": round(wall, 3),
                "rows": n,
                "shuffle_read_mb": round((r1 - r0) / 1e6, 2),
                "shuffle_write_mb": round((w1 - w0) / 1e6, 2),
            }
            if best is None or rec["wall"] < best["wall"]:
                best = rec
        out[name] = best
        print(f"# {sf_dir} {name}: {best}", file=sys.stderr)
    return out


def salted_demo(spark, sf_dir: str, reps: int, factor: int = 10) -> dict:
    """Prove the salted path ENGAGES on a hot key, with broadcast and
    AQE skew-join handling disabled (the regime salted_join exists for
    — a build side too big to broadcast and an engine that can't split
    the hot partition): plain shuffle join vs plans/skew.salted_join.
    Confs are restored afterwards; row counts must agree (salting is a
    rewrite, not an approximation).

    The zipfian replica's geometric head (~10x mass on the hottest
    keys) measured a TIE at local[32] — 32 threads absorb a 10x-hot
    partition, so that run proved only correctness, not engagement.
    This demo therefore builds the named failure mode explicitly:
    orders replicated x`factor` in-plan with HALF the rows remapped to
    ONE custkey — the plain join must push 50% of the fact table
    through a single task, which no thread count hides."""
    from pyspark.sql import functions as F

    from data_pipeline2_spark.plans.skew import salted_join
    from data_pipeline2_spark.registry import _t

    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.enabled",
        )
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    try:
        base = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
        okey = F.col("o_orderkey") * factor + F.col("r")
        orders = (
            base.withColumn(
                "r", F.explode(F.sequence(F.lit(0), F.lit(factor - 1)))
            )
            .select(
                okey.alias("o_orderkey"),
                F.when((okey % 2) == 0, F.lit(1))
                .otherwise(F.col("o_custkey"))
                .alias("custkey"),
            )
            # materialize once so both modes join the same static input
            # instead of re-running the explode inside the timing window
            .localCheckpoint(eager=True)
        )
        cust = _t(spark, sf_dir, "customer").select(
            F.col("c_custkey").alias("custkey"), "c_mktsegment"
        )
        out = {}
        for mode in ("plain", "salted"):
            best = None
            for _ in range(reps):
                t0 = time.perf_counter()
                if mode == "plain":
                    n = orders.join(cust, "custkey").count()
                else:
                    n = salted_join(
                        orders, cust, ["custkey"], "o_orderkey", n_salts=32
                    ).count()
                wall = round(time.perf_counter() - t0, 3)
                if best is None or wall < best["wall"]:
                    best = {"wall": wall, "rows": n}
            out[mode] = best
            print(f"# salted_demo {mode}: {best}", file=sys.stderr)
        assert out["plain"]["rows"] == out["salted"]["rows"], (
            "salted_join changed the row count — rewrite bug"
        )
        out["speedup"] = round(
            out["plain"]["wall"] / max(out["salted"]["wall"], 1e-9), 2
        )
        return out
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def simhash_hot_demo(spark, reps: int = 2, factor: int = 10) -> dict:
    """Prove the simhash_pairs bucket_cap ENGAGES on a constructed hot
    band (VERDICT r8 item 1): 10% of docs share ONE band-0 value (the
    degenerate-fingerprint regime — template mass or an adversarial
    constant band); upper 48 bits are xxhash-spread so the hot bucket
    contributes ~n_hot²/2 candidate XOR-popcounts and almost no real
    pairs. Measured:
      - capped, skewed x1 vs x`factor`: shuffle must scale ~linearly
        (the banded rows are corpus-linear; surviving pairs are tiny);
      - uncapped, skewed x1: the quadratic hot-bucket blowup, recorded
        (x`factor` uncapped would be factor² of that — not run);
      - capped ⊂ uncapped at x1 (the cap only ever drops pairs whose
        every matching band is hot).
    """
    from pyspark.sql import functions as F

    from data_pipeline2_spark.operators.dedup import simhash_pairs

    HOT = 0x1234
    N1 = 200_000
    CAP = 64  # uniform 16-bit buckets hold ~n/65536*<few> docs at both
    # scales — far below the cap; only the constructed hot bucket blows it

    def hashes(n):
        h = F.xxhash64(F.col("id"))
        hot = (F.col("id") % 10) == 0
        sim = F.when(
            hot,
            h.bitwiseAND(F.lit(-65536)).bitwiseOR(F.lit(HOT)),
        ).otherwise(h)
        base = spark.range(n).select(
            F.col("id").alias("doc_id"), sim.alias("simhash")
        )
        # planted near-dup pairs, two classes:
        #  - HOT-ONLY pairs (one per 10k hot docs): twin differs by one
        #    bit in EACH of bands 1..3, so the only matching band is the
        #    hot band 0 — the cap MUST drop these (documented
        #    degradation);
        #  - COOL pairs (one per 10k non-hot docs): twin differs by one
        #    low bit — matching bands 1..3 are all cool, the cap MUST
        #    keep these.
        hot_twins = base.filter(
            (F.col("doc_id") % 10_000) == 0
        ).select(
            (F.col("doc_id") + n).alias("doc_id"),
            F.col("simhash")
            .bitwiseXOR(F.lit(1 << 16))
            .bitwiseXOR(F.lit(1 << 32))
            .bitwiseXOR(F.lit(1 << 48))
            .alias("simhash"),
        )
        cool_twins = base.filter(
            (F.col("doc_id") % 10_000) == 3
        ).select(
            (F.col("doc_id") + 2 * n).alias("doc_id"),
            F.col("simhash").bitwiseXOR(F.lit(1)).alias("simhash"),
        )
        return base.unionByName(hot_twins).unionByName(cool_twins)

    out: dict = {"hot_frac": 0.1, "bucket_cap": CAP, "n_x1": N1}
    for tag, n in (("x1", N1), (f"x{factor}", N1 * factor)):
        best = None
        for _ in range(reps):
            df = hashes(n).localCheckpoint(eager=True)
            r0, w0 = _shuffle_totals(spark)
            t0 = time.perf_counter()
            cnt = simhash_pairs(df, bucket_cap=CAP).count()
            wall = round(time.perf_counter() - t0, 3)
            r1, w1 = _shuffle_totals(spark)
            rec = {
                "wall": wall,
                "pairs": cnt,
                "shuffle_write_mb": round((w1 - w0) / 1e6, 2),
            }
            if best is None or rec["wall"] < best["wall"]:
                best = rec
        out[f"capped_{tag}"] = best
        print(f"# simhash_hot capped {tag}: {best}", file=sys.stderr)
    # uncapped trend: hot-bucket work is quadratic in corpus (x3 pays
    # ~9x the x1 bucket XORs; x10 would pay 100x — recorded, not run)
    for tag, mult in (("x1", 1), ("x3", 3)):
        dfu = hashes(N1 * mult).localCheckpoint(eager=True)
        t0 = time.perf_counter()
        unc = simhash_pairs(dfu).count()
        out[f"uncapped_{tag}"] = {
            "wall": round(time.perf_counter() - t0, 3),
            "pairs": unc,
        }
        print(
            f"# simhash_hot uncapped {tag}: {out[f'uncapped_{tag}']}",
            file=sys.stderr,
        )
    df1 = hashes(N1).localCheckpoint(eager=True)
    capped = set(
        map(tuple, simhash_pairs(df1, bucket_cap=CAP).collect())
    )
    uncapped = set(map(tuple, simhash_pairs(df1).collect()))
    assert capped <= uncapped, "cap must only ever DROP pairs"
    n_hot_planted = N1 // 10_000  # hot-only pairs: all matching bands hot
    n_cool_planted = N1 // 10_000
    assert sum(1 for a, b, h in capped if b >= 2 * N1) == n_cool_planted, (
        "cap dropped a cool planted pair"
    )
    assert not any(N1 <= b < 2 * N1 for a, b, h in capped), (
        "cap kept a hot-only planted pair"
    )
    assert sum(1 for a, b, h in uncapped if N1 <= b < 2 * N1) == n_hot_planted
    out["capped_subset_of_uncapped"] = True
    out["planted_cool_pairs_kept"] = n_cool_planted
    out["planted_hot_only_pairs_dropped"] = n_hot_planted
    out["x1_pairs_dropped_by_cap"] = len(uncapped) - len(capped)
    out["shuffle_ratio"] = round(
        out[f"capped_x{factor}"]["shuffle_write_mb"]
        / max(out["capped_x1"]["shuffle_write_mb"], 1e-9),
        2,
    )
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--skew", action="store_true",
                    help="zipfian-key replica: run SKEW_OPS on uniform "
                         "AND skewed x-factor lakes + the salted-join "
                         "engagement demo")
    ap.add_argument("--simhash-demo", action="store_true",
                    help="constructed-hot-band simhash bucket_cap "
                         "engagement demo only (no replica build)")
    ap.add_argument("--ops", type=str, default="",
                    help="comma-separated subset of OPS to run")
    args = ap.parse_args()
    if args.simhash_demo:
        from data_pipeline2_spark.session import get_spark

        spark = get_spark(
            "dp2s-simhash-hot-demo",
            extra_conf={"spark.ui.enabled": "true",
                        "spark.driver.memory": "24g"},
        )
        spark.sparkContext.setLogLevel("ERROR")
        print(json.dumps(
            {"simhash_hot_demo": simhash_hot_demo(
                spark, args.reps, args.factor)}
        ))
        return
    if args.skew:
        OPS[:] = SKEW_OPS
    if args.ops:
        known = OPS
        wanted = set(args.ops.split(","))
        unknown = wanted - set(known)
        if unknown:
            ap.error(f"unknown ops: {sorted(unknown)} (known: {known})")
        OPS[:] = [o for o in OPS if o in wanted]

    from data_pipeline2_spark import registry
    from data_pipeline2_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_TABLE_CACHE", "0")
    big = tempfile.mkdtemp(prefix="dp2s_scale_")
    skewdir = tempfile.mkdtemp(prefix="dp2s_skew_") if args.skew else None
    try:
        print(f"# building x{args.factor} replica in {big}", file=sys.stderr)
        build_replica(big, args.factor)
        if args.skew:
            print(
                f"# building x{args.factor} ZIPFIAN replica in {skewdir}",
                file=sys.stderr,
            )
            build_replica(skewdir, args.factor, skew=True)
        spark = get_spark(
            "data_pipeline2_spark-scale-bench",
            extra_conf={
                "spark.ui.enabled": "true",
                # local mode: the driver JVM is also every executor; the
                # default 1g heap dies building broadcasts at x10 scale
                "spark.driver.memory": "24g",
            },
        )
        spark.sparkContext.setLogLevel("ERROR")
        qmap = registry.queries()
        for name in OPS:  # JIT/codegen warm-up outside the window
            qmap[name](spark, "/root/testdata/sf0.001").count()
        small = run(spark, qmap, BASE, args.reps)
        bigres = run(spark, qmap, big, args.reps)
        skewres = run(spark, qmap, skewdir, args.reps) if args.skew else None
        report = {
            "factor": args.factor,
            "base": small,
            "scaled": bigres,
            "ratios": {
                n: {
                    "wall": round(bigres[n]["wall"] / max(small[n]["wall"], 1e-9), 2),
                    "shuffle_write": round(
                        bigres[n]["shuffle_write_mb"]
                        / max(small[n]["shuffle_write_mb"], 1e-9),
                        2,
                    ),
                }
                for n in OPS
                if "error" not in small[n] and "error" not in bigres[n]
            },
        }
        if args.skew:
            report["skewed"] = skewres
            # the number the VERDICT r7 gate reads: same volume, same
            # op — how much does zipfian key mass alone cost?
            report["skew_over_uniform"] = {
                n: round(
                    skewres[n]["wall"] / max(bigres[n]["wall"], 1e-9), 2
                )
                for n in OPS
                if "error" not in skewres[n] and "error" not in bigres[n]
            }
            report["salted_demo"] = salted_demo(
                spark, BASE, args.reps, factor=args.factor
            )
        print(json.dumps(report))
        hdr = (
            "| query | sf0.1 wall | x10 wall | ratio | sf0.1 shW MB | "
            "x10 shW MB | shW ratio |"
        )
        print(hdr, file=sys.stderr)
        print("|---" * 7 + "|", file=sys.stderr)
        for n in OPS:
            s, b = small[n], bigres[n]
            if "error" in s or "error" in b:
                print(f"| {n} | ERROR: {s.get('error') or b.get('error')} |",
                      file=sys.stderr)
                continue
            print(
                f"| {n} | {s['wall']} | {b['wall']} | "
                f"{report['ratios'][n]['wall']} | {s['shuffle_write_mb']} | "
                f"{b['shuffle_write_mb']} | {report['ratios'][n]['shuffle_write']} |",
                file=sys.stderr,
            )
        if args.skew:
            print(
                "| query | x10 uniform wall | x10 zipf wall | "
                "zipf/uniform | zipf shW MB |",
                file=sys.stderr,
            )
            print("|---" * 5 + "|", file=sys.stderr)
            for n in OPS:
                b, z = bigres[n], skewres[n]
                if "error" in b or "error" in z:
                    print(
                        f"| {n} | ERROR: {b.get('error') or z.get('error')} |",
                        file=sys.stderr,
                    )
                    continue
                print(
                    f"| {n} | {b['wall']} | {z['wall']} | "
                    f"{report['skew_over_uniform'][n]} | "
                    f"{z['shuffle_write_mb']} |",
                    file=sys.stderr,
                )
    finally:
        shutil.rmtree(big, ignore_errors=True)
        if skewdir:
            shutil.rmtree(skewdir, ignore_errors=True)


if __name__ == "__main__":
    main()
