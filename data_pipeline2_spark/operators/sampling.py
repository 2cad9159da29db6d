"""Deterministic sampling / splitting / shuffling for training data.

At 100 TB, `rand()`-based sampling is a reproducibility bug: retries,
speculative tasks, and re-runs see different rows. These operators key
every decision on a content/id hash (md5 hex — engine-portable, so the
DuckDB oracle replays them exactly):

- `sample_fraction`: keep rows whose hash prefix falls under the rate;
- `train_test_split`: stable train/val/test assignment per key;
- `deterministic_shuffle`: a reproducible global permutation (hash
  order) — the "shuffle the corpus once per epoch" primitive;
- `stratified_sample`: per-group hash sampling (equal rate per group,
  no rand()).

All map-side; the only shuffle is deterministic_shuffle's sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from data_pipeline2_spark.plans.materialize import materialize


def _hash_key(key: Column, salt: str = "") -> Column:
    """md5 hex of the (salted) key — uniform in [0x00.., 0xff..]."""
    return F.md5(F.concat_ws("|", F.lit(salt), key.cast("string")))


def _warn_global_window(op: str) -> None:
    """An unpartitioned window executes as ONE task regardless of
    cluster size — fine for the bounded testdata, a bottleneck on a
    real corpus. Warn once per call site (Python's default dedup)."""
    import warnings

    warnings.warn(
        f"{op}: no shard_col — the global ordering window runs as a "
        "single task; pass shard_col to partition it at scale",
        UserWarning,
        stacklevel=3,
    )


def _threshold(pct: float) -> str:
    """2-hex-char prefix boundary for a percentage in [0, 100].

    256 slots → granularity 1/256 ≈ 0.4%. At >= 100% the boundary must
    exceed every hex prefix: 'g' sorts after 'f', so `prefix < 'g'` is
    always true (format(256,'02x') would be the 3-char '100', which
    sorts BELOW most 2-char prefixes and silently drops ~94% of rows).
    """
    slots = int(round(256 * pct / 100.0))
    if slots <= 0:
        return "00"
    if slots >= 256:
        return "g"
    return format(slots, "02x")


def sample_fraction(
    df: DataFrame, key_col: str, rate_pct: int, salt: str = ""
) -> DataFrame:
    """Keep ~rate_pct% of rows, decided by hash prefix < threshold."""
    return df.filter(
        F.substring(_hash_key(F.col(key_col), salt), 1, 2)
        < F.lit(_threshold(rate_pct))
    )


def train_test_split(
    df: DataFrame,
    key_col: str,
    train_pct: int = 80,
    val_pct: int = 10,
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Stable 3-way split: same key → same split, forever."""
    prefix = F.substring(_hash_key(F.col(key_col), salt), 1, 2)
    t1 = _threshold(train_pct)
    t2 = _threshold(train_pct + val_pct)
    return df.withColumn(
        split_col,
        F.when(prefix < t1, "train").when(prefix < t2, "val").otherwise("test"),
    )


def deterministic_shuffle(
    df: DataFrame, key_col: str, salt: str = "epoch0", seq_col: str = "seq"
) -> DataFrame:
    """Reproducible global permutation: order by hash(salt|key); change
    the salt to get a different (still deterministic) epoch order.

    The sort is a range shuffle; at scale you'd sortWithinPartitions
    after a hash repartition for a partition-local shuffle instead.
    """
    h = _hash_key(F.col(key_col), salt)
    w = Window.orderBy(h, F.col(key_col))
    return df.withColumn(seq_col, F.row_number().over(w))


def stratified_sample(
    df: DataFrame, group_col: str, key_col: str, rate_pct: int, salt: str = ""
) -> DataFrame:
    """~rate_pct% of every group, hash-decided (no rand, no groupBy)."""
    key = F.concat_ws("|", F.col(group_col), F.col(key_col).cast("string"))
    return df.filter(
        F.substring(_hash_key(key, salt), 1, 2) < F.lit(_threshold(rate_pct))
    )


def mix_by_temperature(
    df: DataFrame,
    group_col: str,
    key_col: str,
    temperature: float = 0.5,
    target_frac: float = 0.5,
    salt: str = "tmix",
) -> DataFrame:
    """Temperature-flattened mixture sampling — the pretraining data-mix
    knob (multinomial sampling with q_g ∝ p_g^T): natural group shares
    p_g are re-weighted by exponent T and the corpus downsampled to
    ~target_frac with per-group acceptance min(1, target·N·q_g / n_g).
    T < 1 upsamples rare groups toward uniform; T = 1 keeps the natural
    mix (reduces to plain sampling); T = 0 is exactly uniform-by-group.

    Deterministic: acceptance compares the first 8 md5 hex chars of the
    salted key (parsed as a 32-bit integer) against floor(rate·2^32) —
    stable under retries/speculation, and SQL-replayable. Group rates
    come from a tiny per-group aggregate broadcast back onto the corpus:
    one scan for counts, one for the filter; the corpus never shuffles.
    """
    n_total = F.sum("n").over(Window.partitionBy())
    qs = F.pow(F.col("n") / n_total, F.lit(float(temperature)))
    q_norm = qs / F.sum(qs).over(Window.partitionBy())
    rate = F.least(
        F.lit(1.0), F.lit(float(target_frac)) * n_total * q_norm / F.col("n")
    )
    # round before the floor: the Σq^T reduction is order-sensitive in
    # the last ulp across engines, and floor(rate·2^32) would amplify a
    # 1-ulp wobble into an off-by-one threshold
    # NULL groups are a real group, not rows to lose: an equi-join on the
    # raw column would drop every NULL-group row silently. Join on a
    # null-coalesced shadow key instead.
    grp = F.coalesce(F.col(group_col).cast("string"), F.lit("\x00__null__"))
    rates = (
        df.groupBy(grp.alias("__grp"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "__grp",
            F.floor(F.round(rate, 12) * F.lit(float(1 << 32)))
            .cast("long")
            .alias("__thr"),
        )
    )
    h32 = F.conv(
        F.substring(_hash_key(F.col(key_col), salt), 1, 8), 16, 10
    ).cast("long")
    return (
        df.withColumn("__grp", grp)
        .join(F.broadcast(rates), "__grp")
        .filter(h32 < F.col("__thr"))
        .drop("__thr", "__grp")
    )


def sample_weighted(
    df: DataFrame, key_col: str, weight_col: str, salt: str = "wsamp"
) -> DataFrame:
    """Per-row weighted Bernoulli: keep a row with probability =
    clamp(weight, 0, 1), deciding by hash — h32(salted key) <
    floor(round(weight, 12)·2^32). The quality-proportional downsample
    every curation pipeline wants ("keep good docs more often"), with
    the family's guarantees: deterministic under retries/speculation,
    SQL-replayable, map-only (no shuffle, no rand()). round-before-
    floor for the same cross-engine ulp reason as mix_by_temperature.
    NULL weights keep nothing (NULL comparison is false) — absent
    quality is not a license to sample."""
    h32 = F.conv(
        F.substring(_hash_key(F.col(key_col), salt), 1, 8), 16, 10
    ).cast("long")
    w = F.least(
        F.lit(1.0), F.greatest(F.lit(0.0), F.col(weight_col).cast("double"))
    )
    thr = F.floor(F.round(w, 12) * F.lit(float(1 << 32))).cast("long")
    return df.filter(h32 < thr)


def group_topn_sample(
    df: DataFrame, group_col: str, key_col: str, n: int, salt: str = ""
) -> DataFrame:
    """Exactly min(n, group size) rows per group, hash-ordered — the
    "at most N examples per source/domain" cap a data-mix applies when
    a fraction-based rate would still over-represent giant groups.
    Deterministic (no rand(): same salt → same rows forever); one hash
    exchange on the group key, per-partition top-n via the row_number
    window."""
    h = _hash_key(F.col(key_col), salt)
    w = Window.partitionBy(group_col).orderBy(h, F.col(key_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def pretrain_pack(
    df: DataFrame,
    budget: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_col: str | None = None,
) -> DataFrame:
    """Cross-document pretraining packing → (bin_id, n_docs,
    total_tokens): documents concatenate into fixed-budget training
    bins in deterministic id order, bin = floor(start_offset / budget)
    (start offset = exclusive prefix sum of token counts) — the streaming-friendly approximation of bin packing
    (GPT-style corpora pack sequentially, not first-fit-decreasing,
    so shards stay reproducible and append-only).

    Without `shard_col` the running sum is one global window — a single
    task at lake scale (warned at call time). Pass `shard_col` to pack
    per shard: the window partitions on it, bins are numbered within
    shard, and the output keeps the shard column.
    """
    from data_pipeline2_spark.functions.text import token_count

    sel = [F.col(id_col).alias("__id"), token_count(F.col(text_col)).alias("__tok")]
    if shard_col is not None:
        sel.insert(0, F.col(shard_col))
    toks = df.filter(F.col(text_col).isNotNull()).select(*sel)
    if shard_col is None:
        _warn_global_window("pretrain_pack")
        w = Window.orderBy("__id")
    else:
        w = Window.partitionBy(shard_col).orderBy("__id")
    w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    binned = toks.withColumn(
        "bin_id",
        F.floor((F.sum("__tok").over(w) - F.col("__tok")) / budget).cast("long"),
    )
    group = ["bin_id"] if shard_col is None else [shard_col, "bin_id"]
    return binned.groupBy(*group).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__tok").alias("total_tokens"),
    )


def dataset_interleave(
    df: DataFrame,
    group_col: str,
    key_col: str,
    salt: str = "",
    seq_col: str = "seq",
    shard_col: str | None = None,
) -> DataFrame:
    """Round-robin interleave across sources → input rows plus a global
    `seq` such that reading in seq order alternates sources (epoch 0 of
    a mixed corpus: position i of each source comes before position
    i+1 of any source; within a position, sources order
    lexicographically). Deterministic: within-source order is the
    salted hash, the standard no-rand() shuffle.

    Without `shard_col` the seq is a single-partition window (warned at
    call time, like deterministic_shuffle's sort) — at lake scale pass
    `shard_col` to interleave within shards (seq restarts per shard) or
    write the interleave as the sort key of a range-partitioned write."""
    h = _hash_key(F.col(key_col), salt)
    in_parts = [group_col] if shard_col is None else [shard_col, group_col]
    w_in = Window.partitionBy(*in_parts).orderBy(h, F.col(key_col))
    pos = F.row_number().over(w_in)
    if shard_col is None:
        _warn_global_window("dataset_interleave")
        w_outer = Window.orderBy(F.col("__pos"), F.col(group_col))
    else:
        w_outer = Window.partitionBy(shard_col).orderBy(
            F.col("__pos"), F.col(group_col)
        )
    return (
        df.withColumn("__pos", pos)
        .withColumn(seq_col, F.row_number().over(w_outer))
        .drop("__pos")
    )


def mix_token_allocation(
    documents: DataFrame,
    weights: dict[str, int],
    token_budget: int,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Data-mix planning → (source, available_tokens, target_tokens,
    alloc_tokens, satisfied): split an epoch's `token_budget` across
    sources by integer `weights`, capped by what each source actually
    has.

    target_g = budget * w_g // Σw (integer floor — exact and
    engine-portable); alloc_g = min(target_g, available_g);
    satisfied = the source can fill its share (the unsatisfied rows are
    the signal to re-weight or up-sample). One token-count aggregation
    (vocab-free: sums of per-doc counts), map-side partials.

    Deliberately single-pass: deficit REDISTRIBUTION is a fixpoint loop
    over a handful of sources — do it driver-side on this table if
    needed; the corpus-scale work (token counting) happens here once.
    """
    from data_pipeline2_spark.functions.text import token_count

    # targets computed driver-side in PYTHON bigints: exact for any
    # budget x weight (no int32/double overflow in the plan), and a
    # weighted source with ZERO usable docs still gets its row (the
    # most extreme "unsatisfied" signal) via the full-outer join below
    w_total = sum(weights.values())
    spark = documents.sparkSession
    targets = spark.createDataFrame(
        [(k, token_budget * v // w_total) for k, v in sorted(weights.items())],
        "source string, target_tokens long",
    )
    avail = (
        documents.filter(F.col(text_col).isNotNull())
        .groupBy(F.col(group_col).alias("source"))
        .agg(F.sum(token_count(F.col(text_col)).cast("long")).alias(
            "available_tokens"
        ))
    )
    # no broadcast hint: Spark cannot broadcast a FULL OUTER side (it
    # would lose unmatched build rows) — the tiny targets table rides a
    # regular shuffle join
    joined = avail.join(targets, "source", "full_outer").select(
        "source",
        F.coalesce("available_tokens", F.lit(0)).alias("available_tokens"),
        F.coalesce("target_tokens", F.lit(0)).alias("target_tokens"),
    )
    return joined.select(
        "source",
        "available_tokens",
        "target_tokens",
        F.least(F.col("available_tokens"), F.col("target_tokens")).alias(
            "alloc_tokens"
        ),
        (F.col("available_tokens") >= F.col("target_tokens")).alias(
            "satisfied"
        ),
    )


def unimax_allocation(
    documents: DataFrame,
    budget_frac: float = 0.95,
    epoch_cap: float = 1.0,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """UniMax data-mix allocation (Chung et al. 2023: distribute the
    token budget as UNIFORMLY as possible across sources, subject to a
    per-source repeat-epoch cap) → (source, available_tokens,
    cap_tokens, alloc_tokens, epochs, capped).

    The waterfilling solution in closed form: sort sources ascending
    by cap_g = floor(epoch_cap · available_g); a source is CAPPED iff
    cap_g·(n−i+1) + Σ_{j<i} cap_j ≤ B (the condition is monotone along
    the sort, so the capped set is a prefix, and it is constant across
    ties — allocation never depends on tie order). Uncapped sources
    all receive the same water level (B − Σ_capped cap_j) div
    #uncapped — integer division, floor semantics in both engines; the
    sub-#uncapped remainder is deliberately left unallocated (a real
    run hands those few tokens to any source, below packing
    granularity). The budget here is corpus-relative
    (B = floor(budget_frac · Σ available)) so both branches populate
    at every test SF; production passes an absolute budget the same
    way. epochs = alloc/available is the paper's headline diagnostic
    (UniMax's point: no source exceeds `epoch_cap` repeats, unlike
    temperature sampling which over-repeats small sources).

    Scale shape: ONE token-count aggregation over the corpus (map-side
    partials, vocab-free); everything after operates on the
    source-level table — tiny by construction (thousands of rows at
    worst), where the single-partition windows are planning noise.
    """
    from data_pipeline2_spark.functions.text import token_count

    avail = (
        documents.filter(F.col(text_col).isNotNull())
        .groupBy(F.col(group_col).alias("source"))
        .agg(
            F.sum(token_count(F.col(text_col)).cast("long")).alias(
                "available_tokens"
            )
        )
    )
    caps = avail.select(
        "source",
        "available_tokens",
        F.floor(
            F.col("available_tokens").cast("double")
            * F.lit(float(epoch_cap))
        )
        .cast("long")
        .alias("cap_tokens"),
    )
    # corpus-relative budget: one more 1-row aggregate, broadcast back
    budget = caps.agg(
        F.floor(
            F.sum("available_tokens").cast("double")
            * F.lit(float(budget_frac))
        )
        .cast("long")
        .alias("__budget")
    )
    w = Window.orderBy("cap_tokens", "source")
    ranked = (
        caps.crossJoin(F.broadcast(budget))
        .withColumn("__i", F.row_number().over(w))
        .withColumn(
            "__n", F.count(F.lit(1)).over(Window.partitionBy(F.lit(1)))
        )
        .withColumn(
            "__cum",
            F.sum("cap_tokens").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    capped = (
        F.col("cap_tokens") * (F.col("__n") - F.col("__i") + 1)
        + (F.col("__cum") - F.col("cap_tokens"))
    ) <= F.col("__budget")
    flagged = ranked.withColumn("__capped", capped)
    kstate = flagged.agg(
        F.max(F.when(F.col("__capped"), F.col("__i")).otherwise(0)).alias(
            "__k"
        ),
        F.max(
            F.when(F.col("__capped"), F.col("__cum")).otherwise(0)
        ).alias("__sk"),
    )
    out = flagged.crossJoin(F.broadcast(kstate)).withColumn(
        "__level",
        F.when(
            F.col("__n") > F.col("__k"),
            F.expr("(__budget - __sk) div (__n - __k)"),
        ).otherwise(F.lit(0)),
    )
    alloc = F.when(F.col("__capped"), F.col("cap_tokens")).otherwise(
        F.col("__level")
    )
    return out.select(
        "source",
        "available_tokens",
        "cap_tokens",
        alloc.cast("long").alias("alloc_tokens"),
        F.round(
            alloc.cast("double")
            / F.greatest(F.col("available_tokens"), F.lit(1)).cast(
                "double"
            ),
            6,
        ).alias("epochs"),
        F.col("__capped").alias("capped"),
    )


def curriculum_order(
    documents: DataFrame,
    n_stages: int = 3,
    n_shards: int = 8,
    salt: str = "curr",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Curriculum training schedule (Bengio et al. 2009: present easy
    examples first, harden over stages) → (doc_id, difficulty_scaled,
    stage, shard, seq): the deterministic reading order a trainer
    consumes as ORDER BY (stage, shard, seq).

    Difficulty is the exact integer mean word length per document —
    floor(1000 · total word chars / n_words) — the classic cheap
    hardness proxy (long-word prose reads harder than short-word
    prose); blank/NULL documents carry no training signal and drop.
    Stage assignment is equal-count over difficulty (easiest third =
    stage 1 ... at the default 3) via the DISTINCT-difficulty
    cumulative window — the perplexity_buckets idiom, so no corpus-wide
    row sort exists anywhere in the plan; ties (same integer
    difficulty) share a stage by construction. Within a stage,
    documents hash-shard (dataset_interleave's 60-bit md5 buckets) and
    `seq` is the salted-hash order within (stage, shard) — epochs
    reshuffle by changing `salt`, reproducibly.

    Scale shape: one map-side difficulty projection, ONE aggregation on
    the distinct integer difficulty (bounded by the score range, not
    the corpus), the stage map broadcast back, and per-(stage, shard)
    seq windows — K·S bounded partitions, never a single-task window.
    """
    from data_pipeline2_spark.functions.text import tokens
    from data_pipeline2_spark.operators.dedup import shingle_hash64

    if n_stages < 2:
        raise ValueError(f"n_stages must be >= 2, got {n_stages}")
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    toks = tokens(F.col(text_col))
    n_words = F.size(toks)
    n_chars = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    scored = (
        documents.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("doc_id"),
            n_words.alias("__nw"),
            n_chars.alias("__nc"),
        )
        .filter(F.col("__nw") > 0)
        .select(
            "doc_id",
            F.floor(F.lit(1000) * F.col("__nc") / F.col("__nw"))
            .cast("long")
            .alias("difficulty_scaled"),
        )
        .transform(materialize)
    )
    # score-cardinality table, consumed by BOTH the cumulative window
    # and the total — checkpoint so the aggregation runs once
    counts = (
        scored.groupBy("difficulty_scaled")
        .agg(F.count(F.lit(1)).alias("__c"))
        .transform(materialize)
    )
    cw = Window.orderBy("difficulty_scaled").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    total = counts.agg(F.sum("__c").alias("__total"))
    stage_expr = F.lit(n_stages)
    for s in range(n_stages - 1, 0, -1):
        stage_expr = F.when(
            F.lit(n_stages) * F.col("__cum") <= F.lit(s) * F.col("__total"),
            F.lit(s),
        ).otherwise(stage_expr)
    stages = (
        counts.withColumn("__cum", F.sum("__c").over(cw))
        .crossJoin(F.broadcast(total))
        .select(
            F.col("difficulty_scaled").alias("__d"),
            stage_expr.cast("int").alias("stage"),
        )
    )
    staged = scored.join(
        F.broadcast(stages), scored.difficulty_scaled == F.col("__d")
    ).select("doc_id", "difficulty_scaled", "stage")
    shard = F.pmod(
        shingle_hash64(
            F.concat_ws("|", F.lit(salt + "shard"), F.col("doc_id"))
        ),
        F.lit(n_shards),
    ).cast("int")
    h = F.md5(
        F.concat_ws("|", F.lit(salt), F.col("doc_id").cast("string"))
    )
    w = Window.partitionBy("stage", "shard").orderBy(h, F.col("doc_id"))
    return staged.withColumn("shard", shard).select(
        "doc_id",
        "difficulty_scaled",
        "stage",
        "shard",
        F.row_number().over(w).cast("int").alias("seq"),
    )
