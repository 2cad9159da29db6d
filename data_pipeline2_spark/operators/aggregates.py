"""Aggregation surface — hash aggregates with oracle-exact arithmetic.

The reference's aggregation layer is Prometheus counters/histograms
(utils/metrics.py:8-29; embedding_service.py:14-23); the engine exposes
the full groupBy/agg surface those imply, plus the TPC-H-ish bench aggs.

Float-sum determinism: a double sum is order-dependent, and Spark and
DuckDB fold partitions differently. `exact_sum` casts each value to a
fixed-scale decimal first — decimal addition is exact and associative,
so both engines produce the identical value regardless of partitioning
— then casts the total back to double for a hash-stable output schema.
This costs one extra cast per row, negligible vs the shuffle it rides.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from data_pipeline2_spark.plans.materialize import materialize


def exact_sum(col: Column, scale: int = 2, precision: int = 25) -> Column:
    """Order-independent sum of a double column via decimal accumulation."""
    return F.sum(col.cast(f"decimal({precision},{scale})")).cast("double")


def exact_avg(col: Column, scale: int = 2, precision: int = 25) -> Column:
    """avg = exact decimal sum (double) / count — single well-defined
    double division, identical across engines."""
    return exact_sum(col, scale, precision) / F.count(col)


def pricing_summary(lineitem: DataFrame, ship_cutoff: str = "1998-09-02") -> DataFrame:
    """TPC-H Q1-shaped pricing summary (agg_core flagship).

    Map-side partial aggregation + single shuffle on the 6-value group
    key; AQE coalesces post-shuffle partitions. Scales linearly: no row
    explosion, group cardinality is O(1).
    """
    li = lineitem.filter(F.col("l_shipdate") <= F.lit(ship_cutoff).cast("timestamp"))
    disc_price = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(25,4)"
    )
    # charge is exact at 6 decimal digits (2dp price x 2dp disc x 2dp tax);
    # the cast scale must cover the full exact width or half-way rounding
    # of the double differs between engines.
    charge = (
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
    ).cast("decimal(25,6)")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            exact_sum(F.col("l_quantity")).alias("sum_qty"),
            exact_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            exact_avg(F.col("l_quantity")).alias("avg_qty"),
            exact_avg(F.col("l_extendedprice")).alias("avg_price"),
            exact_avg(F.col("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def group_count(df: DataFrame, cols: list[str], count_alias: str = "cnt") -> DataFrame:
    """Counter-style aggregate — the analog of the reference's
    chunks_created_total{strategy,status} counters (utils/metrics.py:8-12)."""
    return df.groupBy(*cols).agg(F.count(F.lit(1)).alias(count_alias))


def length_histogram(
    df: DataFrame, text_col: str, group_cols: list[str], bucket_width: int = 50,
) -> DataFrame:
    """Histogram of content lengths — the analog of
    chunk_size_chars buckets (utils/metrics.py:14-18)."""
    bucket = (F.floor(F.length(F.col(text_col)) / F.lit(bucket_width))).cast("long")
    return (
        df.withColumn("bucket", bucket)
        .groupBy(*group_cols, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def distribution_stats(
    df: DataFrame, value_col: str, group_cols: list[str], value_scale: int = 2,
) -> DataFrame:
    """count/avg/min/max/median — the analog of the reference's
    processing-time histograms (utils/metrics.py:20-29).

    Median uses exact `percentile` (not percentile_approx) so the oracle
    can match; at 100 TB swap to percentile_approx — same API shape,
    documented relaxation.
    """
    v = F.col(value_col)
    return df.groupBy(*group_cols).agg(
        F.count(v).alias("cnt"),
        exact_avg(v, value_scale).alias("avg_v"),
        F.min(v).alias("min_v"),
        F.max(v).alias("max_v"),
        F.round(F.percentile(v, F.lit(0.5)), 4).alias("median_v"),
    )


def rollup_counts(df: DataFrame, cols: list[str]) -> DataFrame:
    """Hierarchical rollup (GROUPING SETS family)."""
    return df.rollup(*cols).agg(F.count(F.lit(1)).alias("cnt"))


def gap_fill(
    series: DataFrame,
    key_cols: list[str],
    bucket_col: str = "bucket",
    value_col: str = "total",
    grain: str = "1 hour",
) -> DataFrame:
    """Timescale-style gap filling over a bucketed series → one row per
    (key, bucket) for EVERY bucket in each key's [min, max] span:
    (key..., bucket, value, is_gap, value_locf).

    `value` is NULL in gaps; `value_locf` carries the last observed
    value forward. Grid generation is per-key sequence + posexplode
    (map-side after a tiny min/max agg); the LOCF uses the portable
    run-group formulation — cumulative count of non-nulls assigns each
    gap row to its preceding observation's run, then a per-run max
    recovers that observation — which needs no IGNORE NULLS support and
    is engine-portable (same SQL runs on DuckDB for the oracle). Both
    windows sort within the existing hash(key) clustering: one shuffle
    for the grid join, none extra for the fill.
    """
    from pyspark.sql.window import Window

    bounds = series.groupBy(*key_cols).agg(
        F.min(bucket_col).alias("__lo"), F.max(bucket_col).alias("__hi")
    )
    grid = bounds.select(
        *key_cols,
        F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"), F.expr(f"interval {grain}"))
        ).alias(bucket_col),
    )
    actual = series.select(
        *key_cols, bucket_col, F.col(value_col).alias("__v"), F.lit(1).alias("__present")
    )
    joined = grid.join(actual, [*key_cols, bucket_col], "left")
    w_run = (
        Window.partitionBy(*key_cols)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_grp = joined.withColumn("__grp", F.count("__v").over(w_run))
    w_grp = Window.partitionBy(*key_cols, "__grp")
    return with_grp.select(
        *key_cols,
        bucket_col,
        F.col("__v").alias(value_col),
        F.col("__present").isNull().alias("is_gap"),
        F.max("__v").over(w_grp).alias(f"{value_col}_locf"),
    )


def hypertable_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    key_cols: list[str] | None = None,
    value_col: str = "value",
    fine: str = "hour",
    coarse: str = "day",
    value_scale: int = 2,
) -> DataFrame:
    """Timescale-style continuous-aggregate rollup: fine-grain partials
    (time_bucket = date_trunc) re-aggregated into the coarse grain FROM
    THE PARTIALS — the raw rows are scanned exactly once.

    → (grain, bucket, *key_cols, n, total, avg_v): both resolutions in
    one frame, `grain` in {fine, coarse}.

    This is the scale pattern behind hypertable/materialized rollups: at
    100 TB the hourly partials are what you persist (orders of magnitude
    smaller than raw), and every coarser resolution — day, month — is a
    cheap re-aggregation of them. Decimal partial sums make the two-level
    sum exact and order-independent, so rollup-of-partials is
    bit-identical to a direct aggregation (the oracle checks exactly
    that: its coarse level aggregates raw rows directly).
    """
    key_cols = key_cols if key_cols is not None else ["event_type"]
    dec = F.col(value_col).cast(f"decimal(25,{value_scale})")
    fine_p = events.groupBy(
        F.date_trunc(fine, F.col(ts_col)).alias("bucket"), *key_cols
    ).agg(F.sum(dec).alias("__sum"), F.count(F.lit(1)).alias("n"))
    coarse_p = fine_p.groupBy(
        F.date_trunc(coarse, F.col("bucket")).alias("bucket"), *key_cols
    ).agg(F.sum("__sum").alias("__sum"), F.sum("n").alias("n"))

    def _finish(df, grain):
        total = F.col("__sum").cast("double")
        return df.select(
            F.lit(grain).alias("grain"),
            "bucket",
            *key_cols,
            F.col("n").cast("long").alias("n"),
            total.alias("total"),
            F.round(total / F.col("n"), 6).alias("avg_v"),
        )

    return _finish(fine_p, fine).unionByName(_finish(coarse_p, coarse))


def zscore_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    id_cols: list[str],
    threshold: float = 3.0,
) -> DataFrame:
    """Per-group z-score outliers → (id_cols…, group_cols…, value, z).

    The metric-anomaly primitive over an event stream: per-group mean
    and sample stddev, then |z| > threshold rows joined back. Both
    moments come from exact decimal sums (value at scale 2, value² at
    scale 4 — the per-row double square is bit-identical across
    engines, and decimal accumulation is order-independent), so
    var = (Σv² − (Σv)²/n) / (n−1) is a fixed-order double expression
    that bit-matches the oracle. Stats are a handful of rows and
    broadcast back — the corpus never shuffles.
    """
    v = F.col(value_col)
    stats = df.groupBy(*group_cols).agg(
        F.count(v).alias("_n"),
        exact_sum(v, scale=2).alias("_s"),
        exact_sum(v * v, scale=4).alias("_ssq"),
    )
    mean = F.col("_s") / F.col("_n")
    # guards (mirrored in the oracle SQL): a singleton group has no
    # sample variance, and a zero-variance group has no outliers — both
    # would otherwise DIVIDE_BY_ZERO under Spark 4's ANSI mode.
    var = F.when(
        F.col("_n") > 1,
        (F.col("_ssq") - F.col("_s") * F.col("_s") / F.col("_n"))
        / (F.col("_n") - 1),
    )
    stats = stats.select(
        *group_cols, mean.alias("_mean"), F.sqrt(var).alias("_sd")
    )
    z = F.when(
        F.col("_sd") > 0, (v - F.col("_mean")) / F.col("_sd")
    )
    return (
        df.join(F.broadcast(stats), group_cols)
        .withColumn("z", F.round(z, 4))
        .filter(F.abs(F.col("z")) > threshold)
        .select(*id_cols, *group_cols, value_col, "z")
    )


def equi_depth_histogram(
    df: DataFrame,
    value_col: str,
    n_buckets: int = 10,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Equi-depth (equal-frequency) histogram → per-bucket
    (bucket, n, lo, hi) — the optimizer-statistics primitive (histogram
    boundaries for selectivity estimation, quantile-bucketed length
    stratification for sequence packing).

    ntile assigns each row to one of n_buckets rank slices; ordering is
    made total with tiebreak columns so bucket membership (and thus
    lo/hi bounds) is deterministic and engine-portable. The global sort
    is a range exchange; at 100 TB prefer approx percentile cuts
    (percentile_approx) and a broadcast bucket join — this exact form
    exists for oracle-checkable statistics at audit time.
    """
    from pyspark.sql.window import Window

    order = [F.col(value_col)] + [F.col(c) for c in (tiebreak_cols or [])]
    w = Window.orderBy(*order)
    return (
        df.withColumn("bucket", F.ntile(n_buckets).over(w))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(value_col).alias("lo"),
            F.max(value_col).alias("hi"),
        )
        .orderBy("bucket")
    )


def mad_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    id_cols: list[str],
    threshold: float = 3.5,
) -> DataFrame:
    """Robust per-group outliers by modified z-score →
    (id_cols…, group_cols…, value, robust_z).

    Median/MAD instead of mean/stddev: a contaminated group (the case
    an anomaly detector exists for) drags the mean and inflates the
    stddev, masking its own outliers; the breakdown point of the
    median is 50%. robust_z = 0.6745·(v − median)/MAD (Iglewicz-
    Hoaglin), |robust_z| > 3.5 flags. Zero-MAD groups (>= half the
    values identical) yield no outliers rather than dividing by zero.
    Two grouped exact percentiles + broadcast joins back — the event
    table never shuffles.
    """
    v = F.col(value_col)
    med = df.groupBy(*group_cols).agg(
        F.percentile(v, F.lit(0.5)).alias("_med")
    )
    dev = df.join(F.broadcast(med), group_cols)
    mad = (
        dev.withColumn("_absdev", F.abs(v - F.col("_med")))
        .groupBy(*group_cols)
        .agg(F.percentile(F.col("_absdev"), F.lit(0.5)).alias("_mad"))
    )
    rz = F.when(
        F.col("_mad") > 0,
        F.lit(0.6745) * (v - F.col("_med")) / F.col("_mad"),
    )
    return (
        dev.join(F.broadcast(mad), group_cols)
        .withColumn("robust_z", F.round(rz, 4))
        .filter(F.abs(F.col("robust_z")) > threshold)
        .select(*id_cols, *group_cols, value_col, "robust_z")
    )


def approx_quantile_check(
    df: DataFrame,
    group_col: str,
    value_col: str,
    ps: list[float],
    accuracy: int = 1000,
) -> DataFrame:
    """percentile_approx verified by its own contract → (group, p,
    approx_ok): the sketch guarantees the returned element's rank is
    within n/accuracy of the target rank. The engine recomputes the
    returned value's actual rank interval [count(<v), count(<=v)]/n and
    emits whether it intersects [p - 1/accuracy, p + 1/accuracy] — a
    boolean a SQL oracle can assert as constant true (the invariant-
    oracle pattern shared with approx_count_distinct / pq_quantize).
    The sketch VALUE itself is intentionally not hashed: it is
    implementation-defined within the bound, exactly what the bound
    check captures.

    Both aggregation passes are map-side partial; the rank join
    broadcasts |groups| x |ps| single values. NULL values are excluded
    up front (percentile_approx ignores them; ranking over them would
    flag a correct sketch as failed), and the rank join is null-safe so
    a NULL group key keeps its row instead of silently dropping.
    """
    df = df.filter(F.col(value_col).isNotNull())
    approx = (
        df.groupBy(group_col)
        .agg(
            F.percentile_approx(
                F.col(value_col), [float(p) for p in ps], accuracy
            ).alias("__qs")
        )
        .select(
            group_col,
            F.posexplode("__qs").alias("__pi", "__qv"),
        )
    )
    probe = approx.withColumnRenamed(group_col, "__g")
    ranks = (
        df.join(
            F.broadcast(probe), F.col(group_col).eqNullSafe(F.col("__g"))
        )
        .drop("__g")
        .groupBy(group_col, "__pi", "__qv")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.count(F.when(F.col(value_col) < F.col("__qv"), 1)).alias("__lt"),
            F.count(F.when(F.col(value_col) <= F.col("__qv"), 1)).alias("__le"),
        )
    )
    p_expr = F.element_at(
        F.array(*[F.lit(float(p)) for p in ps]), F.col("__pi") + 1
    )
    lo = F.col("__lt") / F.col("__n")
    hi = F.col("__le") / F.col("__n")
    # 1/accuracy is the sketch's relative rank error; +1.5 ranks of
    # slack absorbs the floor/ceil rounding of the target rank itself
    # (observed: a value exactly 1 rank past the n/accuracy bound on
    # real data) — still tight enough that a broken accuracy knob
    # (error ~ n ranks) flips the boolean
    tol = F.lit(1.0 / accuracy) + F.lit(1.5) / F.col("__n")
    return ranks.select(
        F.col(group_col),
        F.round(p_expr, 2).alias("p"),
        ((lo <= p_expr + tol) & (hi >= p_expr - tol)).alias("approx_ok"),
    )


# ---------------------------------------------------------------- higher
# moments / time-series resampling (round 6)


def higher_moments(
    df: DataFrame,
    group_col: str,
    value_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Per-group median, stddev, skewness and excess kurtosis computed
    from EXACT integer power sums.

    Built-in `skewness`/`kurtosis` are definitional minefields across
    engines (population vs sample adjustment, Bessel corrections), and
    double power sums are partition-order-dependent. Here `value_col`
    must hold integral values (cast to bigint); the four power sums
    S1..S4 are exact integers (S1 bigint, S2..S4 decimal(38,0) — see
    the accumulator comment for the |v| bound) — associative,
    shuffle-safe, identical on any engine — and the moments derive
    from one fixed double formula over those exact sums:

        mu  = S1/n
        m2  = S2/n - mu^2                       (population variance)
        m3  = S3/n - 3*mu*S2/n + 2*mu^3
        m4  = S4/n - 4*mu*S3/n + 6*mu^2*S2/n - 3*mu^4
        skew = m3 / m2^1.5 ; exkurt = m4 / m2^2 - 3

    At scale this is a plain partial+final hash agg: five exact
    accumulators per group, one shuffle of group-width rows. The median
    is Spark's exact `percentile` (linear interpolation, same contract
    as DuckDB's quantile_cont) — the only non-sketch part; swap for
    `percentile_approx` when the per-group value set stops fitting an
    executor.

    → (group, n, median, mean, stddev_pop, skewness, exkurtosis)
    """
    # S2..S4 accumulate as decimal(38,0), not bigint: a single v^4
    # exceeds int64 around |v| ~ 55k and Spark's non-ANSI long sum
    # wraps SILENTLY — wrong skew/kurtosis with no error. Decimal
    # overflow at least nulls out loudly. Exactness bound: |v| must
    # stay below ~3.1e9 (v^4 < 10^38) and each group's Σv^4 < 10^38;
    # beyond that, switch to centered one-pass streaming moments.
    v = F.col(value_col).cast("long")
    vd = v.cast("decimal(19,0)")
    v2d = (vd * vd).cast("decimal(38,0)")
    agg = df.groupBy(group_col).agg(
        F.count(v).alias("n"),
        F.sum(v).alias("s1"),
        F.sum(v2d).alias("s2"),
        F.sum((v2d * vd).cast("decimal(38,0)")).alias("s3"),
        F.sum((v2d * v2d).cast("decimal(38,0)")).alias("s4"),
        F.percentile(v, 0.5).alias("med"),
    )
    n = F.col("n").cast("double")
    mu = F.col("s1") / n
    m2 = F.col("s2") / n - mu * mu
    m3 = F.col("s3") / n - F.lit(3.0) * mu * (F.col("s2") / n) + F.lit(
        2.0
    ) * mu * mu * mu
    m4 = (
        F.col("s4") / n
        - F.lit(4.0) * mu * (F.col("s3") / n)
        + F.lit(6.0) * mu * mu * (F.col("s2") / n)
        - F.lit(3.0) * mu * mu * mu * mu
    )
    # constant-value groups: m2 is 0 (or a float artifact once the
    # power sums exceed 2^53) and skew/kurtosis are undefined — return
    # NULL explicitly rather than letting 0/0 diverge across engines
    # (Spark NULL vs DuckDB NaN/inf). The guard is RELATIVE
    # (m2 > 1e-12·(mu²+1)): an absolute m2 > 0 would pass a ~1e-16
    # artifact and divide garbage by garbage^1.5
    return agg.select(
        F.col(group_col),
        F.col("n"),
        F.round(F.col("med"), round_to).alias("median"),
        F.round(mu, round_to).alias("mean"),
        F.round(
            F.sqrt(F.greatest(m2, F.lit(0.0))), round_to
        ).alias("stddev_pop"),
        F.when(
            m2 > F.lit(1e-12) * (mu * mu + F.lit(1.0)),
            F.round(m3 / F.pow(m2, F.lit(1.5)), round_to),
        ).alias("skewness"),
        F.when(
            m2 > F.lit(1e-12) * (mu * mu + F.lit(1.0)),
            F.round(m4 / (m2 * m2) - F.lit(3.0), round_to),
        ).alias("exkurtosis"),
    )


def resample_ohlc(
    events: DataFrame,
    interval_sec: int = 300,
    group_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Resample an event stream into fixed epoch-aligned buckets with
    OHLC semantics: open/close = the value at the lexicographically
    first/last (ts, id) in the bucket, high/low = max/min, volume =
    count, value_sum = exact decimal sum.

    Open/close ride Spark's struct ordering — `min(struct(ts, id, v))`
    is a single partial-aggregable accumulator, so the whole operator
    is one map-side-combined hash agg per (group, bucket): no window
    function, no per-bucket sort, linear at any scale. The bucket key
    is integer epoch seconds (floor(epoch/interval)*interval) — engine-
    portable, and the natural partition column for a time-series lake
    layout (hypertable_rollup's coarser cousin).

    → (group, bucket_s, open, high, low, close, volume, value_sum)
    """
    if interval_sec <= 0:
        raise ValueError(f"interval_sec must be > 0, got {interval_sec}")
    bucket = (
        F.floor(F.col(ts_col).cast("double") / F.lit(float(interval_sec)))
        .cast("long")
        * F.lit(int(interval_sec)).cast("long")
    ).alias("bucket_s")
    tagged = events.select(
        F.col(group_col),
        bucket,
        F.struct(
            F.col(ts_col).alias("t"),
            F.col(id_col).alias("i"),
            F.col(value_col).alias("v"),
        ).alias("tiv"),
        F.col(value_col).alias("v"),
    )
    return tagged.groupBy(group_col, "bucket_s").agg(
        F.min("tiv").getField("v").alias("open"),
        F.max("v").alias("high"),
        F.min("v").alias("low"),
        F.max("tiv").getField("v").alias("close"),
        F.count(F.lit(1)).alias("volume"),
        exact_sum(F.col("v"), scale=6).alias("value_sum"),
    )


def seasonal_baseline(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Hour-of-day seasonal profile per group: each (group, hour 0-23)
    bucket's mean value against the group's overall mean, with the
    peak-hour flag. The seasonality complement to the z-score/MAD
    outlier keys — those flag individual events, this computes the
    baseline a scheduler or anomaly detector subtracts first.

    Two exact-decimal aggregations (one keyed by (group, hod), one by
    group) joined with the small side broadcast — the profile table is
    O(groups × 24) however large the corpus.

    → (group, hod, n, hod_mean, overall_mean, ratio, is_peak)
    """
    hod = F.hour(F.col(ts_col)).alias("hod")
    per_hod = events.groupBy(F.col(group_col), hod).agg(
        F.count(F.lit(1)).alias("n"),
        exact_sum(F.col(value_col), scale=6).alias("hsum"),
    )
    overall = events.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("on"),
        exact_sum(F.col(value_col), scale=6).alias("osum"),
    )
    hod_mean = F.col("hsum") / F.col("n")
    overall_mean = F.col("osum") / F.col("on")
    return per_hod.join(F.broadcast(overall), group_col).select(
        group_col,
        "hod",
        "n",
        F.round(hod_mean, 6).alias("hod_mean"),
        F.round(overall_mean, 6).alias("overall_mean"),
        F.round(hod_mean / overall_mean, 6).alias("ratio"),
        (hod_mean > overall_mean).alias("is_peak"),
    )


def winsorized_stats(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lo_p: float = 0.05,
    hi_p: float = 0.95,
) -> DataFrame:
    """Robust per-group statistics: winsorize at the exact [lo_p, hi_p]
    percentiles (clip, not drop), then exact-decimal mean and population
    stddev of the clipped values, plus how many rows each bound clipped.

    The outlier-robust complement to `higher_moments`: one exact
    percentile pass to find the bounds (same percentile-interpolation
    contract as DuckDB quantile_cont), then one hash agg over clipped
    values with decimal accumulation — two shuffles of group-width
    rows, corpus scanned twice (at 100 TB swap pass one to
    percentile_approx: same API, documented relaxation).

    → (group, n, p_lo, p_hi, wins_mean, wins_stddev,
       n_clipped_lo, n_clipped_hi)
    """
    if not (0.0 <= lo_p < hi_p <= 1.0):
        raise ValueError(
            f"need 0 <= lo_p < hi_p <= 1, got ({lo_p}, {hi_p})"
        )
    v = F.col(value_col)
    bounds = df.groupBy(group_col).agg(
        F.percentile(v, lo_p).alias("p_lo"),
        F.percentile(v, hi_p).alias("p_hi"),
    )
    clipped = df.join(F.broadcast(bounds), group_col).select(
        F.col(group_col),
        v.alias("_v"),
        "p_lo",
        "p_hi",
        F.least(F.greatest(v, F.col("p_lo")), F.col("p_hi")).alias("_w"),
    )
    agg = clipped.groupBy(group_col, "p_lo", "p_hi").agg(
        F.count(F.lit(1)).alias("n"),
        exact_sum(F.col("_w"), scale=6, precision=32).alias("s1"),
        F.sum(
            (F.col("_w") * F.col("_w")).cast("decimal(32,6)")
        ).cast("double").alias("s2"),
        F.sum((F.col("_v") < F.col("p_lo")).cast("long")).alias(
            "n_clipped_lo"
        ),
        F.sum((F.col("_v") > F.col("p_hi")).cast("long")).alias(
            "n_clipped_hi"
        ),
    )
    mean = F.col("s1") / F.col("n")
    # clamp the ~1e-16 float artifact a constant group can produce —
    # sqrt of it is NaN on Spark and an out-of-range ERROR on DuckDB
    var = F.greatest(
        F.col("s2") / F.col("n") - mean * mean, F.lit(0.0)
    )
    return agg.select(
        group_col,
        "n",
        F.round(F.col("p_lo"), 6).alias("p_lo"),
        F.round(F.col("p_hi"), 6).alias("p_hi"),
        F.round(mean, 6).alias("wins_mean"),
        F.round(F.sqrt(var), 6).alias("wins_stddev"),
        "n_clipped_lo",
        "n_clipped_hi",
    )


def distribution_entropy(
    df: DataFrame,
    key_col: str,
    cat_col: str,
    scale: int = 10_000_000_000,
) -> DataFrame:
    """Per-key Shannon entropy (nats) of a categorical distribution —
    e.g. how varied each user's event-type mix is (0 = monomaniac,
    ln(|types|) = uniform). The profile feature behind bot/spam
    detection and stratified sampling weights.

    Exactness: H = -Σ p_t ln p_t is a float sum, so each term
    integerizes first (the unigram_logprob idiom): per (key, cat)
    contribution = cnt_t · floor(ln(cnt_t / total) · scale), an exact
    BIGINT whose sum is associative; H = -S / scale / total. Three
    key-width exchanges ((key,cat) agg, per-key totals, the join-back —
    hash(key,cat) partitioning does NOT satisfy the per-key clustering,
    so Spark re-shuffles the agg OUTPUT, never the corpus); all three
    carry category-cardinality rows, not events.

    Overflow bound: |term| <= cnt · ln(total) · scale, so the default
    scale=1e10 is exact while any (key, cat) count stays under ~3·10^7
    — beyond that (whale keys at lake scale) drop scale a decade per
    decade of count; precision loss is in the 10th decimal.

    → (key, n_events, n_cats, entropy)
    """
    if scale <= 0:
        raise ValueError(f"scale must be > 0, got {scale}")
    counts = df.groupBy(key_col, cat_col).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    totals = counts.groupBy(key_col).agg(
        F.sum("cnt").alias("total"), F.count(F.lit(1)).alias("n_cats")
    )
    term = F.col("cnt") * F.floor(
        F.log(F.col("cnt").cast("double") / F.col("total").cast("double"))
        * F.lit(float(scale))
    ).cast("long")
    return (
        counts.join(totals, key_col)
        .groupBy(key_col, "total", "n_cats")
        .agg(F.sum(term).alias("s"))
        .select(
            key_col,
            F.col("total").cast("long").alias("n_events"),
            F.col("n_cats").cast("long").alias("n_cats"),
            F.round(
                -(F.col("s") / F.lit(float(scale))) / F.col("total"), 6
            ).alias("entropy"),
        )
    )


def cusum_changepoints(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    bucket: str = "hour",
    h_mult: int = 3,
) -> DataFrame:
    """Per-key one-sided CUSUM drift detection over bucketed event
    rates → (key, bucket_ts, n_events, score, drift).

    The classic recursive form S_t = max(0, S_{t-1} + (x_t - mean))
    looks window-inexpressible, but it has the closed form
    S_t = cum_t - min(cum_1..t) with cum the running sum of
    (x_t - mean) — two ORDERED WINDOW functions (running sum + running
    min), no recursion, no UDF. `drift` fires when S_t exceeds
    h_mult·mean, the standard threshold parameterization.

    Exactness: mean = total/n_buckets is kept RATIONAL — every term is
    scaled by the per-key bucket count (term = n·x_t − total, an exact
    bigint), so cum/min/score are integer-exact and the single closing
    division round(S/n, 6) is the only float op. Scale shape: the
    bucket aggregation partial-combines map-side; both windows
    partition by key (each key's timeline is bucket-cardinality
    sized). A key with one global sequence would serialize into one
    task — hence per-key, the same contract as events_ewma.
    """
    from pyspark.sql import Window

    counts = events.groupBy(
        F.col(key_col).alias("key"),
        F.date_trunc(bucket, F.col(ts_col)).alias("bucket_ts"),
    ).agg(F.count(F.lit(1)).alias("x"))
    totals = counts.groupBy("key").agg(
        F.sum("x").alias("total"), F.count(F.lit(1)).alias("nb")
    )
    w = (
        Window.partitionBy("key")
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    term = F.col("nb") * F.col("x") - F.col("total")  # nb*(x - mean), exact
    scored = (
        counts.join(totals, "key")
        .withColumn("__cum", F.sum(term).over(w))
        # one-sided CUSUM: reset-at-zero == cum minus the running min
        # of the cums INCLUDING the empty prefix (cum_0 = 0) — without
        # the 0 floor, a series that starts ABOVE its mean understates
        # S until the first dip (caught by the closed-form-vs-recursion
        # property test)
        .withColumn(
            "__smin",
            F.least(
                F.lit(0).cast("long"), F.min(F.col("__cum")).over(w)
            ),
        )
        .withColumn("__s", F.col("__cum") - F.col("__smin"))
    )
    return scored.select(
        F.col("key").alias(key_col),
        "bucket_ts",
        F.col("x").cast("long").alias("n_events"),
        F.round(F.col("__s") / F.col("nb"), 6).alias("score"),
        (F.col("__s") > F.lit(int(h_mult)) * F.col("total")).alias("drift"),
    )


def cohort_ltv(
    orders: DataFrame,
    cust_col: str = "o_custkey",
    date_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
) -> DataFrame:
    """Acquisition-cohort lifetime-value matrix → (cohort_month,
    month_offset, n_customers, n_orders, revenue).

    Customers cohort by their FIRST order month; every order lands in
    (cohort, months-since-acquisition) with exact decimal revenue —
    the retention/LTV curve read off any analytics warehouse, here as
    one reusable operator (the revenue sibling of events_retention's
    activity triangle).

    Scale shape: the first-order lookup is a keyed min-aggregate
    joined back on the customer key (two customer-width exchanges);
    the matrix aggregation partial-combines to cohort x offset cells.
    Month arithmetic is integer (year*12+month), immune to the
    months_between fractional-day semantics that differ per engine.
    """
    first = orders.groupBy(F.col(cust_col).alias("__cust")).agg(
        F.min(F.date_trunc("month", F.col(date_col))).alias("__cohort")
    )
    mnum = lambda c: F.year(c) * 12 + F.month(c)  # noqa: E731
    enriched = orders.join(
        first, orders[cust_col] == F.col("__cust")
    ).select(
        F.col("__cohort").alias("cohort_month"),
        (
            mnum(F.date_trunc("month", F.col(date_col)))
            - mnum(F.col("__cohort"))
        ).cast("int").alias("month_offset"),
        F.col("__cust"),
        F.col(amount_col).alias("__amt"),
    )
    return (
        enriched.groupBy("cohort_month", "month_offset")
        .agg(
            F.count_distinct(F.col("__cust")).alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
            F.round(exact_sum(F.col("__amt")), 2).alias("revenue"),
        )
    )


def psi_drift(
    df: DataFrame,
    split_predicate: Column,
    group_col: str = "event_type",
    value_col: str = "value",
    bucket_width: float = 25.0,
    scale: int = 1_000_000,
    threshold: float = 0.2,
) -> DataFrame:
    """Population Stability Index between two slices of one frame →
    (group, n_buckets, n_base, n_curr, psi, drifted).

    PSI = Σ_i (p_i − q_i)·ln(p_i/q_i) over value buckets — the
    standard ML-ops drift score between a baseline population
    (split_predicate true) and the current one (false); > 0.2 is the
    conventional "investigate" threshold. Buckets are fixed-width
    (floor(value/width)) and counts are Laplace-smoothed (+1 on the
    union of observed buckets) so empty cells stay finite.

    Exactness: with smoothed counts c1,c2 and totals T1,T2 the term
    (c1/T1 − c2/T2)·ln((c1·T2)/(c2·T1)) multiplies out to the exact
    bigint (c1·T2 − c2·T1) times the floor-integerized log
    (distribution_entropy idiom); one closing division by T1·T2·scale.
    Overflow bound: |c·T| · ln(·) · scale must stay under 2^63 — the
    default scale=1e6 is exact to per-group totals ~10^5; drop scale a
    decade per decade of count beyond that.

    Scale shape: one (group, bucket, side) aggregation over the frame
    (map-side combined), then group-width rollups — shuffles carry
    bucket-cardinality rows, never events.
    """
    if scale <= 0 or bucket_width <= 0:
        raise ValueError(
            f"need scale > 0 and bucket_width > 0; got ({scale}, {bucket_width})"
        )
    sides = df.select(
        F.col(group_col).alias("g"),
        F.floor(F.col(value_col) / F.lit(float(bucket_width))).alias("bkt"),
        F.when(split_predicate, F.lit(1)).otherwise(F.lit(0)).alias("is_base"),
    )
    counts = sides.groupBy("g", "bkt").agg(
        (F.sum("is_base") + F.lit(1)).alias("c1"),       # Laplace +1
        (F.sum(F.lit(1) - F.col("is_base")) + F.lit(1)).alias("c2"),
    )
    totals = counts.groupBy("g").agg(
        F.sum("c1").alias("t1"),
        F.sum("c2").alias("t2"),
        F.count(F.lit(1)).alias("n_buckets"),
    )
    num = F.col("c1") * F.col("t2")
    den = F.col("c2") * F.col("t1")
    term = (num - den) * F.floor(
        F.log(num.cast("double") / den.cast("double")) * F.lit(float(scale))
    ).cast("long")
    psi = F.round(
        F.col("s")
        / (F.col("t1") * F.col("t2")).cast("double")
        / F.lit(float(scale)),
        6,
    )
    return (
        counts.join(totals, "g")
        .groupBy("g", "t1", "t2", "n_buckets")
        .agg(F.sum(term).alias("s"))
        .select(
            F.col("g").alias(group_col),
            F.col("n_buckets").cast("long").alias("n_buckets"),
            F.col("t1").cast("long").alias("n_base"),
            F.col("t2").cast("long").alias("n_curr"),
            psi.alias("psi"),
            (psi > F.lit(float(threshold))).alias("drifted"),
        )
    )


def kmv_distinct(
    documents: DataFrame,
    k: int = 16,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """K-Minimum-Values distinct-count sketch per group PLUS the
    merged all-groups row → (scope, n_exact, kmv_estimate, rel_error).

    KMV (Bar-Yossef et al.): keep the k smallest hash values of a set;
    estimate distinct = (k-1) / U_(k) with U_(k) the k-th smallest
    normalized hash. The property that matters at lake scale is
    MERGEABILITY: min-k(union of min-k sets) == min-k(union of the
    full sets), so per-partition/per-source sketches of a few hundred
    bytes union into a global estimate without re-touching data — the
    'ALL' row's ESTIMATE here is computed from exactly that union: the
    per-group rn <= k rows (G·k values, kilobytes) re-rank on the
    driver-side-tiny merged frame, and the full hash set is never
    re-touched for it (ADVICE r7: the previous plan built ALL from the
    full distinct set and merely CLAIMED merge semantics; the oracle
    replays the full-set construction, which matches by mergeability).
    The ALL row's n_exact is a separate global distinct COUNT — it is
    the self-grading column, explicitly not part of the sketch path,
    and drops with the other n_exact at lake scale. Fewer than k
    distinct values degenerates to the exact count (the sketch IS the
    set).

    Exactness: hashes are the 60-bit md5-prefix fingerprints
    (dedup.shingle_hash64) — deterministic, engine-portable — and the
    estimate is one double division of exact integers, so the sketch
    error itself is reproducible bit-for-bit. n_exact rides along to
    make every row self-grading (rel_error column).

    Scale shape: one distinct-hash aggregation, one per-group top-k
    window over hash order (group-width), and group-cardinality
    rollups. The exact count is for grading — drop it at lake scale
    and the plan is sketch-only.
    """
    from pyspark.sql import Window

    from data_pipeline2_spark.operators.dedup import shingle_hash64

    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    space = float(1 << 60)
    hashes = (
        documents.filter(F.col(text_col).isNotNull())
        .select(
            F.col(group_col).alias("scope"),
            shingle_hash64(F.col(text_col)).alias("h"),
        )
        .distinct()
        # feeds the rank window AND both exact-count aggregations —
        # materialize the distinct set once; it is the same O(distinct)
        # volume the counting shuffle carries anyway
        .transform(materialize)
    )
    w = Window.partitionBy("scope").orderBy("h")
    # per-group k-min sketches: G·k rows total — THIS is the sketch a
    # lake deployment would persist (kilobytes per group). The rn <= k
    # filter triggers Spark's WindowGroupLimit rewrite: each map task
    # keeps only its local k smallest per scope BEFORE the exchange, so
    # the window shuffle carries O(partitions·groups·k), not the corpus.
    sketches = hashes.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )
    # ALL = merge of the per-group sketches, never the full hash set:
    # dedup the union'd sketch values, re-rank, keep the k smallest.
    # The merged frame is G·k rows, so the const-key window is trivial.
    merged = (
        sketches.select(F.lit("ALL").alias("scope"), "h")
        .distinct()
        .withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("scope").orderBy("h")),
        )
        .filter(F.col("rn") <= k)
    )
    kth = (
        sketches.unionByName(merged)
        .filter(F.col("rn") == k)
        .select("scope", F.col("h").alias("hk"))
    )
    # n_exact is the self-grading column, deliberately outside the
    # sketch path: per-group counts partial-combine map-side (the
    # exchange carries one row per scope per task), and the ALL row is
    # one global count-distinct over the checkpointed set — the single
    # corpus-volume exchange left in the plan, and the one a lake
    # deployment drops along with the other n_exact
    stats = hashes.groupBy("scope").agg(
        F.count(F.lit(1)).alias("n_exact")
    ).unionByName(
        hashes.agg(
            F.count_distinct(F.col("h")).alias("n_exact")
        ).select(F.lit("ALL").alias("scope"), "n_exact")
    )
    est = F.when(
        F.col("hk").isNull(), F.col("n_exact").cast("double")
    ).otherwise(
        F.round(F.lit(float(k - 1)) * F.lit(space) / F.col("hk"), 6)
    )
    return (
        stats.join(kth, "scope", "left")
        .select(
            "scope",
            F.col("n_exact").cast("long").alias("n_exact"),
            est.alias("kmv_estimate"),
            F.round(
                F.abs(est - F.col("n_exact")) / F.col("n_exact"), 6
            ).alias("rel_error"),
        )
    )


def theil_sen_trend(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    bucket: str = "day",
) -> DataFrame:
    """Per-key Theil–Sen trend over bucketed event rates → (key,
    n_buckets, n_pairs, slope_median, rising).

    Theil–Sen = the MEDIAN of all pairwise slopes — the robust trend
    line (up to ~29% outlier contamination does not move it), where an
    OLS fit follows every burst. The activity-trend detector behind
    "is this user/source growing or decaying", immune to the single
    spike that drags a least-squares slope.

    Scale shape: the pairwise blow-up is per key and quadratic only in
    the key's BUCKET COUNT (a 30-day daily series = 435 pairs), never
    in events; the bucket aggregation partial-combines map-side, and
    the median is exact `percentile` (the distribution_stats contract
    — swap for percentile_approx when per-key pair sets stop fitting).
    Slopes are (bigint Δcount)/(bigint Δbuckets) — one well-defined
    double division each, so the interpolated median matches the
    oracle. The denominator is computed in BUCKET units from exact
    epoch microseconds (ADVICE r7: the former day-granular datediff
    made every sub-day bucket produce zero deltas and Inf/NaN slopes
    that silently polluted the median); variable-span buckets
    (month/quarter/year) raise rather than mislabel.
    """
    spans_us = {
        "second": 1_000_000,
        "minute": 60_000_000,
        "hour": 3_600_000_000,
        "day": 86_400_000_000,
        "week": 7 * 86_400_000_000,
    }
    if bucket not in spans_us:
        raise ValueError(
            f"bucket must be one of {sorted(spans_us)} (fixed spans; "
            f"month/quarter/year have no constant bucket width), "
            f"got {bucket!r}"
        )
    span = spans_us[bucket]
    # the bucketed series feeds THREE consumers (both pair-join sides
    # + the bucket count) — materialize the key x bucket reduction once
    # rather than re-scanning events per consumer
    daily = events.groupBy(
        F.col(key_col).alias("key"),
        F.date_trunc(bucket, F.col(ts_col)).alias("d"),
    ).agg(F.count(F.lit(1)).alias("x")).transform(materialize)
    a = daily.select(
        "key", F.col("d").alias("da"), F.col("x").alias("xa")
    )
    b = daily.select(
        "key", F.col("d").alias("db"), F.col("x").alias("xb")
    )
    # Δbuckets is exact: both endpoints are date_trunc'd to the bucket
    # boundary, so the micros difference is an integer multiple of span
    slope = (F.col("xb") - F.col("xa")) / (
        (F.unix_micros(F.col("db")) - F.unix_micros(F.col("da")))
        / F.lit(span)
    ).cast("double")
    pairs = (
        a.join(b, "key")
        .filter(F.col("da") < F.col("db"))
        .select("key", slope.alias("s"))
    )
    counts = daily.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_buckets")
    )
    med = pairs.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.percentile(F.col("s"), 0.5), 6).alias("slope_median"),
    )
    return counts.join(med, "key", "left").select(
        F.col("key").alias(key_col),
        F.col("n_buckets").cast("long"),
        F.coalesce(F.col("n_pairs"), F.lit(0)).cast("long").alias("n_pairs"),
        F.coalesce(F.col("slope_median"), F.lit(0.0)).alias("slope_median"),
        (F.coalesce(F.col("slope_median"), F.lit(0.0)) > 0).alias("rising"),
    )


# chi-square upper-tail 0.05 critical values, dof 1..40 (the standard
# published table) — the `significant` gate derives its threshold from
# the COMPUTED dof via this table (ADVICE r7: a fixed 9.488 was
# silently wrong for any category cardinality other than 5)
CHI2_CRIT_95 = (
    3.841, 5.991, 7.815, 9.488, 11.070, 12.592, 14.067, 15.507,
    16.919, 18.307, 19.675, 21.026, 22.362, 23.685, 24.996, 26.296,
    27.587, 28.869, 30.144, 31.410, 32.671, 33.924, 35.172, 36.415,
    37.652, 38.885, 40.113, 41.337, 42.557, 43.773, 44.985, 46.194,
    47.400, 48.602, 49.802, 50.998, 52.192, 53.384, 54.572, 55.758,
)


def ab_chi2(
    df: DataFrame,
    variant_col: Column,
    cat_col: str = "event_type",
    crit: float | None = None,
) -> DataFrame:
    """Chi-square homogeneity test between two variants over a
    categorical distribution → ONE row: (n_total, dof, chi2, crit,
    significant).

    The A/B gate: does the category mix differ between variants more
    than chance allows? Computed as chi2 = N·Σ o²/(rt·ct) − N — the
    contingency-table identity that needs ONLY the observed cells: a
    zero cell contributes 0 to Σ o²/(rt·ct) while its expected count
    still lands in the closing −N, so empty (variant, category) cells
    (which a groupBy never materializes) are handled exactly — the
    naive Σ (o−e)²/e over grouped rows silently drops them. Cell terms
    round to 12 dp and accumulate as DECIMAL(28,12) so the sum is
    associative (the bm25 contribution idiom); exact for o²·N <
    2^53-scale doubles (counts to ~1e5 per cell). The rejection
    threshold comes from CHI2_CRIT_95 indexed by the COMPUTED dof =
    (n_variants−1)·(k−1), the full contingency formula — pass an
    explicit `crit` to override; dof outside the table (> 40) yields
    NULL crit/significant rather than a silently wrong verdict.

    NULL VARIANT rows are excluded from the whole table (cells, both
    margins, N, k): the test asks whether assigned arms differ, and a
    unit with no arm assignment is outside the experiment — unlike a
    NULL category, which IS a signal an arm can shift traffic into.
    (ADVICE r8: the previous row-margin equality join dropped NULL-v
    cells from the term sum while still counting them in N/ct/k,
    biasing chi2 negative; exclusion makes every aggregate see the
    same population.)

    Scale shape: one (variant, category) aggregation over the frame,
    then constant-width rollups — K x V cells regardless of rows.
    """
    # the V x K cell table feeds six consumers (margins, total, k, nv,
    # and the term join) — materialize the corpus reduction once
    cells = (
        df.select(
            variant_col.cast("long").alias("v"), F.col(cat_col).alias("c")
        )
        .filter(F.col("v").isNotNull())
        .groupBy("v", "c")
        .agg(F.count(F.lit(1)).alias("o"))
        .transform(materialize)
    )
    rt = cells.groupBy("v").agg(F.sum("o").alias("rt"))
    # NULL category is a REAL category (a variant shifting traffic into
    # unknown-type rows is exactly the signal this gate exists for):
    # the column margin joins back null-safely, and k counts the NULL
    # group — otherwise null cells silently vanish from Σ o²/(rt·ct)
    # while still weighing down the closing −N, biasing chi2 negative.
    ct = (
        cells.groupBy("c")
        .agg(F.sum("o").alias("ct"))
        .withColumnRenamed("c", "__ct_c")
    )
    nn = cells.agg(F.sum("o").alias("nn"))
    k_cats = cells.select("c").distinct().agg(
        F.count(F.lit(1)).alias("k")
    )
    n_vars = cells.select("v").distinct().agg(
        F.count(F.lit(1)).alias("nv")
    )
    cell_term = F.round(
        F.col("o").cast("double")
        * F.col("o")
        * F.col("nn")
        / (F.col("rt").cast("double") * F.col("ct")),
        12,
    ).cast("decimal(28,12)")
    chi2 = F.round(
        F.sum(cell_term).cast("double") - F.first(F.col("nn")), 6
    )
    dof = ((F.col("nv") - 1) * (F.col("k") - 1)).cast("int")
    if crit is not None:
        crit_col = F.lit(float(crit))
    else:
        # try_element_at: 1-based, NULL out of range — dof > 40 (or a
        # degenerate dof 0) degrades to NULL, never a wrong threshold
        crit_col = F.try_element_at(
            F.array(*[F.lit(float(v)) for v in CHI2_CRIT_95]), dof
        )
    return (
        cells.join(F.broadcast(rt), "v")
        .join(F.broadcast(ct), F.col("c").eqNullSafe(F.col("__ct_c")))
        .crossJoin(F.broadcast(nn))
        .agg(chi2.alias("chi2"))
        .crossJoin(F.broadcast(nn))
        .crossJoin(F.broadcast(k_cats))
        .crossJoin(F.broadcast(n_vars))
        .select(
            F.col("nn").cast("long").alias("n_total"),
            dof.alias("dof"),
            "chi2",
            crit_col.alias("crit"),
            (F.col("chi2") > crit_col).alias("significant"),
        )
    )


def kaplan_meier(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    censor_gap_hours: int = 72,
    scale: int = 1_000_000_000,
) -> DataFrame:
    """Kaplan–Meier survival over user lifetimes → one row per churn
    time: (duration_days, n_at_risk, n_churned, log_survival).

    Lifetime = days between a user's first and last event; a user
    CHURNS at their last event unless it falls within
    `censor_gap_hours` of the observation end (then they are censored
    — still alive when the data stops, the standard right-censoring
    rule). The gap compares exact epoch MICROSECONDS, not calendar-day
    boundary counts — a day-granular gap made every user censored on
    fixtures whose whole span is dense hourly traffic (the r7 vacuous
    oracle: zero churners at every SF because no user's last-event gap
    reached 3 calendar days), and boundary-count semantics differ
    between engines anyway. The KM
    estimator S(t) = Π_{t_i <= t} (1 - d_i / n_i) is a cumulative
    PRODUCT, which engines cannot sum associatively — so the output is
    the LOG-domain curve: each factor contributes the exact bigint
    floor(ln((n_i - d_i)/n_i)·scale), the running sum is a window over
    the churn-time table, and log_survival = round(cum/scale, 6).
    exp() is deliberately NOT applied — libm last-ulp differences
    across engines would break value parity, and survival comparisons
    are monotone in the log domain anyway.

    Scale shape: two corpus aggregations (per-user lifetime, then
    per-duration counts); the running-product window orders a table
    bounded by DISTINCT DURATIONS (observation-window days), not users
    — dimension-sized, the same contract as the global KM curve any
    survival library prints.
    """
    from pyspark.sql import Window

    if scale <= 0 or censor_gap_hours < 0:
        raise ValueError(
            f"need scale > 0 and censor_gap_hours >= 0; "
            f"got ({scale}, {censor_gap_hours})"
        )
    life = events.groupBy(F.col(key_col).alias("key")).agg(
        F.min(ts_col).alias("first_ts"), F.max(ts_col).alias("last_ts")
    )
    horizon = events.agg(F.max(ts_col).alias("end_ts"))
    per_user = life.crossJoin(F.broadcast(horizon)).select(
        F.datediff(F.col("last_ts"), F.col("first_ts")).alias("dur"),
        (
            F.unix_micros(F.col("end_ts")) - F.unix_micros(F.col("last_ts"))
            > F.lit(int(censor_gap_hours) * 3_600_000_000)
        ).alias("churned"),
    )
    # risk sets by duration: n_at_risk(d) = users with dur >= d — a
    # running total from the top of the duration-sorted table
    by_dur = per_user.groupBy("dur").agg(
        F.count(F.lit(1)).alias("n_ending"),
        F.sum(F.col("churned").cast("long")).alias("n_churned"),
    )
    w_desc = (
        Window.orderBy(F.desc("dur"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_asc = (
        Window.orderBy("dur")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    risk = by_dur.withColumn("n_at_risk", F.sum("n_ending").over(w_desc))
    # everyone-at-risk-churns (possible only at the LAST churn time —
    # no one remains at risk afterwards): survival is exactly 0 and
    # ln(0) = -inf, which floor/cast handle differently per engine —
    # emit NULL log_survival for that terminal row instead
    dead = F.col("n_churned") >= F.col("n_at_risk")
    term = F.when(dead, F.lit(None).cast("long")).otherwise(
        F.floor(
            F.log(
                (F.col("n_at_risk") - F.col("n_churned")).cast("double")
                / F.col("n_at_risk").cast("double")
            )
            * F.lit(float(scale))
        ).cast("long")
    )
    return (
        risk.filter(F.col("n_churned") > 0)
        .withColumn("__t", term)
        .withColumn("__dead", dead)
        .withColumn("__cum", F.sum("__t").over(w_asc))
        .select(
            F.col("dur").cast("int").alias("duration_days"),
            F.col("n_at_risk").cast("long"),
            F.col("n_churned").cast("long"),
            F.when(F.col("__dead"), F.lit(None).cast("double"))
            .otherwise(
                F.round(F.col("__cum") / F.lit(float(scale)), 6)
            )
            .alias("log_survival"),
        )
    )


def pareto_concentration(
    orders: DataFrame,
    key_col: str = "o_custkey",
    amount_col: str = "o_totalprice",
    n_tiles: int = 10,
) -> DataFrame:
    """Revenue-concentration (Pareto) curve → one row per customer
    decile: (tile, n_customers, revenue, revenue_share, cum_share).

    The "top 10% of customers produce X% of revenue" curve: customers
    rank by exact decimal revenue (ties broken by key for determinism),
    ntile into `n_tiles` equal-count buckets, and shares cumulate from
    the highest-revenue tile down. Revenue is decimal-exact end to end;
    shares divide once and round.

    Scale shape: one per-key aggregation, then the DISTRIBUTED global
    rank (relational.distributed_rank — range repartition + parallel
    per-partition windows + broadcast offsets; a bare ntile() window
    would single-task-sort the whole customer table, the pretrain_pack
    anti-pattern) with the SQL ntile bucketing derived arithmetically
    from (rank, N): the first N mod k tiles take ceil(N/k) rows. The
    final rollup + cumulative window order tile counts, never keys.
    """
    from pyspark.sql import Window

    from data_pipeline2_spark.operators.relational import distributed_rank

    if n_tiles < 2:
        raise ValueError(f"n_tiles must be >= 2, got {n_tiles}")
    # per-key revenue feeds the ranker AND the total count
    per_key = orders.groupBy(F.col(key_col).alias("key")).agg(
        F.sum(
            F.col(amount_col).cast("decimal(25,2)")
        ).alias("rev")
    ).transform(materialize)
    ranked = distributed_rank(per_key, [F.desc("rev"), F.col("key")])
    n_total = per_key.agg(F.count(F.lit(1)).alias("__n"))
    size = F.floor(F.col("__n") / n_tiles)
    rem = F.col("__n") % n_tiles
    boundary = (size + 1) * rem
    tile = F.when(
        F.col("rank") <= boundary,
        F.floor((F.col("rank") - 1) / (size + 1)) + 1,
    ).otherwise(
        rem + F.floor((F.col("rank") - 1 - boundary) / size) + 1
    )
    tiled = ranked.crossJoin(F.broadcast(n_total)).withColumn(
        "tile", tile.cast("int")
    )
    by_tile = tiled.groupBy("tile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("rev").alias("trev"),
    )
    total = by_tile.agg(F.sum("trev").alias("grand"))
    w_cum = (
        Window.orderBy("tile")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        by_tile.crossJoin(F.broadcast(total))
        .withColumn("__cum", F.sum("trev").over(w_cum))
        .select(
            F.col("tile").cast("int"),
            F.col("n_customers").cast("long"),
            F.round(F.col("trev").cast("double"), 2).alias("revenue"),
            # cast BEFORE dividing: decimal/decimal result scales
            # differ between engines; double/double does not
            F.round(
                F.col("trev").cast("double")
                / F.col("grand").cast("double"),
                6,
            ).alias("revenue_share"),
            F.round(
                F.col("__cum").cast("double")
                / F.col("grand").cast("double"),
                6,
            ).alias("cum_share"),
        )
    )


def burstiness(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    bucket: str = "hour",
    threshold: float = 2.0,
) -> DataFrame:
    """Per-key Fano factor of bucketed event rates → (key, n_buckets,
    mean_rate, fano, bursty).

    Fano = variance / mean of the per-bucket counts: a Poisson
    (organic) arrival process sits at ~1, schedulers and bots collapse
    toward 0, bursty scraping blows past `threshold` — the
    dispersion-based bot signal next to events_type_entropy's variety
    signal. Counts are integers, so Σx and Σx² are exact bigints and
    mean/variance/fano are fixed-order double ops on exact sums.

    Note the denominator convention: buckets a key never touched are
    NOT imputed as zeros (n = observed buckets) — the same convention
    as events_cusum_drift; impute the grid first (gap_fill) if the
    zero-inclusive dispersion is wanted.
    """
    counts = events.groupBy(
        F.col(key_col).alias("key"),
        F.date_trunc(bucket, F.col(ts_col)).alias("b"),
    ).agg(F.count(F.lit(1)).alias("x"))
    agg = counts.groupBy("key").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s"),
        F.sum(F.col("x") * F.col("x")).alias("ss"),
    )
    mean = F.col("s") / F.col("n")
    fano = F.round((F.col("ss") / F.col("n") - mean * mean) / mean, 6)
    return agg.select(
        F.col("key").alias(key_col),
        F.col("n").cast("long").alias("n_buckets"),
        F.round(mean, 6).alias("mean_rate"),
        fano.alias("fano"),
        (fano > F.lit(float(threshold))).alias("bursty"),
    )


def conversion_latency(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    from_type: str = "view",
    to_type: str = "purchase",
) -> DataFrame:
    """Funnel latency summary → ONE row: (n_users, n_converted,
    conv_rate, median_latency_sec, p90_latency_sec).

    Time from a user's FIRST `from_type` to their first `to_type` at
    or after it — the funnel's companion number (events_funnel counts
    who converts; this measures how long conversion takes). Latencies
    are exact bigint microsecond differences divided once; the
    percentiles are exact `percentile` (the distribution_stats
    contract — swap for percentile_approx at lake scale).

    Scale shape: two keyed min-aggregations + one key join; the
    percentile aggregates the per-user latency table (key-cardinality).
    """
    first_from = events.filter(F.col(type_col) == from_type).groupBy(
        F.col(key_col).alias("key")
    ).agg(F.min(ts_col).alias("__f"))
    to_ev = events.filter(F.col(type_col) == to_type).select(
        F.col(key_col).alias("key"), F.col(ts_col).alias("__t")
    )
    conv = (
        first_from.join(to_ev, "key")
        .filter(F.col("__t") >= F.col("__f"))
        .groupBy("key")
        .agg(F.min("__t").alias("__c"), F.min("__f").alias("__f0"))
    )
    # __f is functionally dependent on key; min() carries it through
    # the aggregate (all copies equal) so the join needs no second pass
    lat = conv.select(
        "key",
        (
            (F.unix_micros(F.col("__c")) - F.unix_micros(F.col("__f0")))
            / F.lit(1_000_000.0)
        ).alias("lat"),
    )
    n_users = first_from.agg(F.count(F.lit(1)).alias("n_users"))
    return (
        lat.agg(
            F.count(F.lit(1)).alias("n_converted"),
            F.round(F.percentile(F.col("lat"), 0.5), 6).alias(
                "median_latency_sec"
            ),
            F.round(F.percentile(F.col("lat"), 0.9), 6).alias(
                "p90_latency_sec"
            ),
        )
        .crossJoin(F.broadcast(n_users))
        .select(
            F.col("n_users").cast("long"),
            F.col("n_converted").cast("long"),
            F.round(
                F.col("n_converted") / F.col("n_users"), 6
            ).alias("conv_rate"),
            "median_latency_sec",
            "p90_latency_sec",
        )
    )


def lag_autocorr(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    min_pairs: int = 3,
) -> DataFrame:
    """Per-key lag-1 autocorrelation of hourly event counts → (user_id,
    n_pairs, num_scaled, autocorr): the periodicity signature that
    separates schedulers/bots (counts echo hour over hour, r → 1) and
    alternating burst-rest scrapers (r → −1) from organic traffic
    (r ≈ 0) — the serial-correlation companion of `events_burstiness`'s
    Fano factor.

    Pearson r over consecutive-OBSERVED-hour pairs (x_t, x_{t+1}): the
    pair (h, h+1h) enters only when BOTH buckets have events — the same
    observed-bucket convention events_burstiness documents; zero-filling
    silent hours would require materializing every key's full hour
    range. All five sums (n, Σx, Σy, Σxy, Σx², Σy²) are exact BIGINTs;
    the n·Σ − Σ·Σ combinations are formed in DECIMAL(38,0) (the
    zipf_fit/heaps_fit discipline — plain int64 products silently wrap
    in Spark but raise in DuckDB once hourly counts grow large);
    num = n·Σxy − Σx·Σy is exported as `num_scaled` so the driver
    value-checks an exact integer, guarded to NULL past int64 range on
    BOTH engines (an unguarded decimal→BIGINT cast NULLs in Spark but
    raises in DuckDB — the same divergence one layer up), and r itself
    is ONE closing float expression — num / sqrt(varx · vary) with the variance
    factors multiplied in pinned double order, rounded at 6. Keys with
    fewer than `min_pairs` pairs or a degenerate variance (constant
    series) emit NULL autocorr but keep their row.

    Scale shape: one (key, hour) aggregation (map-side partials absorb
    bursts), one per-key window lead over hour buckets (hour-bucket
    cardinality, not event cardinality), one per-key rollup — the
    window and rollup reuse the key partitioning. Event rows never
    carry past the first aggregation.
    """
    if min_pairs < 2:
        raise ValueError(f"min_pairs must be >= 2, got {min_pairs}")
    from pyspark.sql.window import Window

    hours = events.groupBy(
        F.col(key_col).alias("k"),
        (F.floor(F.unix_timestamp(F.col(ts_col)) / 3600))
        .cast("long")
        .alias("h"),
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))
    w = Window.partitionBy("k").orderBy("h")
    pairs = (
        hours.select(
            "k",
            "h",
            "x",
            F.lead("h").over(w).alias("h2"),
            F.lead("x").over(w).alias("y"),
        )
        .filter(F.col("h2") == F.col("h") + 1)
        .select("k", "x", "y")
    )
    # Inner sums accumulate in DECIMAL(38,0), not int64 (ADVICE r10):
    # long*long wraps silently in Spark while DuckDB multiplies exactly
    # and sum(BIGINT) auto-widens to HUGEINT — casting the factors to
    # decimal BEFORE the product keeps both engines exact WITHIN 38
    # digits (the oracle mirrors by dropping its ::BIGINT narrowing).
    # Bounded-input assumption, not unconditional exactness (ADVICE
    # r11): past 38 digits Spark's non-ANSI sum(decimal) returns NULL
    # while DuckDB raises — wrap-vs-raise becomes null-vs-raise one
    # layer up. The inputs here are integerized log1p values (|x| <
    # 2^17 per row), so the 38-digit headroom covers ~1e28 rows per
    # key — the engines only diverge on inputs neither could sum
    # exactly anyway.
    dec = "decimal(38,0)"
    agg = pairs.groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(F.col("x").cast(dec)).alias("sx"),
        F.sum(F.col("y").cast(dec)).alias("sy"),
        F.sum(F.col("x").cast(dec) * F.col("y").cast(dec)).alias("sxy"),
        F.sum(F.col("x").cast(dec) * F.col("x").cast(dec)).alias("sxx"),
        F.sum(F.col("y").cast(dec) * F.col("y").cast(dec)).alias("syy"),
    )
    num = F.col("n_pairs").cast(dec) * F.col("sxy").cast(dec) - F.col(
        "sx"
    ).cast(dec) * F.col("sy").cast(dec)
    varx = F.col("n_pairs").cast(dec) * F.col("sxx").cast(dec) - F.col(
        "sx"
    ).cast(dec) * F.col("sx").cast(dec)
    vary = F.col("n_pairs").cast(dec) * F.col("syy").cast(dec) - F.col(
        "sy"
    ).cast(dec) * F.col("sy").cast(dec)
    zero = F.lit(0).cast(dec)
    r = F.round(
        num.cast("double")
        / F.sqrt(varx.cast("double") * vary.cast("double")),
        6,
    )
    max_i64 = F.lit("9223372036854775807").cast(dec)
    return agg.select(
        F.col("k").alias(key_col),
        "n_pairs",
        F.when(F.abs(num) <= max_i64, num.cast("long")).alias(
            "num_scaled"
        ),
        F.when(
            (F.col("n_pairs") >= min_pairs) & (varx > zero) & (vary > zero),
            r,
        ).alias("autocorr"),
    )


# Benford first-digit probabilities log10(1 + 1/d), floor-integerized
# at ppm in PYTHON once — no engine-side log10 enters the parity
# surface (the chi2-critical-table discipline)
BENFORD_PPM = {
    1: 301029, 2: 176091, 3: 124938, 4: 96910, 5: 79181,
    6: 66946, 7: 57991, 8: 51152, 9: 45757,
}


def benford_digit_test(
    events: DataFrame, value_col: str = "value", threshold_ppm: int = 30000
) -> DataFrame:
    """Benford's-law first-digit audit over a monetary column → one row
    per digit 1-9: (digit, observed, n_total, observed_ppm,
    benford_ppm, dev_ppm, suspicious): the classic forensic
    data-quality test (Benford 1938; Nigrini's fraud-audit standard) —
    organically-generated amounts follow P(d) = log10(1 + 1/d), while
    fabricated or clipped feeds flatten toward uniform.

    Exactness: values convert to integer cents through the engine's
    DECIMAL(25,2) contract (the exact_sum discipline — no double
    rounding enters; the monetary input is assumed to carry at most 2
    decimal places, the same assumption every exact_sum key makes — an
    input with MORE decimals would round HALF_UP in Spark's decimal
    cast but may round differently in DuckDB's), the leading digit is
    the first character of the INTEGER's decimal string (no log10
    near-power-of-ten ulp hazard), observed_ppm =
    (observed·10⁶) div n_total is TRUE integer division on both
    engines (`div` / `//` — no double ever enters, ADVICE r9),
    and the Benford table is an embedded Python-computed literal.
    Zero/NULL values carry no leading digit and are excluded. Digits
    with zero observations still emit their row (the grid is the
    literal 1-9 table, left-joined).

    Scale shape: ONE hash aggregation on the 9-value digit key (map-
    side partials absorb any volume), then literal-table joins.
    """
    if threshold_ppm < 0:
        raise ValueError(f"threshold_ppm must be >= 0, got {threshold_ppm}")
    spark = events.sparkSession
    cents = F.abs(
        (F.col(value_col).cast("decimal(25,2)") * 100).cast("long")
    )
    digits = (
        events.filter(F.col(value_col).isNotNull())
        .select(cents.alias("__cents"))
        .filter(F.col("__cents") > 0)
        .select(
            F.substring(F.col("__cents").cast("string"), 1, 1)
            .cast("int")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("observed"))
    )
    grid = spark.createDataFrame(
        sorted(BENFORD_PPM.items()), "digit int, benford_ppm long"
    )
    joined = (
        grid.join(digits, "digit", "left")
        .select(
            "digit",
            F.coalesce(F.col("observed"), F.lit(0))
            .cast("long")
            .alias("observed"),
            "benford_ppm",
        )
        .crossJoin(
            F.broadcast(
                digits.agg(
                    F.coalesce(F.sum("observed"), F.lit(0))
                    .cast("long")
                    .alias("n_total")
                )
            )
        )
    )
    # true integer division (both operands non-negative, so trunc ==
    # floor); the former floor-over-double was exact only below 2^53
    obs_ppm = F.expr(
        "(observed * 1000000) div greatest(n_total, 1)"
    ).cast("long")
    return joined.select(
        "digit",
        "observed",
        "n_total",
        obs_ppm.alias("observed_ppm"),
        "benford_ppm",
        F.abs(obs_ppm - F.col("benford_ppm")).alias("dev_ppm"),
        (F.abs(obs_ppm - F.col("benford_ppm")) > threshold_ppm).alias(
            "suspicious"
        ),
    )
