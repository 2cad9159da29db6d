"""Join surface.

The reference's join-shaped logic is key-value lookup composition
(Redis-tier coalesce, document_storage.py:116-140) and the anti-join
"compute only missing" cache pattern (embedding_service.py:148-170).
The engine exposes those plus the full relational join surface the
bench tables need.

Scale stance:
- dimension tables (region/nation/supplier, a batch of query vectors)
  are broadcast — `F.broadcast` pins it, AQE converts dynamically too;
- fact-fact joins shuffle on the join key; AQE skew-join splits hot
  keys; for repeated pipelines, bucket both sides on the key to delete
  the shuffle entirely;
- semi/anti joins express EXISTS / NOT EXISTS without materializing the
  right side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def join_lookup(
    facts: DataFrame, dim: DataFrame, on, how: str = "inner", broadcast_dim: bool = True
) -> DataFrame:
    """Fact⋈dim equi-join with the dim broadcast (hash join, no shuffle
    of the fact side)."""
    right = F.broadcast(dim) if broadcast_dim else dim
    return facts.join(right, on=on, how=how)


def join_anti_incremental(
    pending: DataFrame, done: DataFrame, keys: list[str]
) -> DataFrame:
    """Rows in `pending` with no match in `done` — the incremental
    "compute only what's missing" pattern.

    Reference: embedding cache-aside — probe `embedding:{provider}:{chunk_id}`,
    compute only on miss (embedding_service.py:148-170, embedding_cache.py:16-34).
    At 100 TB this left_anti against the materialized result table is
    what turns a full recompute into an incremental batch.
    """
    return pending.join(done, on=keys, how="left_anti")


def join_semi(left: DataFrame, right: DataFrame, keys: list[str]) -> DataFrame:
    return left.join(right, on=keys, how="left_semi")


def revenue_by_nation(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str,
    date_lo: str,
    date_hi: str,
) -> DataFrame:
    """TPC-H Q5-shaped local-supplier-volume join chain.

    customer⋈orders⋈lineitem⋈supplier⋈nation⋈region with the
    supplier-nation = customer-nation co-location condition. Dims
    (region, nation, supplier at bench SF) broadcast; the orders⋈lineitem
    join shuffles on orderkey — at 100 TB both sides bucketed on
    orderkey makes it shuffle-free.
    """
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(25,4)"
    )
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit(date_lo).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_hi).cast("timestamp"))
    )
    n_r = nation.join(
        F.broadcast(region.filter(F.col("r_name") == region_name)),
        F.col("n_regionkey") == F.col("r_regionkey"),
    )
    return (
        customer.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            F.broadcast(supplier),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .join(F.broadcast(n_r), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


def shipping_priority(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str,
    order_date_cut: str,
    ship_date_cut: str,
    k: int = 10,
) -> DataFrame:
    """TPC-H Q3-shaped: unshipped-order revenue top-k.

    Partial-aggregation pushdown below the join (a rewrite Catalyst
    does not apply automatically): the grouping key is the join key, so
    lineitem collapses to one row per orderkey BEFORE joining — the
    join and top-k then move ~40x fewer rows. Equivalent because every
    output group is exactly one orderkey.
    """
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(25,4)"
    )
    li_agg = (
        lineitem.filter(
            F.col("l_shipdate") > F.lit(ship_date_cut).cast("timestamp")
        )
        .groupBy("l_orderkey")
        .agg(F.sum(revenue).alias("__rev"))
    )
    return (
        customer.filter(F.col("c_mktsegment") == segment)
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < F.lit(order_date_cut).cast("timestamp"))
        .join(li_agg, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            "o_orderkey",
            "o_orderdate",
            "o_orderpriority",
            F.col("__rev").cast("double").alias("revenue"),
        )
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(k)
    )


def range_join_events(
    events: DataFrame, windows: DataFrame, ts_col: str = "ts"
) -> DataFrame:
    """Non-equi (interval containment) join: event ts ∈ [w_start, w_end).

    Broadcast the window table (small); Spark plans BroadcastNestedLoop —
    at scale, bin both sides to an hour key first to make it an equi-join
    plus residual predicate (that scale path is `join_range`).
    """
    return events.join(
        F.broadcast(windows),
        (F.col(ts_col) >= F.col("w_start")) & (F.col(ts_col) < F.col("w_end")),
    )


def join_asof(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
) -> DataFrame:
    """As-of (backward) join: each left row gets the right row with the
    greatest right_ts <= left_ts for the same key, or NULL payload if
    none. Output = all left columns + right_payload columns.

    Spark has no ASOF JOIN (DuckDB/Pandas do; the oracle uses DuckDB's),
    and the naive formulation — inequality join + argmax — explodes to a
    range join. This is the shuffle-minimal formulation: UNION both
    sides tagged, ONE hash shuffle on the key, and a running
    last(payload, ignorenulls) window fills each left row with the most
    recent right payload. Cost is a single sort per key partition —
    the same shape as a windowed dedup, independent of time-range
    overlap, so it survives 100 TB where a range join would not.

    Ties: right rows sort BEFORE left rows at equal ts (<= semantics).
    Like DuckDB's ASOF JOIN, `right` should be unique per (key, ts) —
    among same-ts right rows the winner is otherwise unspecified.
    """
    from pyspark.sql.window import Window

    r_struct = F.struct(*[F.col(c) for c in right_payload])
    l_tagged = left.select(
        *key_cols,
        F.col(left_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        F.lit(None).cast(
            right.select(r_struct.alias("__r")).schema["__r"].dataType
        ).alias("__r"),
    )
    r_tagged = right.select(
        *key_cols,
        F.col(right_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(
            left.select(
                F.struct(*[F.col(c) for c in left.columns]).alias("__l")
            ).schema["__l"].dataType
        ).alias("__l"),
        r_struct.alias("__r"),
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("__ts").asc(), F.col("__side").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = (
        l_tagged.unionByName(r_tagged)
        .withColumn("__rv", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__side") == 0)
    )
    return filled.select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns],
        *[F.col(f"__rv.{c}").alias(c) for c in right_payload],
    )


def join_range(
    probe: DataFrame,
    intervals: DataFrame,
    key_cols: list[str],
    probe_ts: str,
    start_col: str,
    end_col: str,
    bucket_width_us: int,
) -> DataFrame:
    """Scalable interval join: probe rows matched to [start, end) windows
    on the same key, as an EQUI-join on (key, time-bucket) + residual
    range predicate — the banded-join rewrite of the O(n*m) nested loop.

    Each interval explodes to ceil(span/width)+1 bucket rows; each probe
    row maps to exactly one bucket; the join shuffles on (key, bucket)
    like any hash join. Choose bucket_width_us ~ the typical window span
    so intervals land in O(1) buckets. Timestamps are compared at
    microsecond precision (Spark's native timestamp resolution).
    """
    # integer `div`, not double `/` + cast: epoch-µs values (~1e15) lose
    # low bits in a double quotient, mis-bucketing boundary rows
    iv = (
        intervals.withColumn("__s_us", F.unix_micros(F.col(start_col)))
        .withColumn("__e_us", F.unix_micros(F.col(end_col)))
        .withColumn(
            "__bucket",
            F.explode(
                F.sequence(
                    F.expr(f"__s_us div {bucket_width_us}"),
                    # end is exclusive: the last covered bucket holds end-1µs
                    F.expr(f"(__e_us - 1) div {bucket_width_us}"),
                )
            ),
        )
        .drop("__s_us", "__e_us")
    )
    pr = probe.withColumn(
        "__p_us", F.unix_micros(F.col(probe_ts))
    ).withColumn("__bucket", F.expr(f"__p_us div {bucket_width_us}")).drop("__p_us")
    return (
        pr.join(iv, [*key_cols, "__bucket"])
        .filter(
            (F.col(probe_ts) >= F.col(start_col))
            & (F.col(probe_ts) < F.col(end_col))
        )
        .drop("__bucket")
    )
