"""Z-order-style multi-dimensional clustering for parquet layouts.

Spark has no OPTIMIZE ZORDER; the same effect — row-groups whose
min/max ranges are tight on SEVERAL columns at once, so scans prune on
any of them — comes from sorting the write by a bit-interleaved key.

`zorder_key` interleaves the top `bits` bits of each column's rank
(quantile bucket), giving the classic Z-curve: rows close on the curve
are close in every dimension. Writing `df.repartitionByRange(key)
.sortWithinPartitions(key)` then yields parquet files whose per-column
statistics are selective for predicates on ANY of the interleaved
columns — at 100 TB this is the difference between touching 1% and
100% of files for a 2-column selective filter.

Pure expressions; deterministic; no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Rank col into [0, 2^bits) via min/max scaling (computed by the
    caller, typically from a cheap agg or known domain)."""
    n = (1 << bits) - 1
    scaled = (col.cast("double") - lo) / F.when(hi > lo, hi - lo).otherwise(F.lit(1.0))
    return F.least(
        F.greatest((scaled * n).cast("long"), F.lit(0)), F.lit(n)
    )


def zorder_key(buckets: list[Column], bits: int = 12) -> Column:
    """Interleave the bits of the given bucket columns into one long."""
    key = F.lit(0).cast("long")
    n_cols = len(buckets)
    for b in range(bits):
        for i, col in enumerate(buckets):
            src_bit = F.shiftright(col, b).bitwiseAND(F.lit(1))
            dst = b * n_cols + i
            key = key + (src_bit * F.lit(1 << dst).cast("long"))
    return key


def zorder_write(
    df: DataFrame,
    cols: list[str],
    path: str,
    bits: int = 12,
    n_files: int = 16,
) -> DataFrame:
    """Sort by the Z-curve and write; returns the re-read DataFrame.

    Column domains are taken from a single cheap min/max agg (at scale:
    use known domains or a sampled agg).
    """
    # the interleaved key must fit a signed long
    bits = min(bits, 63 // max(1, len(cols)))
    stats = df.agg(
        *[F.min(c).cast("double").alias(f"__lo_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"__hi_{c}") for c in cols],
    ).collect()[0]

    def domain(c):
        lo, hi = stats[f"__lo_{c}"], stats[f"__hi_{c}"]
        # empty input / all-null column: any constant domain works (the
        # bucket expression guards hi > lo), just don't crash on None
        return (float(lo) if lo is not None else 0.0,
                float(hi) if hi is not None else 1.0)

    buckets = []
    for c in cols:
        lo, hi = domain(c)
        buckets.append(_bucket(F.col(c), F.lit(lo), F.lit(hi), bits))
    key = zorder_key(buckets, bits)
    (
        df.withColumn("__z", key)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
    return df.sparkSession.read.parquet(path)


def zone_map_prune_eval(
    df,
    x_col,
    y_col,
    x_point: int,
    y_point: int,
    bits: int = 16,
    z_span: int = 64,
    lin_width: int = 64,
    lin_span: int = 150,
):
    """Data-skipping selectivity, measured: the same rows laid out two
    ways — linear (sorted by x, the single-column clustering every
    naive pipeline ships) vs z-order — with per-file (x, y) zone maps,
    then the fraction of files a point predicate on EACH dimension can
    skip → (layout, n_files, hit_x, hit_y, prune_x, prune_y).

    The number this produces is the whole argument for z-ordering: the
    linear layout prunes ~perfectly on its leading column and not at
    all on the other (every file's y-span is the full range), while
    the z-order layout prunes on BOTH (bounded squares). File
    surrogates are key ranges (floor(key/span)), not row counts, so
    the evaluation is one aggregation per layout — no global ordering
    window anywhere.
    """
    from pyspark.sql import functions as F

    base = df.select(
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
    )
    layouts = {
        "linear_x": F.floor(
            (F.col("x") * F.lit(lin_width) + F.col("y")) / F.lit(lin_span)
        ),
        "zorder": F.floor(
            zorder_key([F.col("x"), F.col("y")], bits=bits) / F.lit(z_span)
        ),
    }
    outs = []
    for name, file_expr in layouts.items():
        zone = base.groupBy(file_expr.alias("file_id")).agg(
            F.min("x").alias("x_lo"),
            F.max("x").alias("x_hi"),
            F.min("y").alias("y_lo"),
            F.max("y").alias("y_hi"),
        )
        hx = (
            (F.col("x_lo") <= x_point) & (F.col("x_hi") >= x_point)
        ).cast("long")
        hy = (
            (F.col("y_lo") <= y_point) & (F.col("y_hi") >= y_point)
        ).cast("long")
        outs.append(
            zone.agg(
                F.count(F.lit(1)).alias("n_files"),
                F.sum(hx).alias("hit_x"),
                F.sum(hy).alias("hit_y"),
            ).select(
                F.lit(name).alias("layout"),
                "n_files",
                "hit_x",
                "hit_y",
                F.round(
                    F.lit(1.0) - F.col("hit_x") / F.col("n_files"), 6
                ).alias("prune_x"),
                F.round(
                    F.lit(1.0) - F.col("hit_y") / F.col("n_files"), 6
                ).alias("prune_y"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
