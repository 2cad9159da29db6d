"""Parquet sources — the engine's primary scan path.

The reference reads rows from Elasticsearch indexes
(doc_pipeline/services/document_storage.py:116-140); this engine's
storage is a Parquet lake. Scans stay declarative so Catalyst pushes
filters into the row-group reader and prunes columns (check with
`df.explain("formatted")`: PushedFilters / ReadSchema).

Scale notes (100 TB):
- one directory per table, files sized 128 MB-1 GB; partition big fact
  tables by a date column (orders/o_orderdate, events/ts date) so
  partition pruning kicks in on time predicates;
- never infer schemas at scale — TABLE_SCHEMAS pins them.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from data_pipeline2_spark.schemas import TABLE_SCHEMAS

# columns stored as TIMESTAMP(NANOS) in the testdata parquet — Spark's
# reader rejects nanos, so (with spark.sql.legacy.parquet.nanosAsLong)
# we read them as long and convert: ns div 1000 → timestamp_micros.
# The testdata's ns values are µs-aligned, so the conversion is exact.
_NANOS_TS_COLS: dict[str, list[str]] = {"events": ["ts"]}


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table with its pinned schema."""
    # timestamp semantics must not depend on who built the session (the
    # driver hands queries a vanilla one): pin UTC at the single entry
    # point every query reads through. Runtime-settable, idempotent.
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass
    schema = TABLE_SCHEMAS.get(name)
    nanos_cols = _NANOS_TS_COLS.get(name, [])
    if schema is not None and nanos_cols:
        schema = StructType(
            [
                StructField(f.name, LongType() if f.name in nanos_cols else f.dataType)
                for f in schema.fields
            ]
        )
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.parquet(table_path(sf_dir, name))
    for c in nanos_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names=None) -> dict[str, DataFrame]:
    names = names or list(TABLE_SCHEMAS)
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_temp_views(spark: SparkSession, sf_dir: str, names=None) -> None:
    """Expose the tables to spark.sql(...) as temp views."""
    for name, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(name)
