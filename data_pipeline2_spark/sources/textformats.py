"""JSONL / CSV source-format support with lossless roundtrip contracts.

The reference ingests documents as uploaded bytes (multipart API,
routes/documents.py) — an engine serving the same corpus also needs the
interchange formats training-data pipelines actually move text in:
newline-delimited JSON (the de-facto corpus format) and RFC-4180 CSV.

Both writers/readers here pin an explicit schema (never inference — a
100 TB read that infers schema scans data twice and can flip a column
type between runs) and use distributed spark.read/write — files split
per partition, so a directory of shards reads in parallel exactly like
parquet, minus the column pruning (documented trade-off: these formats
exist for interchange, parquet remains the processing layout).

CSV null contract: CSV cannot distinguish NULL from '' natively, so a
sentinel (`nullValue`) preserves NULL text through the roundtrip;
multiLine handles embedded newlines (quote-escaped per RFC 4180).
Scale note: multiLine makes each CSV FILE the split unit (embedded
newlines defeat line-splitting), so parallelism = shard count — write
many shards. JSONL files split by line and need no such care.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)

_CSV_NULL = "\\N__NULL__\\N"  # sentinel no real document contains


def write_jsonl(df: DataFrame, path: str) -> None:
    """Write as newline-delimited JSON (one object per line, null
    fields omitted — the JSON-native null representation)."""
    df.write.mode("overwrite").json(path)


def read_jsonl(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """Read JSONL with a pinned schema; missing keys surface as NULL."""
    return spark.read.schema(schema).json(path)


def write_csv(df: DataFrame, path: str) -> None:
    """Write RFC-4180 CSV: quote-doubling escape, header, NULL sentinel."""
    (
        df.write.mode("overwrite")
        .option("header", True)
        .option("quote", '"')
        .option("escape", '"')
        .option("nullValue", _CSV_NULL)
        # the WRITER trims field whitespace by default — lossy for text
        # with leading/trailing newlines; disable both sides explicitly
        .option("ignoreLeadingWhiteSpace", False)
        .option("ignoreTrailingWhiteSpace", False)
        .csv(path)
    )


def read_csv(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """Read the CSV written by write_csv: multiLine re-joins embedded
    newlines inside quotes; the sentinel restores NULLs."""
    return (
        spark.read.schema(schema)
        .option("header", True)
        .option("quote", '"')
        .option("escape", '"')
        .option("nullValue", _CSV_NULL)
        .option("multiLine", True)
        .csv(path)
    )


def _fidelity(df: DataFrame) -> DataFrame:
    """Roundtrip fidelity projection: full scalar columns + a sha256 of
    the text so a single flipped byte anywhere hash-fails upstream."""
    return df.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.sha2(F.col("text"), 256).alias("text_sha"),
    )


def jsonl_roundtrip(spark: SparkSession, docs: DataFrame, path: str) -> DataFrame:
    write_jsonl(docs, path)
    return _fidelity(read_jsonl(spark, path, DOCUMENTS_SCHEMA))


def csv_roundtrip(spark: SparkSession, docs: DataFrame, path: str) -> DataFrame:
    write_csv(docs, path)
    return _fidelity(read_csv(spark, path, DOCUMENTS_SCHEMA))
