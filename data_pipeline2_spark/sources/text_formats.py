"""JSONL / CSV sources and sinks — the interchange formats around a
training-data lake (JSONL in particular is the lingua franca for
document corpora; parquet stays the internal format).

Scale stance:
- **Schema is always explicit.** Inference costs a full extra pass over
  the data and can silently widen/narrow types between runs; at 100 TB
  both are unacceptable. Callers pass a DDL string or StructType.
- **Compression**: writers default to uncompressed for local tests;
  at scale pass compression="gzip" knowing gzip files are NOT
  splittable (one task per file — size files ~128 MB at write time via
  repartition) while uncompressed/bzip2 split fine.
- Reads are line-based and parallel: Spark splits uncompressed JSONL /
  CSV by byte ranges, so a single huge file still fans out.

Reference parity: the reference ingests raw bytes via POST + base64
(document_processor.py:47-74); JSONL/CSV ingest is the batch analog of
that entry point for text corpora.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_jsonl(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    compression: str | None = None,
) -> None:
    """Write one JSON object per line. Column order is not significant
    in JSON; readers bind by name."""
    w = df.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def read_jsonl(spark: SparkSession, path: str, schema) -> DataFrame:
    """Read JSONL with an EXPLICIT schema (DDL string or StructType).

    mode=FAILFAST: a corrupt line is a data bug to surface, not a row
    to silently null out — flip to PERMISSIVE + corrupt-record column
    only for known-dirty feeds.
    """
    return spark.read.schema(schema).option("mode", "FAILFAST").json(path)


# CSV cannot natively distinguish NULL from '': a NULL cell and an
# empty string both serialize to an empty field, and the reader maps
# empty back to NULL — silently corrupting empty-text documents. The
# sentinel (a string no real document contains) round-trips NULL
# explicitly so '' stays ''.
CSV_NULL_SENTINEL = "\\N__NULL__\\N"


def write_csv(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    header: bool = True,
    compression: str | None = None,
    null_value: str = CSV_NULL_SENTINEL,
    check_sentinel: bool = True,
) -> None:
    """CSV with full quoting/escaping enabled — newlines and quotes in
    text columns survive the roundtrip (multiLine on the read side);
    NULLs write as the sentinel so NULL and '' stay distinct.

    A cell whose REAL value equals the sentinel would silently
    round-trip to NULL; `check_sentinel` (on by default) fails fast
    with a count instead. It costs one extra pass over the string
    columns — at lake scale, disable it only if the feed provably
    cannot contain the sentinel (e.g. schema-validated upstream).
    """
    if check_sentinel:
        from functools import reduce

        from pyspark.sql import functions as F

        str_cols = [
            f.name for f in df.schema.fields if f.dataType.simpleString() == "string"
        ]
        if str_cols:
            n_bad = df.filter(
                reduce(
                    lambda a, b: a | b,
                    [F.col(c) == null_value for c in str_cols],
                )
            ).count()
            if n_bad:
                raise ValueError(
                    f"write_csv: {n_bad} row(s) contain the NULL sentinel "
                    f"{null_value!r} as a real value — they would read back "
                    "as NULL. Pass a different null_value or clean the feed."
                )
    w = (
        df.write.mode(mode)
        .option("header", str(header).lower())
        .option("quote", '"')
        .option("escape", '"')
        .option("nullValue", null_value)
        # the writer trims cell whitespace by default — lossy for text
        # corpora where leading/trailing space is content
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false")
    )
    if compression:
        w = w.option("compression", compression)
    w.csv(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema,
    header: bool = True,
    null_value: str = CSV_NULL_SENTINEL,
) -> DataFrame:
    """Read CSV with an explicit schema. multiLine=true pairs with the
    writer's quote-everything stance so embedded newlines parse; note
    multiLine makes gzip'd CSV single-task per file — another reason
    the lake-internal format is parquet."""
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("quote", '"')
        .option("escape", '"')
        .option("nullValue", null_value)
        .option("multiLine", "true")
        .option("mode", "FAILFAST")
        .csv(path)
    )


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink — the other columnar lake format Spark ships natively
    (zlib-compressed, vectorized reader, predicate pushdown). Exists so
    a corpus can interchange with Hive/Trino ORC lakes without an extra
    conversion hop."""
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str, schema) -> DataFrame:
    """Read ORC with an explicit schema (never infer at scale)."""
    return spark.read.schema(schema).orc(path)
