"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship pipeline on sf0.001 (smoke check).
queries()     — every implemented operator from SURVEY.md §2
                (delegates to data_pipeline2_spark.registry).
oracle_sql()  — DuckDB-equivalent SQL for each SQL-expressible query.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_pipeline2_spark import registry  # noqa: E402
from data_pipeline2_spark.session import apply_engine_conf  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship pipeline: documents → fixed chunks → metadata enrich →
    per-language chunk statistics joined back to corpus stats.

    Touches scan, explode-chunking, window enrichment, aggregation and a
    broadcast join — the reference's ingest→chunk→stats spine
    (document_processor.py:96-132) as one declarative plan.
    """
    from pyspark.sql import functions as F

    from data_pipeline2_spark.operators import chunking
    from data_pipeline2_spark.sources.parquet import load_table

    apply_engine_conf(spark)
    docs = load_table(spark, SF_SMOKE, "documents")
    chunks = chunking.chunk_metadata_enrich(
        chunking.chunk_fixed(docs, 100), "fixed"
    )
    per_doc = chunks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(F.length("content")).alias("chunk_chars"),
    )
    return (
        docs.join(per_doc, "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("n_chunks").alias("chunks"),
            F.sum("chunk_chars").alias("chars"),
            (F.sum("chunk_chars") == F.sum("n_chars")).alias("chars_consistent"),
        )
        .orderBy("lang")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
