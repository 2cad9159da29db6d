"""data_pipeline2_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference document-processing / semantic-search pipeline
(solaius/data_pipeline2): document ingestion, chunking, embedding,
vector similarity search, cache-aside incremental compute, job/status
lifecycle — plus the relational / aggregation / window / streaming
surface needed for large-scale (100 TB design point) training-data
pipelines: exact & near dedup, ANN similarity search, text analysis,
multimodal column plumbing.

Design stance (see SURVEY.md §7):
- Declarative DataFrame/SQL plans; Catalyst + AQE pick physical strategy.
- Built-in JVM expressions first; Arrow-batched pandas UDFs only where
  semantics genuinely require Python; row-at-a-time UDFs never.
- Every operator deterministic so a DuckDB oracle can hash-match it.
"""

__version__ = "0.1.0"

from data_pipeline2_spark.session import get_spark  # noqa: F401

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]
