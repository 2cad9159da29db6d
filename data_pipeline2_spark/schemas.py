"""Explicit StructType schemas for every engine table.

Fixed schemas (no inference) mirror the reference's explicitly-created
index mappings (reference: doc_pipeline/services/document_storage.py:38-64,
vector_storage.py:42-59, job_storage.py:38-53) — on a 100 TB lake you
never want schema inference scanning footers across millions of files.

Testdata tables match /root/repo/TESTDATA.md; derived tables match
FIXTURES.md §5 (chunks, embedding_cache, doc_status_log, jobs,
search_results, timings).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

REGION = StructType(
    [
        StructField("r_regionkey", IntegerType()),
        StructField("r_name", StringType()),
    ]
)

NATION = StructType(
    [
        StructField("n_nationkey", IntegerType()),
        StructField("n_name", StringType()),
        StructField("n_regionkey", IntegerType()),
    ]
)

CUSTOMER = StructType(
    [
        StructField("c_custkey", LongType()),
        StructField("c_name", StringType()),
        StructField("c_nationkey", IntegerType()),
        StructField("c_acctbal", DoubleType()),
        StructField("c_mktsegment", StringType()),
    ]
)

SUPPLIER = StructType(
    [
        StructField("s_suppkey", LongType()),
        StructField("s_name", StringType()),
        StructField("s_nationkey", IntegerType()),
        StructField("s_acctbal", DoubleType()),
    ]
)

PART = StructType(
    [
        StructField("p_partkey", LongType()),
        StructField("p_name", StringType()),
        StructField("p_brand", StringType()),
        StructField("p_type", StringType()),
        StructField("p_size", IntegerType()),
        StructField("p_retailprice", DoubleType()),
    ]
)

ORDERS = StructType(
    [
        StructField("o_orderkey", LongType()),
        StructField("o_custkey", LongType()),
        StructField("o_orderstatus", StringType()),
        StructField("o_totalprice", DoubleType()),
        StructField("o_orderdate", TimestampType()),
        StructField("o_orderpriority", StringType()),
    ]
)

LINEITEM = StructType(
    [
        StructField("l_orderkey", LongType()),
        StructField("l_partkey", LongType()),
        StructField("l_suppkey", LongType()),
        StructField("l_linenumber", IntegerType()),
        StructField("l_quantity", DoubleType()),
        StructField("l_extendedprice", DoubleType()),
        StructField("l_discount", DoubleType()),
        StructField("l_tax", DoubleType()),
        StructField("l_returnflag", StringType()),
        StructField("l_linestatus", StringType()),
        StructField("l_shipdate", TimestampType()),
    ]
)

EVENTS = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

DOCUMENTS = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)

EMBEDDINGS = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("label", IntegerType()),
    ]
)

TABLE_SCHEMAS: dict[str, StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

# ---- derived tables the engine produces (FIXTURES.md §5) ----

# Chunk rows — the flattened analog of the reference's nested
# Document.chunks (reference: doc_pipeline/models/document.py:14-21,31;
# per-chunk metadata docling_service.py:222-236).
CHUNKS = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("chunk_id", StringType()),
        StructField("pos", IntegerType()),
        StructField("content", StringType()),
        StructField("chunk_number", IntegerType()),
        StructField("total_chunks", IntegerType()),
        StructField("strategy", StringType()),
        StructField("headings", ArrayType(StringType())),
        StructField("is_fallback", BooleanType()),
    ]
)

# Embedding-cache rows — the analog of the reference Redis cache
# `embedding:{provider}:{chunk_id}` with 24 h TTL
# (reference: doc_pipeline/services/embedding_cache.py:16-34).
EMBEDDING_CACHE = StructType(
    [
        StructField("chunk_id", StringType()),
        StructField("provider", StringType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("created_at", TimestampType()),
        StructField("expires_at", TimestampType()),
    ]
)

# Append-only status log — the analog of ES upserts to documents.status
# (reference: doc_pipeline/services/document_storage.py:143-175; enum
# models/document.py:7-12). Current state = latest-wins window.
DOC_STATUS_LOG = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("status", StringType()),
        StructField("error_message", StringType()),
        StructField("updated_at", TimestampType()),
    ]
)

# Jobs — the analog of the reference Job model (models/job.py:20-35).
JOBS = StructType(
    [
        StructField("job_id", StringType()),
        StructField("job_type", StringType()),
        StructField("status", StringType()),
        StructField("priority", IntegerType()),
        StructField("progress", DoubleType()),
        StructField("total_items", IntegerType()),
        StructField("processed_items", IntegerType()),
        StructField("created_at", TimestampType()),
        StructField("updated_at", TimestampType()),
    ]
)

# Multimodal asset rows — binary payload + typed metadata; the decode /
# feature-extract path runs over mapInPandas (operators/multimodal.py).
ASSETS = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("modality", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)
