"""Binary-file ingestion — the analog of the reference upload endpoint.

Reference flow (doc_pipeline/services/document_processor.py:47-74 +
api/routes/documents.py:26-43): accept raw bytes + filename +
content_type, assign an id, base64-encode content, persist, enqueue.

Spark-first: `spark.read.format("binaryFile")` scans a directory of
raw files into (path, modificationTime, length, content binary); we
derive doc_id / content_type / base64 payload declaratively. MIME
detection re-derives the reference's libmagic sniff
(docling_service.py:53-55,183-185) as a deterministic CASE over file
extension and magic-byte prefixes — byte-for-byte libmagic parity is
out of scope (non-deterministic dependency).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# extension → MIME, mirroring the formats the reference accepts
# (docling_service.py:188-206: pdf/docx/xlsx/pptx/md/txt/images).
_EXT_MIME = {
    "pdf": "application/pdf",
    "docx": "application/vnd.openxmlformats-officedocument.wordprocessingml.document",
    "xlsx": "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet",
    "pptx": "application/vnd.openxmlformats-officedocument.presentationml.presentation",
    "md": "text/markdown",
    "txt": "text/plain",
    "png": "image/png",
    "jpg": "image/jpeg",
    "jpeg": "image/jpeg",
}

# magic-byte prefix (hex) → MIME; checked before extension.
_MAGIC_MIME = [
    ("25504446", "application/pdf"),  # %PDF
    ("504B0304", "application/zip"),  # PK.. (docx/xlsx/pptx containers)
    ("89504E47", "image/png"),
    ("FFD8FF", "image/jpeg"),
]


def mime_detect_col(content=None, path=None):
    """Deterministic MIME sniff: magic bytes first, then extension."""
    content = content if content is not None else F.col("content")
    path = path if path is not None else F.col("path")
    prefix = F.upper(F.hex(F.expr("substring(content, 1, 4)")))
    expr = F.lit(None).cast("string")
    # extension fallback (built innermost)
    ext = F.lower(F.element_at(F.split(path, r"\."), -1))
    ext_expr = F.lit("application/octet-stream")
    for e, m in reversed(list(_EXT_MIME.items())):
        ext_expr = F.when(ext == e, m).otherwise(ext_expr)
    expr = ext_expr
    for magic, m in reversed(_MAGIC_MIME):
        expr = F.when(prefix.startswith(magic[: min(len(magic), 8)]), m).otherwise(expr)
    return expr


def ingest_binary_dir(spark: SparkSession, path: str) -> DataFrame:
    """Directory of raw files → documents-shaped DataFrame.

    Columns: doc_id (deterministic 64-bit from path), filename,
    content_type, content (binary), content_b64, status, created_at.
    Deterministic doc_id (xxhash64 of path) replaces the reference's
    uuid4 (document_processor.py:54) so re-ingestion is idempotent —
    at 100 TB you want ingestion to be a deterministic, restartable
    batch, not uuid-per-run.
    """
    raw = spark.read.format("binaryFile").load(path)
    return (
        raw.select(
            F.xxhash64("path").alias("doc_id"),
            F.element_at(F.split("path", "/"), -1).alias("filename"),
            mime_detect_col().alias("content_type"),
            F.col("content"),
            # canonical unchunked base64 (Spark's base64 is MIME-chunked
            # with CRLF every 76 chars; strip for cross-system parity)
            F.translate(F.base64("content"), "\r\n", "").alias("content_b64"),
            F.lit("pending").alias("status"),
            F.col("modificationTime").alias("created_at"),
        )
    )
