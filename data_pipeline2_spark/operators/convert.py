"""Document conversion seam — the docling analog.

Reference: DoclingService.convert (docling_service.py:188-206) turns
PDF/DOCX/XLSX/PPTX/MD/TXT/image bytes into markdown via IBM Docling —
a heavyweight, non-deterministic external dependency excluded from the
correctness surface by design (SURVEY.md §7).

The engine ships the SEAM as first-class plumbing: a converter registry
keyed by MIME type, executed as one Arrow-batched mapInPandas pass over
(doc_id, content_type, content). Deterministic converters for text
formats are real; binary formats (pdf/docx/...) raise NotImplementedError
exactly where a docling-backed converter would plug in — or produce a
clearly-marked deterministic placeholder when `lenient=True` so
pipelines can be exercised end-to-end without the dependency.

Scale: conversion is the CPU-heavy ingest stage; it parallelizes by
input file with zero shuffle, and the converter only sees one Arrow
batch at a time, bounding memory per task.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame

CONVERT_SCHEMA = "doc_id long, content_type string, text string, converter string"

# MIME → bytes -> markdown/text converter
ConverterFn = Callable[[bytes], str]


def _convert_text(payload: bytes) -> str:
    return payload.decode("utf-8", errors="replace")


def _convert_markdown(payload: bytes) -> str:
    # the reference renames .txt→.md and passes through (docling_service.py:188-191)
    return payload.decode("utf-8", errors="replace")


MIME_DOCX = (
    "application/vnd.openxmlformats-officedocument.wordprocessingml.document"
)
MIME_XLSX = (
    "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet"
)
MIME_PPTX = (
    "application/vnd.openxmlformats-officedocument.presentationml.presentation"
)


def _convert_docx(payload: bytes) -> str:
    from data_pipeline2_spark.functions.docformats import docx_to_markdown

    return docx_to_markdown(payload)


def _convert_xlsx(payload: bytes) -> str:
    from data_pipeline2_spark.functions.docformats import xlsx_to_markdown

    return xlsx_to_markdown(payload)


def _convert_pptx(payload: bytes) -> str:
    from data_pipeline2_spark.functions.docformats import pptx_to_markdown

    return pptx_to_markdown(payload)


def _convert_pdf(payload: bytes) -> str:
    from data_pipeline2_spark.functions.docformats import pdf_extract_text

    return pdf_extract_text(payload)


def _convert_html(payload: bytes) -> str:
    from data_pipeline2_spark.functions.docformats import html_to_markdown

    return html_to_markdown(payload)


# Real converters (functions/docformats.py, pure stdlib): OOXML zip+XML
# walkers, HTML parser, PDF Flate/plain text-operator extraction —
# covering the structured-text core of the reference's docling formats
# (docling_service.py:188-206) deterministically.
DEFAULT_CONVERTERS: dict[str, ConverterFn] = {
    "text/plain": _convert_text,
    "text/markdown": _convert_markdown,
    "text/html": _convert_html,
    "application/pdf": _convert_pdf,
    MIME_DOCX: _convert_docx,
    MIME_XLSX: _convert_xlsx,
    MIME_PPTX: _convert_pptx,
}

# formats that genuinely need the external docling/OCR stack: image
# content has no text without OCR; raw archives have no single document
STUBBED_MIMES = {
    "application/zip",
    "image/png",
    "image/jpeg",
}


def convert_documents(
    ingested: DataFrame,
    converters: dict[str, ConverterFn] | None = None,
    lenient: bool = False,
) -> DataFrame:
    """(doc_id, content_type, content[, ...]) → (doc_id, content_type,
    text, converter).

    Unknown/stubbed MIME types raise NotImplementedError (strict mode,
    matching the reference's unsupported-format error) or yield a
    deterministic placeholder marked converter='stub' (lenient mode).
    """
    table = dict(DEFAULT_CONVERTERS)
    if converters:
        table.update(converters)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out = []
            # zip over columns, not iterrows: per-row Series construction
            # would dominate this CPU-heavy stage
            for doc_id, mime, content in zip(
                pdf["doc_id"], pdf["content_type"], pdf["content"]
            ):
                payload = bytes(content or b"")
                fn = table.get(mime)
                err = ""
                if fn is not None:
                    if lenient:
                        # skip-and-placeholder on converter failure
                        # (image-only PDF, corrupt container, ...) — the
                        # per-item analog of the reference's
                        # skip-and-continue (embedding_service.py:206-212).
                        # The error class is recorded in the placeholder
                        # so a SYSTEMATIC converter bug shows up as a
                        # groupable error signature, not silent stubbing.
                        try:
                            out.append((doc_id, mime, fn(payload), mime))
                            continue
                        except Exception as exc:
                            fn = None
                            err = f" error:{type(exc).__name__}"
                    else:
                        out.append((doc_id, mime, fn(payload), mime))
                        continue
                if lenient:
                    sha = hashlib.sha256(payload).hexdigest()[:16]
                    out.append(
                        (
                            doc_id,
                            mime,
                            f"[unconverted {mime} payload sha256:{sha} "
                            f"bytes:{len(payload)}{err}]",
                            "stub",
                        )
                    )
                elif mime in STUBBED_MIMES:
                    # the docling plug-in point (docling_service.py:199)
                    raise NotImplementedError(
                        f"{mime} requires a docling-class converter "
                        "(external dependency) — register one or use "
                        "lenient=True"
                    )
                else:
                    raise NotImplementedError(
                        f"unknown content type {mime!r}: no converter "
                        "registered and not a recognized document format"
                    )
            yield pd.DataFrame(
                out, columns=["doc_id", "content_type", "text", "converter"]
            )

    return ingested.select("doc_id", "content_type", "content").mapInPandas(
        run, CONVERT_SCHEMA
    )


FIXTURE_FORMATS = ("docx", "xlsx", "pptx", "pdf", "html")
FIXTURE_MIMES = {
    "docx": MIME_DOCX,
    "xlsx": MIME_XLSX,
    "pptx": MIME_PPTX,
    "pdf": "application/pdf",
    "html": "text/html",
}


def fixture_binary_documents(
    documents: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic REAL binary documents — one actual DOCX/XLSX/PPTX/
    PDF/HTML file per id (format = id % 5, content a pure function of
    the id via functions/docformats.make_*), shaped like ingest output
    (doc_id, content_type, content) so convert_documents runs on real
    container bytes end-to-end."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from data_pipeline2_spark.functions import docformats as dfm

        makers = {
            "docx": dfm.make_docx,
            "xlsx": dfm.make_xlsx,
            "pptx": dfm.make_pptx,
            "pdf": dfm.make_pdf_doc,
            "html": dfm.make_html_doc,
        }
        for pdf in batches:
            mimes, payloads = [], []
            for did in pdf["doc_id"]:
                fmt = FIXTURE_FORMATS[int(did) % len(FIXTURE_FORMATS)]
                mimes.append(FIXTURE_MIMES[fmt])
                payloads.append(makers[fmt](int(did)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "content_type": mimes,
                    "content": payloads,
                }
            )

    from pyspark.sql import functions as F

    return documents.select(
        F.col(id_col).cast("long").alias("doc_id")
    ).mapInPandas(gen, "doc_id long, content_type string, content binary")
