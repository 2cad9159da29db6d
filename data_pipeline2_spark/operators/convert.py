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


DEFAULT_CONVERTERS: dict[str, ConverterFn] = {
    "text/plain": _convert_text,
    "text/markdown": _convert_markdown,
}

# formats the reference supports only via docling — stubbed here
STUBBED_MIMES = {
    "application/pdf",
    "application/vnd.openxmlformats-officedocument.wordprocessingml.document",
    "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet",
    "application/vnd.openxmlformats-officedocument.presentationml.presentation",
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
                if fn is not None:
                    out.append((doc_id, mime, fn(payload), mime))
                elif lenient:
                    sha = hashlib.sha256(payload).hexdigest()[:16]
                    out.append(
                        (
                            doc_id,
                            mime,
                            f"[unconverted {mime} payload sha256:{sha} "
                            f"bytes:{len(payload)}]",
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
