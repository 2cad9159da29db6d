"""HTTP API veneer — the engine analog of the reference's FastAPI
surface (doc_pipeline/api/main.py + api/routes/documents.py), built on
the stdlib only (fastapi is not available in this environment).

Endpoints mirror the reference contract:

  GET  /health                           (api/main.py health check)
  POST /api/v1/documents/                upload bytes (?filename=...) →
                                         {doc_id, status: pending}
                                         (api/routes/documents.py:26-43)
  GET  /api/v1/documents/{id}            document row
  GET  /api/v1/documents/{id}/status     status projection (:59-71)
  POST /api/v1/documents/search          {"query": text, "k": n} →
                                         cosine kNN over embeddings
                                         (:120-130 + vector_storage kNN)
  GET  /api/v1/documents/{id}/chunks     chunker output for one doc

The server is a thin veneer: every request maps onto the same operators
the batch/driver surface uses (point_lookup, knn_cosine, chunk_*,
hash embedder). Uploads are processed SYNCHRONOUSLY (chunk on ingest)
— the reference's async queue semantics live in streaming/events.py;
an API worker would submit to that stream in a real deployment.
"""

from __future__ import annotations

import base64 as _b64
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from pyspark.sql import functions as F


class EngineAPI:
    """Holds the session + corpus and implements each endpoint."""

    def __init__(self, spark, sf_dir: str):
        from data_pipeline2_spark.sources.parquet import load_table

        self.spark = spark
        self.sf_dir = sf_dir
        self.documents = load_table(spark, sf_dir, "documents")
        self.embeddings = load_table(spark, sf_dir, "embeddings")
        self.uploads: dict[int, dict] = {}  # uploaded docs (this process)
        self._lock = threading.Lock()

    # ---- endpoint implementations ----

    def upload(self, payload: bytes, filename: str) -> dict:
        from data_pipeline2_spark.operators import chunking

        text = payload.decode("utf-8", errors="replace")
        doc_id = int.from_bytes(
            __import__("hashlib").sha256(filename.encode() + payload).digest()[:6],
            "big",
        )
        df = self.spark.createDataFrame([(doc_id, text)], "doc_id long, text string")
        chunks = chunking.chunk_metadata_enrich(
            chunking.chunk_sentence_exact(df, 500), "sentence"
        )
        rows = [r.asDict() for r in chunks.collect()]
        with self._lock:
            self.uploads[doc_id] = {
                "doc_id": doc_id,
                "filename": filename,
                "status": "completed",
                "content_b64": _b64.b64encode(payload).decode(),
                "chunks": rows,
            }
        return {"doc_id": doc_id, "status": "completed", "n_chunks": len(rows)}

    def get_document(self, doc_id: int) -> dict | None:
        with self._lock:
            if doc_id in self.uploads:
                up = self.uploads[doc_id]
                return {k: up[k] for k in ("doc_id", "filename", "status")}
        from data_pipeline2_spark.operators.relational import point_lookup

        rows = point_lookup(self.documents, "doc_id", doc_id).collect()
        if not rows:
            return None
        r = rows[0]
        return {
            "doc_id": r["doc_id"],
            "lang": r["lang"],
            "source": r["source"],
            "n_chars": r["n_chars"],
            "status": "completed",
        }

    def get_status(self, doc_id: int) -> dict | None:
        doc = self.get_document(doc_id)
        return {"doc_id": doc_id, "status": doc["status"]} if doc else None

    def get_chunks(self, doc_id: int) -> list | None:
        from data_pipeline2_spark.operators import chunking

        with self._lock:
            if doc_id in self.uploads:
                return self.uploads[doc_id]["chunks"]
        doc = self.documents.filter(F.col("doc_id") == doc_id)
        if not doc.take(1):
            return None
        out = chunking.chunk_metadata_enrich(
            chunking.chunk_sentence_exact(doc, 500), "sentence"
        )
        return [r.asDict() for r in out.collect()]

    def search(self, query: str, k: int = 10) -> list:
        from data_pipeline2_spark.operators.embedding import hash_embed_one
        from data_pipeline2_spark.operators.similarity import knn_cosine

        qvec = hash_embed_one(query, 64)
        hits = knn_cosine(self.embeddings, qvec, k=k)
        return [{"vec_id": r["vec_id"], "score": r["score"]} for r in hits.collect()]


def make_handler(api: EngineAPI):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # silence request logging in tests
            pass

        def _send(self, code: int, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            parts = urlparse(self.path)
            seg = [s for s in parts.path.split("/") if s]
            if seg == ["health"]:
                return self._send(200, {"status": "ok"})
            if len(seg) >= 4 and seg[:3] == ["api", "v1", "documents"]:
                try:
                    doc_id = int(seg[3])
                except ValueError:
                    return self._send(400, {"error": "doc_id must be an integer"})
                if len(seg) == 4:
                    doc = api.get_document(doc_id)
                    return (
                        self._send(200, doc)
                        if doc
                        else self._send(404, {"error": "not found"})
                    )
                if seg[4] == "status":
                    st = api.get_status(doc_id)
                    return (
                        self._send(200, st)
                        if st
                        else self._send(404, {"error": "not found"})
                    )
                if seg[4] == "chunks":
                    ch = api.get_chunks(doc_id)
                    return (
                        self._send(200, {"doc_id": doc_id, "chunks": ch})
                        if ch is not None
                        else self._send(404, {"error": "not found"})
                    )
            return self._send(404, {"error": "unknown route"})

        def do_POST(self):
            parts = urlparse(self.path)
            seg = [s for s in parts.path.split("/") if s]
            length = int(self.headers.get("Content-Length", "0"))
            payload = self.rfile.read(length) if length else b""
            if seg == ["api", "v1", "documents"]:
                filename = parse_qs(parts.query).get("filename", ["upload.txt"])[0]
                if not payload:
                    return self._send(400, {"error": "empty body"})
                return self._send(200, api.upload(payload, filename))
            if seg == ["api", "v1", "documents", "search"]:
                try:
                    req = json.loads(payload or b"{}")
                except json.JSONDecodeError:
                    return self._send(400, {"error": "invalid JSON"})
                query = req.get("query")
                if not query:
                    return self._send(400, {"error": "missing 'query'"})
                k = int(req.get("k", 10))
                return self._send(200, {"results": api.search(query, k)})
            return self._send(404, {"error": "unknown route"})

    return Handler


def serve(spark, sf_dir: str, port: int = 0):
    """Start the API server (port 0 = ephemeral); returns the server
    (with .server_address) — call .shutdown() to stop."""
    api = EngineAPI(spark, sf_dir)
    server = ThreadingHTTPServer(("127.0.0.1", port), make_handler(api))
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    return server
