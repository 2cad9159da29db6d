"""Real HTTP transport for the embedding-provider seam — stdlib only.

The reference talks to its Nomic/Granite embedding services over a
lazily-created shared aiohttp session (doc_pipeline/services/
embedding_service.py:40-43, POST at :51-74). The engine's provider
contract (operators/embedding.py: NomicProvider/GraniteProvider +
embed_with_retry) was transport-agnostic by design; this module is the
production transport that plugs into that seam.

Design constraints, in order:
- stdlib only (urllib.request) — the sandbox has no aiohttp/requests,
  and an executor-side dependency would have to ship to every worker
  anyway. One synchronous connection per Python worker is the Spark
  analog of the reference's one-session-per-event-loop: concurrency
  comes from task parallelism (32+ workers × Arrow batches), not from
  an in-worker event loop.
- error taxonomy mirrors the reference's retry split: transient
  failures (HTTP 5xx, 429, socket/URL errors, timeouts) raise
  TransientProviderError so embed_with_retry's 3-attempt exponential
  backoff applies (embedding_service.py:45-50); client errors (other
  4xx) raise NonRetryableProviderError immediately — retrying a 401
  forever is how pipelines melt providers.
- never used in oracled queries: live HTTP is non-deterministic, so
  the correctness surface keeps the hash-projection embedder; this
  transport is exercised by tests against a local http.server mock
  (tests/test_curation_r6b.py) and swaps in via make_provider_embedder
  (session_factory=lambda: HttpSession(...)).
"""

from __future__ import annotations

import json as _json
import socket
import urllib.error
import urllib.request

from data_pipeline2_spark.operators.embedding import TransientProviderError


class NonRetryableProviderError(RuntimeError):
    """A 4xx-class provider failure — retrying cannot help."""


class HttpSession:
    """Minimal synchronous JSON-POST session satisfying the provider
    seam's contract: post(url, json=payload, headers=...) -> dict.

    `timeout` bounds each attempt (the reference relies on aiohttp's
    default timeout; an unbounded executor-side HTTP call would wedge a
    Spark task slot until spark.network.timeout killed the whole task).
    """

    def __init__(self, timeout: float = 30.0):
        self.timeout = timeout

    def post(self, url: str, json: dict, headers: dict | None = None) -> dict:
        body = _json.dumps(json).encode("utf-8")
        req = urllib.request.Request(url, data=body, method="POST")
        req.add_header("Content-Type", "application/json")
        for k, v in (headers or {}).items():
            req.add_header(k, v)
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                return _json.loads(resp.read().decode("utf-8"))
        except urllib.error.HTTPError as e:
            # read+close so the connection can be reused either way
            detail = ""
            try:
                detail = e.read(512).decode("utf-8", "replace")
            except Exception:
                pass
            if e.code >= 500 or e.code == 429:
                raise TransientProviderError(
                    f"HTTP {e.code} from {url}: {detail}"
                ) from e
            raise NonRetryableProviderError(
                f"HTTP {e.code} from {url}: {detail}"
            ) from e
        except (urllib.error.URLError, socket.timeout, OSError) as e:
            raise TransientProviderError(f"{url}: {e}") from e
