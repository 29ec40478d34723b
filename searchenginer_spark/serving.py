"""Thin HTTP/JSON gateway over a warm index — the Spark-side analog of
the reference's wfrest server (``src/Search_Engine_Server.cpp:44-77``,
routes ``/api/search`` and ``/api/suggest``; ``src/main.cpp:6-7`` port
wiring) and of its form-input percent-decoding (``src/Utils.cpp:5-28``).

The reference fronts native engines with an HTTP worker pool that
fans out RPCs. Here the driver IS the gateway: a stdlib
ThreadingHTTPServer whose handlers submit Spark jobs against an
``open_index()`` handle. Spark job submission is thread-safe, so the
handler threads share one SparkSession. This layer exists for parity
with the reference's query surface and for interactive use; bulk
callers should use ``search_query_batch`` / the CLI — one HTTP request
costs one-or-two Spark jobs (~0.3-0.5 s scheduling floor on local
mode, see PLANS.md §6), so pair it with ``serving_mode()``.

Request shapes (both routes take GET query strings or POST bodies in
``application/x-www-form-urlencoded`` or JSON):

* ``/api/search``: ``query`` (full grammar: phrases, +/-, fields,
  facets...), optional ``k`` and ``mode`` — returns
  ``{"query", "k", "results": [{"doc_id", "score"}...]}``.
* ``/api/suggest``: ``word``, optional ``k`` — returns
  ``{"word", "suggestions": [{"term", "sim"}...]}``.
* ``/api/search_batch`` (POST JSON): ``{"queries": {id: query, ...},
  "k", "mode"}`` — ONE Spark job for the whole set via
  ``search_query_batch`` (the measured ~10x-throughput serving shape,
  PLANS.md §6); returns ``{"k", "results": {id: [{"doc_id",
  "score"}...]}}`` with an entry for every id, hitless ids included.
"""

from __future__ import annotations

import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F


def url_decode(col) -> Column:
    """Columnar percent-decoding of form-encoded input ('+' -> space,
    %XX -> UTF-8 byte) — the vectorized analog of the reference's
    ``Utils.cpp:5-28`` urlDecode (and of :func:`urllib.parse.
    unquote_plus`); JVM-side via Spark's builtin url_decode."""
    return F.url_decode(col)


def decode_form(body: str) -> dict[str, str]:
    """Driver-side form decoding for gateway input: last-wins flat dict
    of percent-decoded key/value pairs."""
    return {
        k: v[-1]
        for k, v in urllib.parse.parse_qs(
            body, keep_blank_values=True, strict_parsing=False
        ).items()
    }


class SearchServer:
    """HTTP gateway bound to one index root. ``port=0`` binds an
    ephemeral port (read it back from ``.port``)."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        host: str = "127.0.0.1",
        port: int = 0,
        default_k: int = 10,
    ):
        from .plans.build_index import open_index

        self.spark = spark
        self.idx = open_index(spark, root)
        self.default_k = default_k
        # one request at a time against the shared index handle: its lazy
        # driver-dict cache and dict_version re-snapshot are check-then-act
        # mutations, unsafe under concurrent handler threads. Throughput
        # comes from /api/search_batch (one job per query SET), not from
        # handler parallelism — same trade the reference's worker pool
        # makes per engine connection.
        self._lock = threading.Lock()
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):  # keep test output quiet
                pass

            def _reply(self, code: int, payload: dict) -> None:
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _params(self) -> dict[str, str]:
                parsed = urllib.parse.urlsplit(self.path)
                params = decode_form(parsed.query)
                length = int(self.headers.get("Content-Length") or 0)
                if length:
                    raw = self.rfile.read(length)
                    ctype = (self.headers.get("Content-Type") or "").split(";")[0]
                    if ctype == "application/json":
                        try:
                            body = json.loads(raw)
                        except ValueError as e:
                            raise _BadRequest(f"malformed JSON body: {e}") from None
                        if not isinstance(body, dict):
                            raise _BadRequest("JSON body must be an object")
                        params.update(body)  # values keep type
                    else:  # the reference's form-body shape (Utils.cpp)
                        params.update(decode_form(raw.decode()))
                return params

            def _route(self) -> None:
                path = urllib.parse.urlsplit(self.path).path
                try:
                    params = self._params()
                    if path == "/api/search":
                        with server._lock:
                            self._reply(200, server.api_search(params))
                    elif path == "/api/search_batch":
                        with server._lock:
                            self._reply(200, server.api_search_batch(params))
                    elif path == "/api/suggest":
                        with server._lock:
                            self._reply(200, server.api_suggest(params))
                    else:
                        self._reply(404, {"error": f"no route {path}"})
                except _BadRequest as e:
                    self._reply(400, {"error": str(e)})
                except Exception as e:  # surface, don't kill the thread
                    self._reply(500, {"error": f"{type(e).__name__}: {e}"})

            do_GET = do_POST = _route

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self.httpd.server_address[1]
        self._thread: threading.Thread | None = None

    # --- route implementations (also callable directly in tests)

    def _k(self, params: dict) -> int:
        v = params.get("k")
        if v is None or v == "":
            return self.default_k
        try:
            k = int(v)
        except (TypeError, ValueError):
            raise _BadRequest(f"'k' must be an integer, got {v!r}") from None
        if k < 1:
            raise _BadRequest(f"'k' must be >= 1, got {k}")
        return k

    def api_search(self, params: dict[str, str]) -> dict:
        query = params.get("query") or params.get("q")
        if not query:
            raise _BadRequest("missing 'query'")
        k = self._k(params)
        mode = params.get("mode") or "and"
        rows = self.idx.search_query(query, k=k, mode=mode).collect()
        return {
            "query": query,
            "k": k,
            "results": [
                {"doc_id": r["doc_id"], "score": r["score"]} for r in rows
            ],
        }

    def api_search_batch(self, params: dict) -> dict:
        queries = params.get("queries")
        if isinstance(queries, str):  # form-encoded: JSON-valued field
            queries = json.loads(queries)
        if not isinstance(queries, dict) or not queries:
            raise _BadRequest("missing 'queries' (object of id -> query)")
        k = self._k(params)
        mode = params.get("mode") or "and"
        qs = {str(i): str(q) for i, q in queries.items()}
        rows = self.idx.search_query_batch(qs, k=k, mode=mode).collect()
        results: dict[str, list] = {i: [] for i in qs}
        for r in rows:
            results[r["query_id"]].append(
                {"doc_id": r["doc_id"], "score": r["score"]}
            )
        return {"k": k, "results": results}

    def api_suggest(self, params: dict[str, str]) -> dict:
        word = params.get("word") or params.get("q")
        if not word:
            raise _BadRequest("missing 'word'")
        k = self._k(params)
        from .operators.suggest import suggest

        # suggest from the handle's version-watched term_dict snapshot —
        # a privately-held parquet read would serve a stale dictionary
        # forever after incremental folds bump dict_version
        self.idx._check_version()
        rows = suggest(self.idx.term_dict, word, k=k).collect()
        return {
            "word": word,
            "suggestions": [{"term": r["term"], "sim": r["sim"]} for r in rows],
        }

    # --- lifecycle

    def start(self) -> "SearchServer":
        """Serve on a daemon thread; returns self (port is bound)."""
        self._thread = threading.Thread(
            target=self.httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def serve_forever(self) -> None:
        self.httpd.serve_forever()

    def shutdown(self) -> None:
        self.httpd.shutdown()
        self.httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=10)


class _BadRequest(ValueError):
    pass
