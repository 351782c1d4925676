"""Persistent serving process — the Roxie analog, made concrete.

The reference splits its engine in two: Thor runs batch queries,
Roxie holds the BUILDINDEX output memory-resident and answers point
queries across requests (`PrefixTree.ecl:459-588`). The engine's
in-process analog is ``build_local_index`` (one collect+merge, reused
across calls); this module adds the missing piece — a KEEP-ALIVE
process boundary, so the index outlives any one client and amortizes
across clients, not just across calls.

``PrefixTreeServer`` is a dependency-free HTTP server (stdlib
``http.server``) over a ``LocalIndex``:

    GET /search?q=<word>&k=<max_distance>   → [[word, distance], ...]
    GET /prefix?p=<prefix>                  → [word, ...]
    GET /health                             → {"nodes": N}

Operationally (documented, not sandbox-testable beyond localhost):
run one server per replica behind any HTTP load balancer; the index
is immutable once loaded, so replicas need no coordination — rebuild
→ restart is the refresh story (or a blue/green pair). For batch
traffic keep using ``query(..., index=handle)``; HTTP is the
low-latency single-lookup path only. A Spark Connect deployment can
host the same handle server-side; nothing here depends on a
SparkSession once the index is built.

Threading: ``ThreadingHTTPServer`` + a read-only index — traversals
(`LocalIndex.search`) allocate per-call state, so concurrent requests
need no locks.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from prefixtree_spark.operators.query import LocalIndex


class PrefixTreeServer:
    """Serve a ``LocalIndex`` over HTTP until stopped.

    >>> srv = PrefixTreeServer(build_local_index(pt)).start()
    >>> # GET http://host:port/search?q=KAMINSKI&k=1
    >>> srv.stop()
    """

    def __init__(
        self, index: LocalIndex, *, host: str = "127.0.0.1", port: int = 0,
        max_k: int = 8,
    ):
        self.index = index
        self.max_k = int(max_k)
        self._host = host
        self._port = port
        self._httpd: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    # -- lifecycle ---------------------------------------------------------

    def start(self) -> "PrefixTreeServer":
        if self._httpd is not None:
            # a second start() would abandon a live server with no
            # remaining handle to stop it (leaked port + thread)
            raise RuntimeError("server already running; stop() it first")
        index = self.index
        max_k = self.max_k

        class Handler(BaseHTTPRequestHandler):
            # keep-alive: every response carries Content-Length, so
            # HTTP/1.1 persistent connections are free — without this
            # each "low-latency" lookup paid a fresh TCP handshake
            protocol_version = "HTTP/1.1"

            def do_GET(self) -> None:  # noqa: N802 (stdlib casing)
                url = urlparse(self.path)
                q = {k: v[0] for k, v in parse_qs(url.query).items()}
                try:
                    if url.path == "/health":
                        body = {"nodes": int(len(index.ids))}
                    elif url.path == "/search":
                        k = int(q.get("k", "1"))
                        if not 0 <= k <= max_k:
                            # unbounded k would traverse the whole trie
                            # and serialize the entire dictionary into
                            # one response on any client's say-so
                            self.send_error(
                                400, f"k must be in [0, {max_k}]"
                            )
                            return
                        body = [
                            [w, int(d)] for w, d in index.search(q["q"], k)
                        ]
                    elif url.path == "/prefix":
                        body = index.search_prefix(q["p"])
                    else:
                        self.send_error(404)
                        return
                except (KeyError, ValueError) as exc:
                    self.send_error(400, str(exc))
                    return
                payload = json.dumps(body).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

            def log_message(self, *args) -> None:  # quiet
                pass

        self._httpd = ThreadingHTTPServer((self._host, self._port), Handler)
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, name="prefixtree-serving", daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None
        if self._thread is not None:
            self._thread.join(timeout=10)
            self._thread = None

    @property
    def address(self) -> tuple[str, int]:
        assert self._httpd is not None, "server not started"
        host, port = self._httpd.server_address[:2]
        return str(host), int(port)

    def url(self, path: str = "") -> str:
        host, port = self.address
        return f"http://{host}:{port}{path}"

    def __enter__(self) -> "PrefixTreeServer":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()
