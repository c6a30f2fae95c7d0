"""HTTP API parity layer: the reference's 4 routes over the Spark engine.

Route map (reference main.go):
- GET /ready                                  → 200 empty    (main.go:36)
- GET /collections                            → JSON array   (main.go:37-47)
- ANY /collections/{collection}/{key}         → {"data": v}  (main.go:48-78)
- ANY /collections/{collection}/{key}/{value} → 200 empty    (main.go:79-104)

JSON shapes match: success read is {"data": value} (main.go:70-77);
errors are {"code": <int>, "message": <str>} (main.go:126-137). The
reference registers handlers without .Methods(...) so any verb matches
(main.go:79) — reproduced here. One deliberate fix: a missing key or
collection returns 404, not the reference's blanket 500
(main.go:126-137 maps every error to 500); set strict_500_parity=True
to reproduce the 500 behavior exactly.

Handlers are plain functions over `Engine` so tests and embedding apps
call them without sockets; `serve()` wraps them in a stdlib
ThreadingHTTPServer (the reference's gorilla/mux server, main.go:107-109,
is replaced by the standard library — no new dependencies).
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from gotsdb_spark.storage.engine import (
    CollectionExistsError,
    CollectionNotFoundError,
    Engine,
    KeyNotFoundError,
)


@dataclass
class Response:
    status: int
    body: bytes
    content_type: str = "application/json"


def _error(status: int, message: str) -> Response:
    # main.go:126-137 error envelope
    return Response(status, json.dumps({"code": status, "message": message}).encode())


def handle_ready(engine: Engine) -> Response:
    """A1 (main.go:36): liveness no-op — 200, empty body."""
    return Response(200, b"", "text/plain")


def handle_list_collections(engine: Engine) -> Response:
    """A2 (main.go:37-47): JSON array of collection ids."""
    return Response(200, json.dumps(engine.list_collections()).encode())


def handle_read_key(
    engine: Engine, collection: str, key: str, strict_500_parity: bool = False
) -> Response:
    """A3 (main.go:48-78): {"data": value} or the error envelope."""
    try:
        value = engine.read_key(collection, key)
    except (KeyNotFoundError, CollectionNotFoundError) as exc:
        status = 500 if strict_500_parity else 404
        return _error(status, str(exc.args[0] if exc.args else exc))
    return Response(200, json.dumps({"data": value}).encode())


def handle_write_key(
    engine: Engine, collection: str, key: str, value: str,
    strict_500_parity: bool = False,
) -> Response:
    """A4 (main.go:79-104): write; empty 200 on success."""
    try:
        engine.write_key(collection, key, value)
    except (CollectionNotFoundError, CollectionExistsError) as exc:
        status = 500 if strict_500_parity else 404
        return _error(status, str(exc.args[0] if exc.args else exc))
    return Response(200, b"", "text/plain")


def dispatch(engine: Engine, method: str, path: str) -> Response:
    """Route a request path exactly as the reference's mux table does.

    Any HTTP verb matches every route (main.go:79 registers without
    .Methods), so `method` is accepted but unused — kept in the
    signature because it is part of the observable contract.
    """
    parts = [p for p in path.split("/") if p]
    if parts == ["ready"]:
        return handle_ready(engine)
    if parts == ["collections"]:
        return handle_list_collections(engine)
    if len(parts) == 3 and parts[0] == "collections":
        return handle_read_key(engine, parts[1], parts[2])
    if len(parts) == 4 and parts[0] == "collections":
        return handle_write_key(engine, parts[1], parts[2], parts[3])
    return _error(404, f"no route for [{path}]")


def serve(engine: Engine, port: int = 8080) -> ThreadingHTTPServer:
    """Start the parity HTTP server (reference port 8080, main.go:14).

    Returns the server; call .shutdown() to stop. Unlike the reference
    (which only flushes on server error, main.go:112-123), callers
    should flush_all_collections() on orderly shutdown.
    """

    class Handler(BaseHTTPRequestHandler):
        def _respond(self) -> None:
            resp = dispatch(engine, self.command, self.path)
            self.send_response(resp.status)
            self.send_header("Content-Type", resp.content_type)
            self.send_header("Content-Length", str(len(resp.body)))
            self.end_headers()
            self.wfile.write(resp.body)

        do_GET = do_POST = do_PUT = do_DELETE = _respond

        def log_message(self, *args: object) -> None:  # quiet
            pass

    server = ThreadingHTTPServer(("127.0.0.1", port), Handler)
    import threading

    threading.Thread(target=server.serve_forever, daemon=True).start()
    return server
