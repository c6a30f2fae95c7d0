"""API-parity tests: the 4 routes, JSON shapes, and verb-agnostic
routing (reference main.go:36-104)."""

import pytest
import json
import urllib.request


from gotsdb_spark.api import dispatch, serve
from gotsdb_spark.storage.engine import Engine


@pytest.fixture()
def engine(spark, tmp_path):
    return Engine(spark, str(tmp_path / "data"))


def test_ready(engine):
    resp = dispatch(engine, "GET", "/ready")
    assert resp.status == 200 and resp.body == b""


def test_write_read_list_roundtrip(engine):
    w = dispatch(engine, "GET", "/collections/c/k/v")  # A4: value in path
    assert w.status == 200 and w.body == b""
    r = dispatch(engine, "GET", "/collections/c/k")
    assert r.status == 200
    assert json.loads(r.body) == {"data": "v"}  # main.go:70-77 shape
    ls = dispatch(engine, "GET", "/collections")
    assert json.loads(ls.body) == ["c"]


def test_error_envelope_shape(engine):
    r = dispatch(engine, "GET", "/collections/ghost/k")
    assert r.status == 404
    body = json.loads(r.body)
    assert set(body) == {"code", "message"}  # main.go:126-137 shape
    assert "ghost" in body["message"]


def test_any_verb_matches(engine):
    # main.go:79: HandleFunc without .Methods → any verb
    assert dispatch(engine, "DELETE", "/collections/c/k/v").status == 200
    assert dispatch(engine, "PUT", "/collections/c/k").status == 200


def test_http_server_end_to_end(engine):
    server = serve(engine, port=0)
    port = server.server_address[1]
    try:
        base = f"http://127.0.0.1:{port}"
        assert urllib.request.urlopen(f"{base}/ready").status == 200
        urllib.request.urlopen(f"{base}/collections/c/k/hello")
        with urllib.request.urlopen(f"{base}/collections/c/k") as r:
            assert json.loads(r.read()) == {"data": "hello"}
        with urllib.request.urlopen(f"{base}/collections") as r:
            assert json.loads(r.read()) == ["c"]
    finally:
        server.shutdown()
