"""Edge cases: strict 500-parity mode, concurrent engine access,
invalid collection ids, and dispatch of unknown routes."""

import pytest
import json
import threading


from gotsdb_spark.api import dispatch, handle_read_key
from gotsdb_spark.storage.engine import Engine


@pytest.fixture()
def engine(spark, tmp_path):
    return Engine(spark, str(tmp_path / "data"))


def test_strict_500_parity_mode(engine):
    """The reference maps every error to HTTP 500 (main.go:126-137);
    strict mode reproduces that, default mode uses 404."""
    resp = handle_read_key(engine, "ghost", "k", strict_500_parity=True)
    assert resp.status == 500
    body = json.loads(resp.body)
    assert body["code"] == 500
    assert (
        body["message"]
        == "No collection found for collection id [ghost] in hot or cold storage"
    )


def test_unknown_route_404(engine):
    resp = dispatch(engine, "GET", "/nope/deeper")
    assert resp.status == 404


def test_invalid_collection_id_rejected(engine):
    # anchored id validation (the reference's regex is unanchored and
    # buggy, cold.go:72 — ours rejects path-traversal-shaped ids)
    for bad in ("../etc", "a/b", "a.b", ""):
        with pytest.raises(ValueError):
            engine.read_key(bad, "k")


def test_concurrent_writes_are_safe(engine):
    """The reference races on its hot map (hot.go:53, no sync). The
    engine must serialize concurrent writers correctly."""
    errors = []

    def writer(tid: int) -> None:
        try:
            for i in range(50):
                engine.write_key("shared", f"k{tid}_{i}", f"v{tid}_{i}")
                engine.write_key("shared", "contended", f"tid{tid}")
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    threads = [threading.Thread(target=writer, args=(t,)) for t in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    # every private key present; the contended key holds one of the
    # last-written values
    for tid in range(8):
        assert engine.read_key("shared", f"k{tid}_49") == f"v{tid}_49"
    assert engine.read_key("shared", "contended").startswith("tid")


def test_concurrent_read_write_mix(engine):
    engine.write_key("c", "k", "v0")
    stop = threading.Event()
    errors = []

    def reader() -> None:
        while not stop.is_set():
            try:
                assert engine.read_key("c", "k").startswith("v")
            except Exception as exc:  # noqa: BLE001
                errors.append(exc)
                return

    t = threading.Thread(target=reader)
    t.start()
    for i in range(100):
        engine.write_key("c", "k", f"v{i}")
    stop.set()
    t.join()
    assert not errors
    assert engine.read_key("c", "k") == "v99"
