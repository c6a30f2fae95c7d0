"""Property-based KV tests: arbitrary operation sequences must agree
with a plain-dict model (last-writer-wins, flush/promote transparency).

Hypothesis drives (op, collection, key, value) sequences; the model is
the reference's own semantics — Collection map[string]string with
last-writer-wins upsert (reference types.go:3, hot.go:50-60). Flushes
and re-promotions must be invisible to reads.
"""

import pytest
import threading

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from gotsdb_spark.storage.engine import (
    CollectionNotFoundError,
    Engine,
    KeyNotFoundError,
)

COLLS = ("alpha", "beta")
KEYS = tuple(f"k{i}" for i in range(5))

ops = st.lists(
    st.one_of(
        st.tuples(
            st.just("write"),
            st.sampled_from(COLLS),
            st.sampled_from(KEYS),
            st.text(min_size=0, max_size=8),
        ),
        st.tuples(st.just("flush"), st.sampled_from(COLLS)),
        st.tuples(st.just("read"), st.sampled_from(COLLS), st.sampled_from(KEYS)),
    ),
    min_size=1,
    max_size=25,
)


@pytest.fixture(scope="module")
def prop_spark(spark):
    return spark


@given(sequence=ops)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@pytest.mark.slow
def test_engine_matches_dict_model(prop_spark, tmp_path_factory, sequence):
    data_dir = str(tmp_path_factory.mktemp("prop"))
    engine = Engine(prop_spark, data_dir)
    model: dict[str, dict[str, str]] = {}

    for op in sequence:
        if op[0] == "write":
            _, coll, key, value = op
            engine.write_key(coll, key, value)
            model.setdefault(coll, {})[key] = value
        elif op[0] == "flush":
            _, coll = op
            if coll in engine.list_hot():
                engine.flush_collection(coll)
        else:
            _, coll, key = op
            expected = model.get(coll, {}).get(key)
            if coll not in model:
                with pytest.raises(KeyError):
                    engine.read_key(coll, key)
            elif expected is None:
                with pytest.raises(KeyNotFoundError):
                    engine.read_key(coll, key)
            else:
                assert engine.read_key(coll, key) == expected

    # final audit: every model entry readable, including after a full
    # flush + fresh-engine promotion
    for coll, kv in model.items():
        for key, value in kv.items():
            assert engine.read_key(coll, key) == value
    engine.flush_all_collections()
    reborn = Engine(prop_spark, data_dir)
    for coll, kv in model.items():
        for key, value in kv.items():
            assert reborn.read_key(coll, key) == value


@pytest.mark.slow
def test_engine_concurrent_access_matches_models(spark, tmp_path_factory):
    """Concurrent write/read/flush/promote against ONE Engine.

    The reference's hot tier mutates its Go map with no mutex
    (hot.go:53) — concurrent PUTs can corrupt the map or lose writes;
    the rebuild serializes every hot-tier mutation behind
    ``Engine._lock``. Prove the lock actually delivers the guarantees:
    8 threads hammer one shared collection on DISJOINT per-thread
    keyspaces while interleaving flushes (hot→cold demotion) and the
    read-through promotions they force, and

    (a) no thread observes an unexpected exception (the only benign
        race is two threads flushing the same collection — the loser
        gets the reference's own not-found-in-hot error, hot.go:84),
    (b) every thread's read of its own key is read-your-writes
        consistent regardless of interleaved flush/load by others,
    (c) the final state equals the union of the per-thread dict models,
        including from a FRESH engine over the flushed log — concurrent
        flush/write interleavings never tear or drop a durable write.
    """
    data_dir = str(tmp_path_factory.mktemp("conc"))
    engine = Engine(spark, data_dir)
    n_threads, n_ops = 8, 24
    barrier = threading.Barrier(n_threads)
    failures: list[tuple[int, Exception]] = []
    models: list[dict[str, str]] = [{} for _ in range(n_threads)]

    def worker(t: int) -> None:
        try:
            barrier.wait(timeout=60)
            for i in range(n_ops):
                key = f"t{t}_k{i % 4}"
                val = f"{t}:{i}"
                engine.write_key("shared", key, val)
                models[t][key] = val
                if i % 8 == 7 and t % 2 == 0:
                    try:
                        engine.flush_collection("shared")
                    except CollectionNotFoundError:
                        pass  # another thread demoted first — benign
                assert engine.read_key("shared", key) == val
        except Exception as exc:  # noqa: BLE001 — surfaced via failures
            failures.append((t, exc))

    threads = [
        threading.Thread(target=worker, args=(t,), name=f"kv-conc-{t}")
        for t in range(n_threads)
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=300)
    assert not failures, failures

    merged: dict[str, str] = {}
    for m in models:  # per-thread keyspaces are disjoint by construction
        merged.update(m)
    for key, val in merged.items():
        assert engine.read_key("shared", key) == val
    assert engine.flush_all_collections() == []
    reborn = Engine(spark, data_dir)
    for key, val in merged.items():
        assert reborn.read_key("shared", key) == val
