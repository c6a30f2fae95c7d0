"""Property-based KV tests: arbitrary operation sequences must agree
with a plain-dict model (last-writer-wins, flush/promote transparency).

Hypothesis drives (op, collection, key, value) sequences; the model is
the reference's own semantics — Collection map[string]string with
last-writer-wins upsert (reference types.go:3, hot.go:50-60). Flushes
and re-promotions must be invisible to reads.
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from gotsdb_spark.storage.engine import Engine, KeyNotFoundError

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
