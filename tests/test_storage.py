"""KV-engine semantics tests — the behaviors in SURVEY.md §2.1/§3:
read-your-writes, promotion-on-miss, auto-create, flush/evict, error
parity (missing key vs missing collection), last-writer-wins."""


import pytest
from gotsdb_spark.storage.engine import (
    CollectionExistsError,
    CollectionNotFoundError,
    Engine,
    KeyNotFoundError,
)


@pytest.fixture()
def engine(spark, tmp_path):
    return Engine(spark, str(tmp_path / "data"), auto_create_collection=True)


def test_write_then_read_your_writes(engine):
    engine.write_key("c", "k", "v")
    assert engine.read_key("c", "k") == "v"


def test_last_writer_wins(engine):
    engine.write_key("c", "k", "v1")
    engine.write_key("c", "k", "v2")
    assert engine.read_key("c", "k") == "v2"


def test_flush_then_promote_roundtrip(spark, tmp_path):
    """SURVEY.md §7 minimum slice: write → read → flush → new engine →
    read again (promotion from Parquet)."""
    data = str(tmp_path / "data")
    e1 = Engine(spark, data)
    e1.write_key("c", "k", "v")
    e1.write_key("c", "k2", "v2")
    e1.flush_collection("c")
    assert not e1.list_hot()  # evicted (engine.go:121)

    e2 = Engine(spark, data)  # fresh engine = restart
    assert e2.list_cold() == ["c"]
    assert e2.read_key("c", "k") == "v"  # read-through promotion
    assert e2.is_hot("c")  # promoted whole collection (engine.go:150-169)
    assert e2.read_key("c", "k2") == "v2"


def test_last_writer_wins_across_flushes(spark, tmp_path):
    data = str(tmp_path / "data")
    e1 = Engine(spark, data)
    e1.write_key("c", "k", "old")
    e1.flush_collection("c")
    e1.write_key("c", "k", "new")
    e1.flush_collection("c")
    e2 = Engine(spark, data)
    assert e2.read_key("c", "k") == "new"


def test_missing_key_vs_missing_collection_errors(engine):
    engine.write_key("c", "k", "v")
    with pytest.raises(KeyNotFoundError, match=r"No value found for key \[nope\] in hot collection \[c\]\."):
        engine.read_key("c", "nope")
    with pytest.raises(
        CollectionNotFoundError,
        match=r"No collection found for collection id \[ghost\] in hot or cold storage",
    ):
        engine.read_key("ghost", "k")


def test_auto_create_toggle(spark, tmp_path):
    e = Engine(spark, str(tmp_path / "d"), auto_create_collection=False)
    with pytest.raises(
        CollectionNotFoundError,
        match=r"Unable to find a collection to load into hot storage with id \[c\]\.",
    ):
        e.write_key("c", "k", "v")


def test_create_and_drop(engine):
    engine.create_collection("c")
    with pytest.raises(
        CollectionExistsError,
        match=r"Collection already exists with id \[c\] in hot storage\.",
    ):
        engine.create_collection("c")
    engine.drop_collection("c")
    with pytest.raises(
        CollectionNotFoundError,
        match=r"No collection found for collection id \[c\] in hot storage\.",
    ):
        engine.drop_collection("c")


def test_list_and_tiers(engine):
    engine.write_key("hotonly", "k", "v")
    engine.write_key("both", "k", "v")
    engine.flush_collection("both")
    assert engine.list_hot() == ["hotonly"]
    assert engine.list_cold() == ["both"]
    assert engine.list_collections() == ["both", "hotonly"]
    assert engine.is_hot("hotonly")
    assert not engine.is_hot("both")
    with pytest.raises(CollectionNotFoundError):
        engine.is_hot("ghost")
    assert engine.collection_exists("both")
    assert not engine.collection_exists("ghost")


def test_flush_empty_autocreated_collection_persists(spark, tmp_path):
    data = str(tmp_path / "data")
    e1 = Engine(spark, data)
    e1.write_key("c", "k", "v")  # auto-creates
    e1.create_collection("empty")
    e1.flush_all_collections()
    e2 = Engine(spark, data)
    assert e2.list_collections() == ["c", "empty"]


def test_flush_all_collects_errors(engine):
    engine.write_key("a", "k", "v")
    engine.write_key("b", "k", "v")
    errors = engine.flush_all_collections()
    assert errors == []
    assert engine.list_hot() == []


def test_flush_not_hot_errors(engine):
    engine.write_key("c", "k", "v")
    engine.flush_collection("c")
    with pytest.raises(CollectionNotFoundError, match=r"in hot storage\."):
        engine.flush_collection("c")


def test_compact_preserves_latest(spark, tmp_path):
    data = str(tmp_path / "data")
    e = Engine(spark, data)
    for i in range(5):
        e.write_key("c", "k", f"v{i}")
        e.flush_collection("c")
    e.compact("c")
    assert e.read_key("c", "k") == "v4"
    # compaction must shrink the log to one row per key
    n = spark.read.parquet(str(tmp_path / "data" / "c")).count()
    assert n == 1


def test_snapshot_is_dataframe_view(engine):
    engine.write_key("c", "a", "1")
    engine.write_key("c", "b", "2")
    engine.write_key("c", "a", "3")
    snap = engine.snapshot("c")
    got = {r["key"]: r["value"] for r in snap.collect()}
    assert got == {"a": "3", "b": "2"}


def test_unicode_and_empty_values(engine):
    engine.write_key("c", "uni", "héllo wörld 中文")
    engine.write_key("c", "empty", "")
    engine.flush_collection("c")
    assert engine.read_key("c", "uni") == "héllo wörld 中文"
    assert engine.read_key("c", "empty") == ""


def test_cross_generation_seq_monotonic(spark, tmp_path):
    """Segment seqs must be strictly increasing across engine
    generations so the (write_ts, seq) LWW tie-break holds even if two
    flushes land in the same timestamp tick."""
    from pyspark.sql import functions as F

    data = str(tmp_path / "data")
    e1 = Engine(spark, data)
    e1.write_key("c", "k", "gen1")
    e1.write_key("c", "k2", "other")
    e1.flush_collection("c")

    e2 = Engine(spark, data)  # fresh generation, no in-memory state
    e2.write_key("c", "k", "gen2")
    e2.flush_collection("c")

    log = spark.read.parquet(str(tmp_path / "data" / "c"))
    seqs = {r["value"]: r["seq"] for r in log.where(F.col("key") == "k").collect()}
    assert seqs["gen2"] > seqs["gen1"], seqs

    e3 = Engine(spark, data)
    assert e3.read_key("c", "k") == "gen2"
    e3.compact("c")
    assert e3.read_key("c", "k") == "gen2"


def test_compact_crash_recovery_restores_original(spark, tmp_path):
    """Crash between the two compact renames (live dir missing, .old
    present) → recovery restores the original log."""
    import os
    import shutil

    data = str(tmp_path / "data")
    e1 = Engine(spark, data)
    e1.write_key("c", "k", "v")
    e1.flush_collection("c")
    path = os.path.join(data, "c")
    os.rename(path, path + ".compact.old")  # simulated mid-swap crash

    e2 = Engine(spark, data)
    assert e2.list_cold() == ["c"]
    assert e2.read_key("c", "k") == "v"
    assert not os.path.isdir(path + ".compact.old")

    # Crash with a COMPLETE tmp (has _SUCCESS): tmp is promoted instead.
    e2.write_key("c", "k", "v2")
    e2.flush_collection("c")
    shutil.copytree(path, path + ".compact.tmp")
    shutil.rmtree(path)
    e3 = Engine(spark, data)
    assert e3.read_key("c", "k") == "v2"
    assert not os.path.isdir(path + ".compact.tmp")


def test_compact_crash_incomplete_tmp_rolled_back(spark, tmp_path):
    """An incomplete tmp (no _SUCCESS) must never be promoted; the
    displaced original wins and the junk tmp is deleted."""
    import os

    data = str(tmp_path / "data")
    e1 = Engine(spark, data)
    e1.write_key("c", "k", "good")
    e1.flush_collection("c")
    path = os.path.join(data, "c")
    os.rename(path, path + ".compact.old")
    os.makedirs(path + ".compact.tmp")  # partial write, no _SUCCESS

    e2 = Engine(spark, data)
    assert e2.read_key("c", "k") == "good"
    assert not os.path.isdir(path + ".compact.tmp")
