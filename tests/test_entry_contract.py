"""Driver-contract guard: __spark_entry__ must expose a consistent
entry/queries/oracle_sql surface that works from any import context."""

import importlib.util


def _load():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_contract_shapes():
    mod = _load()
    qs, os_ = mod.queries(), mod.oracle_sql()
    assert len(qs) >= 80
    assert set(os_) <= set(qs), "oracle without a query"
    assert all(callable(f) for f in qs.values())
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in os_.values())


def test_entry_runs_and_is_stable(spark):
    mod = _load()
    a = mod.entry(spark)
    rows = a.collect()
    assert len(rows) > 0
    assert a.schema == mod.entry(spark).schema


def test_rows_only_queries_are_known():
    """Every registered query carries a DuckDB oracle (the approx
    sketches are oracled via bounded-error verdicts since round 2)."""
    mod = _load()
    rows_only = set(mod.queries()) - set(mod.oracle_sql())
    assert rows_only == set()
