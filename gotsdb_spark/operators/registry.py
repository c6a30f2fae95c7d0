"""Registration machinery for named queries and their DuckDB oracles."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

# Names whose registration is environment-gated (e.g. on an optional
# runtime dependency): present in QUERIES only where the dependency
# exists. Ledger tooling and consistency tests treat these as known on
# every host so the ledger is identical everywhere.
GATED_QUERIES: set[str] = set()


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query; ``oracle`` is equivalent DuckDB SQL.

    Column names must match between the Spark result and the oracle —
    the driver sorts columns by name and hashes values, so every computed
    column is aliased identically on both sides.
    """

    def wrap(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return wrap
