"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``gotsdb_spark`` package; this module only
re-exports the operator registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# The driver may import this file from any working directory; make the
# sibling package importable regardless.
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from gotsdb_spark.operators import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    return QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def _driver_green_rounds() -> dict[str, int]:
    """Latest round in which each query name had a fully-green driver
    CORRECTNESS row (rows+schema+hash) in CORRECTNESS_r*.json."""
    import glob
    import json
    import re

    green: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(_REPO_ROOT, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                green[name] = max(green.get(name, 0), rnd)
    return green


def _ledger_age() -> dict[str, int]:
    """Round each query name was first registered (tools/verify_ledger.json,
    maintained by tools/update_coverage.py). Missing file → empty dict."""
    import json

    try:
        with open(os.path.join(_REPO_ROOT, "tools", "verify_ledger.json")) as fh:
            return {k: int(v) for k, v in json.load(fh).items()}
    except (OSError, ValueError):
        return {}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    The driver verifies the first 50 entries per round; with more than
    50 registered queries we rotate so names without a prior fully-green
    driver row come first, OLDEST registration round first (the ledger),
    then registration order. Already-green names fill the rest of the
    window oldest-last-green-round first, so a green row is periodically
    re-falsified instead of being trusted forever — round 3 proved the
    forever-green ordering wrong when two round-1 greens silently
    stopped building and the rotation could never notice.
    """
    green = _driver_green_rounds()
    age = _ledger_age()
    order = {name: i for i, name in enumerate(QUERIES)}
    ordered = sorted(
        QUERIES,
        key=lambda n: (n in green, green.get(n, 0), age.get(n, 1 << 30), order[n]),
    )
    return {name: QUERIES[name] for name in ordered}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for EVERY registered query
    — no keys are absent (len(ORACLES) == len(QUERIES); the driver's
    weaker rows-only fallback has been unused since every sketch and
    streaming operator gained a hand-written deterministic oracle)."""
    return dict(ORACLES)
