"""DuckDB-side oracle cost audit: time EVERY registered oracle at
sf0.1 and at the .sf1 fixture (10x), no Spark involved.

Motivation (late round 12): extending the sf1 rehearsal to the graph
readouts found two oracles whose non-materialized CTE chains re-inline
an expensive root scan once per reference — graph_link_prediction
(>25 min at sf1) and graph_degree_distribution (390 s) — both invisible
at sf0.1 where the root scan is cheap. The registry has ~150 oracles
with multi-referenced plain CTEs; most are harmless (DuckDB CSEs flat
shapes; scalar CTEs cost nothing to re-run), so the mechanical signal
is the RATIO: a healthy oracle is ~<=15x slower on 10x data; a CTE
blowup is 50-1000x. This tool makes that ratio a per-round artifact.

Usage:  python tools/oracle_cost_audit.py [budget_seconds_per_oracle]
Writes tools/oracle_cost_audit.json: {name: {"sf01_s": .., "sf1_s": ..,
"ratio": ..}} with "TIMEOUT" for oracles interrupted at the budget.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from gotsdb_spark.operators import ORACLES

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(REPO, ".sf1")


def _connect(base: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{base}/{t}.parquet'"
        )
    return con


def _timed(con: duckdb.DuckDBPyConnection, sql: str, budget: float):
    """(seconds, rows) or (None, 'TIMEOUT') — interrupts at budget."""
    timer = threading.Timer(budget, con.interrupt)
    timer.start()
    t0 = time.time()
    try:
        n = len(con.execute(sql).fetchall())
        return round(time.time() - t0, 2), n
    except duckdb.InterruptException:
        return None, "TIMEOUT"
    except duckdb.Error as exc:  # interrupt surfaces differently per version
        if "INTERRUPT" in str(exc).upper():
            return None, "TIMEOUT"
        raise
    finally:
        timer.cancel()


def main() -> None:
    budget = float(sys.argv[1]) if len(sys.argv) > 1 else 120.0
    names = sys.argv[2:] or list(ORACLES)
    if not os.path.isdir(SF1):
        raise SystemExit("run tools/sweep_sf1.py once to materialize .sf1")
    out: dict[str, dict] = {}
    worst: list[tuple[float, str]] = []
    for name in names:
        sql = ORACLES[name]
        c1 = _connect(SF01)
        s01, n01 = _timed(c1, sql, budget)
        c1.close()
        c2 = _connect(SF1)
        s1, n1 = _timed(c2, sql, budget)
        c2.close()
        ratio = (
            round(s1 / max(s01, 0.005), 1)
            if (s01 is not None and s1 is not None)
            else None
        )
        out[name] = {"sf01_s": s01, "sf1_s": s1, "ratio": ratio}
        flag = ""
        if s1 is None or (ratio is not None and ratio > 30):
            flag = "  <-- BLOWUP?"
            worst.append((float("inf") if s1 is None else ratio, name))
        def _fmt(s, n):
            return "TIMEOUT" if s is None else f"{s}s ({n} rows)"

        print(
            f"{name}: sf0.1 {_fmt(s01, n01)}  sf1 {_fmt(s1, n1)}"
            f"  x{ratio}{flag}",
            flush=True,
        )
    path = os.path.join(REPO, "tools", "oracle_cost_audit.json")
    if sys.argv[2:]:
        # Subset run: merge into the existing artifact instead of
        # clobbering the committed full-registry audit.
        try:
            with open(path) as fh:
                merged = json.load(fh)
        except (OSError, ValueError):
            merged = {}
        merged.update(out)
        out = merged
    with open(path, "w") as fh:
        json.dump(out, fh, indent=0, sort_keys=True)
    print(f"\nwrote {path}; {len(worst)} flagged: {sorted(worst, reverse=True)[:10]}")


if __name__ == "__main__":
    main()
