"""Print a plan-health line for every registered query.

Usage: python tools/plan_audit.py [sf_dir]
Flags (!) queries with cartesian/nested-loop joins so plan regressions
are visible at a glance.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from gotsdb_spark.operators import QUERIES  # noqa: E402
from gotsdb_spark.plans import plan_report  # noqa: E402
from gotsdb_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("plan-audit")
    for name, fn in QUERIES.items():
        try:
            r = plan_report(fn(spark, sf_dir))
        except Exception as exc:  # noqa: BLE001
            print(f"{name:38s} ERROR {exc}")
            continue
        flag = "!" if (r["cartesian"] or r["nested_loop"]) else " "
        gw = "W" if r["global_windows"] else " "
        print(
            f"{flag}{gw}{name:38s} shuffles={r['shuffles']:2d} bhj={r['broadcast_joins']}"
            f" smj={r['sortmerge_joins']} codegen={r['codegen_stages']:2d}"
            f" py={r['python_stages']} scans={r['scans']}"
            f" gw={r['global_windows']}"
        )


if __name__ == "__main__":
    main()
