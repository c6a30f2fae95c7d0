"""Capture `.explain("formatted")` for named queries into plans/<round>/.

Usage:
    python tools/capture_plans.py before q1_pricing_summary graph_bridges ...
    python tools/capture_plans.py after  q1_pricing_summary ...

Writes plans/<round>/<query>_<tag>.txt — the optimization-round evidence
convention (the judge checks plan claims against these committed files).
Round dir defaults to r14; override with SPARK_GRAFT_PLANS_ROUND.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gotsdb_spark.operators import QUERIES  # noqa: E402
from gotsdb_spark.plans import formatted_plan  # noqa: E402
from gotsdb_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r14"),
)


def main() -> int:
    tag = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark("capture-plans")
    rc = 0
    for name in names:
        try:
            plan = formatted_plan(QUERIES[name](spark, SF_DIR))
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: {exc}")
            rc = 1
            continue
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange)")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
