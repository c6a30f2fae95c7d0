"""Physical-plan inspection: the feedback loop for scale tuning.

The reference has no plans at all (SURVEY.md §4.1 — hard-coded control
flow); here every operator is declarative and these helpers make the
resulting physical plan testable: predicate pushdown reached the scan,
dimensions broadcast, no accidental cartesian products, shuffle counts
bounded. tests/test_plans.py pins these properties so a refactor that
silently de-optimizes a plan fails CI, not the 100 TB run.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The EXPLAIN FORMATTED text of the physical plan (no execution)."""
    spark = df.sparkSession
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def pushed_filters(df: DataFrame) -> list[str]:
    """All parquet-pushed predicates across the plan's scans."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df)):
        body = m.group(1).strip()
        if body:
            # split on top-level commas (filter exprs contain no nesting
            # beyond parens without commas-in-brackets)
            out.extend(p.strip() for p in re.split(r",(?![^(]*\))", body))
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists actually read by each scan (pruning check)."""
    cols: list[list[str]] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", formatted_plan(df)):
        fields = [f.split(":")[0].strip() for f in m.group(1).split(",") if f.strip()]
        cols.append(fields)
    return cols


def broadcast_join_count(df: DataFrame) -> int:
    return len(re.findall(r"\bBroadcastHashJoin\b", formatted_plan(df)))


def shuffle_count(df: DataFrame) -> int:
    """Number of distinct Exchange (shuffle) operators in the plan tree."""
    plan = formatted_plan(df)
    # The operator-tree section lists each node once as "(n) Exchange";
    # AQE summaries repeat names, so count tree nodes only.
    return len(re.findall(r"\(\d+\) Exchange\b", plan))


def has_cartesian_product(df: DataFrame) -> bool:
    return "CartesianProduct" in formatted_plan(df) or "BroadcastNestedLoopJoin" in (
        formatted_plan(df)
    )


# Single-child operators that can legally sit between a Window and the
# exchange that feeds it. Anything else (joins, aggregates, scans,
# another Window, an Exchange with a real partitioning) terminates the
# walk — the Window is fed by THAT operator's output distribution, not
# by a SinglePartition exchange.
_WINDOW_CHAIN_PASSTHROUGH = re.compile(
    r"\b(Sort|Project|Filter|InputAdapter|WholeStageCodegen|"
    r"ColumnarToRow|ShuffleQueryStage|AQEShuffleRead)\b"
)


def single_partition_window_chains_text(plan: str) -> int:
    """Count Window operators fed by an ``Exchange SinglePartition`` in
    an executed-plan tree string — the `WindowExec: No Partition
    Defined ... Moving all data to a single partition` shape that
    serializes the whole frame through one executor at scale.

    Detection walks the first-child spine below each Window line: every
    operator between a Window and its feeding exchange (Sort, Project,
    Filter, ShuffleQueryStage, codegen wrappers, ...) is single-child,
    so the chain is exactly the consecutive run of pass-through lines —
    however long — ending at the first non-pass-through operator. A
    fixed lookahead (the pre-round-7 implementation) silently missed
    chains with more than two interposed lines. Global aggregates also
    use SinglePartition exchanges — those are fine (partial+final, tiny
    shuffle) and do NOT match because no Window sits on top.
    WindowGroupLimit (the top-k rewrite) is excluded: it bounds rows
    before any exchange.
    """
    lines = plan.splitlines()
    chains = 0
    for i, ln in enumerate(lines):
        if re.search(r"\bWindow\b", ln) and "WindowGroupLimit" not in ln:
            j = i + 1
            while j < len(lines):
                nxt = lines[j]
                if "Exchange SinglePartition" in nxt:
                    chains += 1
                    break
                if "ReusedExchange" in nxt:
                    # A ReusedExchange prints the simpleString of the
                    # exchange it reuses; if that referenced exchange is
                    # SinglePartition the Window above it is still a
                    # global window (the data funnels through the same
                    # one-partition shuffle, just computed once).
                    # Otherwise it is an exchange with a real
                    # partitioning and terminates the chain.
                    if "SinglePartition" in nxt:
                        chains += 1
                    break
                if not _WINDOW_CHAIN_PASSTHROUGH.search(nxt):
                    break
                j += 1
    return chains


def single_partition_window_chains(df: DataFrame) -> int:
    """`single_partition_window_chains_text` over a DataFrame's
    executed plan (AQE-final tree)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return single_partition_window_chains_text(plan)


def plan_report(df: DataFrame) -> dict:
    """One-line plan-health summary (used by tools/plan_audit.py)."""
    plan = formatted_plan(df)
    return {
        "shuffles": len(re.findall(r"\(\d+\) Exchange\b", plan)),
        "broadcast_joins": len(re.findall(r"\(\d+\) BroadcastHashJoin\b", plan)),
        "sortmerge_joins": len(re.findall(r"\(\d+\) SortMergeJoin\b", plan)),
        "cartesian": "CartesianProduct" in plan,
        "nested_loop": "BroadcastNestedLoopJoin" in plan,
        "codegen_stages": len(set(re.findall(r"codegen id : (\d+)", plan))),
        "python_stages": len(re.findall(r"\(\d+\) (?:MapInPandas|ArrowEvalPython|FlatMapGroupsInPandas)", plan)),
        "scans": len(re.findall(r"\(\d+\) Scan parquet", plan)),
        "global_windows": single_partition_window_chains(df),
    }


_FACT_TABLES = ("lineitem", "orders", "events", "documents", "embeddings")

# Node-detail blocks in EXPLAIN FORMATTED start with "(n) <NodeName>".
_NODE_HEADER = re.compile(r"^\(\d+\) (.+?)\s*$", re.MULTILINE)


def _scan_blocks(plan: str) -> list[tuple[str, str]]:
    """(table, detail-block-text) per parquet Scan node.

    The formatted plan puts each scan's file path on its own
    ``Location:`` line INSIDE the node's detail block — never on the
    ``(n) Scan parquet`` header line itself — so any single-line regex
    over the whole plan silently matches nothing. Parse per-block: slice
    the detail section at ``(n) Header`` boundaries, keep blocks whose
    header starts with ``Scan parquet``, and take the table name from
    the last path component of that block's Location. Partitioned
    warehouse layouts scan a DIRECTORY (``.../events_dt``, no
    ``.parquet`` suffix); strip the ``_dt`` layout suffix so those scans
    map back to the logical table and participate in the audits.
    """
    headers = list(_NODE_HEADER.finditer(plan))
    out: list[tuple[str, str]] = []
    for i, h in enumerate(headers):
        if not h.group(1).startswith("Scan parquet"):
            continue
        end = headers[i + 1].start() if i + 1 < len(headers) else len(plan)
        block = plan[h.end():end]
        loc = re.search(r"Location:[^\n]*?\[([^\]]*)\]", block)
        table = ""
        if loc:
            last = loc.group(1).rstrip("/").split("/")[-1]
            table = re.sub(r"\.parquet$", "", last)
            table = re.sub(r"_dt$", "", table)
        out.append((table, block))
    return out


def fact_scan_counts(df: DataFrame) -> dict[str, int]:
    """Parquet Scan nodes per FACT table in the formatted plan.

    A frame checkpointed once shows up as ``Scan ExistingRDD``, so a
    count >= 3 for any fact table means the plan re-derives a
    fact-sized subtree once per reference — the class
    graph_triangle_stats hit at sf0.1 (six lineitem scans, 462 s)
    before its edge frame was checkpointed. Dimension tables
    (nation/region/...) are excluded: re-scanning a 25-row parquet is
    free at any scale.
    """
    counts: dict[str, int] = {}
    for t, _ in _scan_blocks(formatted_plan(df)):
        if t in _FACT_TABLES:
            counts[t] = counts.get(t, 0) + 1
    return counts


def scan_read_widths(df: DataFrame) -> list[tuple[str, int]]:
    """(table, columns-read) per parquet scan, from the formatted plan.

    Pairs each scan's fixture-table name with its ReadSchema field
    count — the column-pruning audit: a scan that reads every column of
    a wide table for a narrow projection means pruning broke (at 100 TB
    the difference between reading 2 of lineitem's 16 columns and all
    16 is ~8x the IO). Location and ReadSchema are taken from the SAME
    node block, so a plan mixing file scans with the partitioned
    events_dt directory layout cannot shift widths onto the wrong
    tables.
    """
    out: list[tuple[str, int]] = []
    for t, block in _scan_blocks(formatted_plan(df)):
        m = re.search(r"ReadSchema: struct<([^>]*)>", block)
        fields = [f for f in m.group(1).split(",") if f.strip()] if m else []
        out.append((t, len(fields)))
    return out
