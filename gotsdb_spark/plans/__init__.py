from gotsdb_spark.plans.inspect import (
    broadcast_join_count,
    fact_scan_counts,
    scan_read_widths,
    formatted_plan,
    has_cartesian_product,
    plan_report,
    pushed_filters,
    read_schema_columns,
    shuffle_count,
    single_partition_window_chains,
)

__all__ = [
    "formatted_plan",
    "pushed_filters",
    "read_schema_columns",
    "broadcast_join_count",
    "shuffle_count",
    "has_cartesian_product",
    "single_partition_window_chains",
    "fact_scan_counts",
    "scan_read_widths",
    "plan_report",
]
