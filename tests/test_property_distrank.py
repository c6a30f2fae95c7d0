"""Property-based differential testing of operators/distrank.py.

dist_rank must equal a driver-side Python model of global row_number /
running sum / ntile for ANY data shape, duplicate-heavy sort keys,
partition count, and sort direction — the partition-boundary algebra
(range partition → local rank → offset compose) is exactly the kind of
code where an off-by-one hides at a boundary the fixed-seed tests
never place a row on. (The fixed-seed invariance test already caught
one real bug: resampled range boundaries between plan evaluations;
this fuzzer guards the composition itself.)
"""

from __future__ import annotations

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from gotsdb_spark.operators.distrank import dist_rank, ntile_from_rank

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=12),  # sort key: heavy ties
        st.integers(min_value=-50, max_value=50),  # summed value
    ),
    min_size=1,
    max_size=300,
)


def _model(rows, descending):
    """Driver-side truth: total order (k, id), global rank + running sum."""
    indexed = [(k, v, i) for i, (k, v) in enumerate(rows)]
    indexed.sort(key=lambda t: ((-t[0] if descending else t[0]), t[2]))
    out = {}
    cum = 0
    for rnk, (k, v, i) in enumerate(indexed, start=1):
        cum += v
        out[i] = (rnk, cum)
    return out


def _model_ntile(rank, n, buckets):
    size, rem = divmod(n, buckets)
    big = rem * (size + 1)
    if rank <= big:
        return (rank + size) // (size + 1)
    return rem + -(-(rank - big) // size)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=rows_strategy,
    nparts=st.integers(min_value=1, max_value=24),
    buckets=st.integers(min_value=2, max_value=9),
    descending=st.booleans(),
)
@pytest.mark.slow
def test_dist_rank_matches_python_model(spark, rows, nparts, buckets, descending):
    df = spark.createDataFrame(
        [(i, k, v) for i, (k, v) in enumerate(rows)], "id long, k long, v long"
    )
    order = [F.desc("k") if descending else F.asc("k"), F.asc("id")]
    got = dist_rank(
        df, order, rank_col="rnk", sum_cols={"cum": "v"}, num_partitions=nparts
    )
    n = len(rows)
    got = got.select(
        "id",
        "rnk",
        "cum",
        ntile_from_rank(F.col("rnk"), F.lit(n), buckets).alias("q"),
    ).collect()
    truth = _model(rows, descending)
    assert len(got) == n
    for r in got:
        exp_rnk, exp_cum = truth[r["id"]]
        assert r["rnk"] == exp_rnk, (r, exp_rnk)
        assert r["cum"] == exp_cum, (r, exp_cum)
        assert r["q"] == _model_ntile(exp_rnk, n, buckets)
