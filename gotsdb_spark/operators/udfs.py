"""UDF surface (SURVEY.md §2.3): every Python-extension point Spark
offers, each with a built-in-SQL oracle proving the result.

Ranked by preference (and documented cost):
1. Built-in functions            — JVM codegen, the default everywhere else
2. @pandas_udf (scalar)          — Arrow-batched, vectorized numpy
3. @pandas_udf (grouped agg)     — Arrow-batched per-group reduction
4. applyInPandas (grouped map)   — whole group as a pandas DataFrame
5. row-at-a-time @udf            — serde per row; exists here ONLY to
                                    demonstrate the API (never hot-path)

The oracles double as proof that none of these UDFs was necessary for
these particular computations — which is exactly the engineering bar:
reach for Python only when the JVM genuinely can't express the op
(see operators.multimodal for the real case).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gotsdb_spark.operators.registry import query
from gotsdb_spark.sources.registry import fan_out, load_table


@query(
    "udf_pandas_scalar_norm",
    oracle="""
    SELECT vec_id,
           sqrt(list_dot_product(
             list_transform(embedding, x -> CAST(x AS DOUBLE)),
             list_transform(embedding, x -> CAST(x AS DOUBLE)))) AS l2_norm
    FROM embeddings
    """,
)
def udf_pandas_scalar_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas_udf: L2 norm over the embedding arrays via numpy.

    Arrow moves the array column as one buffer per batch; numpy
    vectorizes across the batch. ~10-100× faster than a row-at-a-time
    udf, still slower than the pure-JVM aggregate() in functions.exprs.
    """

    @F.pandas_udf("double")
    def l2(col: pd.Series) -> pd.Series:
        return col.map(lambda v: float(math.sqrt(np.dot(v, v))))

    emb = fan_out(load_table(spark, "embeddings", sf_dir), n=8)
    return emb.select("vec_id", l2("embedding").alias("l2_norm"))


@query(
    "udf_pandas_grouped_agg_geomean",
    oracle="""
    SELECT event_type, exp(avg(ln(value))) AS geo_mean
    FROM events
    WHERE value > 0
    GROUP BY event_type
    """,
)
def udf_pandas_grouped_agg_geomean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas_udf: geometric mean of value per type.

    The UDAF shape: one pandas Series per group in, one scalar out.
    NOTE the scale caveat — a grouped-agg pandas UDF materializes the
    whole group in memory (no partial aggregation); at 100 TB express
    the same thing as exp(avg(ln(x))) with built-ins, as the oracle does.
    """

    @F.pandas_udf("double")
    def geomean(v: pd.Series) -> float:
        return float(np.exp(np.log(v.to_numpy()).mean()))

    # Geometric mean is defined on positives only (value=0 rows exist at
    # larger scale factors and would poison the log).
    ev = load_table(spark, "events", sf_dir).where(F.col("value") > 0)
    return ev.groupBy("event_type").agg(geomean("value").alias("geo_mean"))


@query(
    "udf_apply_in_pandas_zscore",
    oracle="""
    SELECT event_id,
           (value - avg(value) OVER w) / stddev_samp(value) OVER w AS z
    FROM events
    WINDOW w AS (PARTITION BY event_type)
    """,
)
def udf_apply_in_pandas_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas (grouped map): per-event-type z-score normalization.

    Whole group in, whole group out — the shape for per-group model
    scoring / sklearn-style transforms. Same scale caveat as above
    (group must fit an executor); the window-function oracle is the
    built-in formulation that doesn't have that limit.
    """

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"]
        z = (v - v.mean()) / v.std(ddof=1)
        # Single-row groups: pandas std(ddof=1) yields NaN but the SQL
        # stddev_samp oracle yields NULL — map NaN to None so a sparse
        # group at another scale factor can't hash-mismatch.
        return pd.DataFrame(
            {"event_id": pdf["event_id"], "z": z.where(z.notna(), None)}
        )

    ev = load_table(spark, "events", sf_dir)
    return ev.groupBy("event_type").applyInPandas(zscore, "event_id bigint, z double")


@query(
    "udf_row_at_a_time_reverse",
    oracle="""
    SELECT p_partkey, reverse(p_brand) AS brand_rev FROM part
    """,
)
def udf_row_at_a_time_reverse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time @udf — the API-surface demo and the anti-pattern.

    Pickles every row through Python. Exists to cover the extension
    point; F.reverse (the oracle) is the real answer.
    """

    @F.udf("string")
    def rev(s: str) -> str:
        return s[::-1]

    part = load_table(spark, "part", sf_dir)
    return part.select("p_partkey", rev("p_brand").alias("brand_rev"))


@query(
    "udf_arrow_optimized_title",
    oracle="""
    SELECT p_partkey,
           upper(p_type) || ':' ||
             CAST(length(p_type) AS VARCHAR) AS tagged
    FROM part
    """,
)
def udf_arrow_optimized_title(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized Python UDF (Spark 4's useArrow=True): same
    per-value Python signature as the row-at-a-time @udf above, but
    values cross the boundary in Arrow batches instead of pickled rows
    — the drop-in migration path for legacy @udf code that can't be
    vectorized, typically good for ~2x over pickled serde (still far
    behind @pandas_udf's vectorized numpy, which is why the ranking in
    this module's docstring stands).
    """

    @F.udf("string", useArrow=True)
    def tag(s: str) -> str:
        return f"{s.upper()}:{len(s)}"

    part = load_table(spark, "part", sf_dir)
    return part.select("p_partkey", tag("p_type").alias("tagged"))
