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


@query(
    "udtf_bigram_explode",
    oracle="""
    WITH w AS (
      SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents
      WHERE doc_id < 40
    ), bi AS (
      SELECT doc_id, lang,
             unnest(list_transform(range(1, len(ws)),
                                   i -> ws[i] || ' ' || ws[i + 1])) AS bigram
      FROM w
    )
    SELECT doc_id, lang, count(*) AS n_bigrams,
           count(DISTINCT bigram) AS n_distinct
    FROM bi GROUP BY doc_id, lang
    """,
)
def udtf_bigram_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (user-defined TABLE function): one input row fans
    out to N bigram rows via a generator `eval`, consumed with a
    LATERAL join — the table-function extension point next to the
    scalar/grouped UDFs in this module.

    Like udf_row_at_a_time_reverse, this is the API-surface demo: the
    UDTF runs row-at-a-time Python, so the input is gated to a bounded
    slice (doc_id < 40) and the production equivalents of this exact
    fan-out are the JVM-side higher-order-function shingles
    (functions/exprs.py:word_shingles) or mapInPandas. The dataflow —
    scan → lateral table function → aggregate — is what matters here.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="bigram string")
    class BigramUDTF:
        def eval(self, text: str):
            words = text.split(" ")
            for a, b in zip(words, words[1:]):
                yield (f"{a} {b}",)

    docs = load_table(spark, "documents", sf_dir).where(F.col("doc_id") < 40)
    return (
        docs.lateralJoin(BigramUDTF(F.col("text").outer()))
        .groupBy("doc_id", "lang")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.countDistinct("bigram").alias("n_distinct"),
        )
    )


@query(
    "udf_map_in_arrow_norm",
    oracle="""
    SELECT vec_id,
           floor(sqrt(list_dot_product(
             list_transform(embedding, x -> CAST(x AS DOUBLE)),
             list_transform(embedding, x -> CAST(x AS DOUBLE)))) * 1e6 + 0.5) / 1e6
             AS l2_norm
    FROM embeddings
    """,
)
def udf_map_in_arrow_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow: the zero-copy batch extension point — pyarrow
    RecordBatches in, RecordBatches out, no pandas materialization.

    The L2 norm is computed with numpy over the Arrow buffers
    (zero-copy list flatten → reshape → vectorized reduction), the
    right shape for numeric kernels too wide for SQL but too hot for
    row-at-a-time Python. Each batch is independent — embarrassingly
    parallel at any scale. Output is half-up rounded to 1e-6 to pin the
    float-summation-order difference vs the SQL oracle.
    """
    import pyarrow as pa

    def batches(it):
        for batch in it:
            tbl = pa.table(batch)
            vec_id = tbl.column("vec_id")
            emb = tbl.column("embedding")
            arr = emb.combine_chunks()
            flat = arr.flatten().to_numpy(zero_copy_only=False)
            n = len(arr)
            mat = flat.reshape(n, -1).astype("float64")
            norms = np.sqrt((mat * mat).sum(axis=1))
            norms = np.floor(norms * 1e6 + 0.5) / 1e6
            yield pa.record_batch(
                [vec_id.combine_chunks(), pa.array(norms, type=pa.float64())],
                names=["vec_id", "l2_norm"],
            )

    emb = fan_out(load_table(spark, "embeddings", sf_dir)).select(
        "vec_id", "embedding"
    )
    return emb.mapInArrow(batches, schema="vec_id bigint, l2_norm double")


@query(
    "udf_cogrouped_purchase_error_gap",
    oracle="""
    WITH p AS (
      SELECT user_id, count(*) AS n_purchases,
             CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS purchase_e3
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ), e AS (
      SELECT user_id, count(*) AS n_errors
      FROM events WHERE event_type = 'error' GROUP BY user_id
    )
    SELECT coalesce(p.user_id, e.user_id) AS user_id,
           CAST(coalesce(p.n_purchases, 0) AS BIGINT) AS n_purchases,
           CAST(coalesce(e.n_errors, 0)    AS BIGINT) AS n_errors,
           CAST(coalesce(p.purchase_e3, 0) AS BIGINT) AS purchase_e3
    FROM p FULL OUTER JOIN e ON p.user_id = e.user_id
    """,
)
def udf_cogrouped_purchase_error_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cogroup().applyInPandas — the two-sided grouped-map UDF shape:
    each user's purchases AND errors arrive as two aligned pandas
    frames in one Python call.

    This is the API for per-key custom joins (as-of matching, sessions
    × refunds reconciliation) when the logic won't fit join syntax.
    Here each side reduces to integer counters (values pre-scaled to
    e3 ints so pandas' summation order can't drift from SQL), making
    the oracle a plain FULL OUTER JOIN of per-user aggregates. Scale
    caveat mirrors applyInPandas: both groups for a key materialize on
    one executor — keep the per-key payload bounded, or express it as
    a join when the semantics allow (as the oracle does).
    """
    ev = load_table(spark, "events", sf_dir)
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.floor(F.col("value") * 1000).cast("long").alias("v_e3")
    )
    errors = ev.where(F.col("event_type") == "error").select("user_id")

    def gap(key, pdf_p: pd.DataFrame, pdf_e: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [int(key[0])],
                "n_purchases": [len(pdf_p)],
                "n_errors": [len(pdf_e)],
                "purchase_e3": [int(pdf_p["v_e3"].sum()) if len(pdf_p) else 0],
            }
        )

    return (
        purchases.groupBy("user_id")
        .cogroup(errors.groupBy("user_id"))
        .applyInPandas(
            gap,
            "user_id bigint, n_purchases bigint, n_errors bigint, purchase_e3 bigint",
        )
    )
