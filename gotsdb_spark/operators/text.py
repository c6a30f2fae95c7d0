"""Text analysis over `documents`: token stats, quality scoring,
language-ID heuristic, document fingerprinting (SURVEY.md §2.3).

Everything is built-in column algebra (split / higher-order array
functions / regexp) — JVM-side, codegen'd, zero Python in the hot path.
At 100 TB each of these is a pure map over the documents table: no
shuffle at all until an explicit aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from gotsdb_spark.operators.registry import query
from gotsdb_spark.sources.registry import load_table

# Marker stopwords per language for the n-gram/stopword-hit heuristic.
_LANG_MARKERS = {
    "en": ("the", "a", "of", "and"),
    "es": ("el", "la", "de", "que"),
    "fr": ("le", "les", "et", "une"),
    "de": ("der", "die", "das", "und"),
}


@query(
    "text_token_stats",
    oracle="""
    WITH t AS (
      SELECT doc_id, n_chars, string_split(text, ' ') AS ws FROM documents
    )
    SELECT doc_id, n_chars,
           CAST(len(ws) AS INT)                 AS n_tokens,
           CAST(len(list_distinct(ws)) AS INT)  AS n_distinct,
           len(list_distinct(ws)) * 1.0 / len(ws) AS ttr,
           list_aggregate(list_transform(ws, w -> length(w)), 'sum') * 1.0
             / len(ws) AS avg_token_len
    FROM t
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counting + type-token ratio + mean token length."""
    docs = load_table(spark, "documents", sf_dir)
    ws = F.split("text", " ")
    n = F.size(ws)
    nd = F.size(F.array_distinct(ws))
    total_len = F.aggregate(
        ws, F.lit(0.0), lambda acc, w: acc + F.length(w).cast("double")
    )
    return docs.select(
        "doc_id",
        "n_chars",
        n.alias("n_tokens"),
        nd.alias("n_distinct"),
        (nd.cast("double") / n).alias("ttr"),
        (total_len / n).alias("avg_token_len"),
    )


@query(
    "text_quality_score",
    oracle="""
    WITH t AS (
      SELECT doc_id, n_chars, string_split(text, ' ') AS ws FROM documents
    )
    SELECT doc_id,
           0.4 * least(n_chars / 500.0, 1.0)
         + 0.4 * (len(list_distinct(ws)) * 1.0 / len(ws))
         + 0.2 * least(len(ws) / 100.0, 1.0) AS quality
    FROM t
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality score: length + lexical diversity + token count.

    The classic pre-training filter shape (C4/Gopher-style rules reduce
    to exactly this kind of row-local arithmetic) — a pure map, so it
    runs at scan speed at any scale.
    """
    docs = load_table(spark, "documents", sf_dir)
    ws = F.split("text", " ")
    n = F.size(ws).cast("double")
    ttr = F.size(F.array_distinct(ws)).cast("double") / n
    quality = (
        0.4 * F.least(F.col("n_chars") / 500.0, F.lit(1.0))
        + 0.4 * ttr
        + 0.2 * F.least(n / 100.0, F.lit(1.0))
    )
    return docs.select("doc_id", quality.alias("quality"))


@query(
    "text_lang_id",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS ws
      FROM documents
    ), hits AS (
      SELECT doc_id, lang,
             len(list_intersect(ws, {list(_LANG_MARKERS['en'])})) AS en_hits,
             len(list_intersect(ws, {list(_LANG_MARKERS['es'])})) AS es_hits,
             len(list_intersect(ws, {list(_LANG_MARKERS['fr'])})) AS fr_hits,
             len(list_intersect(ws, {list(_LANG_MARKERS['de'])})) AS de_hits
      FROM t
    ), pred AS (
      SELECT doc_id, lang,
             CASE
               WHEN en_hits = 0 AND es_hits = 0 AND fr_hits = 0 AND de_hits = 0
                 THEN 'unknown'
               WHEN en_hits >= es_hits AND en_hits >= fr_hits AND en_hits >= de_hits
                 THEN 'en'
               WHEN es_hits >= fr_hits AND es_hits >= de_hits THEN 'es'
               WHEN fr_hits >= de_hits THEN 'fr'
               ELSE 'de'
             END AS predicted_lang
      FROM hits
    )
    SELECT lang, predicted_lang, count(*) AS n
    FROM pred GROUP BY lang, predicted_lang
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit language ID (confusion matrix vs the labeled lang).

    A real deployment swaps the marker lists for per-language n-gram
    profiles; the dataflow (row-local scoring → argmax → aggregate) is
    identical.
    """
    docs = load_table(spark, "documents", sf_dir)
    ws = F.array_distinct(F.split("text", " "))
    hit = {
        lang: F.size(F.array_intersect(ws, F.array(*[F.lit(m) for m in markers])))
        for lang, markers in _LANG_MARKERS.items()
    }
    predicted = (
        F.when(
            (hit["en"] == 0) & (hit["es"] == 0) & (hit["fr"] == 0) & (hit["de"] == 0),
            "unknown",
        )
        .when(
            (hit["en"] >= hit["es"]) & (hit["en"] >= hit["fr"]) & (hit["en"] >= hit["de"]),
            "en",
        )
        .when((hit["es"] >= hit["fr"]) & (hit["es"] >= hit["de"]), "es")
        .when(hit["fr"] >= hit["de"], "fr")
        .otherwise("de")
    )
    return (
        docs.select("lang", predicted.alias("predicted_lang"))
        .groupBy("lang", "predicted_lang")
        .agg(F.count("*").alias("n"))
    )


@query(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
             AS fingerprint
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive document fingerprint: md5 over the sorted
    distinct-token set — catches shuffled near-copies that exact-text
    hashing misses, at the same (row-local) cost."""
    docs = load_table(spark, "documents", sf_dir)
    return docs.select(
        "doc_id",
        F.md5(
            F.concat_ws(" ", F.array_sort(F.array_distinct(F.split("text", " "))))
        ).alias("fingerprint"),
    )


@query(
    "text_regex_tokens",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[a-z]+')) AS INT)      AS n_alpha,
           CAST(len(regexp_extract_all(text, '[a-z]{1,4}')) AS INT)  AS n_bpe_ish,
           CAST(len(regexp_extract_all(text, '\\s+')) AS INT) + 1    AS n_ws_tokens
    FROM documents
    """,
)
def text_regex_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex tokenization: alpha tokens, BPE-ish ≤4-char chunks,
    whitespace tokens — the token-count trio for data budgeting."""
    docs = load_table(spark, "documents", sf_dir)
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit("[a-z]+"), 0)).alias("n_alpha"),
        F.size(F.regexp_extract_all("text", F.lit("[a-z]{1,4}"), 0)).alias("n_bpe_ish"),
        (F.size(F.regexp_extract_all("text", F.lit("\\s+"), 0)) + 1).alias("n_ws_tokens"),
    )
