"""Text analysis over `documents`: token stats, quality scoring,
language-ID heuristic, document fingerprinting (SURVEY.md §2.3).

Everything is built-in column algebra (split / higher-order array
functions / regexp) — JVM-side, codegen'd, zero Python in the hot path.
At 100 TB each of these is a pure map over the documents table: no
shuffle at all until an explicit aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gotsdb_spark.operators.registry import query
from gotsdb_spark.sources.registry import fan_out, load_table

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


@query(
    "text_tfidf_top_term",
    oracle="""
    WITH tokens AS (
      SELECT doc_id, w FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
      ) raw
    ), tf AS (
      SELECT doc_id, w, count(*) AS tf FROM tokens GROUP BY doc_id, w
    ), df AS (
      SELECT w, count(DISTINCT doc_id) AS df FROM tokens GROUP BY w
    ), n AS (
      SELECT count(*) AS n_docs FROM documents
    ), scored AS (
      SELECT doc_id, w, tf * ln((n_docs + 1.0) / (df + 1.0)) AS tfidf
      FROM tf JOIN df USING (w), n
    )
    SELECT doc_id, w AS top_term, tfidf FROM (
      SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY tfidf DESC, w
      ) AS rn FROM scored
    ) t WHERE rn = 1
    """,
)
def text_tfidf_top_term(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF: most characteristic term per document.

    tf is a per-doc count; df a per-term distinct-doc count; idf the
    smoothed log ratio. ONE explode+groupBy pass builds tf
    (map-side-combinable), localCheckpointed because it has two
    consumers: df derives from it for free (tf holds exactly one row
    per (doc, term), so counting tf rows per term IS the distinct-doc
    count — no second corpus pass, no countDistinct shuffle), and the
    scoring join reads it back. The vocabulary (df) table grows with
    the corpus — sublinearly but unboundedly — so it is joined back
    with a shuffle-hash equi-join on the term, NOT broadcast (a
    corpus-growing broadcast is a driver OOM at 100 TB). The only
    broadcast is the 1-row corpus size, kept lazy as an aggregate
    frame instead of a driver-side count(). Deterministic tie-break
    on the term string.
    """
    docs = load_table(spark, "documents", sf_dir)
    tokens = docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    tf = (
        tokens.groupBy("doc_id", "w")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=False)
    )
    df = tf.groupBy("w").agg(F.count("*").alias("df"))
    n = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df.hint("shuffle_hash"), "w")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "w",
            (
                F.col("tf") * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0))
            ).alias("tfidf"),
        )
    )
    from pyspark.sql.window import Window as W

    win = W.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("w"))
    return (
        scored.withColumn("rn", F.row_number().over(win))
        .where(F.col("rn") == 1)
        .select("doc_id", F.col("w").alias("top_term"), "tfidf")
    )


@query(
    "text_rolling_hash",
    oracle="""
    SELECT doc_id,
           CAST(list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(
                 list_filter(string_split(text, ''), c -> c <> ''),
                 c -> CAST(ascii(c) AS BIGINT))),
             (a, b) -> (a * 31 + b) % 2147483647) AS BIGINT) AS rhash
    FROM documents
    """,
)
def text_rolling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polynomial rolling-hash fingerprint over the raw characters.

    The streaming-friendly fingerprint (updatable per character, unlike
    md5) — h = Σ c_i·31^i mod p via a left fold. Pure row-local
    higher-order expression in both engines.
    """
    docs = load_table(spark, "documents", sf_dir)
    chars = F.filter(F.split("text", ""), lambda c: c != "")
    rhash = F.aggregate(
        F.transform(chars, lambda c: F.ascii(c).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, c: (acc * 31 + c) % 2147483647,
    )
    return docs.select("doc_id", rhash.alias("rhash"))


@query(
    "text_top_bigrams",
    oracle="""
    WITH words AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), bigrams AS (
      SELECT doc_id,
             unnest(list_transform(
               generate_series(1, greatest(len(ws) - 1, 1)),
               i -> ws[i] || ' ' || ws[i+1])) AS bg
      FROM words
    )
    SELECT bg,
           count(*) AS n_occurrences,
           count(DISTINCT doc_id) AS n_docs
    FROM bigrams
    GROUP BY bg
    ORDER BY n_occurrences DESC, bg
    LIMIT 25
    """,
)
def text_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level bigram frequency table, top 25 by occurrence.

    The n-gram statistics pass behind vocabulary induction and
    contamination screens: bigrams are built row-locally (sequence +
    slice, the word_shingles machinery with k=2), so the only wide work
    is one count aggregation keyed by bigram — map-side combinable,
    shuffle O(distinct bigrams). Tie-break on the bigram text makes the
    top-k total.
    """
    docs = fan_out(load_table(spark, "documents", sf_dir))
    bigram = F.explode(
        F.transform(
            F.sequence(
                F.lit(1),
                F.greatest(F.size(F.split("text", " ")) - 1, F.lit(1)),
            ),
            lambda i: F.concat_ws(
                " ", F.slice(F.split("text", " "), i, 2)
            ),
        )
    )
    return (
        docs.select("doc_id", bigram.alias("bg"))
        .groupBy("bg")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.desc("n_occurrences"), F.asc("bg"))
        .limit(25)
    )


@query(
    "text_zipf_slope",
    oracle="""
    WITH tokens AS (
      SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ), freqs AS (
      SELECT w, count(*) AS f FROM tokens GROUP BY w
    ), ranked AS (
      SELECT f, row_number() OVER (ORDER BY f DESC, w) AS r FROM freqs
    )
    SELECT count(*) AS vocab_size,
           regr_slope(ln(f), ln(r)) AS zipf_slope,
           regr_r2(ln(f), ln(r)) AS fit_r2
    FROM ranked
    """,
)
def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the corpus vocabulary: regression slope of
    log-frequency on log-rank (natural text ~ -1).

    The corpus-health statistic: a slope far from -1 or a poor fit
    flags synthetic, templated, or boilerplate-heavy data before it
    trains anything. One count aggregation keyed by word, then a
    DISTRIBUTED rank over the vocabulary (dist_rank: range partition →
    local rank → broadcast offsets — the vocabulary is corpus-sized
    and Zipfian, exactly the frame a single-partition window must not
    own), and a regression aggregate — regr_slope/regr_r2 are
    map-side-combinable moment sums in both engines. Rank ties break
    on the word for a total order.
    """
    from gotsdb_spark.operators.distrank import dist_rank

    docs = load_table(spark, "documents", sf_dir)
    freqs = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("f"))
    )
    ranked = dist_rank(
        freqs, [F.desc("f"), F.asc("w")], rank_col="r"
    ).select("f", "r")
    return ranked.agg(
        F.count("*").alias("vocab_size"),
        F.regr_slope(F.log("f"), F.log("r")).alias("zipf_slope"),
        F.regr_r2(F.log("f"), F.log("r")).alias("fit_r2"),
    )


@query(
    "text_marker_position",
    oracle="""
    SELECT doc_id,
           nullif(list_position(string_split(text, ' '), 'the'), 0)
             AS the_pos,
           nullif(list_position(string_split(text, ' '), 'spark'), 0)
             AS spark_pos
    FROM documents
    """,
)
def text_marker_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First position of marker tokens per document (1-based).

    Pins a semantic footgun shared by BOTH engines: array_position /
    list_position return 0 (not NULL) for absent elements, silently
    colliding with downstream "is it set" checks. The query normalizes
    0 → NULL on both sides so 'not found' is NULL, never a valid-
    looking index. Row-local, scan-speed.
    """
    docs = load_table(spark, "documents", sf_dir)
    ws = F.split("text", " ")
    return docs.select(
        "doc_id",
        F.nullif(F.array_position(ws, "the"), F.lit(0)).alias("the_pos"),
        F.nullif(F.array_position(ws, "spark"), F.lit(0)).alias("spark_pos"),
    )


@query(
    "text_lang_mixing",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents
    ), hits AS (
      SELECT doc_id, lang,
             len(list_filter(ws, x -> x IN {_LANG_MARKERS['en']})) AS h_en,
             len(list_filter(ws, x -> x IN {_LANG_MARKERS['es']})) AS h_es,
             len(list_filter(ws, x -> x IN {_LANG_MARKERS['fr']})) AS h_fr,
             len(list_filter(ws, x -> x IN {_LANG_MARKERS['de']})) AS h_de
      FROM t
    ), scored AS (
      SELECT doc_id, lang,
             h_en + h_es + h_fr + h_de AS total,
             greatest(h_en, h_es, h_fr, h_de) AS top
      FROM hits
    )
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN total > 0 AND total > top THEN 1 ELSE 0 END)
                AS BIGINT) AS n_mixed,
           CAST(sum(CASE WHEN total = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_no_signal,
           floor(avg(CASE WHEN total > 0 THEN top * 1.0 / total END)
                 * 1e6 + 0.5001) / 1e6 AS avg_purity
    FROM scored GROUP BY lang
    """,
)
def text_lang_mixing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-mixing filter: docs whose marker tokens split across
    languages (code-switching / concatenation artifacts) get flagged —
    a standard corpus-curation gate next to lang-ID.

    Purity = top-language marker hits / all marker hits, counted over
    TOKENS (not distinct types, so repeated function words weigh in).
    Row-local array filters; one tiny aggregate per labeled lang. The
    avg is tie-nudge rounded (ratios of small ints land on exact
    rounding boundaries — see ts_stl_decompose).
    """
    docs = load_table(spark, "documents", sf_dir)
    ws = F.split("text", " ")

    def _hit_counter(markers: tuple) -> "F.Column":
        # A closure (not a default arg): higher-order-function lambdas
        # must take exactly one parameter or PySpark binds extras as
        # lambda variables.
        return F.size(F.filter(ws, lambda x: x.isin(*markers))).cast("long")

    hits = {lang: _hit_counter(m) for lang, m in _LANG_MARKERS.items()}
    total = hits["en"] + hits["es"] + hits["fr"] + hits["de"]
    top = F.greatest(hits["en"], hits["es"], hits["fr"], hits["de"])
    scored = docs.select(
        "lang", total.alias("total"), top.alias("top")
    )
    return scored.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(
            F.when((F.col("total") > 0) & (F.col("total") > F.col("top")), 1)
            .otherwise(0)
        ).cast("long").alias("n_mixed"),
        F.sum(F.when(F.col("total") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_no_signal"),
        (
            F.floor(
                F.avg(
                    F.when(
                        F.col("total") > 0,
                        F.col("top").cast("double") / F.col("total"),
                    )
                )
                * 1e6
                + 0.5001
            )
            / 1e6
        ).alias("avg_purity"),
    )


# BM25 parameters (Robertson et al. defaults) and a fixed query.
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TERMS = ("join", "scan", "vector")
_BM25_TOPN = 15


def _bm25_oracle() -> str:
    terms = ", ".join(f"('{t}')" for t in _BM25_TERMS)
    return f"""
    WITH q(term) AS (VALUES {terms}),
    toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ), dl AS (
      SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id
    ), stats AS (
      SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl
    ), tf AS (
      SELECT t.doc_id, t.w AS term, count(*) AS tf
      FROM toks t JOIN q ON q.term = t.w
      GROUP BY 1, 2
    ), df AS (
      SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term
    ), contrib AS (
      SELECT tf.doc_id,
             CAST(floor(
               ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
               * tf.tf * ({_BM25_K1} + 1.0)
               / (tf.tf + {_BM25_K1} * (1 - {_BM25_B}
                    + {_BM25_B} * dl.dl / (s.sum_dl * 1.0 / s.n_docs)))
               * 1e6 + 0.5001) AS BIGINT) AS c_e6
      FROM tf
      JOIN df USING (term)
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN stats s
    ), scored AS (
      SELECT doc_id, CAST(sum(c_e6) AS BIGINT) AS score_e6 FROM contrib GROUP BY doc_id
    )
    SELECT doc_id, score_e6 FROM scored
    ORDER BY score_e6 DESC, doc_id
    LIMIT {_BM25_TOPN}
    """


@query("text_bm25_topk", oracle=_bm25_oracle())
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval: top-{n} documents for a fixed 3-term query.

    The ranking function behind classical search and the usual
    lexical arm of RAG retrieval, next to text_tfidf_top_term's
    feature view. Term frequencies come from one (doc, term) groupBy
    *pre-filtered to the query terms* — at 100 TB the shuffle carries
    only matching postings, never the corpus vocabulary. Document
    length and corpus stats (N, avgdl) are exact integer aggregates
    broadcast back; per-term contributions are scalar double math on
    those exact inputs, scaled to integer 1e-6 units BEFORE the
    per-doc sum so summation order can't flip a digit (OLS/χ²
    convention, statistics.py). Final top-k is the
    TakeOrderedAndProject pattern — no global sort materializes.
    """
    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    # Both corpus passes are checkpointed: dl feeds the stats aggregate
    # AND the scoring join; tf feeds df AND the scoring join — without
    # the checkpoints each second consumer re-derived its groupBy from
    # a fresh documents scan (4 scans before the round-10 audit fix).
    dl = (
        toks.groupBy("doc_id")
        .agg(F.count("*").alias("dl"))
        .localCheckpoint(eager=False)
    )
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.sum("dl").cast("long").alias("sum_dl")
    )
    tf = (
        toks.where(F.col("w").isin(*_BM25_TERMS))
        .groupBy("doc_id", F.col("w").alias("term"))
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=False)
    )
    # tf holds one row per (doc, term), so counting rows per term IS
    # the distinct-doc count — no countDistinct Expand needed.
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    avgdl = F.col("sum_dl") * 1.0 / F.col("n_docs")
    idf = F.log(1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    denom = F.col("tf") + _BM25_K1 * (1 - _BM25_B + _BM25_B * F.col("dl") / avgdl)
    contrib = (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.floor(idf * F.col("tf") * (_BM25_K1 + 1.0) / denom * 1e6 + 0.5001)
            .cast("long")
            .alias("c_e6"),
        )
    )
    return (
        contrib.groupBy("doc_id")
        .agg(F.sum("c_e6").cast("long").alias("score_e6"))
        .orderBy(F.desc("score_e6"), F.asc("doc_id"))
        .limit(_BM25_TOPN)
    )


@query(
    "text_unigram_logprob",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ), freq AS (
      SELECT w, count(*) AS c FROM toks GROUP BY w
    ), tot AS (
      SELECT CAST(sum(c) AS BIGINT) AS total FROM freq
    ), nll AS (
      SELECT t.doc_id,
             CAST(floor(-ln(f.c * 1.0 / s.total) * 1e6 + 0.5001) AS BIGINT)
               AS nll_e6
      FROM toks t JOIN freq f USING (w) CROSS JOIN tot s
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(nll_e6) AS BIGINT) AS sum_nll_e6,
           CAST(floor(sum(nll_e6) * 1.0 / count(*) + 0.5001) AS BIGINT)
             AS avg_nll_e6
    FROM nll GROUP BY doc_id
    """,
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unigram negative log-likelihood (perplexity proxy).

    The classic cheap quality score: fit a unigram LM on the corpus
    itself (token frequency / total tokens), then score each document
    by its mean token negative log-probability — documents full of
    rare junk score high, fluent in-distribution text scores low.
    This is the KenLM-style filter of pretraining pipelines reduced
    to its Spark-native core: ONE explode+groupBy pass to the
    (doc, token, k) dictionary (map-side combinable,
    localCheckpointed), from which the corpus frequency table and the
    total are exact sums — no second corpus pass — and a per-doc
    integer sum weighted by k; token NLLs are scaled to 1e-6 integers
    BEFORE summing, so accumulation order is irrelevant.
    The frequency join is deliberately NOT hinted: a whitespace
    tokenization of a 100 TB web corpus has a heavy-tailed vocabulary
    in the billions of distinct tokens (typos, URLs, numbers), so the
    count table grows with the corpus and must never be forced
    through the 8 GB broadcast ceiling — same reasoning as the bigram
    sibling (text_bigram_logprob). AQE picks broadcast at small SF
    and sort-merge at scale. The only broadcast state is the 1-row
    corpus total.
    """
    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    dtoks = (
        toks.groupBy("doc_id", "w")
        .agg(F.count("*").alias("k"))
        .localCheckpoint(eager=False)
    )
    freq = dtoks.groupBy("w").agg(F.sum("k").alias("c"))
    tot = freq.agg(F.sum("c").cast("long").alias("total"))
    nll = (
        dtoks.join(freq, "w")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            "k",
            F.floor(-F.log(F.col("c") * 1.0 / F.col("total")) * 1e6 + 0.5001)
            .cast("long")
            .alias("nll_e6"),
        )
    )
    return nll.groupBy("doc_id").agg(
        F.sum("k").alias("n_tokens"),
        F.sum(F.col("k") * F.col("nll_e6")).cast("long").alias("sum_nll_e6"),
        F.floor(
            F.sum(F.col("k") * F.col("nll_e6")) * 1.0 / F.sum("k") + 0.5001
        )
        .cast("long")
        .alias("avg_nll_e6"),
    )


@query(
    "text_token_drift_snapshots",
    oracle="""
    WITH toks AS (
      SELECT doc_id % 2 AS snap, unnest(string_split(text, ' ')) AS term
      FROM documents
    ), counts AS (
      SELECT term,
             sum(CASE WHEN snap = 0 THEN 1 ELSE 0 END) AS old_n,
             sum(CASE WHEN snap = 1 THEN 1 ELSE 0 END) AS new_n
      FROM toks GROUP BY term
    ), totals AS (
      SELECT sum(old_n) AS old_total, sum(new_n) AS new_total FROM counts
    ), scored AS (
      SELECT term, CAST(old_n AS BIGINT) AS old_n, CAST(new_n AS BIGINT) AS new_n,
             CAST(floor(1e6 * ln((new_n * old_total * 1.0)
                                 / (old_n * new_total)) + 0.5001) AS BIGINT) AS drift_e6
      FROM counts, totals
      WHERE old_n >= 3 AND new_n >= 3
    )
    SELECT term, old_n, new_n, drift_e6 FROM scored
    ORDER BY abs(drift_e6) DESC, term LIMIT 20
    """,
)
def text_token_drift_snapshots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-frequency drift between two corpus snapshots — the
    distribution-shift monitor a training pipeline runs when a corpus
    is refreshed (did the new crawl change the language mix? did one
    template explode?).

    Snapshots are simulated by doc_id parity. Per-term counts come
    from one conditional aggregation over the exploded token table
    (single shuffle of (term, partial counts) — map-side combine
    absorbs the Zipf head); the two corpus totals are a broadcast
    1-row frame. Drift is the log frequency ratio, integer-scaled:
    the ratio's numerator/denominator are exact integer products
    (< 2^53), so both engines take ln of the identical double — but
    each engine's ln is only ~1-ulp accurate, so the file's +0.5001
    epsilon guard keeps the floor away from the one realistic
    boundary (ratio exactly 1 → ln = 0, where a 1-ulp wobble would
    flip floor between 0 and -1 and reshuffle the top-20 membership
    the ORDER BY abs() depends on). Top-20 by absolute drift with a
    total-order
    tiebreak; terms below 3 occurrences in either snapshot are
    excluded (rare-term ratios are noise, and at scale the filter
    prunes the long tail before the sort)."""
    docs = fan_out(load_table(spark, "documents", sf_dir))
    toks = docs.select(
        (F.col("doc_id") % 2).alias("snap"),
        F.explode(F.split("text", " ")).alias("term"),
    )
    counts = toks.groupBy("term").agg(
        F.sum(F.when(F.col("snap") == 0, 1).otherwise(0)).alias("old_n"),
        F.sum(F.when(F.col("snap") == 1, 1).otherwise(0)).alias("new_n"),
    )
    totals = counts.agg(
        F.sum("old_n").alias("old_total"), F.sum("new_n").alias("new_total")
    )
    scored = (
        counts.where((F.col("old_n") >= 3) & (F.col("new_n") >= 3))
        .crossJoin(F.broadcast(totals))
        .select(
            "term",
            F.col("old_n").cast("long").alias("old_n"),
            F.col("new_n").cast("long").alias("new_n"),
            F.floor(
                1e6
                * F.log(
                    (F.col("new_n") * F.col("old_total") * F.lit(1.0))
                    / (F.col("old_n") * F.col("new_total"))
                )
                + 0.5001
            )
            .cast("long")
            .alias("drift_e6"),
        )
    )
    return scored.orderBy(F.abs("drift_e6").desc(), "term").limit(20)


_BOILER_DF = 50  # shingles in ≥ this many docs are template/boilerplate

_BOILERPLATE_ORACLE = f"""
    WITH words AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), shingles AS (
      SELECT DISTINCT doc_id, sh FROM (
        SELECT doc_id,
               unnest(list_transform(
                 generate_series(1, greatest(len(ws) - 2, 1)),
                 i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS sh
        FROM words
      ) raw
    ), freq AS (
      SELECT sh FROM shingles GROUP BY sh HAVING count(*) >= {_BOILER_DF}
    )
    SELECT s.doc_id,
           CAST(count(*) AS BIGINT) AS n_sh,
           CAST(count(f.sh) AS BIGINT) AS n_boiler,
           CAST(floor(count(f.sh) * 1000000.0 / count(*)) AS BIGINT)
             AS boiler_share_e6
    FROM shingles s LEFT JOIN freq f USING (sh)
    GROUP BY s.doc_id
"""


@query("text_boilerplate_share", oracle=_BOILERPLATE_ORACLE)
def text_boilerplate_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document boilerplate ratio: the share of a doc's distinct
    3-word shingles that are corpus-wide templates (document frequency
    ≥ {_BOILER_DF}).

    The CCNet/C4-style signal that separates navigation chrome, license
    headers and scraped templates from original prose — a doc whose
    shingles are mostly corpus-frequent adds nothing to a training mix
    even if it is not an exact duplicate of any single other doc.

    Scale design: shingle document-frequency is one map-side-combinable
    groupBy (hot shingles absorbed map-side — never a window over the
    Zipfian shingle key); the boilerplate set is a one-column frame
    joined back on the shingle key where AQE skew-split applies; the
    final per-doc rollup shuffles (doc_id, flag) pairs only. The ratio
    is exact integer arithmetic (n*1e6 is exact in double far below
    2^53 and IEEE division is correctly rounded, so floor is
    cross-engine stable).
    """
    from gotsdb_spark.operators.dedup import shingle_table

    sh = shingle_table(spark, sf_dir).localCheckpoint(eager=False)
    boiler = (
        sh.groupBy("sh")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") >= _BOILER_DF)
        .select("sh", F.lit(1).alias("is_boiler"))
    )
    return (
        sh.join(boiler, "sh", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_sh"),
            F.count("is_boiler").cast("long").alias("n_boiler"),
            F.floor(F.count("is_boiler") * 1000000.0 / F.count("*"))
            .cast("long")
            .alias("boiler_share_e6"),
        )
    )


_RRF_K = 60
_RRF_DEPTH = 15  # per-arm candidate depth (matches the BM25 top-k)


def _rrf_oracle() -> str:
    return f"""
    WITH lex AS (
      SELECT doc_id,
             CAST(row_number() OVER (ORDER BY score_e6 DESC, doc_id)
                  AS BIGINT) AS rank_lex
      FROM ({_bm25_oracle()}) b
    ), emb AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ), qv AS (
      SELECT e AS qe FROM emb WHERE vec_id = 0
    ), sem_scored AS (
      SELECT vec_id AS doc_id,
             CAST(floor(list_dot_product(qe, e)
                        / (sqrt(list_dot_product(qe, qe))
                           * sqrt(list_dot_product(e, e)))
                        * 1e6 + 0.5001) AS BIGINT) AS cos_e6
      FROM emb CROSS JOIN qv WHERE vec_id <> 0
    ), sem AS (
      SELECT doc_id,
             CAST(row_number() OVER (ORDER BY cos_e6 DESC, doc_id)
                  AS BIGINT) AS rank_sem
      FROM sem_scored ORDER BY cos_e6 DESC, doc_id LIMIT {_RRF_DEPTH}
    )
    SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id,
           l.rank_lex, s.rank_sem,
           CAST(COALESCE(1000000 // ({_RRF_K} + l.rank_lex), 0)
                + COALESCE(1000000 // ({_RRF_K} + s.rank_sem), 0)
                AS BIGINT) AS rrf_e6
    FROM lex l FULL OUTER JOIN sem s ON s.doc_id = l.doc_id
    """


@query("text_rrf_fusion", oracle=_rrf_oracle())
def text_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of the lexical (BM25) and semantic
    (embedding-cosine) retrieval arms — the standard hybrid-search
    combiner (Cormack et al. 2009) behind most production RAG stacks.

    RRF(d) = Σ_arms 1/(k + rank_arm(d)), k=60. Ranks are deterministic
    (score desc, doc_id) over each arm's top-15; the fused
    score is an exact integer sum of BIGINT floor divisions, so no
    float ever crosses the engine boundary. The cosine itself is
    floored to e6 BEFORE ranking (one expression per row), making the
    rank ulp-proof.

    Scale: each arm ends in a TakeOrderedAndProject top-k (partial
    top-k per partition merged on the driver — no global sort); the
    rank window then runs over k rows. The fusion is a full outer join
    of two k-row frames. The BM25 arm shares text_bm25_topk's
    query-term-filtered postings plan; the semantic arm is one
    broadcast of the query vector against the corpus scan.
    """
    from pyspark.sql.window import Window as W

    from gotsdb_spark.operators.similarity import cosine

    lex = (
        text_bm25_topk(spark, sf_dir)
        .withColumn(
            "rank_lex",
            F.row_number()
            .over(W.orderBy(F.desc("score_e6"), F.asc("doc_id")))
            .cast("bigint"),
        )
        .select("doc_id", "rank_lex")
    )
    emb = load_table(spark, "embeddings", sf_dir)
    qv = emb.where(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))
    sem_scored = (
        emb.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.floor(cosine(F.col("q_emb"), F.col("embedding")) * 1e6 + 0.5001)
            .cast("bigint")
            .alias("cos_e6"),
        )
    )
    sem = (
        sem_scored.orderBy(F.desc("cos_e6"), F.asc("doc_id"))
        .limit(_RRF_DEPTH)
        .withColumn(
            "rank_sem",
            F.row_number()
            .over(W.orderBy(F.desc("cos_e6"), F.asc("doc_id")))
            .cast("bigint"),
        )
        .select("doc_id", "rank_sem")
    )
    fused = lex.join(sem, "doc_id", "full_outer")
    return fused.select(
        "doc_id",
        "rank_lex",
        "rank_sem",
        (
            F.coalesce(F.expr(f"1000000 DIV ({_RRF_K} + rank_lex)"), F.lit(0))
            + F.coalesce(F.expr(f"1000000 DIV ({_RRF_K} + rank_sem)"), F.lit(0))
        )
        .cast("bigint")
        .alias("rrf_e6"),
    )


# ---------------------------------------------------------------------------
# Token entropy + bigram LM scoring — round 6.
# ---------------------------------------------------------------------------

TOKEN_ENTROPY_ORACLE = """
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ), cnt AS (
      SELECT doc_id, w, count(*) AS c FROM toks GROUP BY doc_id, w
    ), tot AS (
      SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS n_distinct
      FROM cnt GROUP BY doc_id
    ), contrib AS (
      SELECT cnt.doc_id,
             CAST(floor(-(c * 1.0 / n) * ln(c * 1.0 / n) * 1e9 + 0.5001)
                  AS BIGINT) AS h_e9
      FROM cnt JOIN tot ON cnt.doc_id = tot.doc_id
    )
    SELECT tot.doc_id, n AS n_tokens, n_distinct,
           CAST(sum(h_e9) AS BIGINT) AS entropy_e9,
           CASE WHEN n_distinct > 1 THEN
             CAST(sum(h_e9) * 1000000
                  // CAST(floor(ln(n_distinct) * 1e9 + 0.5001) AS BIGINT)
                  AS BIGINT)
           ELSE CAST(0 AS BIGINT) END AS norm_entropy_e6
    FROM contrib JOIN tot ON contrib.doc_id = tot.doc_id
    GROUP BY tot.doc_id, n, n_distinct
"""


@query("text_token_entropy", oracle=TOKEN_ENTROPY_ORACLE)
def text_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Shannon entropy of the token distribution, plus the
    entropy normalized by ln(vocabulary) — the repetitiveness score a
    quality filter uses: near 0 means one token dominates (templated /
    degenerate text), near 1 means tokens are spread evenly.

    Determinism: each term's contribution −(c/n)·ln(c/n) is evaluated
    once on exact integer counts and floored to an e9 integer BEFORE
    summing (the unigram-NLL convention: integer sums commute, float
    sums don't); the normalized form is an integer ratio of two
    e-scaled values, engine-identically truncated. Two map-side-
    combinable groupBys keyed by (doc, token) and doc — per-doc state
    bounded by document length, never corpus size. The (doc, token)
    count table is localCheckpointed: its three consumers (the per-doc
    totals, the contribution join, the final readout join) share ONE
    corpus pass instead of re-deriving the explode+groupBy each
    (round-10 scan-audit fix).
    """
    docs = load_table(spark, "documents", sf_dir)
    cnt = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=False)
    )
    tot = cnt.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_distinct"),
    )
    p = F.col("c") * 1.0 / F.col("n_tokens")
    contrib = cnt.join(tot, "doc_id").select(
        "doc_id",
        F.floor(-p * F.log(p) * 1e9 + 0.5001).cast("long").alias("h_e9"),
    )
    return (
        contrib.groupBy("doc_id")
        .agg(F.sum("h_e9").cast("long").alias("entropy_e9"))
        .join(tot, "doc_id")
        .select(
            "doc_id",
            "n_tokens",
            "n_distinct",
            "entropy_e9",
            F.when(
                F.col("n_distinct") > 1,
                F.expr(
                    "entropy_e9 * 1000000 DIV"
                    " CAST(floor(ln(n_distinct) * 1e9 + 0.5001) AS BIGINT)"
                ),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("norm_entropy_e6"),
        )
    )


BIGRAM_LOGPROB_ORACLE = """
    WITH ws AS (
      SELECT doc_id, string_split(text, ' ') AS a FROM documents
    ), bg AS (
      SELECT doc_id, a[i] AS w1, a[i + 1] AS w2
      FROM ws, unnest(range(1, len(a))) AS t(i)
    ), c12 AS (
      SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2
    ), c1 AS (
      SELECT w1, count(*) AS c1 FROM bg GROUP BY w1
    ), v AS (
      SELECT count(DISTINCT w) AS v FROM (
        SELECT unnest(string_split(text, ' ')) AS w FROM documents
      ) toks
    ), scored AS (
      SELECT bg.doc_id,
             CAST(floor(-ln((c12.c12 + 1) * 1.0 / (c1.c1 + v.v)) * 1e6
                        + 0.5001) AS BIGINT) AS nll_e6
      FROM bg
      JOIN c12 ON bg.w1 = c12.w1 AND bg.w2 = c12.w2
      JOIN c1 ON bg.w1 = c1.w1
      CROSS JOIN v
    )
    SELECT doc_id,
           count(*) AS n_bigrams,
           CAST(sum(nll_e6) AS BIGINT) AS sum_nll_e6,
           CAST(sum(nll_e6) // count(*) AS BIGINT) AS avg_nll_e6
    FROM scored GROUP BY doc_id
"""


@query("text_bigram_logprob", oracle=BIGRAM_LOGPROB_ORACLE)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document bigram-LM negative log-likelihood with add-one
    smoothing — the order-aware upgrade of text_unigram_logprob: a doc
    of common words in impossible ORDER now scores high (word salad),
    which the bag-of-words unigram score cannot see. This is the KenLM
    n-gram filter of pretraining pipelines at n=2, Spark-native.

    P(w2|w1) = (c(w1,w2)+1)/(c(w1)+V), fit on the corpus itself. ONE
    explode pass collapses the bigram stream to the per-document
    (doc, w1, w2, k) dictionary (map-side combinable, built
    row-locally with a JVM transform over the token array, no
    self-join), localCheckpointed because everything else derives
    from it: the corpus pair counts are Σk over docs, the w1 marginal
    is Σk over (docs, w2) — no separate bigram passes — and scoring
    joins the dictionary back on the (w1,w2) equi-key, weighting each
    NLL by k. The join is a shuffle join, NOT a broadcast: at corpus
    scale the bigram table is itself corpus-sized, exactly what must
    never be collected. Only the unigram VOCABULARY size needs its own
    corpus pass (1-token docs contribute vocabulary but no bigrams).
    Per-position NLLs floor to e6 integers before the doc sum
    (association-safe); avg is exact integer division.
    """
    docs = load_table(spark, "documents", sf_dir)
    ws = docs.select("doc_id", F.split("text", " ").alias("a"))
    bg = ws.select(
        "doc_id",
        F.explode(
            # Positions are sequence(1, size(a)) FILTERED to i < size(a)
            # rather than sequence(1, size(a) - 1): for a 1-token doc
            # the latter is sequence(1, 0), which Spark builds with the
            # implicit -1 step as DESCENDING [1, 0] — and element_at(a,
            # 0) then raises INVALID_INDEX_OF_ZERO even in non-ANSI
            # mode. The filtered form yields an empty array for 1-token
            # docs, so explode drops the doc — matching the oracle,
            # whose range(1, len(a)) is empty for such docs.
            F.expr(
                "transform(filter(sequence(1, size(a)), i -> i < size(a)),"
                " i -> struct(element_at(a, i) AS w1,"
                "             element_at(a, i + 1) AS w2))"
            )
        ).alias("b"),
    ).select("doc_id", "b.w1", "b.w2")
    dbg = (
        bg.groupBy("doc_id", "w1", "w2")
        .agg(F.count("*").alias("k"))
        .localCheckpoint(eager=False)
    )
    c12 = dbg.groupBy("w1", "w2").agg(F.sum("k").alias("c12"))
    c1 = dbg.groupBy("w1").agg(F.sum("k").alias("c1"))
    v = docs.select(
        F.explode(F.split("text", " ")).alias("w")
    ).agg(F.countDistinct("w").alias("v"))
    scored = (
        dbg.join(c12, ["w1", "w2"])
        .join(c1, ["w1"])
        .crossJoin(F.broadcast(v))
        .select(
            "doc_id",
            "k",
            F.floor(
                -F.log((F.col("c12") + 1) * 1.0 / (F.col("c1") + F.col("v")))
                * 1e6
                + 0.5001
            )
            .cast("long")
            .alias("nll_e6"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.sum("k").alias("n_bigrams"),
        F.sum(F.col("k") * F.col("nll_e6")).cast("long").alias("sum_nll_e6"),
        F.expr(
            "CAST(sum(k * nll_e6) DIV sum(k) AS BIGINT)"
        ).alias("avg_nll_e6"),
    )


# ---------------------------------------------------------------------------
# PMI collocation mining — round 7.
# ---------------------------------------------------------------------------

_PMI_MIN_COUNT = 5
_PMI_TOP_K = 50

PMI_BIGRAMS_ORACLE = f"""
    WITH ws AS (
      SELECT doc_id, string_split(text, ' ') AS a FROM documents
    ), bg AS (
      SELECT a[i] AS w1, a[i + 1] AS w2
      FROM ws, unnest(range(1, len(a))) AS t(i)
    ), tot AS (
      SELECT count(*) AS n FROM bg
    ), c12 AS (
      SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2
    ), c1 AS (
      SELECT w1, count(*) AS c1 FROM bg GROUP BY w1
    ), c2 AS (
      SELECT w2, count(*) AS c2 FROM bg GROUP BY w2
    )
    SELECT c12.w1, c12.w2,
           CAST(c12.c12 AS BIGINT) AS n_pair,
           CAST(floor(ln(c12.c12 * tot.n * 1.0 / (c1.c1 * c2.c2)) * 1e6
                      + 0.5001) AS BIGINT) AS pmi_e6
    FROM c12
    JOIN c1 ON c12.w1 = c1.w1
    JOIN c2 ON c12.w2 = c2.w2
    CROSS JOIN tot
    WHERE c12.c12 >= {_PMI_MIN_COUNT}
    ORDER BY pmi_e6 DESC, c12.w1, c12.w2
    LIMIT {_PMI_TOP_K}
"""


@query("text_pmi_bigrams", oracle=PMI_BIGRAMS_ORACLE)
def text_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top collocations by pointwise mutual information — the phrase
    detector (Mikolov-style word2phrase scoring) a tokenizer-training
    or stop-phrase-mining pass runs over the corpus: PMI ranks bigrams
    by how much MORE often they co-occur than their unigram rates
    predict, surfacing multi-word units ("new york") that raw bigram
    counts (text_top_bigrams) bury under frequent-word noise.

    PMI = ln(c12·N / (c1·c2)) over positional marginals (c1 = count as
    FIRST word, c2 = count as SECOND word — the standard bigram-PMI
    contingency), computed once per output row from exact integer
    counts and floored to e6; a min-count gate (≥{_PMI_MIN_COUNT})
    drops the unstable low-frequency tail. Top-{_PMI_TOP_K} under a
    total order (pmi desc, w1, w2) plans as TakeOrdered — per-task
    heaps, no global sort.

    Scale: ONE map-side-combinable groupBy over the bigram stream
    (built row-locally, same guarded position build as
    text_bigram_logprob) to the (w1, w2) pair-count table,
    localCheckpointed — the total and BOTH positional marginals are
    exact sums over it, so nothing re-reads the corpus (the
    pre-round-10 shape ran four bigram passes). The marginal joins
    are shuffle equi-joins on word keys — corpus-sized tables
    deliberately NOT broadcast. The 1-row total is a broadcast cross
    join.
    """
    docs = load_table(spark, "documents", sf_dir)
    ws = docs.select("doc_id", F.split("text", " ").alias("a"))
    bg = ws.select(
        F.explode(
            F.expr(
                "transform(filter(sequence(1, size(a)), i -> i < size(a)),"
                " i -> struct(element_at(a, i) AS w1,"
                "             element_at(a, i + 1) AS w2))"
            )
        ).alias("b")
    ).select("b.w1", "b.w2")
    c12 = (
        bg.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
        .localCheckpoint(eager=False)
    )
    tot = c12.agg(F.sum("c12").alias("n"))
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    c2 = c12.groupBy("w2").agg(F.sum("c12").alias("c2"))
    return (
        c12.where(F.col("c12") >= _PMI_MIN_COUNT)
        .join(c1, "w1")
        .join(c2, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            F.col("c12").cast("long").alias("n_pair"),
            F.floor(
                F.log(
                    F.col("c12") * F.col("n") * 1.0 / (F.col("c1") * F.col("c2"))
                )
                * 1e6
                + 0.5001
            )
            .cast("long")
            .alias("pmi_e6"),
        )
        .orderBy(F.col("pmi_e6").desc(), "w1", "w2")
        .limit(_PMI_TOP_K)
    )


# ---------------------------------------------------------------------------
# N-gram novelty scoring — round 7.
# ---------------------------------------------------------------------------

NOVELTY_ORACLE = """
    WITH words AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), shingles AS (
      SELECT DISTINCT doc_id, sh FROM (
        SELECT doc_id,
               unnest(list_transform(
                 generate_series(1, greatest(len(ws) - 2, 1)),
                 i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS sh
        FROM words
      ) raw
    ), df AS (
      SELECT sh, count(*) AS df FROM shingles GROUP BY sh
    )
    SELECT s.doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_novel,
           CAST(sum(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) * 1000000
                // count(*) AS BIGINT) AS novelty_e6
    FROM shingles s JOIN df ON s.sh = df.sh
    GROUP BY s.doc_id
"""


@query("text_ngram_novelty", oracle=NOVELTY_ORACLE)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram NOVELTY: the share of a doc's distinct
    3-word shingles that appear in NO other document — the inverse of
    the boilerplate share (text_boilerplate_share scores how much of a
    doc is corpus-common; this scores how much is corpus-unique). Low
    novelty → templated/duplicated content even when no single pair
    crosses the near-dup threshold; high novelty → the doc contributes
    genuinely new n-grams to the training mix (and, post-training, is
    the content most exposed to verbatim-memorization risk, which is
    why curation pipelines track exactly this share).

    Shape: distinct (doc, shingle) stream → document-frequency counts
    (map-side-combinable groupBy on the shingle key) → join back on
    the shingle → per-doc exact integer share. df=1 detection needs
    the GLOBAL df, so the join is a shuffle equi-join on shingle —
    corpus-sized by necessity, same class as the TF-IDF/BM25 postings
    joins, and the only shuffles in the plan.
    """
    from gotsdb_spark.operators.dedup import shingle_table

    sh = shingle_table(spark, sf_dir).localCheckpoint(eager=False)
    df = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    return (
        sh.join(df, "sh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.sum(F.when(F.col("df") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_novel",
            F.expr("CAST(n_novel * 1000000 DIV n_shingles AS BIGINT)").alias(
                "novelty_e6"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Type-token ratio / hapax profile per source — round 8.
# ---------------------------------------------------------------------------

TTR_HAPAX_ORACLE = """
    WITH tok AS (
      SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
    ), dic AS (
      SELECT source, w, CAST(count(*) AS BIGINT) AS c
      FROM tok GROUP BY source, w
    )
    SELECT source,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_types,
           CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_hapax,
           CAST(count(*) * 1000000 // sum(c) AS BIGINT) AS ttr_e6,
           CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1000000
                // count(*) AS BIGINT) AS hapax_share_e6
    FROM dic GROUP BY source
"""


@query("text_ttr_hapax_profile", oracle=TTR_HAPAX_ORACLE)
def text_ttr_hapax_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical-diversity profile per source: type-token ratio and
    hapax-legomena share — the two numbers corpus linguists read
    first. A source whose TTR collapsed is template spam (few types,
    endless tokens); one whose hapax share spiked is OCR noise or
    boilerplate-stripping failure (every 'word' unique). Together with
    token entropy (text_token_entropy, corpus-global) this gives the
    per-source vocabulary dashboard.

    The per-source term dictionary — (source, token, count), the same
    shape BM25's postings use — comes from one explode + map-side-
    combinable groupBy; everything after is dictionary-bounded
    (vocabulary size, not token count). Ratios are exact e6 integer
    rationals. The whitespace-token convention (empty text tokenizes
    to one empty-string token) matches text_token_stats and both
    engines' split semantics.

    Scale: the explode is a flat map at scan speed; the groupBy
    partial-aggregates within partitions, so shuffle volume is the
    per-partition vocabulary, which saturates (Heaps' law) long
    before token volume does.

    Reference parity: the reference (j0shgrant/gotsdb) has no text
    surface (internal/storage/types.go:3); this is [TARGET] text
    machinery.
    """
    docs = load_table(spark, "documents", sf_dir)
    tok = docs.select(
        "source", F.explode(F.split("text", " ")).alias("w")
    )
    dic = tok.groupBy("source", "w").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    return dic.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_hapax"),
        F.expr("CAST(count(*) * 1000000 DIV sum(c) AS BIGINT)").alias(
            "ttr_e6"
        ),
        F.expr(
            "CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1000000"
            " DIV count(*) AS BIGINT)"
        ).alias("hapax_share_e6"),
    )


# ---------------------------------------------------------------------------
# Automated Readability Index per (lang, source) — round 11.
# ---------------------------------------------------------------------------

ARI_ORACLE = """
    WITH per_doc AS (
      SELECT lang, source,
             CAST(length(text) AS BIGINT) AS chars,
             CAST(length(text) - length(replace(text, ' ', '')) + 1
                  AS BIGINT) AS words,
             CAST(greatest(length(regexp_replace(text, '[^.!?]', '', 'g')),
                           1) AS BIGINT) AS sents
      FROM documents
    )
    SELECT lang, source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(chars) AS BIGINT) AS total_chars,
           CAST(sum(words) AS BIGINT) AS total_words,
           CAST(sum(sents) AS BIGINT) AS total_sentences,
           CAST(471 * sum(chars) * 10000 // sum(words) // 100
                + 5 * sum(words) * 1000000 // sum(sents) // 10
                - 2143 * 10000 AS BIGINT) AS ari_e6
    FROM per_doc
    GROUP BY lang, source
    ORDER BY lang, source
"""


@query("text_readability_ari", oracle=ARI_ORACLE)
def text_readability_ari(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Automated Readability Index per (lang, source) — the classic
    grade-level formula 4.71*(chars/words) + 0.5*(words/sentences)
    - 21.43, chosen over Flesch exactly because it needs NO syllable
    model: characters, whitespace-separated words and terminal-
    punctuation sentences are the only inputs, so the whole metric is
    engine-portable integer arithmetic. Complements the Gopher quality
    rules (per-doc gates) with a corpus-level complexity profile —
    mixing grade-4 and grade-16 sources at equal weight is a known
    pretraining-mix failure.

    Determinism: chars = length, words = spaces + 1, sentences =
    count of [.!?] characters (greatest 1 so headline-style docs
    divide safely) — all exact integers; ARI at e6 = 471*C*10000 DIV
    W DIV 100 + 5*W*1000000 DIV S DIV 10 - 21430000 with the constant
    factors pre-scaled so every division is integer (truncation
    identical in both engines).

    Scale: one map-side-combinable shuffle to the (lang, source)
    dictionary; per-doc counts are scan-side expressions — no window,
    no join.

    Reference parity: the reference (j0shgrant/gotsdb) has no text
    surface (internal/storage/types.go:3); this is [TARGET] text
    machinery.
    """
    per_doc = load_table(spark, "documents", sf_dir).select(
        "lang",
        "source",
        F.length("text").cast("long").alias("chars"),
        (
            F.length("text")
            - F.length(F.regexp_replace("text", " ", ""))
            + 1
        )
        .cast("long")
        .alias("words"),
        F.greatest(
            F.length(F.regexp_replace("text", "[^.!?]", "")), F.lit(1)
        )
        .cast("long")
        .alias("sents"),
    )
    return (
        per_doc.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("chars").cast("long").alias("total_chars"),
            F.sum("words").cast("long").alias("total_words"),
            F.sum("sents").cast("long").alias("total_sentences"),
        )
        .select(
            "lang",
            "source",
            "n_docs",
            "total_chars",
            "total_words",
            "total_sentences",
            F.expr(
                "CAST(471 * total_chars * 10000 DIV total_words DIV 100"
                " + 5 * total_words * 1000000 DIV total_sentences DIV 10"
                " - 2143 * 10000 AS BIGINT)"
            ).alias("ari_e6"),
        )
        .orderBy("lang", "source")
    )


# ---------------------------------------------------------------------------
# Vocabulary coverage curve (tokenizer-budget sizing) — round 11.
# ---------------------------------------------------------------------------

_VOCAB_CUTS = (100, 1000, 10000)

VOCAB_COVERAGE_ORACLE = f"""
    WITH tok AS (
      SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ), freq AS (
      SELECT w, CAST(count(*) AS BIGINT) AS f FROM tok GROUP BY w
    ), ranked AS (
      SELECT f, row_number() OVER (ORDER BY f DESC, w) AS rk,
             sum(f) OVER (ORDER BY f DESC, w) AS cum
      FROM freq
    ), tot AS (
      SELECT CAST(sum(f) AS BIGINT) AS total,
             CAST(count(*) AS BIGINT) AS n_types
      FROM freq
    )
    SELECT c.k AS vocab_size,
           CAST(max(r.cum) AS BIGINT) AS tokens_covered,
           t.total AS total_tokens,
           t.n_types,
           CAST(max(r.cum) * 1000000 // t.total AS BIGINT) AS coverage_e6
    FROM (SELECT unnest([{", ".join(str(k) for k in _VOCAB_CUTS)}]) AS k) c
    JOIN ranked r ON r.rk <= c.k
    CROSS JOIN tot t
    GROUP BY c.k, t.total, t.n_types
    ORDER BY vocab_size
"""


@query("text_vocab_coverage", oracle=VOCAB_COVERAGE_ORACLE)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: what share of all corpus tokens the
    top-k most frequent types cover, at k = {cuts} — THE tokenizer-
    budget question (how big a vocab before <unk> is negligible) and
    the quantitative face of Zipf's law (text_zipf_slope fits the
    exponent; this reads the integral off the same dictionary).

    Determinism: the token dictionary ranks by (frequency DESC, token)
    — a total order, so both engines pick identical top-k sets even
    across frequency ties; cumulative counts and the e6 coverage are
    exact integers via dist_rank's running sum.

    Scale: one map-side-combinable shuffle to the token dictionary
    (heavy-tailed but sublinear in corpus size), one linear dist_rank
    over it — never a single-partition data-sized window; the 3-cut
    spine is a broadcast and each cut reads one running-sum row class.

    Reference parity: the reference (j0shgrant/gotsdb) has no text
    surface (internal/storage/types.go:3); this is [TARGET] text
    machinery.
    """
    from gotsdb_spark.operators.distrank import dist_rank

    docs = load_table(spark, "documents", sf_dir)
    freq = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("f"))
    )
    ranked = dist_rank(
        freq,
        [F.desc("f"), F.asc("w")],
        rank_col="rk",
        sum_cols={"cum": "f"},
    ).localCheckpoint(eager=False)
    tot = ranked.agg(
        F.sum("f").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
    )
    cuts = docs.sparkSession.createDataFrame(
        [(k,) for k in _VOCAB_CUTS], "k INT"
    )
    return (
        ranked.join(F.broadcast(cuts), F.col("rk") <= F.col("k"))
        .groupBy("k")
        .agg(F.max("cum").cast("long").alias("tokens_covered"))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("k").alias("vocab_size"),
            "tokens_covered",
            F.col("total").alias("total_tokens"),
            "n_types",
            F.expr(
                "CAST(tokens_covered * 1000000 DIV total AS BIGINT)"
            ).alias("coverage_e6"),
        )
        .orderBy("vocab_size")
    )


text_vocab_coverage.__doc__ = text_vocab_coverage.__doc__.format(
    cuts=_VOCAB_CUTS
)


# ---------------------------------------------------------------------------
# Heaps-law vocabulary-growth fit — round 12.
# ---------------------------------------------------------------------------

HEAPS_LAW_ORACLE = """
    WITH tok AS (
      SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
    ), dict AS (
      SELECT source, w, CAST(count(*) AS BIGINT) AS f
      FROM tok GROUP BY source, w
    ), per_src AS (
      SELECT source,
             CAST(sum(f) AS BIGINT) AS toks,
             CAST(count(*) AS BIGINT) AS types,
             CAST(floor(ln(CAST(sum(f) AS DOUBLE)) * 1e9 + 0.5001)
                  AS BIGINT) AS x_e9,
             CAST(floor(ln(CAST(count(*) AS DOUBLE)) * 1e9 + 0.5001)
                  AS BIGINT) AS y_e9
      FROM dict GROUP BY source
    ), suff AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(toks) AS BIGINT) AS sum_tokens,
             CAST(sum(types) AS BIGINT) AS sum_types,
             CAST(sum(x_e9) AS HUGEINT) AS sx,
             CAST(sum(y_e9) AS HUGEINT) AS sy,
             CAST(sum(CAST(x_e9 AS HUGEINT) * y_e9) AS HUGEINT) AS sxy,
             CAST(sum(CAST(x_e9 AS HUGEINT) * x_e9) AS HUGEINT) AS sxx
      FROM per_src
    )
    SELECT n AS n_sources, sum_tokens, sum_types,
           CAST((n * sxy - sx * sy) * 1000000
                // NULLIF(n * sxx - sx * sx, 0) AS BIGINT) AS beta_e6,
           CAST((sy * (n * sxx - sx * sx) - (n * sxy - sx * sy) * sx)
                // NULLIF(n * (n * sxx - sx * sx) * 1000, 0) AS BIGINT)
             AS lnk_e6
    FROM suff
"""


@query("text_heaps_law_fit", oracle=HEAPS_LAW_ORACLE)
def text_heaps_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary-growth fit: V = k * T^beta estimated by
    integer OLS over the per-source (ln tokens, ln types) points —
    the growth-exponent companion to text_vocab_coverage (which reads
    the Zipf integral off one corpus; Heaps reads how fast the type
    inventory GROWS as token count scales across the 20 sources).
    beta ~ 0.5 means a tokenizer vocab sized for 10x the corpus needs
    ~3.2x the types — THE vocabulary-budget forecast.

    Determinism: per-source token and type counts are exact integers
    off the (source, token) dictionary; each log coordinate is
    e9-floored (with the ulp nudge) BEFORE any cross-row sum, and the
    OLS slope/intercept are exact integer expressions over
    DECIMAL(38,0)/HUGEINT sufficient sums — no order-sensitive float
    arithmetic anywhere (the ts_hurst_exponent slope idiom). Both
    engines truncate the final integer divisions toward zero.

    Scale: one map-side-combinable shuffle to the (source, token)
    dictionary (sublinear in corpus size), one map-side-combinable
    rollup to the source grain (bounded by the source dictionary),
    then a scalar aggregate — no window, no join, no pair blowup.

    Reference parity: the reference (j0shgrant/gotsdb) has no text
    surface (internal/storage/types.go:3); this is [TARGET] text
    machinery.
    """
    dec = "decimal(38,0)"
    docs = load_table(spark, "documents", sf_dir)
    dic = (
        docs.select(
            "source", F.explode(F.split("text", " ")).alias("w")
        )
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("f"))
    )
    per_src = dic.groupBy("source").agg(
        F.sum("f").cast("long").alias("toks"),
        F.count(F.lit(1)).cast("long").alias("types"),
    ).select(
        "toks",
        "types",
        F.expr(
            "CAST(floor(ln(CAST(toks AS DOUBLE)) * 1e9 + 0.5001)"
            " AS BIGINT)"
        ).alias("x_e9"),
        F.expr(
            "CAST(floor(ln(CAST(types AS DOUBLE)) * 1e9 + 0.5001)"
            " AS BIGINT)"
        ).alias("y_e9"),
    )
    suff = per_src.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("toks").cast("long").alias("sum_tokens"),
        F.sum("types").cast("long").alias("sum_types"),
        F.sum(F.col("x_e9").cast(dec)).alias("sx"),
        F.sum(F.col("y_e9").cast(dec)).alias("sy"),
        F.sum(F.col("x_e9").cast(dec) * F.col("y_e9")).alias("sxy"),
        F.sum(F.col("x_e9").cast(dec) * F.col("x_e9")).alias("sxx"),
    )
    return suff.select(
        F.col("n").alias("n_sources"),
        "sum_tokens",
        "sum_types",
        F.expr(
            "CAST((n * sxy - sx * sy) * 1000000"
            " DIV NULLIF(n * sxx - sx * sx, 0) AS BIGINT)"
        ).alias("beta_e6"),
        F.expr(
            "CAST((sy * (n * sxx - sx * sx) - (n * sxy - sx * sy) * sx)"
            " DIV NULLIF(n * (n * sxx - sx * sx) * 1000, 0) AS BIGINT)"
        ).alias("lnk_e6"),
    )


# ---------------------------------------------------------------------------
# Good-Turing unseen-mass estimate — round 12.
# ---------------------------------------------------------------------------

_GT_MAX_R = 5

GOOD_TURING_ORACLE = f"""
    WITH words AS (
      SELECT string_split(text, ' ') AS ws FROM documents
    ), tok AS (
      -- ws[i:i+2] is DuckDB's INCLUSIVE 3-element slice; array_to_string
      -- over it emits partial shingles for < 3-word docs exactly like
      -- Spark's concat_ws(' ', slice(ws, i, 3)) — a || chain would
      -- collapse every short doc into one NULL type instead.
      SELECT unnest(list_transform(
               generate_series(1, greatest(len(ws) - 2, 1)),
               i -> array_to_string(ws[i:i+2], ' '))) AS g
      FROM words
    ), freq AS (
      SELECT g, CAST(count(*) AS BIGINT) AS f FROM tok GROUP BY g
    ), fof AS MATERIALIZED (
      SELECT f, CAST(count(*) AS BIGINT) AS nf FROM freq GROUP BY f
    ), tot AS (
      SELECT CAST(sum(f * nf) AS BIGINT) AS total_tokens,
             CAST(sum(nf) AS BIGINT) AS n_types,
             CAST(max(CASE WHEN f = 1 THEN nf ELSE 0 END) AS BIGINT) AS n1
      FROM fof
    )
    SELECT a.f AS r,
           a.nf AS n_types_r,
           CAST(coalesce(b.nf, 0) AS BIGINT) AS n_types_r1,
           CAST((a.f + 1) * coalesce(b.nf, 0) * 1000000
                // a.nf AS BIGINT) AS r_star_e6,
           t.total_tokens,
           t.n_types,
           CAST(t.n1 * 1000000 // t.total_tokens AS BIGINT)
             AS p_unseen_e6
    FROM fof a LEFT JOIN fof b ON b.f = a.f + 1
    CROSS JOIN tot t
    WHERE a.f <= {_GT_MAX_R}
    ORDER BY r
"""


@query("text_good_turing_unseen", oracle=GOOD_TURING_ORACLE)
def text_good_turing_unseen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good-Turing unseen-mass estimate from the word-TRIGRAM
    frequency-of-frequencies dictionary: P(next trigram is a
    NEVER-seen type) = N1/N, plus the smoothed count
    r* = (r+1)*N_{{r+1}}/N_r for the rare-count rows r = 1..{r} — the
    discovery-rate reading that completes the vocabulary triptych
    (text_heaps_law_fit fits growth, text_vocab_coverage reads the
    integral; Good-Turing prices what is still MISSING). The type
    unit is the 3-word shingle (the dedup/novelty family's unit, same
    construction as text_ngram_novelty but WITHOUT per-doc distinct —
    Good-Turing needs occurrence counts): the synthetic corpus has a
    closed unigram vocabulary (every word repeats hundreds of times,
    N1 = 0 — degenerate), while its trigram tail is live at every sf.

    Determinism: frequencies, frequency-of-frequencies, totals, and
    both e6 ratios are exact integers end to end (DIV on BIGINTs);
    the r spine is the fixed 1..{r} prefix of the fof dictionary.

    Scale: one map-side-combinable shuffle to the trigram dictionary
    (the same postings-shuffle class as TF-IDF/novelty), then one
    shuffle to the frequency-of-frequencies dictionary, which is TINY
    (thousands of distinct frequencies even at web scale — bounded by
    the number of distinct type counts, which grows ~sqrt of the max
    frequency). The r+1 lookup is a self-join on that tiny
    dictionary; totals are one scalar aggregate. Nothing downstream
    of the first groupBy is corpus-sized.

    Reference parity: the reference (j0shgrant/gotsdb) has no text
    surface (internal/storage/types.go:3); this is [TARGET] text
    machinery.
    """
    from gotsdb_spark.sources.registry import fan_out

    # fan_out before the explode: trigram expansion + the hash-agg
    # partials are the heavy per-row work, and a one-row-group fixture
    # scans as a single task (no-op on an already-split cluster scan).
    docs = fan_out(load_table(spark, "documents", sf_dir).select("text"))
    words = F.split("text", " ")
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(words) - 2, F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(words, i, 3)),
    )
    freq = (
        docs.select(F.explode(grams).alias("g"))
        .groupBy("g")
        .agg(F.count(F.lit(1)).cast("long").alias("f"))
    )
    # Two consumers (the totals and the r-spine self-join): freeze the
    # frequency-of-frequencies dictionary once.
    fof = (
        freq.groupBy("f")
        .agg(F.count(F.lit(1)).cast("long").alias("nf"))
        .localCheckpoint(eager=False)
    )
    tot = fof.agg(
        F.sum(F.col("f") * F.col("nf")).cast("long").alias("total_tokens"),
        F.sum("nf").cast("long").alias("n_types"),
        F.max(F.when(F.col("f") == 1, F.col("nf")).otherwise(0))
        .cast("long")
        .alias("n1"),
    )
    nxt = fof.select(
        (F.col("f") - 1).alias("f"), F.col("nf").alias("nf1")
    )
    return (
        fof.where(F.col("f") <= _GT_MAX_R)
        .join(nxt, "f", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("f").alias("r"),
            F.col("nf").alias("n_types_r"),
            F.coalesce("nf1", F.lit(0)).cast("bigint").alias("n_types_r1"),
            F.expr(
                "CAST((f + 1) * coalesce(nf1, 0) * 1000000"
                " DIV nf AS BIGINT)"
            ).alias("r_star_e6"),
            "total_tokens",
            "n_types",
            F.expr(
                "CAST(n1 * 1000000 DIV total_tokens AS BIGINT)"
            ).alias("p_unseen_e6"),
        )
        .orderBy("r")
    )


text_good_turing_unseen.__doc__ = text_good_turing_unseen.__doc__.format(
    r=_GT_MAX_R
)
