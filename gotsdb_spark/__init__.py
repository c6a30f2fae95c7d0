"""gotsdb_spark — a PySpark-native analytics engine.

A ground-up rebuild of the capabilities of j0shgrant/gotsdb (a two-tier
hot/cold KV store, see /root/reference) re-expressed Spark-first, plus the
full analytics surface described in SURVEY.md §2.3: relational operators,
time-series windows, streaming ingest, and LLM-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing).

Everything here is DataFrame/SQL-first: we declare logical plans and let
Catalyst/Tungsten (plus AQE) pick physical strategies. UDFs appear only
where built-ins genuinely can't express the semantics, and then always as
Arrow-batched Pandas UDFs.
"""

from gotsdb_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
