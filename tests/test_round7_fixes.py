"""Round-7 regression pins for the round-6 ADVICE findings.

1. text_bigram_logprob must survive (and oracle-match on) 1-token and
   empty-text docs — Spark's sequence(1, size(a)-1) is DESCENDING
   [1, 0] when size(a)=1 (implicit -1 step), and element_at(a, 0)
   raises INVALID_INDEX_OF_ZERO even in non-ANSI mode.
2. The single-partition-window chain detector must walk arbitrarily
   long pass-through spines (Project/Filter interposed between the
   Window and its exchange), not a fixed lookahead.
"""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from gotsdb_spark.operators.registry import ORACLES, QUERIES


def test_bigram_logprob_one_token_docs(spark, tmp_path):
    """Docs with <2 tokens must be DROPPED (matching the oracle, whose
    range(1, len(a)) is empty), not crash the query."""
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "one",  # 1 token: sequence(1, 0) hazard
                "",  # split('') == [''] — also 1 token
                "alpha beta alpha",  # real bigrams
                "beta alpha",  # one bigram
            ],
            "lang": ["en"] * 4,
            "source": ["t"] * 4,
            "n_chars": [3, 0, 16, 10],
        }
    )
    pq.write_table(pa.Table.from_pandas(docs), os.path.join(tmp_path, "documents.parquet"))

    got = QUERIES["text_bigram_logprob"](spark, str(tmp_path)).toPandas()
    assert set(got["doc_id"]) == {3, 4}, "1-token/empty docs must be dropped"

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{os.path.join(tmp_path, 'documents.parquet')}')"
    )
    want = con.execute(ORACLES["text_bigram_logprob"]).df()
    g = got.sort_values("doc_id").reset_index(drop=True)
    w = want.sort_values("doc_id").reset_index(drop=True)
    for c in ("doc_id", "n_bigrams", "sum_nll_e6", "avg_nll_e6"):
        assert list(g[c].astype("int64")) == list(w[c].astype("int64")), c


def test_window_chain_detector_walks_interposed_nodes():
    """ADVICE r6: >2 interposed lines between Window and the exchange
    must still be flagged; the fixed 3-line slice missed them."""
    from gotsdb_spark.plans.inspect import single_partition_window_chains_text

    plan = (
        "AdaptiveSparkPlan isFinalPlan=true\n"
        "+- Window [row_number() windowspecdefinition(x#1 ASC NULLS FIRST)], [x#1 ASC NULLS FIRST]\n"
        "   +- Project [x#1]\n"
        "      +- Filter isnotnull(x#1)\n"
        "         +- Sort [x#1 ASC NULLS FIRST], false, 0\n"
        "            +- ShuffleQueryStage 0\n"
        "               +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=5]\n"
        "                  +- Scan parquet [x#1]\n"
    )
    assert single_partition_window_chains_text(plan) == 1
    # Properly hash-partitioned: same spine, no SinglePartition — clean.
    good = plan.replace("SinglePartition", "hashpartitioning(x#1, 32)")
    assert single_partition_window_chains_text(good) == 0
    # The walk must STOP at a non-pass-through operator: the exchange
    # here belongs to a global aggregate under a join, not the Window.
    stopped = (
        "+- Window [rank() ...], [g#2], [x#1 ASC NULLS FIRST]\n"
        "   +- Sort [g#2 ASC, x#1 ASC], false, 0\n"
        "      +- Exchange hashpartitioning(g#2, 32), ENSURE_REQUIREMENTS, [plan_id=3]\n"
        "         +- BroadcastHashJoin [g#2], [g#5], Inner, BuildRight\n"
        "            +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=2]\n"
    )
    assert single_partition_window_chains_text(stopped) == 0


def test_window_chain_detector_sees_reused_exchange():
    """ADVICE r7: a Window fed through a ReusedExchange whose reused
    target is a SinglePartition exchange is still a global window (the
    data funnels through the same one-partition shuffle, computed
    once); a ReusedExchange of a hash-partitioned exchange terminates
    the chain cleanly."""
    from gotsdb_spark.plans.inspect import single_partition_window_chains_text

    reused_bad = (
        "AdaptiveSparkPlan isFinalPlan=true\n"
        "+- Window [sum(v#3) windowspecdefinition(x#1 ASC NULLS FIRST)], [x#1 ASC NULLS FIRST]\n"
        "   +- Sort [x#1 ASC NULLS FIRST], false, 0\n"
        "      +- ReusedExchange [x#1, v#3], Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=5]\n"
    )
    assert single_partition_window_chains_text(reused_bad) == 1
    reused_good = reused_bad.replace(
        "SinglePartition", "hashpartitioning(x#1, 32)"
    )
    assert single_partition_window_chains_text(reused_good) == 0


def test_misra_gries_counters_stay_int64():
    """ADVICE r7: Series.add(fill_value=0) promotes to float64 when
    batch indexes differ (counts above 2^53 then merge inexactly and
    no cast can restore them). The merge must avoid the float64
    intermediate entirely. Exercise the merge shape directly."""
    import pandas as pd

    counters = pd.Series({10: 2**53 + 3}, dtype="int64")
    vc = pd.Series({11: 5, 10: 2}, dtype="int64")
    merged = pd.concat([counters, vc]).groupby(level=0).sum()
    assert merged.dtype == "int64"
    assert int(merged.loc[10]) == 2**53 + 5  # float64 would round this
    assert int(merged.loc[11]) == 5
