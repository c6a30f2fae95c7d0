"""XML interchange roundtrip vs the DuckDB oracle over the ORIGINAL
parquet (operator queued for round-6 registration — this test is its
oracle gate until then)."""

from __future__ import annotations

import pytest

import duckdb

from gotsdb_spark.operators.filesources import (
    XML_ROUNDTRIP_ORACLE,
    xml_interchange_roundtrip,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW supplier AS SELECT * FROM read_parquet('{SF}/supplier.parquet')"
    )
    return con


def test_xml_roundtrip_matches_original(spark, duck):
    got = sorted(
        (r["s_nationkey"], r["n_suppliers"], r["balance_cents"], r["first_key"], r["last_key"])
        for r in xml_interchange_roundtrip(spark, SF).collect()
    )
    want = sorted(
        (int(a), int(b), int(c), int(d), int(e))
        for a, b, c, d, e in duck.execute(XML_ROUNDTRIP_ORACLE).fetchall()
    )
    assert got == want and got
