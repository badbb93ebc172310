"""t2 oracle gate (local replica of the driver's check): every declared
query must match DuckDB on the same parquet at sf0.001 (fast inner loop;
the driver re-checks at sf0.01)."""

from __future__ import annotations

import pytest

from mongoshake_spark.plans import QUERIES

from tests.oracle_harness import compare, run_oracle


@pytest.mark.parametrize("name", [n for n, q in QUERIES.items() if q.oracle])
def test_query_matches_oracle(spark, sf_dir, name):
    q = QUERIES[name]
    spark_df = q.fn(spark, sf_dir)
    oracle_df = run_oracle(sf_dir, q.oracle)
    ok, msg = compare(spark_df, oracle_df)
    assert ok, f"{name}: {msg}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    names = set(e.queries())
    oracles = set(e.oracle_sql())
    assert oracles <= names
