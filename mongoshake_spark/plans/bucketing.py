"""Bucketed co-located joins — shuffle elimination for repeated big joins.

The reference's full sync replicates shard layout on the target (W13:
doc_syncer.go:101-204 re-creates sharding specs so reads stay local). The
Spark analog for *analytical* co-location is bucketing: write both join
sides bucketed by the join key; every subsequent join on that key is
exchange-free (each bucket pair joins in place), which at 100 TB removes
the dominant cost of fact-to-fact joins.

Local note: bucketing requires table-format metadata, so these helpers go
through ``saveAsTable`` (the session's warehouse dir); parquet path reads
don't retain bucket info.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table: str, key: str, n_buckets: int = 16, sort: bool = True
) -> None:
    """W13 analog: declare the physical layout once at write time.
    Sorted buckets additionally remove the sort from sort-merge joins."""
    writer = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, key_l: str, key_r: str
) -> DataFrame:
    """Join two tables bucketed on their join keys: no Exchange on either
    side (asserted in tests/test_plans.py)."""
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    return lt.join(rt, lt[key_l] == rt[key_r])
