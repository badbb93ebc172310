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


# ---------------------------------------------------------------------------
# Z-order layout — multi-column data-skipping locality
# ---------------------------------------------------------------------------

_SPREAD_MASKS = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _spread16(col):
    """Interleave-spread a 16-bit value's bits into the even positions of
    a 32-bit lane (the classic magic-mask dilation) — pure JVM integer
    expressions, exactly reproducible in any engine with 64-bit ints."""
    from pyspark.sql import functions as F

    x = col.cast("bigint").bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD_MASKS:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def zorder_key(col_x, col_y):
    """32-bit Z-value (Morton code) of two 16-bit keys: x in the even bit
    positions, y in the odd. Rows sorted by this key cluster on BOTH
    dimensions at once, so per-file min/max column statistics prune scans
    filtered on either column — the multi-column data-skipping layout a
    single-column sort cannot give (sort by x and the y statistics of
    every file span the whole domain). Callers reduce wider keys to 16
    bits first (modulo / bucketing); the clustering property needs only
    locality, not injectivity."""
    from pyspark.sql import functions as F

    return _spread16(col_x).bitwiseOR(F.shiftleft(_spread16(col_y), 1))


def write_zordered(
    df: DataFrame, path: str, col_x: str, col_y: str, n_files: int = 8
) -> None:
    """Materialize the Z-order layout: range-partition by the Z-value
    (globally disjoint Z ranges per file) and sort within each partition,
    so every file covers a compact rectangle of (x, y) space and its
    parquet min/max stats prune on both columns. The helper column is
    dropped before writing — the layout lives in row order + file stats,
    not the schema."""
    from pyspark.sql import functions as F

    z = zorder_key(F.col(col_x), F.col(col_y)).alias("_z")
    (
        df.select("*", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
