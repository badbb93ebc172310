"""Distributed global prefix sum — the two-pass pattern shared by DDL
barrier numbering (operators/combiner.ddl_barriers) and training-sequence
packing (functions/packing.pack_sequences).

A global running total over a total order is the textbook case where the
naive plan — ``Window.orderBy(...)`` with no partitioning — funnels the
entire table through ONE task. The scalable shape costs one range
exchange plus metadata-sized driver work:

1. ``repartitionByRange(n, *order_cols)`` makes partition boundaries
   respect the global order (every key in partition p precedes every key
   in partition p+1); a window partitioned by ``spark_partition_id()``
   then computes each partition's LOCAL inclusive running sum in
   parallel.
2. Per-partition totals (n rows — metadata-sized) get their exclusive
   prefix via a tiny triangular self-join, and the offsets broadcast-join
   back onto the local sums.

The ranged exchange is locally checkpointed so both passes observe the
same partition ids (range boundaries come from sampling and are not
otherwise guaranteed identical across re-evaluations); the blocks free
on GC rather than pinning cache in a long-lived session.
tests/test_plans.py gates that no partition-less window appears in the
resulting plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def running_total(
    df: DataFrame,
    order_cols: list[str],
    value: Column,
    out_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Adds ``out_col`` = INCLUSIVE prefix sum of ``value`` over the global
    ``order_cols`` order. Input column set is preserved (internal columns
    are dropped)."""
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(n, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .withColumn("_val", value)
        .localCheckpoint(eager=True)
    )
    wl = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = ranged.withColumn("_local", F.sum("_val").over(wl))
    tot = ranged.groupBy("_pid").agg(F.sum("_val").alias("_t"))
    a, b = tot.alias("a"), tot.alias("b")
    offsets = (
        a.join(b, F.col("b._pid") < F.col("a._pid"), "left")
        .groupBy(F.col("a._pid").alias("_pid"))
        .agg(F.coalesce(F.sum("b._t"), F.lit(0)).alias("_off"))
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, (F.col("_local") + F.col("_off")).cast("bigint"))
        .drop("_pid", "_val", "_local", "_off")
    )
