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
    # internal names are namespaced AND collision-checked: withColumn on a
    # name the caller already uses would silently overwrite their values
    # mid-computation and then drop the column from the output
    pid, val, loc, off = "__rt_pid", "__rt_val", "__rt_local", "__rt_off"
    clash = {pid, val, loc, off} & set(df.columns)
    if clash:
        raise ValueError(f"running_total reserved column name(s) in input: {clash}")
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(n, *order_cols)
        .withColumn(pid, F.spark_partition_id())
        .withColumn(val, value)
        .localCheckpoint(eager=True)
    )
    wl = (
        Window.partitionBy(pid)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = ranged.withColumn(loc, F.sum(val).over(wl))
    tot = ranged.groupBy(pid).agg(F.sum(val).alias("_t"))
    a, b = tot.alias("a"), tot.alias("b")
    offsets = (
        a.join(b, F.col(f"b.{pid}") < F.col(f"a.{pid}"), "left")
        .groupBy(F.col(f"a.{pid}").alias(pid))
        .agg(F.coalesce(F.sum("b._t"), F.lit(0)).alias(off))
    )
    return (
        local.join(F.broadcast(offsets), pid)
        .withColumn(out_col, (F.col(loc) + F.col(off)).cast("bigint"))
        .drop(pid, val, loc, off)
    )
