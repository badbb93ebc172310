"""W1 group-adjacent combiner and B2/B5/B6 batch segmentation — the
reference's write-batch shaping layer, as window/aggregate expressions.

Reference: executor/combiner.go:26-61 (merge adjacent same-(ns,op) logs into
groups capped at 1000 ops / 12 MB), executor/executor.go:240-244 (stable
ns-sort first), collector/batcher.go:280-397 (DDL barrier segmentation),
batcher.go:199-267 (target-delay gate), batcher.go:218-236 (exit-point).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

GROUP_MAX_OPS = 1000  # executor/executor.go:30-32 OplogsMaxGroupNum


def write_groups(df: DataFrame, max_ops: int = GROUP_MAX_OPS) -> DataFrame:
    """W1: assign each row its bulk-write group: stable order within
    (ns, op) by (ts, id), then cap groups at ``max_ops`` rows.

    Window over (ns, op) = one shuffle on the grouping key; at scale this
    is the same partitioning the apply kernel needs, so the exchange is
    reused across the sort, the grouping and the write.
    """
    w = Window.partitionBy("ns", "op").orderBy("ts", "id")
    return df.withColumn(
        "grp", F.floor((F.row_number().over(w) - F.lit(1)) / F.lit(max_ops))
    )


def ddl_barriers(df: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """B2 DDL barrier segmentation (batcher.go:280-397): every op=='c' row
    closes the current batch; rows are tagged with a barrier_id that
    increments at each DDL so the apply kernel can execute segments
    sequentially (segment k, then DDL k, then segment k+1 ...).

    The global running DDL count over (ts, id) order is a two-pass
    distributed prefix sum (operators/prefix.running_total) — no
    single-partition window anywhere in the plan, which
    tests/test_plans.py gates.
    """
    from mongoshake_spark.operators.prefix import running_total

    flag = F.when(F.col("op") == "c", 1).otherwise(0)
    return running_total(
        df, ["ts", "id"], flag, "barrier_id", num_partitions
    )


def delay_gate(df: DataFrame, delay_expr: str = "INTERVAL 1 HOUR") -> DataFrame:
    """B5 target-delay gate (batcher.go:199-267): ship only rows older than
    the configured delay relative to the newest observed ts (slaveDelay
    semantics). Batch form uses max(ts) as "now"; streaming form uses a
    watermark."""
    horizon = df.agg(F.max("ts").alias("mx"))
    return df.join(F.broadcast(horizon)).filter(
        F.expr(f"ts <= mx - {delay_expr}")
    ).drop("mx")


def exit_point(df: DataFrame, exit_ts) -> DataFrame:
    """B6 exit-point cutoff (batcher.go:218-236): truncate at first row past
    the user-set exit ts."""
    return df.filter(F.col("ts") <= F.lit(exit_ts))
