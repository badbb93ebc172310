"""Skew-resistant aggregation — the salting pattern as a reusable operator.

The reference hash-partitions by ns or _id (oplog/hasher.go); a hot
namespace lands entirely on one worker and becomes the pipeline's
bottleneck — MongoShake simply eats that. At Spark scale the standard
remedies are AQE skew-join splitting (enabled in session.py) for joins,
and two-phase *salted* aggregation for hot grouping keys, provided here.

salted_agg: phase 1 groups by (key, salt) — the hot key's rows spread over
``salt_n`` reducers; phase 2 re-aggregates the per-salt partials by key.
Works for any algebraic aggregate (sum/count/min/max — anything with an
associative combine); results are identical to the direct groupBy, which
the declared query q_salted_agg proves against the oracle's plain GROUP BY.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[Column, Column]],
    salt_n: int = 16,
) -> DataFrame:
    """Two-phase aggregation over possibly-skewed ``keys``.

    ``aggs`` maps output column name -> (phase1 aggregate over raw rows,
    phase2 aggregate over the phase-1 partial column of the same name).
    Example::

        salted_agg(df, ["ns"], {
            "cnt":   (F.count("*"),      F.sum("cnt")),
            "total": (F.sum("value"),    F.sum("total")),
            "mx":    (F.max("value"),    F.max("mx")),
        })

    The salt is a uniform pseudo-random derived from a high-entropy row
    expression (here: crc-free ``pmod(hash(rand-free cols))`` over all
    columns is overkill — monotonically-assigned ``spark_partition_id`` is
    enough: it spreads a hot key exactly as widely as it was scanned, and
    is deterministic for a deterministic input layout).
    """
    salted = df.withColumn("_salt", F.spark_partition_id() % F.lit(salt_n))
    phase1 = salted.groupBy(*keys, "_salt").agg(
        *[a1.alias(name) for name, (a1, _) in aggs.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[a2.alias(name) for name, (_, a2) in aggs.items()]
    )
