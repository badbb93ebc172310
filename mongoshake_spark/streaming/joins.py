"""Stream-stream joins: watermarked interval join of two CDC feeds.

The reference never joins two live feeds (SURVEY §2.7 — its operators
are single-stream), but the event streams its replication delivers are
exactly what downstream correlation jobs consume: "pair every login
with the purchases that follow it within the hour", fraud windows,
cause→effect attribution. Structured Streaming supports this natively —
a stream-stream inner join with a time-range condition — and the state
store keeps each side buffered only until the watermark proves no
future match can arrive, which is what bounds state at 100 TB/day:
state size ≈ input rate × (watermark delay + window span), independent
of total history.

``stream_interval_join`` builds the canonical form: equality key +
``r.ts ∈ [l.ts + lower, l.ts + upper]``, watermarks on BOTH sides (both
are required for Spark to prune join state; without them an inner join
still runs but buffers forever).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lower_seconds: int,
    upper_seconds: int,
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked stream-stream inner join: rows with equal ``on`` keys
    and ``right.right_ts`` within ``[left.left_ts + lower, left.left_ts
    + upper]`` (inclusive). ``left_ts``/``right_ts`` must be distinct
    names (alias upstream) — both survive in the output.

    The range condition is expressed on the event-time columns directly
    (not unix casts) so Spark's streaming planner recognizes it and
    derives the state-eviction bounds from the watermark.
    """
    if left_ts == right_ts:
        raise ValueError("stream_interval_join: alias the ts columns apart")
    # the key columns are renamed apart before the join: when both sides
    # derive from the same base frame, `lw[on] == rw[on]` resolves to the
    # SAME attribute and Spark warns "trivially true equals predicate" —
    # DataFrame-scoped resolution kept it correct, but distinct names make
    # the resolution explicit (and the plan readable)
    lw = left.withWatermark(left_ts, watermark).withColumnRenamed(on, "_l_key")
    rw = right.withWatermark(right_ts, watermark).withColumnRenamed(on, "_r_key")
    cond = (
        (lw["_l_key"] == rw["_r_key"])
        & (rw[right_ts] >= lw[left_ts] + F.expr(f"INTERVAL {lower_seconds} SECOND"))
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {upper_seconds} SECOND"))
    )
    return (
        lw.join(rw, cond, "inner")
        .drop("_r_key")
        .withColumnRenamed("_l_key", on)
    )
