"""Watermarked windowed aggregation — streaming metrics over event time
(A2's windowed TPS as a *stream*, with late-data semantics).

The reference computes operational TPS over processing time
(common/metric.go); Spark's event-time windows + watermark generalize this:
late rows within the watermark still update their window, older rows are
dropped, and window state is evicted once the watermark passes — bounded
state at any scale (state size = active windows × groups, independent of
stream length).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    group_cols: tuple = (),
) -> DataFrame:
    """Streaming windowed counts: groupBy(window(ts), *group_cols).count()
    under a watermark. Append-mode emits each window exactly once, when the
    watermark passes its end — the streaming equivalent of Q23's batch
    date_trunc aggregation.

    Event-time columns must be TIMESTAMP (with local-tz semantics) for
    ``withWatermark``; fixture-derived feeds carry TIMESTAMP_NTZ, so cast
    first (session tz is pinned UTC, making the cast a no-op on values)."""
    from pyspark.sql.types import TimestampNTZType

    if isinstance(stream.schema[ts_col].dataType, TimestampNTZType):
        stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), *[F.col(c) for c in group_cols])
        .agg(F.count("*").alias("cnt"))
        .select(
            F.col("window.start").alias("window_start"),
            *[F.col(c) for c in group_cols],
            F.col("cnt"),
        )
    )
