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


def session_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    gap: str = "12 hours",
    watermark: str = "2 hours",
    group_cols: tuple = ("user_id",),
) -> DataFrame:
    """Streaming SESSION windows: ``groupBy(session_window(ts, gap))``
    under a watermark — the stateful merge of events into gap-separated
    sessions, with state evicted once the watermark passes a session's
    end (bounded state: open sessions × groups, independent of stream
    length). Append mode emits each merged session exactly once.

    Bounded-input note (the declared query's harness): append mode only
    emits a session after the watermark passes ``last_event + gap``, so
    draining a bounded feed leaves every tail session open unless a
    far-future SENTINEL row arrives in a later micro-batch to advance
    the watermark; the engine's closing no-data micro-batch then flushes
    the real sessions while the sentinel's own (still-open) session is
    withheld — exactly-once AND complete output over a finite replay.
    """
    from pyspark.sql.types import TimestampNTZType

    if isinstance(stream.schema[ts_col].dataType, TimestampNTZType):
        stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(*[F.col(c) for c in group_cols], F.session_window(F.col(ts_col), gap))
        .agg(F.count("*").alias("n_events"))
        .select(
            *[F.col(c) for c in group_cols],
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            F.col("n_events"),
        )
    )
