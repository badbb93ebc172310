"""Streaming exact dedup — the ingest-time curation operator: suppress
re-arrivals of already-seen document content across micro-batches, with
bounded state.

Batch dedup (functions/dedup.exact_groups) answers "what is duplicated";
this answers "don't let a duplicate IN while the corpus streams in" — the
shape a continuous crawl ingest needs. State is the platform's dedup state
store keyed by the content hash:

- ``dropDuplicatesWithinWatermark``: state for a hash is kept only until
  the event-time watermark passes it — bounded state at any stream length
  (the curation contract: a duplicate arriving within the dedup window is
  suppressed; one arriving after the window re-enters, which is the
  documented semantics of re-crawl dedup windows, not a bug).
- ``watermark=None`` falls back to exact-forever ``dropDuplicates`` —
  unbounded state, only for bounded backfills.

The emitted stream carries the first-seen row per hash; which physical row
of an intra-batch duplicate pair survives is nondeterministic (partition
race), so downstream contracts should depend only on the hash set — the
declared query (stream_dedup) therefore verifies the emitted HASH SET and
its cardinality against the batch-mode distinct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_exact_dedup(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str | None = "ts",
    watermark: str = "1 hour",
    hash_out: str = "text_hash",
) -> DataFrame:
    """Content-hash dedup over a streaming DataFrame (see module doc).

    Adds ``hash_out`` = md5(text) and keeps the first arrival per hash.
    With ``ts_col`` set, state is evicted once the watermark passes the
    hash's event time; pass ``ts_col=None`` for exact-forever dedup."""
    hashed = stream.withColumn(hash_out, F.md5(F.col(text_col)))
    if ts_col is None:
        return hashed.dropDuplicates([hash_out])
    return hashed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        [hash_out]
    )
