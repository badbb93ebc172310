"""Scan fan-out for CPU-heavy narrow transforms.

Parquet scans parallelize at row-group granularity. When an input arrives
as a handful of row groups (one driver-generated file locally; a few
consolidated files after compaction in production) every downstream
map-side expression — tokenize, n-gram explode, hash — runs on that same
handful of tasks, serializing work the rest of the cluster could share.
The dedup/text operators' first stage multiplies each row into tens of
gram rows, so they are exactly the place where an under-partitioned scan
hurts: the explode's CPU cost is 10-100x the scan's I/O cost.

``fan_out_scan`` inserts ONE round-robin repartition of the narrow input
(id + text — cheap rows; the multiplied gram rows never shuffle) if and
only if the scan's partition count is below half the cluster parallelism.
At 100 TB any real table scan has orders of magnitude more row groups
than cores, so the guard makes this a structural no-op at scale — it
exists for the small-file tail, not the common case.

When to use it (measured at sf0.1, idle host): it pays when the heavy
per-row work completes MAP-SIDE — in-row winnowing, gram md5 + broadcast
semi-join probe, per-doc window merges (2-3x faster). It LOSES when the
exploded rows feed a hash exchange immediately (token/bigram counting):
the downstream shuffle already spreads the work across the cluster, so
the extra hop is pure cost (~2x slower) — leave those call sites alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out_scan(df: DataFrame, min_fraction: float = 0.5) -> DataFrame:
    """Repartition ``df`` to the default parallelism when its source file
    count is below ``min_fraction`` of it; pass through untouched (no
    exchange in the plan) otherwise.

    The guard reads ``inputFiles()`` — analysis-only, ~60x cheaper than
    forcing physical planning via ``df.rdd`` (0.01 s vs 0.7 s per call,
    which matters because composed pipelines hit several fan-out sites at
    build time). File count under-estimates split count for one large
    multi-row-group file — the fan-out then inserts a redundant (cheap,
    narrow-row) exchange — and a non-file source reports no files, in
    which case fan-out is skipped: in-memory test frames already carry
    the parallelize default, and streaming inputs must not be shuffled
    here."""
    sc = df.sparkSession.sparkContext
    cores = sc.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:  # noqa: BLE001 — analysis edge; fan-out is best-effort
        return df
    if n_files == 0 or n_files >= max(2, int(cores * min_fraction)):
        return df
    return df.repartition(cores)
