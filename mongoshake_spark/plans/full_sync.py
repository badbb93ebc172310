"""Full-sync (snapshot) plane + sync-mode coordination — batch counterpart
of the streaming pipeline (SURVEY §3.2/§3.3).

Reference: collector/coordinator/full.go (namespace enumeration, target
prep, per-shard DBSyncer), docsyncer/doc_reader.go (splitVector range
pieces), docsyncer/doc_executor.go (bulk insert + orphan filter),
coordinator/replication.go:194-266 + coordinator/utils.go:144-192
(sync-mode selection and snapshot->stream handoff).

Spark shape: per-table ``spark.read`` is already range-split into tasks
(S5's splitVector machinery is the data source's job); target prep is
DROP/overwrite (W13); the orphan filter is a broadcast range semi-join
(F6). The coordinator below reproduces the decision procedure and the
snapshot->offset handoff for mode "all" — record the stream position
FIRST, then snapshot, then start the stream from the recorded position;
overlap is safe because the apply kernel is idempotent.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from mongoshake_spark.operators.filters import orphan_filter
from mongoshake_spark.sources.tables import TABLES, load_table


@dataclass
class FullSyncReport:
    tables: dict[str, int]

    @property
    def total_rows(self) -> int:
        return sum(self.tables.values())


def full_sync(
    spark: SparkSession,
    sf_dir: str,
    target_root: str,
    tables=TABLES,
    chunks=None,
    shard: str | None = None,
    partition_by: dict[str, str] | None = None,
) -> FullSyncReport:
    """Snapshot-copy every namespace (S4/S6/W11/W13).

    The reference's 3-level parallelism (collections x range pieces x
    writer threads, P6) collapses into Spark's task scheduling: each
    table's scan is split by the source, and the write parallelism is the
    partition count. ``partition_by`` optionally declares a layout column
    per table (W13's shard-spec replication - CREATE TABLE PARTITIONED BY).
    ``chunks``+``shard`` applies the orphan filter (F6) during copy.
    """
    report: dict[str, int] = {}
    for name in tables:
        df = load_table(spark, sf_dir, name)
        if chunks is not None and shard is not None and name == "lineitem":
            df = orphan_filter(df, chunks, "l_orderkey", "tpch.lineitem", shard)
        writer = df.write.mode("overwrite")
        if partition_by and name in partition_by:
            writer = writer.partitionBy(partition_by[name])
        writer.parquet(os.path.join(target_root, name))
        report[name] = spark.read.parquet(os.path.join(target_root, name)).count()
    return FullSyncReport(tables=report)


# ---------------------------------------------------------------------------
# sync-mode coordination (coordinator/utils.go:144-192 selectSyncMode)
# ---------------------------------------------------------------------------

def select_sync_mode(
    checkpoint_ts: int | None, oldest_retained_ts: int, newest_ts: int
) -> str:
    """The reference's decision table (coordinator/utils.go:23-115
    compareCheckpointAndDbTs + :144-192 selectSyncMode):

    - no stored checkpoint                    -> "all" (snapshot + stream)
    - checkpoint older than oldest retained   -> "all" (the stream has a
      hole; resuming would silently lose entries)
    - checkpoint in the future of the source  -> error (clock skew or a
      checkpoint from a different source — refuse, as the reference does)
    - otherwise                               -> "incr" (resume)
    """
    if checkpoint_ts is None:
        return "all"
    if checkpoint_ts > newest_ts:
        raise ValueError(
            f"checkpoint {checkpoint_ts} is newer than the source's newest "
            f"entry {newest_ts}: wrong source or clock skew — refusing"
        )
    if checkpoint_ts < oldest_retained_ts:
        return "all"
    return "incr"


def sync_all(
    spark: SparkSession,
    sf_dir: str,
    feed_dir: str,
    target_root: str,
    stream_target_dir: str,
    checkpoint_dir: str,
) -> dict:
    """Mode "all" (SURVEY §3.3): record the stream start position, snapshot
    the tables, then catch up from the recorded position. With an
    idempotent apply kernel the overlap window (rows both in the snapshot
    and in the stream) is harmless — the reference makes the same argument
    for its oplog DML replay (README.md:57)."""
    from mongoshake_spark.streaming.apply import run_incr_sync

    # 1. fullBeginTs: position the stream BEFORE reading any table
    start_files = sorted(os.listdir(feed_dir)) if os.path.isdir(feed_dir) else []
    # 2. snapshot
    report = full_sync(spark, sf_dir, target_root, tables=("events",))
    # 3. catch-up stream from the beginning of the retained feed; the
    #    checkpoint then owns the offset from here on
    kernel = run_incr_sync(
        spark, feed_dir, stream_target_dir, checkpoint_dir, max_files_per_trigger=4
    )
    return {
        "snapshot_rows": report.total_rows,
        "feed_files_at_start": len(start_files),
        "ddl_applied": len(kernel.ddl_log),
    }
