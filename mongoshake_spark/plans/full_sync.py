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


_SYNC_MARKER = "_sync_report.json"


def _marker_fs(spark: SparkSession, path_str: str):
    """(FileSystem, Path) for any Hadoop URI — markers must go through
    the Hadoop FS API, not local ``open()``: ``writer.parquet`` accepts
    ``hdfs://``/``s3a://`` targets (the stated 100 TB deployment shape)
    and a local ``open()`` against such a URI crashes right after the
    first table's commit."""
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(path_str)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, path


def _marker_read(spark: SparkSession, path_str: str) -> dict | None:
    import json

    fs, path = _marker_fs(spark, path_str)
    if not fs.exists(path):
        return None
    stream = fs.open(path)
    try:
        reader = spark._jvm.java.io.BufferedReader(
            spark._jvm.java.io.InputStreamReader(stream, "UTF-8")
        )
        line = reader.readLine()  # markers are written as one JSON line
        return json.loads(line) if line else None
    finally:
        stream.close()


def _marker_write_raw(spark: SparkSession, path_str: str, body: str) -> None:
    fs, path = _marker_fs(spark, path_str)
    out = fs.create(path, True)  # creates parent dirs on any Hadoop FS
    try:
        out.write(bytearray(body.encode("utf-8")))
    finally:
        out.close()


def _marker_write(spark: SparkSession, path_str: str, data: dict) -> None:
    import json

    _marker_write_raw(spark, path_str, json.dumps(data))


def full_sync(
    spark: SparkSession,
    sf_dir: str,
    target_root: str,
    tables=TABLES,
    chunks=None,
    shard: str | None = None,
    partition_by: dict[str, str] | None = None,
    index_map: dict[str, list[dict]] | None = None,
    resume: bool = False,
) -> FullSyncReport:
    """Snapshot-copy every namespace (S4/S6/W11/W13).

    The reference's 3-level parallelism (collections x range pieces x
    writer threads, P6) collapses into Spark's task scheduling: each
    table's scan is split by the source, and the write parallelism is the
    partition count. ``partition_by`` optionally declares a layout column
    per table (W13's shard-spec replication - CREATE TABLE PARTITIONED BY).
    ``chunks``+``shard`` applies the orphan filter (F6) during copy.

    ``resume=True`` skips tables whose copy already COMPLETED — each
    table's row count is stamped into a ``_sync_report.json`` marker only
    after its write commits, so a crash mid-table leaves no marker and
    the table re-copies. The reference restarts a failed full sync from
    zero (full-sync checkpoints are an open TODO in its docs); at 100 TB
    a snapshot WILL be interrupted, and per-namespace resume turns a
    restart from "re-copy everything" into "re-copy the one table that
    was in flight". Idempotent either way: re-copying a completed table
    is a clean overwrite.
    """
    import json

    from pyspark.sql import Observation

    report: dict[str, int] = {}
    for name in tables:
        marker = os.path.join(target_root, name, _SYNC_MARKER)
        if resume:
            prior = _marker_read(spark, marker)
            if prior is not None:
                report[name] = int(prior["rows"])
                continue
        df = load_table(spark, sf_dir, name)
        if chunks is not None and shard is not None and name == "lineitem":
            df = orphan_filter(df, chunks, "l_orderkey", "tpch.lineitem", shard)
        # row count observed DURING the write (metadata cost) — a
        # read-back count() would re-scan every just-written table,
        # doubling the snapshot's read I/O purely for the report
        obs = Observation()
        writer = df.observe(obs, F.count(F.lit(1)).alias("rows")).write.mode(
            "overwrite"
        )
        if partition_by and name in partition_by:
            writer = writer.partitionBy(partition_by[name])
        writer.parquet(os.path.join(target_root, name))
        report[name] = int(obs.get["rows"])
        # completion marker, written only after the parquet commit; the
        # leading underscore keeps it invisible to Spark's file index
        _marker_write(spark, marker, {"rows": report[name]})
    if index_map:
        # W12: index sync runs after the copy, as the reference does
        # (coordinator/full.go:202-206 StartIndexSync foreground).
        emit_index_specs(target_root, build_index_specs(index_map), spark=spark)
    return FullSyncReport(tables=report)


# ---------------------------------------------------------------------------
# W12 index sync — layout-spec emission
# (collector/docsyncer/doc_syncer.go:206-287 StartIndexSync;
#  coordinator/utils.go:198-239 fetchIndexes)
# ---------------------------------------------------------------------------

def build_index_specs(
    index_map: dict[str, list[dict]],
    ns_transform=None,
    background: bool = False,
) -> dict[str, list[dict]]:
    """W12: the observable behavior of StartIndexSync as a pure spec
    transformation. Per source index document:

    - a single-field ``_id`` index is skipped (HaveIdIndexKey,
      common/common.go:199-218: the key doc has exactly one field named
      ``_id`` — compound indexes that merely contain _id are kept)
    - the ``ns``/``v``/``background`` fields are stripped
      (doc_syncer.go:265-270)
    - a fresh ``background`` flag is appended (doc_syncer.go:271)
    - the namespace is routed through the ns transform (N4) when present

    Field order is preserved (index key docs are ordered in BSON; JSON
    dicts preserve insertion order here). Parquet targets have no
    secondary indexes, so the spec is the *emission contract*: on a real
    warehouse these become clustering/ZORDER columns; the tests pin the
    spec itself.
    """
    out: dict[str, list[dict]] = {}
    for ns, indexes in index_map.items():
        to_ns = ns_transform(ns) if ns_transform else ns
        specs = []
        for idx in indexes:
            key = idx.get("key")
            if isinstance(key, dict) and list(key) == ["_id"]:
                continue
            new = {k: v for k, v in idx.items() if k not in ("ns", "v", "background")}
            new["background"] = background
            specs.append(new)
        if specs:
            out[to_ns] = specs
    return out


def emit_index_specs(
    target_root: str, specs: dict[str, list[dict]], spark: SparkSession | None = None
) -> list[str]:
    """Persist each namespace's index spec as ``_indexes.json`` inside the
    table directory — the table-properties / layout-spec analog of the
    reference's createIndexes commands. Returns the written paths.

    With ``spark`` given, writes go through the Hadoop FS API (``create``
    makes parent dirs), so hdfs://s3a:// target roots work; the local
    ``open()`` path remains for spark-less callers/tests on local paths."""
    import json

    written = []
    for ns, spec in specs.items():
        table = ns.split(".", 1)[1] if "." in ns else ns
        d = os.path.join(target_root, table)
        path = os.path.join(d, "_indexes.json")
        body = json.dumps(
            [{"createIndexes": table, "indexes": [i]} for i in spec], indent=1
        )
        if spark is not None:
            _marker_write_raw(spark, path, body)
        else:
            os.makedirs(d, exist_ok=True)
            with open(path, "w") as f:
                f.write(body)
        written.append(path)
    return written


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
