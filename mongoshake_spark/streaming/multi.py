"""Multi-namespace incremental apply — the reference's whole-deployment
sync shape.

MongoShake's incremental path applies EVERY replicated namespace through
one worker set (collector/syncer.go drives all namespaces; the executor
routes each oplog to its collection via the ns field). The single-table
``ApplyKernel`` (streaming/apply.py) is the per-namespace fold; this
module composes one kernel per namespace behind a single foreachBatch
callback, so one stream + one checkpoint drives the whole deployment:

- each micro-batch is split by ``ns`` and folded into that namespace's
  own bucketed target directory (``root_dir/<ns>``) — per-ns state,
  per-ns watermark, per-ns tombstone compaction, exactly the reference's
  per-collection apply granularity;
- the driver-side loop is bounded by the number of DISTINCT namespaces
  in the batch (table count, not row count) — the same bound the
  reference's per-collection writer map carries;
- ordering: within a namespace the per-kernel (key, ordinal) MERGE
  resolves order exactly as the single-table kernel does; ACROSS
  namespaces the reference makes no ordering promise either (workers are
  hash-partitioned per ns/key), so none is introduced here;
- replay safety: the stream checkpoint replays a failed batch into
  EVERY namespace kernel; each per-ns MERGE is idempotent, so the batch
  is at-least-once delivered and exactly-once materialized per ns —
  the composition inherits the single-kernel argument unchanged.

A namespace seen for the first time mid-stream (a created collection)
gets its kernel lazily — the reference's dynamic collection handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mongoshake_spark.streaming.apply import ApplyKernel


class MultiTableApplyKernel:
    """One ApplyKernel per namespace, driven by a single foreachBatch."""

    def __init__(
        self,
        spark: SparkSession,
        root_dir: str,
        ns_col: str = "ns",
        **kernel_kwargs,
    ) -> None:
        self.spark = spark
        self.root_dir = root_dir.rstrip("/")
        self.ns_col = ns_col
        self.kernel_kwargs = kernel_kwargs
        self.kernels: dict[str, ApplyKernel] = {}

    def _kernel_for(self, ns: str) -> ApplyKernel:
        k = self.kernels.get(ns)
        if k is None:
            # '/' is the only separator that would break the layout; the
            # reference's ns grammar (db.coll) never contains it, but a
            # malformed ns must not escape the root dir
            safe = ns.replace("/", "_")
            kw = dict(self.kernel_kwargs)
            for d in ("dead_letter_dir", "journal_dir"):
                if kw.get(d):
                    kw[d] = f"{kw[d]}/{safe}"
            k = ApplyKernel(self.spark, f"{self.root_dir}/{safe}", **kw)
            self.kernels[ns] = k
        return k

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        batch = batch.persist()
        try:
            # bounded by table count per batch, not row count — the same
            # driver-side bound the reference's writer map carries
            names = sorted(
                r[0]
                for r in batch.select(self.ns_col).distinct().collect()
                if r[0] is not None
            )
            for ns in names:
                self._kernel_for(ns).process_batch(
                    batch.filter(F.col(self.ns_col) == ns), batch_id
                )
            # NULL-ns rows cannot be routed; the W7 contract says they
            # must reach a dead-letter, not vanish
            nulls = batch.filter(F.col(self.ns_col).isNull())
            if self.kernel_kwargs.get("dead_letter_dir") and nulls.limit(1).count():
                nulls.write.mode("append").parquet(
                    self.kernel_kwargs["dead_letter_dir"] + "/_null_ns"
                )
        finally:
            batch.unpersist()

    def state_view(self, ns: str) -> DataFrame | None:
        k = self.kernels.get(ns)
        return k.state_view() if k else None


def run_multi_incr_sync(
    spark: SparkSession,
    feed_dir: str,
    root_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
    timeout_sec: float = 300.0,
    **kernel_kwargs,
) -> MultiTableApplyKernel:
    """Drain a replay feed into per-namespace targets (availableNow run,
    one checkpoint for the whole deployment — the reference's single
    replication job over all namespaces)."""
    from mongoshake_spark.streaming.replay import read_oplog_stream

    multi = MultiTableApplyKernel(spark, root_dir, **kernel_kwargs)
    stream = read_oplog_stream(spark, feed_dir, max_files_per_trigger)
    q = (
        stream.writeStream.foreachBatch(multi.process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_sec):
        q.stop()
        raise RuntimeError("multi incr sync: drain timed out")
    return multi
