"""B3 transaction reassembly — the stateful streaming operator.

Reference: oplog/txn_buffer.go:99-166 — a state machine keyed by
(lsid, txnNumber): buffer ``partialTxn`` chunks as they arrive, emit every
buffered op in order when the commit entry arrives, purge on abort. The
reference buffers in memory with no TTL (txn_buffer.go:52-56 notes the
risk); here state lives in the Structured Streaming state store with a
processing-time timeout, so abandoned sessions are evicted instead of
leaking.

Spark form: ``applyInPandasWithState`` over groupBy(lsid, txnNumber) —
state scales horizontally with the shuffle partitioning of the session
keys, exactly the partition-by-session parallelism the reference gets from
its single-process map.

Batch fallback (``reassemble_in_batch``): when a transaction is known to
fit inside one micro-batch (the reference's common case,
batcher.go:327-349 applies small txns inline), reassembly is a plain
window/aggregate — no state store at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TXN_OUT_SCHEMA = (
    "lsid string, txnNumber bigint, seq bigint, op string, ns string, o string"
)
_STATE_SCHEMA = "ops array<struct<seq:bigint,op:string,ns:string,o:string>>"


def reassemble_transactions(
    grouped_stream: DataFrame, timeout_ms: int | None = None
) -> DataFrame:
    """Streaming reassembly: rows (lsid, txnNumber, seq, op, ns, o,
    commit boolean, abort boolean) -> committed ops, emitted atomically at
    commit time, in seq order.

    ``timeout_ms`` enables processing-time eviction of abandoned sessions
    (the reference's unbounded-buffer risk, txn_buffer.go:52-56). Leave it
    None for bounded/catch-up runs: with a processing-time timeout active,
    Structured Streaming keeps scheduling ticking micro-batches to fire
    timers, so an availableNow drain would never terminate."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdf_iter, state: GroupState):
        buffered = list(state.get[0]) if state.exists else []
        if state.hasTimedOut:
            state.remove()
            return
        out = []
        # the group's rows arrive as MULTIPLE Arrow chunks (capped by
        # maxRecordsPerBatch) in arbitrary post-shuffle order — sorting
        # each chunk independently would let a commit row in an early
        # chunk emit before lower-seq ops in later chunks (out-of-order
        # output + stranded ops). Concatenate, then sort ONCE; a
        # transaction's batch rows must fit in memory regardless, since
        # the state buffers the whole transaction.
        chunks = list(pdf_iter)
        if chunks:
            whole = pd.concat(chunks, ignore_index=True).sort_values("seq")
            for row in whole.itertuples(index=False):
                if row.abort:
                    buffered = []
                    continue
                # state tuples, field order = stateStructType's struct
                buffered.append((int(row.seq), row.op, row.ns, row.o))
                if row.commit:
                    out.extend(buffered)
                    buffered = []
        if out:
            yield pd.DataFrame(
                {
                    "lsid": [key[0]] * len(out),
                    "txnNumber": [key[1]] * len(out),
                    "seq": [o[0] for o in out],
                    "op": [o[1] for o in out],
                    "ns": [o[2] for o in out],
                    "o": [o[3] for o in out],
                }
            )
        if buffered:
            state.update((buffered,))
            if timeout_ms is not None:
                state.setTimeoutDuration(timeout_ms)
        elif state.exists:
            state.remove()

    return grouped_stream.groupBy("lsid", "txnNumber").applyInPandasWithState(
        fn,
        outputStructType=TXN_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.NoTimeout
            if timeout_ms is None
            else GroupStateTimeout.ProcessingTimeTimeout
        ),
    )


def reassemble_in_batch(batch: DataFrame) -> DataFrame:
    """Within-batch fallback: transactions whose commit row is present in
    the batch emit all their ops; the rest are dropped (they would remain
    buffered). Pure DataFrame ops — one shuffle on the session key."""
    committed = (
        batch.groupBy("lsid", "txnNumber")
        .agg(F.max(F.when(F.col("commit"), F.col("seq"))).alias("commit_seq"))
        .filter(F.col("commit_seq").isNotNull())
    )
    return (
        batch.join(F.broadcast(committed), ["lsid", "txnNumber"])
        .filter((F.col("seq") <= F.col("commit_seq")) & ~F.col("abort"))
        .select("lsid", "txnNumber", "seq", "op", "ns", "o")
    )
