"""The standalone receiver daemon — ``cmd/receiver/receiver.go:1-92`` +
``receiver/replayer.go:54-146`` as a long-lived "drain this tunnel into
the apply kernel" process behind ``--sync-mode receive``.

The embedded :class:`~mongoshake_spark.sources.socket_tunnel.TunnelServer`
already speaks the full wire protocol (retransmission gate, CRC,
compressor registry, per-shard ack watermarks); this module adds the
replayer's APPLY side: received logs are folded into an
:class:`~mongoshake_spark.streaming.apply.ApplyKernel` in bounded
micro-batches, so the receiver's target directory converges to the same
last-writer-wins state a local incremental sync would produce.

Lifecycle (the testable daemon contract):

- ``on_ready(port)`` fires once the socket is bound — a supervising
  process (or test) learns the ephemeral port without scraping logs;
- frames drain into kernel batches whenever ``batch_rows`` are pending
  or the feed has gone idle with a partial batch;
- the daemon exits once at least one log was consumed AND the tunnel
  has been idle for ``idle_timeout`` seconds (a sender that finished and
  closed), or unconditionally at ``max_wall`` — the reference receiver
  runs until killed, so max_wall is the harness bound, not semantics;
- exactly-once: the kernel's idempotent MERGE makes a replayed frame
  (sender retransmission after a lost ack) converge to the same state,
  and the server's per-shard watermark dedupes the append feed itself
  (receiver/replayer.go handles the identical case).
"""

from __future__ import annotations

import time

from pyspark.sql import SparkSession

from mongoshake_spark.sources.socket_tunnel import TunnelServer
from mongoshake_spark.streaming.apply import ApplyKernel


def run_receiver(
    spark: SparkSession,
    target_dir: str,
    host: str = "127.0.0.1",
    port: int = 0,
    idle_timeout: float = 10.0,
    max_wall: float = 300.0,
    batch_rows: int = 4096,
    poll: float = 0.1,
    on_ready=None,
    **kernel_kwargs,
) -> dict:
    """Serve one receiver session; returns a summary dict
    ``{port, logs, batches, state_rows}``. See module docstring for the
    exit contract."""
    from mongoshake_spark.sources.tunnel import OPLOG_WIRE_SCHEMA, decode_frames

    server = TunnelServer(host=host, port=port).start()
    kernel = ApplyKernel(spark, target_dir, **kernel_kwargs)
    consumed = 0
    batch_id = 0
    t0 = time.monotonic()
    last_activity = t0
    try:
        if on_ready is not None:
            on_ready(server.port)

        def flush(upto: int) -> None:
            # drain() RELEASES the consumed rows from the server under its
            # lock, so daemon resident memory is bounded by one pending
            # batch — the reference replayer frees each TMessage after
            # handoff (receiver/replayer.go:54-146); an append-only list
            # would grow linearly for the whole run-until-killed lifetime
            nonlocal consumed, batch_id
            rows = server.drain(upto)
            if not rows:
                return
            import pandas as pd

            # pandas first: createDataFrame over a pandas frame takes the
            # Arrow path (one columnar batch), ~an order of magnitude
            # cheaper than row-tuple conversion at 10k+ logs per flush
            frames = spark.createDataFrame(
                pd.DataFrame(rows, columns=["shard", "value"]),
                "shard int, value string",
            )
            kernel.process_batch(
                decode_frames(frames, OPLOG_WIRE_SCHEMA), batch_id
            )
            consumed = upto
            batch_id += 1

        while True:
            now = time.monotonic()
            with server._lock:
                pending_upto = server.total_received
            if now - t0 >= max_wall:
                # the harness bound is checked FIRST — a sender that
                # never pauses must not starve it — and exits through a
                # final flush so the bound never strands received logs
                flush(pending_upto)
                break
            if pending_upto - consumed >= batch_rows:
                flush(pending_upto)
                last_activity = time.monotonic()
            elif pending_upto > consumed:
                # partial batch: apply it once the wire has gone quiet
                # for one poll interval (micro-batching, not per-frame)
                time.sleep(poll)
                with server._lock:
                    settled = server.total_received
                if settled == pending_upto:
                    flush(settled)
                last_activity = time.monotonic()
            elif consumed > 0 and now - last_activity >= idle_timeout:
                break
            else:
                time.sleep(poll)
    finally:
        server.stop()
    sv = kernel.state_view()
    state_rows = sv.count() if sv is not None else 0
    return {
        "port": server.port,
        "logs": consumed,
        "batches": batch_id,
        "state_rows": state_rows,
    }
