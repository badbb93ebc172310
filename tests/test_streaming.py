"""Streaming incr-sync tests (SURVEY §5 test plan items 3; reference
contract: executor/db_writer_test.go's seed -> apply -> compare-final-state
pattern, and collector/batcher_test.go's barrier/segmentation scenarios)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mongoshake_spark.operators import merge
from mongoshake_spark.sources.oplog import oplog_view
from mongoshake_spark.sources.tables import load_table
from mongoshake_spark.streaming.apply import ApplyKernel, run_incr_sync
from mongoshake_spark.streaming.replay import read_oplog_stream, write_replay_feed


@pytest.fixture(scope="module")
def feed(spark, sf_dir, tmp_path_factory):
    d = tmp_path_factory.mktemp("feed")
    # small batches so the sf0.001 feed spans several micro-batches
    write_replay_feed(spark, sf_dir, str(d), batch_rows=128)
    return str(d)


def _final_state(spark, target_dir):
    df = merge.visible(spark.read.parquet(target_dir))
    return {r["user_id"]: r["value"] for r in df.collect()}


def _expected_state(spark, sf_dir):
    oplog = oplog_view(load_table(spark, sf_dir, "events"))
    return {
        r["user_id"]: r["value"] for r in merge.last_writer_wins(oplog).collect()
    }


def test_final_state_equivalence(spark, sf_dir, feed, tmp_path):
    """Streaming MERGE materialization == batch arg_max reconstruction
    (FIXTURES.md §4 / Q13 contract), with multiple micro-batches."""
    target = str(tmp_path / "target")
    ckpt = str(tmp_path / "ckpt")
    kernel = run_incr_sync(
        spark, feed, target, ckpt, max_files_per_trigger=2
    )
    assert _final_state(spark, target) == _expected_state(spark, sf_dir)
    # every DDL row was applied as a barrier, in global (ts, id) order
    ddl_ids = [x[0] for x in kernel.ddl_log]
    oplog = oplog_view(load_table(spark, sf_dir, "events"))
    expected_ddl = [
        r["id"] for r in oplog.filter(F.col("op") == "c").orderBy("ts", "id").collect()
    ]
    assert ddl_ids == expected_ddl


def test_resume_from_checkpoint(spark, sf_dir, feed, tmp_path):
    """S13: kill after a prefix, restart with the same checkpointLocation,
    final state identical — no row lost or double-applied."""
    target = str(tmp_path / "target")
    ckpt = str(tmp_path / "ckpt")
    kernel = ApplyKernel(spark, target)
    stream = read_oplog_stream(spark, feed, max_files_per_trigger=1)

    seen = {"n": 0}
    orig = kernel.process_batch

    def first_three(batch, bid):
        if seen["n"] >= 3:
            raise RuntimeError("simulated crash")
        orig(batch, bid)
        seen["n"] += 1

    q = (
        stream.writeStream.foreachBatch(first_three)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception):
        q.awaitTermination()

    # restart: same checkpoint, normal kernel -> drains the rest exactly once
    kernel2 = ApplyKernel(spark, target)
    q2 = (
        read_oplog_stream(spark, feed, max_files_per_trigger=1)
        .writeStream.foreachBatch(kernel2.process_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(300)
    assert _final_state(spark, target) == _expected_state(spark, sf_dir)


def test_ddl_barrier_segmentation(spark, tmp_path):
    """batcher_test.go-style scenario: DDL rows at chosen positions split
    the batch; apply order is segment, barrier, segment, barrier, tail."""
    import datetime

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    # ops: i i c u c d  (ids 1..6) -> segments [1,2] [4] [6], barriers 3,5
    for i, op in enumerate(["i", "i", "c", "u", "c", "d"], start=1):
        rows.append(
            (i, t0 + datetime.timedelta(seconds=i), 7, op, "db0.c1", float(i), "{}")
        )
    batch = spark.createDataFrame(
        rows, "id long, ts timestamp, user_id long, op string, ns string, value double, o string"
    )
    kernel = ApplyKernel(spark, str(tmp_path / "t"), strict_barriers=True)
    applied_order = []
    orig_seg, orig_ddl = kernel._apply_segment, kernel._apply_ddl

    def rec_seg(seg):
        ids = [r["id"] for r in seg.orderBy("id").collect()]
        if ids:
            applied_order.append(("seg", ids))
        orig_seg(seg)

    def rec_ddl(rows_):
        applied_order.append(("ddl", [r["id"] for r in rows_]))
        orig_ddl(rows_)

    kernel._apply_segment, kernel._apply_ddl = rec_seg, rec_ddl
    kernel.process_batch(batch, 0)
    assert applied_order == [
        ("seg", [1, 2]),
        ("ddl", [3]),
        ("seg", [4]),
        ("ddl", [5]),
        ("seg", [6]),
    ]
    # delete (id 6) was last writer for user 7 -> target empty
    assert _final_state(spark, str(tmp_path / "t")) == {}


BARRIER_SCENARIOS = {
    # op sequences mirroring collector/batcher_test.go's scenario tables:
    # DDL at the front, back, consecutive, interleaved, none, all, noop runs
    "no_ddl": "iiuud",
    "ddl_front": "ciiu",
    "ddl_back": "iiuc",
    "ddl_consecutive": "iccu",
    "ddl_interleaved": "icicic",
    "all_ddl": "ccc",
    "noop_runs": "ninuin",
    "single_row_ddl": "c",
    "delete_after_barrier": "icd",
}


@pytest.mark.parametrize("name", list(BARRIER_SCENARIOS))
def test_strict_barrier_scenarios(spark, tmp_path, name):
    """batcher_test.go behavioral spec: for every DDL placement, the strict
    kernel must (a) apply DDLs in global order, (b) interleave segments and
    barriers exactly as a sequential apply would, (c) reach the same final
    state as a row-at-a-time reference simulation."""
    import datetime

    ops = BARRIER_SCENARIOS[name]
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (i, t0 + datetime.timedelta(seconds=i), i % 3, op, "db0.c1", float(i), "{}")
        for i, op in enumerate(ops, start=1)
    ]
    batch = spark.createDataFrame(
        rows,
        "id long, ts timestamp, user_id long, op string, ns string, value double, o string",
    )

    # sequential reference simulation (the contract)
    sim_state: dict = {}
    sim_ddl = []
    for i, op in enumerate(ops, start=1):
        uid = i % 3
        if op == "i" or op == "u":
            sim_state[uid] = float(i)
        elif op == "d":
            sim_state.pop(uid, None)
            sim_state[uid] = None  # tombstone
        elif op == "c":
            sim_ddl.append(i)
    sim_visible = {k: v for k, v in sim_state.items() if v is not None}

    kernel = ApplyKernel(spark, str(tmp_path / "t"), strict_barriers=True)
    events = []
    orig_seg, orig_ddl = kernel._apply_segment, kernel._apply_ddl

    def rec_seg(seg):
        ids = [r["id"] for r in seg.orderBy("id").collect()]
        if ids:
            events.append(("seg", ids))
        orig_seg(seg)

    def rec_ddl(rows_):
        events.append(("ddl", [r["id"] for r in rows_]))
        orig_ddl(rows_)

    kernel._apply_segment, kernel._apply_ddl = rec_seg, rec_ddl
    kernel.process_batch(batch, 0)

    # (a) DDL ids in order
    assert [i for kind, ids in events if kind == "ddl" for i in ids] == sim_ddl
    # (b) every applied id appears in ascending global order across events
    flat = [i for _, ids in events for i in ids]
    assert flat == sorted(flat)
    # (c) final visible state matches the sequential simulation
    got = {r["user_id"]: r["value"] for r in (kernel.state_view() or batch.limit(0)).collect()}
    assert got == sim_visible


def test_txn_reassembly_in_batch(spark):
    """B3 within-batch fallback: committed txn emits all ops in order,
    uncommitted txn emits nothing, aborted rows are dropped."""
    from mongoshake_spark.streaming.txn import reassemble_in_batch

    rows = [
        ("s1", 1, 1, "i", "db0.c1", "{}", False, False),
        ("s1", 1, 2, "u", "db0.c1", "{}", False, False),
        ("s1", 1, 3, "u", "db0.c1", "{}", True, False),
        ("s2", 1, 1, "i", "db0.c2", "{}", False, False),  # no commit
        ("s3", 1, 1, "i", "db0.c3", "{}", False, True),  # aborted
        ("s3", 1, 2, "u", "db0.c3", "{}", True, False),
    ]
    batch = spark.createDataFrame(
        rows,
        "lsid string, txnNumber long, seq long, op string, ns string, o string, commit boolean, abort boolean",
    )
    out = reassemble_in_batch(batch).orderBy("lsid", "seq").collect()
    assert [(r["lsid"], r["seq"]) for r in out] == [
        ("s1", 1),
        ("s1", 2),
        ("s1", 3),
        ("s3", 2),
    ]


def test_kernel_all_options_combined(spark, sf_dir, feed, tmp_path):
    """Interaction test: strict barriers + journal + dead-letter + metrics
    listener all enabled on one run — options must compose."""
    from mongoshake_spark.streaming import metrics, read_oplog_stream

    listener = metrics.attach(spark)
    try:
        kernel = ApplyKernel(
            spark,
            str(tmp_path / "t"),
            dead_letter_dir=str(tmp_path / "dlq"),
            journal_dir=str(tmp_path / "j"),
            strict_barriers=True,
        )
        q = (
            read_oplog_stream(spark, feed, max_files_per_trigger=4)
            .writeStream.foreachBatch(kernel.process_batch)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(400)
        assert _final_state(spark, str(tmp_path / "t")) == _expected_state(spark, sf_dir)
        total = spark.read.parquet(feed).count()
        assert spark.read.parquet(str(tmp_path / "j")).count() == total
        assert len(kernel.ddl_log) > 0
    finally:
        spark.streams.removeListener(listener)


def test_windowed_counts_match_batch(spark, sf_dir, feed, tmp_path):
    """A2 streaming form: watermarked 1-hour windows over the replayed
    stream equal the batch date_trunc aggregation (q23's contract), because
    the feed replays in order so no row is beyond the watermark."""
    from mongoshake_spark.streaming.replay import read_oplog_stream
    from mongoshake_spark.streaming.windows import windowed_counts

    stream = read_oplog_stream(spark, feed, max_files_per_trigger=4)
    out = windowed_counts(stream, window="1 hour", watermark="2 hours")
    rows = []
    q = (
        out.writeStream.outputMode("append")
        .foreachBatch(lambda df, bid: rows.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {r["window_start"]: r["cnt"] for r in rows}
    batch = (
        oplog_view(load_table(spark, sf_dir, "events"))
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("h"))
        .count()
        .collect()
    )
    exp = {r["h"]: r["count"] for r in batch}
    # append mode withholds windows the watermark hasn't passed — the final
    # window(s) stay open; everything emitted must match the batch truth
    assert len(got) >= len(exp) - 3
    for k, v in got.items():
        assert exp[k] == v


def test_txn_reassembly_streaming(spark, tmp_path):
    """B3 stateful path: ops of one txn arrive across micro-batches; the
    commit in a later batch emits the whole transaction."""
    import json
    import os
    import time

    from mongoshake_spark.streaming.txn import reassemble_transactions

    src = tmp_path / "txn_src"
    os.makedirs(src)
    schema = (
        "lsid string, txnNumber long, seq long, op string, ns string, o string, "
        "commit boolean, abort boolean"
    )

    files_written = [0]

    def write_file(name, rows):
        with open(src / name, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        # strictly increasing mtimes: the file source admits oldest-first,
        # and equal mtimes leave batch order arbitrary
        t = time.time() - 100 + files_written[0]
        os.utime(src / name, (t, t))
        files_written[0] += 1

    write_file(
        "b0.json",
        [
            {"lsid": "s1", "txnNumber": 1, "seq": 1, "op": "i", "ns": "a.b", "o": "{}",
             "commit": False, "abort": False},
            {"lsid": "s1", "txnNumber": 1, "seq": 2, "op": "u", "ns": "a.b", "o": "{}",
             "commit": False, "abort": False},
        ],
    )
    write_file(
        "b1.json",
        [
            {"lsid": "s1", "txnNumber": 1, "seq": 3, "op": "d", "ns": "a.b", "o": "{}",
             "commit": True, "abort": False},
        ],
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    out = reassemble_transactions(stream)
    results = []
    q = (
        out.writeStream.outputMode("append")
        .foreachBatch(lambda df, bid: results.extend(df.collect()))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    time.sleep(0.1)
    got = sorted((r["lsid"], r["seq"], r["op"]) for r in results)
    assert got == [("s1", 1, "i"), ("s1", 2, "u"), ("s1", 3, "d")]


def test_flush_is_incremental_per_bucket(spark, tmp_path):
    """Per-batch write I/O must scale with batch size, not state size: a
    small batch touching few hash buckets rewrites ONLY those _bucket=
    partitions (round-2 fix — the previous flush overwrote the whole state
    every micro-batch)."""
    import datetime
    import os as _os

    def snapshot(root):
        files = {}
        for dirpath, _, names in _os.walk(root):
            for n in names:
                if n.endswith(".parquet"):
                    p = _os.path.join(dirpath, n)
                    files[p] = _os.path.getsize(p)
        return files

    t0 = datetime.datetime(2024, 1, 1)
    schema = (
        "id long, ts timestamp, user_id long, op string, ns string, "
        "value double, o string"
    )
    big = spark.createDataFrame(
        [
            (i, t0 + datetime.timedelta(seconds=i), i % 5000, "i", "db0.c1", float(i), "{}")
            for i in range(1, 20001)
        ],
        schema,
    )
    target = str(tmp_path / "t")
    kernel = ApplyKernel(spark, target, n_buckets=64)
    kernel.process_batch(big, 0)
    before = snapshot(target)
    n_buckets_on_disk = len(
        [d for d in _os.listdir(target) if d.startswith("_bucket=")]
    )
    assert n_buckets_on_disk == 64  # 5000 keys cover every bucket

    small = spark.createDataFrame(
        [
            (20001 + k, t0 + datetime.timedelta(hours=1, seconds=k), k, "u", "db0.c1", -1.0, "{}")
            for k in range(3)  # 3 keys -> at most 3 buckets
        ],
        schema,
    )
    kernel.process_batch(small, 1)
    after = snapshot(target)
    changed_dirs = {
        _os.path.relpath(p, target).split(_os.sep)[0]
        for p in (set(after) - set(before))
        | {p for p in after if p in before and after[p] != before[p]}
    }
    assert len(changed_dirs) <= 3, f"rewrote {len(changed_dirs)} buckets: {changed_dirs}"
    # untouched bucket files are byte-identical (same paths, same sizes)
    untouched = {p for p in before if _os.path.relpath(p, target).split(_os.sep)[0] not in changed_dirs}
    assert untouched <= set(after)
    assert all(after[p] == before[p] for p in untouched)
    # and the merge itself is still correct
    state = {r["user_id"]: r["value"] for r in kernel.state_view().collect()}
    assert state[0] == -1.0 and state[1] == -1.0 and state[2] == -1.0
    assert state[3] == 15003.0  # last writer for key 3 in the big batch

    # READ side scales with the batch too (round-4 fix): the small batch's
    # state slice covered at most its 3 buckets' files and a sliver of the
    # 5000-key state — not a full-state reload.
    total_files = sum(
        1
        for dirpath, _, names in _os.walk(target)
        for n in names
        if n.endswith(".parquet")
    )
    assert kernel.last_state_files_read <= 2 * 3
    assert kernel.last_state_files_read < total_files / 4
    assert kernel.last_state_rows_read < 5000 / 4


def test_state_slice_read_is_partition_pruned(spark, tmp_path):
    """Plan gate for the kernel's per-batch state read: the bucket ``IN``
    filter must reach the file index as a PartitionFilter (pruned scan),
    not a post-scan Filter over every bucket."""
    import datetime

    t0 = datetime.datetime(2024, 1, 1)
    big = spark.createDataFrame(
        [
            (i, t0 + datetime.timedelta(seconds=i), i, "i", "db0.c1", float(i), "{}")
            for i in range(1, 2001)
        ],
        "id long, ts timestamp, user_id long, op string, ns string, value double, o string",
    )
    target = str(tmp_path / "t")
    kernel = ApplyKernel(spark, target, n_buckets=16)
    kernel.process_batch(big, 0)
    sliced = (
        spark.read.parquet(target)
        .filter(F.col("_bucket").isin([0, 1]))
        .drop("_bucket")
    )
    plan = sliced._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "_bucket" in plan.split("PartitionFilters", 1)[1][:200]


def test_flat_layout_migrates_to_bucketed_once(spark, tmp_path):
    """ADVICE round-3: a legacy flat ``*.parquet`` state dir must be
    re-bucketed before the first dynamic flush — otherwise the flat files
    survive beside the new ``_bucket=`` dirs and rows double-count."""
    import datetime
    import os as _os

    target = str(tmp_path / "t")
    legacy = spark.createDataFrame(
        [(k, float(k), "i", k) for k in range(1, 51)],
        "user_id long, value double, op string, id long",
    )
    legacy.write.parquet(target)  # flat layout, no _bucket
    assert any(f.endswith(".parquet") for f in _os.listdir(target))

    t0 = datetime.datetime(2024, 1, 1)
    batch = spark.createDataFrame(
        [(100, t0, 7, "u", "db0.c1", -7.0, "{}")],
        "id long, ts timestamp, user_id long, op string, ns string, value double, o string",
    )
    kernel = ApplyKernel(spark, target, n_buckets=8)
    kernel.process_batch(batch, 0)

    # fully bucketed now: no flat files, marker pinned
    assert not any(f.endswith(".parquet") for f in _os.listdir(target))
    assert _os.path.isfile(_os.path.join(target, "_layout.json"))
    state = kernel.state_view()
    # no double-counted keys, update applied, legacy rows intact
    assert state.groupBy("user_id").count().filter("count > 1").count() == 0
    vals = {r["user_id"]: r["value"] for r in state.collect()}
    assert vals[7] == -7.0 and vals[8] == 8.0 and len(vals) == 50


def test_tombstone_compaction_under_watermark(spark, tmp_path):
    """W4 at scale: op='d' tombstones are physically dropped once the
    committed-batch watermark passes their ordinal — state must not grow
    monotonically with every key ever deleted — while replaying the
    delete batch (at-least-once) still converges to the same state."""
    import datetime

    t0 = datetime.datetime(2024, 1, 1)
    schema = (
        "id long, ts timestamp, user_id long, op string, ns string, "
        "value double, o string"
    )

    def mk(rows):
        return spark.createDataFrame(
            [
                (i, t0 + datetime.timedelta(seconds=i), k, op, "db0.c1", float(i), "{}")
                for i, k, op in rows
            ],
            schema,
        )

    target = str(tmp_path / "t")
    # n_buckets=1 so every batch touches the tombstone's bucket (lazy
    # compaction runs whenever the bucket is rewritten)
    kernel = ApplyKernel(spark, target, n_buckets=1)
    kernel.process_batch(mk([(i, i, "i") for i in range(1, 11)]), 0)
    b1 = mk([(11, 3, "d")])
    kernel.process_batch(b1, 1)

    def raw_ops(ops="d"):
        return (
            spark.read.parquet(target).filter(F.col("op").isin(list(ops))).count()
        )

    # tombstone present: batch 1's watermark (10) hasn't passed ordinal 11
    assert raw_ops("d") == 1
    n_rows_before = spark.read.parquet(target).count()

    kernel.process_batch(mk([(12, 20, "i")]), 2)
    # watermark is now 11 >= tombstone ordinal -> physically compacted
    assert raw_ops("d") == 0
    assert spark.read.parquet(target).count() == n_rows_before  # -1 tomb +1 insert
    assert 3 not in {r["user_id"] for r in kernel.state_view().collect()}

    # replay safety: re-delivering the delete batch after compaction
    # re-merges idempotently (fresh kernel = post-crash restart)
    kernel2 = ApplyKernel(spark, target, n_buckets=1)
    kernel2.process_batch(b1, 1)
    vis = {r["user_id"]: r["value"] for r in kernel2.state_view().collect()}
    assert set(vis) == {1, 2, 4, 5, 6, 7, 8, 9, 10, 20}
    # and the replayed tombstone was compacted straight away (ord 11 <=
    # persisted watermark 12 from the marker)
    assert raw_ops("d") == 0


def test_bucket_count_change_rebuckets(spark, tmp_path):
    """Resuming with a different n_buckets must re-bucket the layout once
    (marker validation) — not scatter keys across two generations of
    buckets as silent duplicates."""
    import datetime
    import os as _os

    t0 = datetime.datetime(2024, 1, 1)
    schema = (
        "id long, ts timestamp, user_id long, op string, ns string, "
        "value double, o string"
    )
    target = str(tmp_path / "t")
    seed = spark.createDataFrame(
        [(i, t0, i % 100, "i", "db0.c1", float(i), "{}") for i in range(1, 201)],
        schema,
    )
    ApplyKernel(spark, target, n_buckets=4).process_batch(seed, 0)
    assert len([d for d in _os.listdir(target) if d.startswith("_bucket=")]) <= 4

    update = spark.createDataFrame(
        [(1000, t0 + datetime.timedelta(hours=1), 5, "u", "db0.c1", -5.0, "{}")],
        schema,
    )
    kernel2 = ApplyKernel(spark, target, n_buckets=16)
    kernel2.process_batch(update, 1)
    import json as _json

    with open(_os.path.join(target, "_layout.json")) as f:
        assert _json.load(f)["n_buckets"] == 16
    buckets = [
        int(d.split("=", 1)[1])
        for d in _os.listdir(target)
        if d.startswith("_bucket=")
    ]
    assert buckets and max(buckets) < 16 and len(buckets) > 4
    state = kernel2.state_view()
    assert state.groupBy("user_id").count().filter("count > 1").count() == 0
    vals = {r["user_id"]: r["value"] for r in state.collect()}
    assert vals[5] == -5.0 and len(vals) == 100


def test_stream_exact_dedup_suppresses_cross_batch_rearrivals(spark, tmp_path):
    import os
    import time as _time

    from pyspark.sql import functions as F

    from mongoshake_spark.streaming.dedup import stream_exact_dedup

    feed = str(tmp_path / "feed")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    rows1 = [(1, "alpha text", 1700000001), (2, "beta text", 1700000002)]
    rows2 = [(3, "alpha text", 1700000003),  # re-arrival -> suppressed
             (4, "gamma text", 1700000004)]
    schema = "doc_id bigint, text string, epoch bigint"
    for i, rows in enumerate((rows1, rows2)):
        df = spark.createDataFrame(rows, schema).withColumn(
            "ts", F.timestamp_seconds(F.col("epoch"))
        ).drop("epoch").coalesce(1)
        df.write.mode("overwrite").parquet(f"{feed}/b{i}")
    # one directory-of-one-file per batch, mtime-ordered
    os.makedirs(out, exist_ok=True)
    files = []
    for i in range(2):
        d = f"{feed}/b{i}"
        f = [x for x in os.listdir(d) if x.endswith(".parquet")][0]
        files.append((i, os.path.join(d, f)))
    merged = str(tmp_path / "merged")
    os.makedirs(merged)
    t0 = _time.time() - 20
    for i, path in files:
        dst = os.path.join(merged, f"part-{i}.parquet")
        os.link(path, dst)
        os.utime(dst, (t0 + i, t0 + i))
    sch = "doc_id bigint, text string, ts timestamp"
    stream = (
        spark.readStream.schema(sch).option("maxFilesPerTrigger", 1).parquet(merged)
    )
    q = (
        stream_exact_dedup(stream, watermark="1 hour")
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.read.parquet(out).select("doc_id", "text_hash").collect()
    ids = sorted(r["doc_id"] for r in got)
    assert ids == [1, 2, 4], ids  # doc 3's content already seen in batch 1
    assert len({r["text_hash"] for r in got}) == 3


def test_txn_reassembly_spans_arrow_chunks(spark, tmp_path):
    """A transaction larger than arrow maxRecordsPerBatch reaches the
    state function as MULTIPLE pandas chunks in arbitrary order — the
    reassembly must sort the whole group once, not per chunk, or ops can
    emit after the commit out of seq order (or strand in state)."""
    import json
    import os

    from mongoshake_spark.streaming.txn import reassemble_transactions

    src = tmp_path / "txn_chunks"
    os.makedirs(src)
    n_ops = 40
    rows = [
        {"lsid": "s1", "txnNumber": 1, "seq": s, "op": "i", "ns": "a.b", "o": "{}",
         "commit": s == n_ops, "abort": False}
        for s in range(1, n_ops + 1)
    ]
    with open(src / "b0.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    schema = (
        "lsid string, txnNumber long, seq long, op string, ns string, o string, "
        "commit boolean, abort boolean"
    )
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        stream = spark.readStream.schema(schema).json(str(src))
        results = []
        q = (
            reassemble_transactions(stream)
            .writeStream.outputMode("append")
            .foreachBatch(lambda df, bid: results.extend(df.collect()))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        assert [r["seq"] for r in results] == list(range(1, n_ops + 1))
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)


def test_multi_table_apply_routes_per_namespace(spark, sf_dir, tmp_path):
    """The whole-deployment shape: one stream + one checkpoint drives a
    kernel per namespace; each target equals that namespace's own
    last-writer-wins reconstruction, and cross-ns keys never mix."""
    from mongoshake_spark.streaming.multi import run_multi_incr_sync

    # synthesize a 2-namespace feed: the events oplog with rows split
    # deterministically between two collections
    ov = oplog_view(load_table(spark, sf_dir, "events"))
    two_ns = ov.withColumn(
        "ns",
        F.when(F.col("user_id") % 2 == 0, F.lit("db0.even")).otherwise(
            F.lit("db0.odd")
        ),
    )
    feed = str(tmp_path / "feed")
    (
        two_ns.repartitionByRange(4, "ts", "id")
        .sortWithinPartitions("ts", "id")
        .write.parquet(feed)
    )
    # the file stream admits oldest-mtime-first and one write job shares
    # an mtime: stamp range order like write_replay_feed does, or the
    # replay order (and the kernel's compaction watermark assumption)
    # is arbitrary
    import os as _os
    import time as _time

    parts = sorted(f for f in _os.listdir(feed) if f.endswith(".parquet"))
    base = _time.time() - len(parts) - 10
    for i, f in enumerate(parts):
        _os.utime(_os.path.join(feed, f), (base + i, base + i))
    multi = run_multi_incr_sync(
        spark, feed, str(tmp_path / "root"), str(tmp_path / "ck"),
        max_files_per_trigger=1,
    )
    assert set(multi.kernels) == {"db0.even", "db0.odd"}
    for ns, parity in (("db0.even", 0), ("db0.odd", 1)):
        want = {
            r["user_id"]: r["value"]
            for r in merge.last_writer_wins(
                two_ns.filter(F.col("ns") == ns)
            ).collect()
        }
        got = {
            r["user_id"]: r["value"]
            for r in spark.read.parquet(str(tmp_path / "root") + "/" + ns)
            .filter(F.col("op") != "d")
            .select("user_id", "value")
            .collect()
        }
        assert got == want
        assert all(k % 2 == parity for k in got)


def test_multi_table_apply_lazy_namespace_and_unroutable(spark, tmp_path):
    """A namespace first seen mid-stream gets its kernel lazily;
    unroutable rows (NULL ns, path-hostile ns) reach the dead-letter —
    with NO dead_letter_dir configured they default under the root, and
    the M4 batch journal records them too."""
    import datetime
    import os

    from mongoshake_spark.streaming.multi import UNROUTABLE, MultiTableApplyKernel

    t0 = datetime.datetime(2024, 1, 1)
    schema = (
        "id long, ts timestamp, user_id long, op string, ns string, "
        "value double, o string"
    )
    root = str(tmp_path / "root")
    jdir = str(tmp_path / "journal")
    multi = MultiTableApplyKernel(spark, root, journal_dir=jdir)
    b0 = spark.createDataFrame(
        [
            (1, t0, 1, "i", "db0.a", 1.0, "{}"),
            (2, t0, 2, "i", None, 2.0, "{}"),      # NULL ns
            (3, t0, 3, "i", "..", 3.0, "{}"),       # path escape attempt
        ],
        schema,
    )
    multi.process_batch(b0, 0)
    assert set(multi.kernels) == {"db0.a"}
    b1 = spark.createDataFrame([(4, t0, 4, "i", "db0.b", 4.0, "{}")], schema)
    multi.process_batch(b1, 1)
    assert set(multi.kernels) == {"db0.a", "db0.b"}
    # unroutable rows recorded under the DEFAULT dead-letter, never dropped
    dl = spark.read.parquet(f"{root}/_dead_letter/{UNROUTABLE}")
    assert sorted(r["id"] for r in dl.collect()) == [2, 3]
    # nothing escaped the root; the '..' target was never created
    assert not os.path.isdir(str(tmp_path / "_bucket=0"))
    # M4: the journal holds every row of every batch, unroutable included
    assert spark.read.parquet(jdir).count() == 4
    assert multi.state_view("db0.b").count() == 1
    assert multi.state_view("db0.missing") is None


def test_multi_table_apply_parallel_fanout(spark, tmp_path):
    """The per-namespace kernel flushes run CONCURRENTLY from a driver
    thread pool (the reference starts one syncer goroutine per worker —
    collector/coordinator/incr.go:60-74); a serial loop makes per-batch
    wall grow linearly in live-table count while executors idle. A
    12-namespace batch must (a) produce byte-identical per-ns state
    under pool=1 and pool=8, and (b) actually OVERLAP kernel flushes —
    asserted structurally (max observed in-flight kernels > 1) rather
    than by wall-clock ratio, which flakes on loaded/low-core hosts."""
    import threading
    import time

    from pyspark.sql import functions as F

    from mongoshake_spark.streaming.apply import ApplyKernel
    from mongoshake_spark.streaming.multi import MultiTableApplyKernel

    n_ns = 12
    rows = (
        spark.range(0, 6000)
        .select(
            (F.col("id") % 500).alias("user_id"),
            (F.col("id") * 1.5).alias("value"),
            F.col("id").alias("id"),
            F.lit("i").alias("op"),
            F.to_timestamp(F.lit("2024-01-01")).alias("ts"),
            F.concat(
                F.lit("db0.c"), (F.col("id") % n_ns).cast("string")
            ).alias("ns"),
            F.lit(None).cast("string").alias("o"),
        )
        .persist()
    )
    rows.count()

    # instrument concurrency structurally: count kernels whose
    # process_batch is in flight at once (deterministic on any host,
    # unlike a wall-clock ratio)
    gauge = {"now": 0, "max": 0}
    gauge_lock = threading.Lock()
    orig = ApplyKernel.process_batch

    def counted(self, df, bid):
        with gauge_lock:
            gauge["now"] += 1
            gauge["max"] = max(gauge["max"], gauge["now"])
        try:
            return orig(self, df, bid)
        finally:
            with gauge_lock:
                gauge["now"] -= 1

    def run(par, root):
        m = MultiTableApplyKernel(spark, root, max_parallel_ns=par)
        t0 = time.monotonic()
        m.process_batch(rows, 0)
        return time.monotonic() - t0, m

    try:
        run(1, str(tmp_path / "warm"))  # JVM/codegen warmup out of band
        w_serial, m1 = run(1, str(tmp_path / "serial"))
        ApplyKernel.process_batch = counted
        try:
            w_par, m8 = run(8, str(tmp_path / "parallel"))
        finally:
            ApplyKernel.process_batch = orig
    finally:
        rows.unpersist()
    assert set(m1.kernels) == set(m8.kernels) and len(m8.kernels) == n_ns
    for ns in m8.kernels:
        want = {
            (r["user_id"], r["value"])
            for r in m1.state_view(ns).collect()
        }
        got = {
            (r["user_id"], r["value"])
            for r in m8.state_view(ns).collect()
        }
        assert got == want and len(got) > 0
    # the fan-out must not degrade to a serial loop: with pool=8 over 12
    # namespaces, >1 kernel must have been in flight simultaneously
    # (wall-clock was 0.41x serial on an idle local[32], but that ratio
    # is load-dependent — the structural gauge is not)
    assert gauge["max"] > 1, (
        f"no kernel overlap observed (max in-flight {gauge['max']}) — "
        f"pool=8 over {n_ns} namespaces ran serially "
        f"(par {w_par:.2f}s vs serial {w_serial:.2f}s)"
    )


def test_multi_table_parallel_failure_fails_whole_batch(spark, tmp_path):
    """A namespace flush failure must fail the WHOLE foreachBatch (so
    streaming retries the batch; idempotent per-ns MERGE makes the
    replay safe) — and every other in-flight namespace is awaited first,
    never left racing the retry."""
    import datetime

    import pytest

    from mongoshake_spark.streaming.multi import MultiTableApplyKernel

    t0 = datetime.datetime(2024, 1, 1)
    schema = (
        "id long, ts timestamp, user_id long, op string, ns string, "
        "value double, o string"
    )
    root = str(tmp_path / "root")
    multi = MultiTableApplyKernel(spark, root, max_parallel_ns=4)
    b0 = spark.createDataFrame(
        [(i, t0, i, "i", f"db0.c{i % 4}", float(i), "{}") for i in range(8)],
        schema,
    )
    multi.process_batch(b0, 0)

    boom = RuntimeError("kernel down")

    class _Exploding:
        def process_batch(self, df, bid):
            raise boom

    multi.kernels["db0.c1"] = _Exploding()
    b1 = spark.createDataFrame(
        [(i + 100, t0, i, "u", f"db0.c{i % 4}", float(i) + 9, "{}") for i in range(8)],
        schema,
    )
    with pytest.raises(RuntimeError, match="kernel down"):
        multi.process_batch(b1, 1)
    # the healthy namespaces were awaited and applied (at-least-once);
    # their second delivery on retry re-merges to the same state
    assert multi.state_view("db0.c0").filter("value > 9").count() > 0


def test_multi_table_kernel_lru_eviction_rebuilds_from_state_dir(spark, tmp_path):
    """VERDICT round-8 deployment hygiene: a 10k-namespace deployment must
    not hold 10k kernel objects forever. With ``max_live_kernels`` set,
    idle kernels are LRU-evicted after each batch; a later batch (or a
    state_view) rebuilds the kernel from its state dir — and the rebuild
    must re-read ``_layout.json`` (watermark + layout), so an
    evict-then-reuse namespace stays byte-correct."""
    import datetime

    from mongoshake_spark.streaming.multi import MultiTableApplyKernel

    t0 = datetime.datetime(2024, 1, 1)
    schema = (
        "id long, ts timestamp, user_id long, op string, ns string, "
        "value double, o string"
    )
    multi = MultiTableApplyKernel(
        spark, str(tmp_path / "root"), max_parallel_ns=2,
        max_live_kernels=2, n_buckets=4,
    )
    b0 = spark.createDataFrame(
        [(i, t0, i % 3, "i", f"db0.c{i % 4}", float(i), "{}") for i in range(12)],
        schema,
    )
    multi.process_batch(b0, 0)
    assert len(multi.kernels) == 2  # 4 namespaces seen, cap held
    evicted = [f"db0.c{j}" for j in range(4) if f"db0.c{j}" not in multi.kernels]
    assert len(evicted) == 2

    # view of an evicted namespace: a TRANSIENT kernel reads the state
    # dir; the kernel map is NOT mutated (state_view may run off the
    # batch thread — see _run_ns_tasks' thread-safety argument)
    ns = evicted[0]
    j = int(ns[-1])
    got = {(r["user_id"], r["value"]) for r in multi.state_view(ns).collect()}
    assert got == {(i % 3, float(i)) for i in range(12) if i % 4 == j}
    assert ns not in multi.kernels and len(multi.kernels) == 2
    # the rebuild re-read _layout.json: a fresh kernel over the same dir
    # recovers the persisted compaction watermark (this namespace's
    # batch-0 max ordinal)
    from mongoshake_spark.streaming.apply import ApplyKernel

    probe = ApplyKernel(spark, f"{multi.root_dir}/{ns}", n_buckets=4)
    probe.state_view()
    assert probe._watermark == max(i for i in range(12) if i % 4 == j)

    # update + delete routed through ANOTHER evict/rebuild cycle still
    # converge (the layout re-read kept bucketing consistent, so no
    # double-counted generations). Every ns holds users {0,1,2}
    # (ids j, j+4, j+8 -> all three residues): update user 0, delete
    # user 1, leave user 2.
    b1 = spark.createDataFrame(
        [
            (100, t0, 0, "u", ns, 999.0, "{}"),
            (101, t0, 1, "d", ns, 0.0, "{}"),
        ],
        schema,
    )
    multi.process_batch(b1, 1)
    assert len(multi.kernels) <= 2
    final = {(r["user_id"], r["value"]) for r in multi.state_view(ns).collect()}
    (v2,) = [float(i) for i in range(12) if i % 4 == j and i % 3 == 2]
    assert final == {(0, 999.0), (2, v2)}


def test_multi_table_ns_sanitization_is_collision_free(tmp_path):
    from mongoshake_spark.streaming.multi import safe_ns_dir

    assert safe_ns_dir("db0.coll-1_x") == "db0.coll-1_x"  # clean passes through
    assert safe_ns_dir("..") is None
    assert safe_ns_dir(".") is None
    assert safe_ns_dir("") is None
    a, b = safe_ns_dir("a/b"), safe_ns_dir("a_b")
    assert a != b and "/" not in a          # substitution disambiguated
    assert safe_ns_dir("a/b") == a          # deterministic
    assert safe_ns_dir("a@b") != safe_ns_dir("a#b")  # distinct ns stay distinct


def test_multi_table_rejects_mirror(spark, tmp_path):
    import pytest

    from mongoshake_spark.streaming.multi import MultiTableApplyKernel

    with pytest.raises(ValueError, match="mirror"):
        MultiTableApplyKernel(spark, str(tmp_path / "r"), mirror=lambda d, b: None)


def test_multi_table_resume_from_checkpoint(spark, sf_dir, tmp_path):
    """S13 for the whole-deployment shape: crash after a prefix of
    batches, restart with the same checkpoint and a FRESH kernel map
    (lazy kernels re-open their per-ns watermarked state), and every
    namespace's final state is exact — nothing lost or double-applied."""
    from mongoshake_spark.streaming.multi import MultiTableApplyKernel
    from mongoshake_spark.streaming.replay import write_replay_feed

    feed = str(tmp_path / "feed")
    write_replay_feed(spark, sf_dir, feed, batch_rows=200)
    root, ckpt = str(tmp_path / "root"), str(tmp_path / "ck")

    multi = MultiTableApplyKernel(spark, root)
    seen = {"n": 0}
    orig = multi.process_batch

    def first_two(batch, bid):
        if seen["n"] >= 2:
            raise RuntimeError("simulated crash")
        orig(batch, bid)
        seen["n"] += 1

    q = (
        read_oplog_stream(spark, feed, max_files_per_trigger=1)
        .writeStream.foreachBatch(first_two)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception):
        q.awaitTermination()

    multi2 = MultiTableApplyKernel(spark, root)  # fresh kernel map
    q2 = (
        read_oplog_stream(spark, feed, max_files_per_trigger=1)
        .writeStream.foreachBatch(multi2.process_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(300)

    ov = oplog_view(load_table(spark, sf_dir, "events"))
    for ns in [r["ns"] for r in ov.select("ns").distinct().collect()][:4]:
        want = {
            r["user_id"]: r["value"]
            for r in merge.last_writer_wins(ov.filter(F.col("ns") == ns)).collect()
        }
        got = {
            r["user_id"]: r["value"]
            for r in spark.read.parquet(f"{root}/{ns}")
            .filter(F.col("op") != "d")
            .select("user_id", "value")
            .collect()
        }
        assert got == want


def test_multi_table_routes_admin_commands_per_db(spark, tmp_path):
    """'db.$cmd' command rows reach EVERY kernel of that db (merged into
    each slice so barrier ordering covers them) and no literal '$cmd'
    target directory is created; another db's kernels never see them."""
    import datetime
    import os

    from mongoshake_spark.streaming.multi import MultiTableApplyKernel

    t0 = datetime.datetime(2024, 1, 1)
    schema = (
        "id long, ts timestamp, user_id long, op string, ns string, "
        "value double, o string"
    )
    root = str(tmp_path / "root")
    multi = MultiTableApplyKernel(spark, root)
    batch = spark.createDataFrame(
        [
            (1, t0, 1, "i", "db0.a", 1.0, "{}"),
            (2, t0, 2, "i", "db0.b", 2.0, "{}"),
            (3, t0, 3, "c", "db0.$cmd", None, '{"create": "a2"}'),
            (4, t0, 4, "i", "db1.x", 4.0, "{}"),
        ],
        schema,
    )
    multi.process_batch(batch, 0)
    assert set(multi.kernels) == {"db0.a", "db0.b", "db1.x"}
    assert [x[0] for x in multi.kernels["db0.a"].ddl_log] == [3]
    assert [x[0] for x in multi.kernels["db0.b"].ddl_log] == [3]
    assert multi.kernels["db1.x"].ddl_log == []
    assert not any("$cmd" in d or "_cmd" in d for d in os.listdir(root))


def test_stream_interval_join_matches_across_micro_batches(spark, tmp_path):
    """Stream-stream interval join: a right row arriving in a LATER
    micro-batch must still pair with a left row buffered from an earlier
    one (the state store holds each side until the watermark passes),
    and rows outside the window must not pair."""
    import json
    import os
    import time

    from mongoshake_spark.streaming.joins import stream_interval_join

    ldir, rdir = tmp_path / "sj_left", tmp_path / "sj_right"
    os.makedirs(ldir), os.makedirs(rdir)
    n = [0]

    def write_file(d, name, rows):
        with open(d / name, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        t = time.time() - 100 + n[0]
        os.utime(d / name, (t, t))
        n[0] += 1

    # left batch 1: two anchors; right batch 1: empty-ish; right batch 2
    # carries the matches for batch-1 anchors (cross-batch pairing)
    write_file(ldir, "l0.json", [
        {"k": 1, "l_ts": "2024-01-01 10:00:00", "lid": 100},
        {"k": 2, "l_ts": "2024-01-01 10:00:00", "lid": 200},
    ])
    write_file(ldir, "l1.json", [
        {"k": 1, "l_ts": "2024-01-01 12:00:00", "lid": 101},
    ])
    write_file(rdir, "r0.json", [
        {"k": 1, "r_ts": "2024-01-01 09:59:59", "rid": 900},  # before: no
    ])
    write_file(rdir, "r1.json", [
        {"k": 1, "r_ts": "2024-01-01 10:20:00", "rid": 901},  # batch-1 left
        {"k": 2, "r_ts": "2024-01-01 10:31:00", "rid": 902},  # > 30min: no
        {"k": 1, "r_ts": "2024-01-01 12:05:00", "rid": 903},  # batch-2 left
    ])
    ls = (
        spark.readStream.schema("k long, l_ts timestamp, lid long")
        .option("maxFilesPerTrigger", 1).json(str(ldir))
    )
    rs = (
        spark.readStream.schema("k long, r_ts timestamp, rid long")
        .option("maxFilesPerTrigger", 1).json(str(rdir))
    )
    joined = stream_interval_join(
        ls, rs, "k", "l_ts", "r_ts", 0, 1800, watermark="10 minutes"
    )
    results = []
    q = (
        joined.select("lid", "rid")
        .writeStream.outputMode("append")
        .foreachBatch(lambda df, bid: results.extend(df.collect()))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    time.sleep(0.1)
    assert sorted((r["lid"], r["rid"]) for r in results) == [
        (100, 901), (101, 903)
    ]


def test_stream_interval_join_requires_distinct_ts_names(spark, tmp_path):
    import pytest

    from mongoshake_spark.streaming.joins import stream_interval_join

    df = spark.readStream.format("rate").load()
    with pytest.raises(ValueError, match="alias the ts columns apart"):
        stream_interval_join(df, df, "value", "timestamp", "timestamp", 0, 1)


def test_streaming_neardup_index_persists_across_runs(spark, tmp_path):
    """Ingest-time near-dup: the band index is the stream's state and
    must survive a restart — a SECOND drain over a new feed file pairs
    the new docs against everything already indexed (origin=corpus) and
    against themselves (origin=increment), without re-pairing the old
    corpus."""
    import os
    import time

    from mongoshake_spark.streaming.neardup import run_streaming_lsh_dedup

    text_a = "the quick brown fox jumps over the lazy dog tonight"
    text_b = "the quick brown fox jumps over the lazy dog today"   # near-dup of a
    text_c = "completely different words about spark and shuffles here"
    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    work = str(tmp_path / "work")

    def feed_file(name, rows, age):
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        d = str(tmp_path / ("st_" + name))
        df.coalesce(1).write.mode("overwrite").parquet(d)
        part = next(f for f in os.listdir(d) if f.endswith(".parquet"))
        dst = os.path.join(feed, name + ".parquet")
        os.replace(os.path.join(d, part), dst)
        os.utime(dst, (time.time() - age, time.time() - age))

    feed_file("one", [(1, text_a), (2, text_c)], 20)
    pairs1 = {tuple(r) for r in run_streaming_lsh_dedup(
        spark, feed, "doc_id bigint, text string", work
    ).collect()}
    assert pairs1 == set()  # nothing near-duplicated yet
    # restart with a new arrival that near-dups doc 1
    feed_file("two", [(3, text_b)], 10)
    pairs2 = {tuple(r) for r in run_streaming_lsh_dedup(
        spark, feed, "doc_id bigint, text string", work
    ).collect()}
    assert (1, 3, "corpus") in pairs2
    assert all(p[1] == 3 for p in pairs2)  # only the new doc pairs


def test_receiver_max_wall_flushes_pending(spark, tmp_path):
    """The receiver's wall-clock bound must exit THROUGH a flush: logs
    received but not yet batch-applied when max_wall strikes land in the
    target instead of being stranded in memory."""
    import json as _json
    import threading
    import time

    from mongoshake_spark.sources import socket_tunnel as st
    from mongoshake_spark.streaming.receive import run_receiver

    box: dict = {}
    ready = threading.Event()

    def serve():
        box["summary"] = run_receiver(
            spark,
            str(tmp_path / "t"),
            idle_timeout=9999,  # idle exit unreachable: max_wall must fire
            max_wall=6.0,
            poll=0.1,
            batch_rows=10_000,  # never reached -> tail only flushable at exit
            n_buckets=4,
            on_ready=lambda p: (box.__setitem__("port", p), ready.set()),
        )

    th = threading.Thread(target=serve, daemon=True)
    th.start()
    assert ready.wait(30)
    client = st.TunnelClient("127.0.0.1", box["port"])
    logs = [
        _json.dumps(
            {"id": i, "ts": "2024-01-01 00:00:00", "user_id": i % 5,
             "op": "i", "ns": "db.c", "value": float(i), "o": "{}"}
        ).encode()
        for i in range(40)
    ]
    client.send(logs, 0, 39)
    client.close()
    th.join(60)
    assert not th.is_alive()
    s = box["summary"]
    assert s["logs"] == 40 and s["state_rows"] == 5


def test_multi_table_cmd_only_batch_reaches_live_kernels(spark, tmp_path):
    """A micro-batch whose ONLY rows for a db are db.$cmd commands must
    still reach that db's live kernels (single-row DDL batches are
    routine at maxFilesPerTrigger=1) — before the fix they were silently
    dropped: not applied, not ddl_logged, not dead-lettered."""
    import datetime

    from mongoshake_spark.streaming.multi import MultiTableApplyKernel

    t0 = datetime.datetime(2024, 1, 1)
    schema = (
        "id long, ts timestamp, user_id long, op string, ns string, "
        "value double, o string"
    )
    multi = MultiTableApplyKernel(spark, str(tmp_path / "root"), n_buckets=4)
    multi.process_batch(spark.createDataFrame(
        [(1, t0, 1, "i", "db0.c1", 1.0, "{}"),
         (2, t0, 2, "i", "db1.c9", 2.0, "{}")], schema), 0)
    # batch 1: ONLY a db0 command — no db0 CRUD rows anywhere
    multi.process_batch(spark.createDataFrame(
        [(3, t0, 0, "c", "db0.$cmd", 0.0, '{"drop":"c1"}')], schema), 1)
    assert [o[0] for o in multi.kernels["db0.c1"].ddl_log] == [3]
    assert multi.kernels["db1.c9"].ddl_log == []  # other dbs untouched


def test_ann_ingest_store_matches_batch_and_is_replay_idempotent(
    spark, tmp_path
):
    """streaming/ann_ingest: the drained store's top-k equals the batch
    ivfpq_topk on the same corpus (frozen model => batch-size-invariant
    encode), and a full REPLAY of the feed (fresh checkpoint, same files
    re-appended) changes nothing — the probe dedups by id."""
    import os

    from mongoshake_spark.functions.quantization import ivfpq_topk
    from mongoshake_spark.streaming.ann_ingest import (
        ann_index_bootstrap,
        ann_index_topk,
        streaming_ann_ingest,
    )

    vecs = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .filter(F.col("vec_id") < 300)
        .localCheckpoint(eager=True)
    )
    idx = str(tmp_path / "index")
    feed = str(tmp_path / "feed")
    ann_index_bootstrap(vecs, idx, m=4, k_code=8, iters=2)
    os.makedirs(feed)
    for i in range(2):
        d = str(tmp_path / f"b{i}")
        vecs.filter(F.col("vec_id") % 2 == i).coalesce(1).write.parquet(d)
        part = next(f for f in os.listdir(d) if f.endswith(".parquet"))
        os.replace(os.path.join(d, part), f"{feed}/c{i}.parquet")

    def drain(ckpt):
        stream = (
            spark.readStream.schema(vecs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        )
        q = streaming_ann_ingest(stream, idx, ckpt)
        assert q.awaitTermination(300)

    drain(str(tmp_path / "ckpt1"))
    queries = vecs.filter(F.col("vec_id") < 5)
    got1 = sorted(
        tuple(r) for r in ann_index_topk(spark, idx, queries, k=5, n_probe=2).collect()
    )
    want = sorted(
        tuple(r)
        for r in ivfpq_topk(
            vecs, list(range(5)), k=5, n_probe=2, m=4, k_code=8, iters=2
        ).collect()
    )
    assert got1 == want and len(got1) == 25
    # replay: fresh checkpoint reprocesses every file -> duplicate appends
    drain(str(tmp_path / "ckpt2"))
    got2 = sorted(
        tuple(r) for r in ann_index_topk(spark, idx, queries, k=5, n_probe=2).collect()
    )
    assert got2 == got1


def test_ann_ingest_without_bootstrap_fails_loudly(spark, tmp_path):
    import os

    from mongoshake_spark.streaming.ann_ingest import streaming_ann_ingest

    vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(10)
    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    vecs.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "b0"))
    part = next(
        f for f in os.listdir(str(tmp_path / "b0")) if f.endswith(".parquet")
    )
    os.replace(str(tmp_path / "b0" / part), f"{feed}/c0.parquet")
    stream = spark.readStream.schema(vecs.schema).parquet(feed)
    # fails at WIRING time (the frozen model is read and pinned before the
    # stream starts), not inside some later micro-batch
    with pytest.raises(Exception, match="PATH_NOT_FOUND|Path does not exist"):
        streaming_ann_ingest(stream, str(tmp_path / "idx"), str(tmp_path / "ck"))


def test_streaming_phash_dedup_matches_batch_and_replays_idempotently(
    spark, tmp_path
):
    """Media twin of the LSH ingest stream: drained pairs equal the batch
    phash_pairs run (pigeonhole — every Hamming<=3 pair shares a band, so
    cross-batch probing + intra-batch join lose nothing), and a full
    replay only re-emits the same (doc_a, doc_b) pairs."""
    import os

    from mongoshake_spark.operators.multimodal import attach_fake_media, phash_pairs
    from mongoshake_spark.streaming.neardup import streaming_phash_dedup

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter(F.col("doc_id") < 200)
        .localCheckpoint(eager=True)
    )
    media = attach_fake_media(docs)
    want = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in phash_pairs(media).collect()
    }
    assert want  # the fixture has exact dups -> hamming-0 pairs exist

    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    for i in range(2):
        d = str(tmp_path / f"b{i}")
        media.filter(F.col("doc_id") % 2 == i).coalesce(1).write.parquet(d)
        part = next(f for f in os.listdir(d) if f.endswith(".parquet"))
        os.replace(os.path.join(d, part), f"{feed}/c{i}.parquet")

    def drain(ck):
        stream = (
            spark.readStream.schema(media.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        )
        q = streaming_phash_dedup(
            stream, str(tmp_path / "index"), str(tmp_path / "pairs"), ck
        )
        assert q.awaitTermination(300)

    drain(str(tmp_path / "ck1"))
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in spark.read.parquet(str(tmp_path / "pairs")).collect()
    }
    assert got == want
    # some pairs must genuinely cross the batch boundary (origin=corpus)
    origins = {
        r["origin"]
        for r in spark.read.parquet(str(tmp_path / "pairs")).collect()
    }
    assert origins == {"increment", "corpus"}
    # replay: fresh checkpoint reprocesses the feed; pair SET unchanged
    drain(str(tmp_path / "ck2"))
    got2 = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in spark.read.parquet(str(tmp_path / "pairs")).collect()
    }
    assert got2 == want


def test_write_class_feed_one_file_per_class_in_one_job(spark, tmp_path):
    """_write_class_feed must produce exactly one parquet file per
    arrival class, carrying exactly that class's rows with the source
    schema (no class column), mtime-ordered — file = micro-batch is what
    every replay harness's cross-batch claim stands on."""
    import os

    from mongoshake_spark.plans.queries._shared import _write_class_feed

    df = spark.range(0, 97).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("t"), F.col("id")).alias("text"),
    )
    feed = str(tmp_path / "feed")
    tracker = spark.sparkContext.statusTracker()
    jobs_before = len(tracker.getJobIdsForGroup(None) or [])
    _write_class_feed(df, F.col("doc_id") % 3, 3, feed, str(tmp_path))
    jobs_after = len(tracker.getJobIdsForGroup(None) or [])
    # ONE write job (the old per-class filter+coalesce loop ran three)
    assert jobs_after - jobs_before == 1
    files = sorted(os.listdir(feed))
    assert files == ["class0.parquet", "class1.parquet", "class2.parquet"]
    mtimes = [os.path.getmtime(os.path.join(feed, f)) for f in files]
    assert mtimes == sorted(mtimes) and len(set(mtimes)) == 3
    for i, f in enumerate(files):
        got = spark.read.parquet(os.path.join(feed, f))
        assert got.columns == ["doc_id", "text"]
        ids = {r["doc_id"] for r in got.collect()}
        assert ids == {n for n in range(97) if n % 3 == i}


def test_write_class_feed_empty_class_fails_loudly(spark, tmp_path):
    import pytest as _pytest

    from mongoshake_spark.plans.queries._shared import _write_class_feed

    df = spark.range(0, 10).select((F.col("id") * 2).alias("doc_id"))
    with _pytest.raises(RuntimeError, match="produced no rows"):
        _write_class_feed(
            df, F.col("doc_id") % 2, 2, str(tmp_path / "feed"), str(tmp_path)
        )
