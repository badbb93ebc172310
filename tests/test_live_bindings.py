"""S2/S8/S12 live connector bindings: availability gate behavior in this
package-less sandbox, plus cluster-only integration tests that skip here
and run wherever the connector packages (and a broker/replica set) exist."""

from __future__ import annotations

import os

import pytest

from mongoshake_spark.sources import live


def test_source_available_classifies(spark):
    # a built-in source is found even when the call itself fails on options
    assert live.source_available(spark, "parquet") is True
    assert live.source_available(spark, "no_such_source_xyz") is False


def test_missing_kafka_package_raises_with_coordinates(spark, sf_dir):
    if live.source_available(spark, "kafka"):
        pytest.skip("kafka package present — gated error path not reachable")
    from mongoshake_spark.sources.tables import load_table

    df = load_table(spark, sf_dir, "events")
    with pytest.raises(RuntimeError, match="spark-sql-kafka"):
        live.write_kafka_tunnel(df, "broker:9092", "oplog")
    with pytest.raises(RuntimeError, match="spark-sql-kafka"):
        live.read_kafka_tunnel(spark, "broker:9092", "oplog")


def test_missing_mongo_connector_raises_with_coordinates(spark):
    if live.source_available(spark, "mongodb"):
        pytest.skip("mongo connector present — gated error path not reachable")
    with pytest.raises(RuntimeError, match="mongo-spark-connector"):
        live.read_change_stream(spark, "mongodb://h/", "db0", "c1")


KAFKA_BROKERS = os.environ.get("MONGOSHAKE_SPARK_TEST_KAFKA")
MONGO_URI = os.environ.get("MONGOSHAKE_SPARK_TEST_MONGO_URI")


@pytest.mark.skipif(
    not KAFKA_BROKERS, reason="set MONGOSHAKE_SPARK_TEST_KAFKA=host:port to run"
)
def test_kafka_tunnel_roundtrip_live(spark, sf_dir, tmp_path):
    """Cluster-only: frames written through the real Kafka sink decode
    back losslessly (the packaged equivalent of q28's file tunnel)."""
    from pyspark.sql import functions as F

    from mongoshake_spark.sources.oplog import oplog_view
    from mongoshake_spark.sources.tables import load_table

    topic = f"mshake_test_{os.getpid()}"
    ov = oplog_view(load_table(spark, sf_dir, "events"))
    live.write_kafka_tunnel(ov, KAFKA_BROKERS, topic)
    good, corrupt = live.read_kafka_tunnel(spark, KAFKA_BROKERS, topic)
    rows = []
    q = (
        good.writeStream.foreachBatch(lambda df, bid: rows.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert len(rows) == ov.count()
    assert sorted(r["id"] for r in rows) == [
        r["id"] for r in ov.select("id").orderBy("id").collect()
    ]
    _ = F  # silence unused in skipped-env linting


@pytest.mark.skipif(
    not MONGO_URI, reason="set MONGOSHAKE_SPARK_TEST_MONGO_URI to run"
)
def test_change_stream_binding_live(spark, tmp_path):
    """Cluster-only: the live watch() tail starts and emits normalized
    oplog rows for inserts made while the stream runs."""
    stream = live.read_change_stream(spark, MONGO_URI, "mshake_test", "c1")
    assert stream.isStreaming
    assert set(stream.columns) >= {"ts", "op", "ns", "o"}


def test_missing_mongo_connector_gates_write_binding(spark, sf_dir):
    if live.source_available(spark, "mongodb"):
        pytest.skip("mongo connector present — gated error path not reachable")
    from mongoshake_spark.sources.tables import load_table

    df = load_table(spark, sf_dir, "nation")
    with pytest.raises(RuntimeError, match="mongo-spark-connector"):
        live.write_mongo_table(df, "mongodb://h/", "db0", "c1")


def test_mongo_ops_mirror_gates_on_pymongo():
    try:
        import pymongo  # noqa: F401
    except ImportError:
        with pytest.raises(RuntimeError, match="pymongo"):
            live.mongo_ops_mirror("mongodb://h/", "db0", "c1")
    else:
        mirror = live.mongo_ops_mirror("mongodb://h/", "db0", "c1")
        assert callable(mirror)


def test_apply_kernel_mirror_receives_net_ops(spark, tmp_path):
    """S7 mirror wiring: the kernel hands each committed batch's NET
    per-key (key, value, op) set to the mirror — upserts for live keys,
    'd' for keys whose last writer was a delete — which is exactly the
    bulk_write set mongo_ops_mirror would apply
    (executor/db_writer.go:49-59)."""
    import datetime

    from mongoshake_spark.streaming.apply import ApplyKernel

    t0 = datetime.datetime(2024, 1, 1)
    schema = (
        "id long, ts timestamp, user_id long, op string, ns string, "
        "value double, o string"
    )
    seen: list[dict] = []

    def mirror(net_ops, batch_id):
        seen.append(
            {
                "batch": batch_id,
                "ops": {
                    r[0]: (r[1], r[2]) for r in net_ops.collect()
                },
            }
        )

    kernel = ApplyKernel(spark, str(tmp_path / "t"), mirror=mirror, n_buckets=4)
    b0 = spark.createDataFrame(
        [
            (1, t0, 7, "i", "db0.c1", 1.0, "{}"),
            (2, t0, 8, "i", "db0.c1", 2.0, "{}"),
            (3, t0, 7, "u", "db0.c1", 3.0, "{}"),
        ],
        schema,
    )
    kernel.process_batch(b0, 0)
    b1 = spark.createDataFrame(
        [
            (4, t0, 8, "d", "db0.c1", None, "{}"),
            (5, t0, 9, "i", "db0.c1", 5.0, "{}"),
        ],
        schema,
    )
    kernel.process_batch(b1, 1)
    assert seen[0]["batch"] == 0
    assert seen[0]["ops"] == {7: (3.0, "u"), 8: (2.0, "i")}
    # batch 1: key 8's net op is the delete; key 7 untouched -> absent
    assert seen[1]["ops"][8][1] == "d"
    assert seen[1]["ops"][9] == (5.0, "i")
    assert 7 not in seen[1]["ops"]


@pytest.mark.skipif(
    not MONGO_URI, reason="set MONGOSHAKE_SPARK_TEST_MONGO_URI to run"
)
def test_mongo_write_binding_live(spark):
    """Cluster-only: rows written through the real connector land in the
    collection, and a re-run converges (upsert-by-id, not dup-key)."""
    df = spark.createDataFrame([(1, "a"), (2, "b")], "_id long, value string")
    live.write_mongo_table(df, MONGO_URI, "mshake_test", "wtarget")
    live.write_mongo_table(df, MONGO_URI, "mshake_test", "wtarget")
    import pymongo

    coll = pymongo.MongoClient(MONGO_URI)["mshake_test"]["wtarget"]
    assert coll.count_documents({}) == 2


def test_apply_kernel_mirror_failure_replays_idempotently(spark, sf_dir, tmp_path):
    """The delivery contract for a live mirror: a mirror failure raises
    out of foreachBatch, the stream retries the batch from its
    checkpoint, and the mirror — being replace/delete-by-id — converges
    to the same live state a clean run produces. Simulated with an
    in-memory 'live collection' dict and a mirror that fails once."""
    from pyspark.sql import functions as F

    from mongoshake_spark.sources.oplog import oplog_view
    from mongoshake_spark.sources.tables import load_table
    from mongoshake_spark.streaming.apply import ApplyKernel
    from mongoshake_spark.streaming.replay import read_oplog_stream, write_replay_feed

    feed = str(tmp_path / "feed")
    n_files = write_replay_feed(spark, sf_dir, feed, batch_rows=200)
    assert n_files >= 3  # the outage must hit a MIDDLE batch

    live: dict = {}
    state = {"calls": 0}

    def flaky_mirror(net_ops, batch_id):
        state["calls"] += 1
        rows = net_ops.collect()
        # apply half, then fail ONCE mid-batch — the retry must heal the
        # partial application (exactly the bulk_write crash window)
        half = len(rows) // 2
        for r in rows[:half]:
            if r[2] == "d":
                live.pop(r[0], None)
            else:
                live[r[0]] = r[1]
        if state["calls"] == 2:
            raise RuntimeError("simulated live-target outage")
        for r in rows[half:]:
            if r[2] == "d":
                live.pop(r[0], None)
            else:
                live[r[0]] = r[1]

    target, ckpt = str(tmp_path / "t"), str(tmp_path / "ck")

    def run(kernel):
        q = (
            read_oplog_stream(spark, feed, max_files_per_trigger=1)
            .writeStream.foreachBatch(kernel.process_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        return q

    kernel = ApplyKernel(spark, target, mirror=flaky_mirror, n_buckets=8)
    try:
        run(kernel)
        crashed = False
    except Exception:
        crashed = True
    assert crashed  # the outage propagated: the batch was NOT committed
    # restart from the same checkpoint: the failed batch replays
    kernel2 = ApplyKernel(spark, target, mirror=flaky_mirror, n_buckets=8)
    run(kernel2)
    # live state == the kernel's own materialized state (tombstones drop)
    want = {
        r[0]: r[1]
        for r in spark.read.parquet(target)
        .filter(F.col("op") != "d")
        .select("user_id", "value")
        .collect()
    }
    assert live == want
    # and == the batch reconstruction of the full feed
    from mongoshake_spark.operators.merge import last_writer_wins

    expect = {
        r["user_id"]: r["value"]
        for r in last_writer_wins(
            oplog_view(load_table(spark, sf_dir, "events"))
        ).collect()
    }
    assert live == expect


def test_kafka_tunnel_roundtrip_embedded_log(spark, sf_dir, tmp_path):
    """Always-on S8/S12 coverage: the tunnel's full encode -> log ->
    decode pipeline over the embedded Kafka-shaped log (brokers =
    embedded:///dir) — the SAME _decode_kafka_records stage the real
    format('kafka') source uses, all three message codecs, with the raw
    codec's CRC dead-letter leg exercised by a corrupted record."""
    from pyspark.sql import functions as F

    from mongoshake_spark.sources.oplog import oplog_view
    from mongoshake_spark.sources.tables import load_table

    ov = oplog_view(load_table(spark, sf_dir, "events"))
    n = ov.count()
    brokers = f"embedded://{tmp_path}/log"
    for codec in ("json", "canonical_extended_json", "raw"):
        topic = f"t_{codec}"
        live.write_kafka_tunnel(ov, brokers, topic, message=codec)
        good, corrupt = live.read_kafka_tunnel(
            spark, brokers, topic, message=codec
        )
        rows = []
        q = (
            good.writeStream.foreachBatch(
                lambda df, bid: rows.extend(df.collect())
            )
            .option("checkpointLocation", str(tmp_path / f"ck_{codec}"))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300)
        assert len(rows) == n, codec
        assert sorted(r["id"] for r in rows) == [
            r["id"] for r in ov.select("id").orderBy("id").collect()
        ]
    # per-partition ordering key survives as the kafka record key
    recs = spark.read.parquet(f"{tmp_path}/log/t_json")
    assert set(recs.columns) == {
        "key", "value", "topic", "partition", "offset", "timestamp"
    }
    assert recs.filter(
        F.pmod(F.col("key").cast("string").cast("int"), F.lit(8))
        != F.col("partition")
    ).count() == 0
    # corrupt one raw record -> the CRC reject leg dead-letters it
    raw_dir = f"{tmp_path}/log/t_raw"
    one = spark.read.parquet(raw_dir).limit(1).collect()[0]
    bad_value = bytearray(bytes(one["value"]))
    bad_value[-1] ^= 0xFF
    spark.createDataFrame(
        [(one["key"], bytes(bad_value), one["topic"], one["partition"],
          999999, one["timestamp"])],
        live.EMBEDDED_RECORD_SCHEMA,
    ).write.mode("append").parquet(raw_dir)
    good, corrupt = live.read_kafka_tunnel(spark, brokers, "t_raw", message="raw")
    bad_rows = []
    q = (
        corrupt.writeStream.foreachBatch(
            lambda df, bid: bad_rows.extend(df.collect())
        )
        .option("checkpointLocation", str(tmp_path / "ck_bad"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    assert len(bad_rows) == 1


class _WriteErr(Exception):
    """Structural stand-in for pymongo.errors.BulkWriteError: the mirror
    detects write errors by the `details` dict shape, so the remediation
    logic tests without pymongo installed."""

    def __init__(self, write_errors):
        super().__init__("bulk write error")
        self.details = {"writeErrors": write_errors}


class _Coll:
    """Scripted collection: fails the given request payloads with dup-key
    for the first `fail_rounds` bulk_write calls that contain them."""

    def __init__(self, poison, fail_rounds=1):
        self.poison = set(poison)
        self.fail_rounds = fail_rounds
        self.rounds_failed = 0
        self.applied = []
        self.calls = []

    def bulk_write(self, reqs, ordered=False):
        assert ordered is False  # the mirror always sends unordered bulks
        self.calls.append(list(reqs))
        errs = []
        for i, r in enumerate(reqs):
            if r in self.poison and self.rounds_failed < self.fail_rounds:
                errs.append({"index": i, "code": 11000,
                             "errmsg": f"E11000 duplicate key: {r}"})
            else:
                self.applied.append(r)
        if errs:
            self.rounds_failed += 1
            raise _WriteErr(errs)


def test_apply_requests_retries_transient_dupkey_once():
    """The collision_matrix.go concern, optimistic form: a dup-key that
    resolves once the rest of the batch lands (key A released the value
    key B takes) must succeed on the single retry pass — no dead letter,
    every op applied exactly once."""
    dead = []
    coll = _Coll(poison={"ins_B"}, fail_rounds=1)
    live._apply_requests(
        coll, ["upd_A", "ins_B", "del_C"], bulk_size=10,
        on_dead=lambda req, we: dead.append((req, we)),
    )
    assert dead == []
    assert sorted(coll.applied) == ["del_C", "ins_B", "upd_A"]
    assert len(coll.calls) == 2  # one bulk + one retry bulk


def test_apply_requests_residual_conflict_dead_letters():
    """A conflict the batch cannot resolve (the value is held outside the
    batch) dead-letters the op with its server error — never dropped,
    never an opaque crash — and everything else still applies."""
    dead = []
    coll = _Coll(poison={"ins_B"}, fail_rounds=2)
    live._apply_requests(
        coll, ["upd_A", "ins_B", "del_C"], bulk_size=2,
        on_dead=lambda req, we: dead.append((req, we["code"])),
    )
    assert dead == [("ins_B", 11000)]
    assert sorted(coll.applied) == ["del_C", "upd_A"]


def test_apply_requests_resolves_multi_pass_rotation_chain():
    """A depth-2 value-rotation chain (A releases the value B takes, B
    releases the value C takes): pass 1 applies A, pass 2 applies B,
    pass 3 applies C — the retry-until-no-progress loop must resolve it
    with no dead letters (a single-retry design would dead-letter C)."""

    class _ChainColl:
        def __init__(self, fails):  # req -> number of times it dup-keys
            self.fails = dict(fails)
            self.applied = []
            self.calls = []

        def bulk_write(self, reqs, ordered=False):
            self.calls.append(list(reqs))
            errs = []
            for i, r in enumerate(reqs):
                if self.fails.get(r, 0) > 0:
                    self.fails[r] -= 1
                    errs.append({"index": i, "code": 11000,
                                 "errmsg": f"E11000: {r}"})
                else:
                    self.applied.append(r)
            if errs:
                raise _WriteErr(errs)

    dead = []
    coll = _ChainColl({"ins_B": 1, "ins_C": 2})
    live._apply_requests(
        coll, ["upd_A", "ins_B", "ins_C"], bulk_size=10,
        on_dead=lambda req, we: dead.append(req),
    )
    assert dead == []
    assert sorted(coll.applied) == ["ins_B", "ins_C", "upd_A"]
    assert len(coll.calls) == 3  # initial + two progress-making passes


def test_apply_requests_non_write_errors_propagate():
    """Connection-class failures must fail the task (retrying or
    dead-lettering a down server would hide data loss)."""

    class _Down:
        def bulk_write(self, reqs, ordered=False):
            raise ConnectionError("server gone")

    with pytest.raises(ConnectionError):
        live._apply_requests(_Down(), ["a"], 10, on_dead=lambda r, w: None)


def test_apply_requests_chunking_respects_bulk_size():
    coll = _Coll(poison=set())
    live._apply_requests(coll, list(range(25)), bulk_size=10,
                         on_dead=lambda r, w: None)
    assert [len(c) for c in coll.calls] == [10, 10, 5]
    assert coll.applied == list(range(25))


@pytest.mark.skipif(
    not MONGO_URI, reason="set MONGOSHAKE_SPARK_TEST_MONGO_URI to run"
)
def test_mirror_unique_index_conflict_dead_letters_live(spark, tmp_path):
    """Cluster-only: a synthetic cross-key dup-key conflict on a
    SECONDARY unique index, forced through mongo_ops_mirror against a
    real server, lands in the dead-letter dir (the value is held by a
    document outside the batch, so the retry pass cannot resolve it)."""
    import json
    import os

    import pymongo

    client = pymongo.MongoClient(MONGO_URI)
    dbname, cname = "mshake_test", f"uniq_{os.getpid()}"
    coll = client[dbname][cname]
    coll.drop()
    coll.create_index("val", unique=True)
    coll.insert_one({"_id": 999, "val": 7.0})  # holder OUTSIDE the batch
    dl = str(tmp_path / "dead")
    mirror = live.mongo_ops_mirror(
        MONGO_URI, dbname, cname, dead_letter_dir=dl
    )
    net = spark.createDataFrame(
        [(1, 7.0, "i"), (2, 8.0, "i")], "user_id long, val double, op string"
    ).coalesce(1)
    mirror(net, 0)
    assert coll.find_one({"_id": 2})["val"] == 8.0  # clean op applied
    recs = []
    for f in os.listdir(dl):
        with open(os.path.join(dl, f)) as fh:
            recs.extend(json.loads(line) for line in fh)
    assert len(recs) == 1 and recs[0]["code"] == 11000
    coll.drop()
    client.close()
