"""Config validation (M5), DBRef transform (N6), metrics listener (A2/B10),
journal (M4)."""

from __future__ import annotations

import pytest

from mongoshake_spark.config import ConfigError, SyncConfig
from mongoshake_spark.operators import transforms


def test_config_defaults_valid():
    SyncConfig().validate()


@pytest.mark.parametrize(
    "kw",
    [
        dict(sync_mode="bogus"),
        dict(shard_key="nope"),
        dict(workers=0),
        dict(batch_rows=0),
        dict(target_delay_sec=-1),
        dict(ns_whitelist=("db1",), ns_blacklist=("db1",)),
        dict(gids=("g1",), ddl_enable=False),
        dict(checkpoint_interval_ms=10),
    ],
)
def test_config_rejects(kw):
    with pytest.raises(ConfigError):
        SyncConfig(**kw).validate()


def test_transform_dbref(spark):
    o = '{"link": {"$ref": "c1", "$db": "db0", "$id": 5}, "other": [1, {"x": 2}]}'
    df = spark.createDataFrame([(1, o)], "id long, o string")
    out = transforms.transform_dbref(df, [("db0", "tgt0")]).collect()[0]["o"]
    import json

    doc = json.loads(out)
    assert doc["link"]["$db"] == "tgt0"
    assert doc["link"]["$ref"] == "c1"
    assert doc["link"]["$id"] == 5
    assert doc["other"] == [1, {"x": 2}]


def test_transform_dbref_passes_malformed(spark):
    df = spark.createDataFrame([(1, "not json")], "id long, o string")
    assert transforms.transform_dbref(df, [("a", "b")]).collect()[0]["o"] == "not json"


def test_metrics_listener_and_journal(spark, sf_dir, tmp_path):
    from mongoshake_spark.streaming import metrics
    from mongoshake_spark.streaming.apply import ApplyKernel
    from mongoshake_spark.streaming.replay import read_oplog_stream, write_replay_feed

    feed = str(tmp_path / "feed")
    write_replay_feed(spark, sf_dir, feed, batch_rows=512)
    listener = metrics.attach(spark)
    try:
        kernel = ApplyKernel(
            spark, str(tmp_path / "t"), journal_dir=str(tmp_path / "journal")
        )
        q = (
            read_oplog_stream(spark, feed, max_files_per_trigger=2)
            .writeStream.foreachBatch(kernel.process_batch)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        total = spark.read.parquet(feed).count()
        # M4: the journal holds every oplog row exactly once
        assert spark.read.parquet(str(tmp_path / "journal")).count() == total
        # A2: the listener saw every row and at least one batch
        import time

        time.sleep(1)  # listener events are async
        assert listener.metrics.rows_in == total
        assert listener.metrics.batches >= 1
        assert listener.metrics.snapshot()["rows_in"] == total
    finally:
        spark.streams.removeListener(listener)
