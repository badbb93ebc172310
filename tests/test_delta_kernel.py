"""ApplyKernel(state_format="delta") — the production MERGE INTO state
plane (DEPLOYMENT.md), run against the same semantic matrix the parquet
kernel passes: last-writer-wins, tombstones, replay idempotence, DDL
barriers, watermark compaction, evict/rebuild.

Availability-gated: delta-spark is not baked into the default container.
When present, these tests must run in a FRESH interpreter (the Delta
extension jars load at JVM start via configure_spark_with_delta_pip, so
they cannot attach to the suite's already-running session):

    MONGOSHAKE_DELTA_TESTS=1 python -m pytest tests/test_delta_kernel.py

Without the package the module skips — except the gate test, which
asserts the loud construction-time failure contract in any environment.
"""

from __future__ import annotations

import datetime
import importlib.util
import os

import pytest

HAVE_DELTA = importlib.util.find_spec("delta") is not None
OPTED_IN = os.environ.get("MONGOSHAKE_DELTA_TESTS") == "1"

T0 = datetime.datetime(2024, 1, 1)
SCHEMA = (
    "id long, ts timestamp, user_id long, op string, ns string, "
    "value double, o string"
)


def test_delta_state_format_gates_loudly_without_package(spark, tmp_path):
    """The availability contract that runs EVERYWHERE: asking for the
    delta state plane without delta-spark installed must fail at
    construction with actionable guidance — never midway through a
    stream."""
    from mongoshake_spark.streaming.apply import ApplyKernel

    if HAVE_DELTA:
        pytest.skip("delta-spark installed; the missing-package gate "
                    "cannot be exercised here")
    with pytest.raises(RuntimeError, match="delta-spark"):
        ApplyKernel(spark, str(tmp_path / "t"), state_format="delta")


def test_delta_state_format_rejects_unknown_format(spark, tmp_path):
    from mongoshake_spark.streaming.apply import ApplyKernel

    with pytest.raises(ValueError, match="state_format"):
        ApplyKernel(spark, str(tmp_path / "t"), state_format="iceberg")


needs_delta = pytest.mark.skipif(
    not (HAVE_DELTA and OPTED_IN),
    reason="delta-spark not installed or MONGOSHAKE_DELTA_TESTS!=1 "
    "(run standalone in a fresh interpreter; see module docstring)",
)


@pytest.fixture(scope="module")
def delta_spark():
    from delta.pip_utils import configure_spark_with_delta_pip
    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.master("local[8]")
        .appName("delta-kernel-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config(
            "spark.sql.extensions",
            "io.delta.sql.DeltaSparkSessionExtension",
        )
        .config(
            "spark.sql.catalog.spark_catalog",
            "org.apache.spark.sql.delta.catalog.DeltaCatalog",
        )
    )
    spark = configure_spark_with_delta_pip(builder).getOrCreate()
    yield spark
    spark.stop()


def _batch(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


@needs_delta
def test_delta_merge_last_writer_wins_and_tombstones(delta_spark, tmp_path):
    from mongoshake_spark.streaming.apply import ApplyKernel

    k = ApplyKernel(delta_spark, str(tmp_path / "t"), state_format="delta",
                    n_buckets=4)
    k.process_batch(_batch(delta_spark, [
        (1, T0, 10, "i", "db.c", 1.0, "{}"),
        (2, T0, 11, "i", "db.c", 2.0, "{}"),
        (3, T0, 10, "u", "db.c", 9.0, "{}"),
    ]), 0)
    got = {(r["user_id"], r["value"]) for r in k.state_view().collect()}
    assert got == {(10, 9.0), (11, 2.0)}
    # delete becomes a tombstone: invisible in the view, still outranking
    # a late lower-ordinal op
    k.process_batch(_batch(delta_spark, [
        (4, T0, 11, "d", "db.c", 0.0, "{}"),
    ]), 1)
    got = {(r["user_id"], r["value"]) for r in k.state_view().collect()}
    assert got == {(10, 9.0)}
    k.process_batch(_batch(delta_spark, [
        (1, T0, 11, "i", "db.c", 2.0, "{}"),  # stale replayed insert
    ]), 2)
    got = {(r["user_id"], r["value"]) for r in k.state_view().collect()}
    assert got == {(10, 9.0)}  # the ordinal-4 tombstone outranks it


@needs_delta
def test_delta_replay_idempotence(delta_spark, tmp_path):
    from mongoshake_spark.streaming.apply import ApplyKernel

    k = ApplyKernel(delta_spark, str(tmp_path / "t"), state_format="delta",
                    n_buckets=4)
    b = _batch(delta_spark, [
        (1, T0, 1, "i", "db.c", 1.0, "{}"),
        (2, T0, 2, "i", "db.c", 2.0, "{}"),
        (3, T0, 1, "d", "db.c", 0.0, "{}"),
    ])
    k.process_batch(b, 0)
    first = sorted(tuple(r) for r in k.state_view().collect())
    k.process_batch(b, 0)  # at-least-once re-delivery
    assert sorted(tuple(r) for r in k.state_view().collect()) == first


@needs_delta
def test_delta_strict_barriers_order(delta_spark, tmp_path):
    from mongoshake_spark.streaming.apply import ApplyKernel

    k = ApplyKernel(delta_spark, str(tmp_path / "t"), state_format="delta",
                    strict_barriers=True, n_buckets=4)
    k.process_batch(_batch(delta_spark, [
        (1, T0, 1, "i", "db.c", 1.0, "{}"),
        (2, T0, 0, "c", "db.$cmd", '{"create": "c"}', "{}"),
        (3, T0, 1, "u", "db.c", 5.0, "{}"),
    ]), 0)
    assert [o[0] for o in k.ddl_log] == [2]
    got = {(r["user_id"], r["value"]) for r in k.state_view().collect()}
    assert got == {(1, 5.0)}


@needs_delta
def test_delta_tombstone_compaction_past_watermark(delta_spark, tmp_path):
    from pyspark.sql import functions as F

    from mongoshake_spark.streaming.apply import ApplyKernel

    k = ApplyKernel(delta_spark, str(tmp_path / "t"), state_format="delta",
                    n_buckets=4)
    k.process_batch(_batch(delta_spark, [
        (1, T0, 1, "i", "db.c", 1.0, "{}"),
        (2, T0, 1, "d", "db.c", 0.0, "{}"),
    ]), 0)
    # the tombstone physically persists until a later flush touching its
    # bucket runs with the watermark past its ordinal
    raw = delta_spark.read.format("delta").load(str(tmp_path / "t"))
    assert raw.filter(F.col("op") == "d").count() == 1
    k.process_batch(_batch(delta_spark, [
        (3, T0, 1, "i", "db.c", 3.0, "{}"),
    ]), 1)
    raw = delta_spark.read.format("delta").load(str(tmp_path / "t"))
    assert raw.filter(F.col("op") == "d").count() == 0
    got = {(r["user_id"], r["value"]) for r in k.state_view().collect()}
    assert got == {(1, 3.0)}


@needs_delta
def test_delta_new_kernel_resumes_from_state_dir(delta_spark, tmp_path):
    from mongoshake_spark.streaming.apply import ApplyKernel

    d = str(tmp_path / "t")
    k1 = ApplyKernel(delta_spark, d, state_format="delta", n_buckets=4)
    k1.process_batch(_batch(delta_spark, [
        (1, T0, 1, "i", "db.c", 1.0, "{}"),
    ]), 0)
    k2 = ApplyKernel(delta_spark, d, state_format="delta", n_buckets=4)
    k2.process_batch(_batch(delta_spark, [
        (2, T0, 2, "i", "db.c", 2.0, "{}"),
    ]), 1)
    got = {(r["user_id"], r["value"]) for r in k2.state_view().collect()}
    assert got == {(1, 1.0), (2, 2.0)}
    assert k2._watermark == 2  # marker round-trip across kernel objects


@needs_delta
def test_delta_rejects_bucket_count_mismatch(delta_spark, tmp_path):
    """Reopening a delta state dir with a different n_buckets must fail
    loudly: the MERGE condition includes the bucket column, so a silent
    reopen would miss every match and duplicate keys (the parquet path
    migrates; delta refuses)."""
    from mongoshake_spark.streaming.apply import ApplyKernel

    d = str(tmp_path / "t")
    k1 = ApplyKernel(delta_spark, d, state_format="delta", n_buckets=8)
    k1.process_batch(_batch(delta_spark, [
        (1, T0, 1, "i", "db.c", 1.0, "{}"),
    ]), 0)
    k2 = ApplyKernel(delta_spark, d, state_format="delta", n_buckets=4)
    with pytest.raises(RuntimeError, match="n_buckets"):
        k2.process_batch(_batch(delta_spark, [
            (2, T0, 2, "i", "db.c", 2.0, "{}"),
        ]), 1)


def test_delta_refuses_existing_parquet_state(spark, tmp_path):
    """Reopening a parquet-format state dir with state_format='delta'
    must refuse loudly BEFORE any write: the first delta segment is a
    mode('overwrite') save that would replace the accumulated state.
    This guard needs no delta package (it fires before any Delta API),
    so it runs everywhere — with a stub module when delta is absent."""
    import datetime
    import sys
    import types

    from mongoshake_spark.streaming.apply import ApplyKernel

    d = str(tmp_path / "t")
    pk = ApplyKernel(spark, d, n_buckets=4)
    pk.process_batch(spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 1), 1, "i", "db.c", 1.0, "{}")],
        "id long, ts timestamp, user_id long, op string, ns string, "
        "value double, o string"), 0)

    if not HAVE_DELTA:
        # satisfy the availability gate with a stub delta.tables module;
        # _ensure_layout's refusal fires before any attribute is used
        fake = types.ModuleType("delta")
        fake_tables = types.ModuleType("delta.tables")
        fake_tables.DeltaTable = object
        fake.tables = fake_tables
        sys.modules["delta"] = fake
        sys.modules["delta.tables"] = fake_tables
    try:
        dk = ApplyKernel(spark, d, state_format="delta", n_buckets=4)
        with pytest.raises(RuntimeError, match="parquet-format"):
            dk.state_view()
    finally:
        if not HAVE_DELTA:
            del sys.modules["delta"], sys.modules["delta.tables"]
