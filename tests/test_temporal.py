"""Temporal operators (operators/temporal): as-of join and sessionization."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from mongoshake_spark.operators.temporal import asof_join, session_ids


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def test_asof_join_hand_example(spark):
    left = spark.createDataFrame(
        [(1, _ts(1)), (1, _ts(5)), (1, _ts(9)), (2, _ts(5))],
        "k bigint, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, _ts(2), 20.0), (1, _ts(5), 50.0), (3, _ts(1), 99.0)],
        "k bigint, ts timestamp, v double",
    )
    got = {
        (r["k"], r["ts"].second): r["asof_v"]
        for r in asof_join(left, right, "k", "ts", ["v"]).collect()
    }
    assert got == {
        (1, 1): None,   # nothing at-or-before
        (1, 5): 50.0,   # same-instant right row IS visible (inclusive)
        (1, 9): 50.0,   # latest wins over the older 20.0
        (2, 5): None,   # key with no right rows at all
    }


def test_asof_join_preserves_left_payload_columns(spark):
    left = spark.createDataFrame(
        [(1, _ts(5), "keep-me")], "k bigint, ts timestamp, tag string"
    )
    right = spark.createDataFrame(
        [(1, _ts(1), 7.0)], "k bigint, ts timestamp, v double"
    )
    row = asof_join(left, right, "k", "ts", ["v"]).collect()[0]
    assert row["tag"] == "keep-me" and row["asof_v"] == 7.0


def test_session_ids_gap_splitting_and_tiebreak(spark):
    rows = [
        (1, 10, _ts(0)), (1, 11, _ts(30)),        # same session (gap 60s)
        (1, 12, dt.datetime(2024, 1, 1, 1, 0)),   # > 60s later: new session
        (2, 20, _ts(0)),                          # other key: own numbering
    ]
    df = spark.createDataFrame(rows, "user bigint, eid bigint, ts timestamp")
    got = {
        r["eid"]: r["session_no"]
        for r in session_ids(df, "user", "ts", gap_seconds=60,
                             tiebreak_col="eid").collect()
    }
    assert got == {10: 1, 11: 1, 12: 2, 20: 1}


def test_asof_plan_is_one_key_shuffle_no_theta_join(spark, sf_dir):
    """The union-tag form must plan ONE hash exchange on the key and a
    per-key window — no CartesianProduct / BroadcastNestedLoop (the
    O(n*m) plans a naive l.ts >= r.ts join condition would pick)."""
    import re

    from mongoshake_spark.sources.tables import load_table
    from tests.test_plans import _plan

    ev = load_table(spark, sf_dir, "events")
    left = ev.select("event_id", "user_id", "ts")
    right = ev.filter(F.col("event_id") % 10 == 0).groupBy("user_id", "ts").agg(
        F.max("value").alias("value")
    )
    plan = _plan(asof_join(left, right, "user_id", "ts", ["value"]))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # windows all carry a partition spec
    for first_arg in re.findall(r"windowspecdefinition\(([^,]*),", plan):
        assert "ASC" not in first_arg and "DESC" not in first_arg


def test_asof_join_null_value_in_newest_right_row_wins(spark):
    """A genuinely-NULL value in the newest matching right row is that
    row's answer — NOT skipped for a stale older value (the struct
    carrier distinguishes 'no right row yet' from 'right row with NULL');
    and with several value columns all outputs come from the SAME row."""
    left = spark.createDataFrame([(1, _ts(3)), (1, _ts(1))], "k bigint, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts(0), 5.0, "a"), (1, _ts(2), None, "b")],
        "k bigint, ts timestamp, v double, tag string",
    )
    got = {
        r["ts"].second: (r["asof_v"], r["asof_tag"])
        for r in asof_join(left, right, "k", "ts", ["v", "tag"]).collect()
    }
    assert got == {
        1: (5.0, "a"),      # only the ts=0 row is at-or-before
        3: (None, "b"),     # newest row wins wholesale, NULL v included
    }
