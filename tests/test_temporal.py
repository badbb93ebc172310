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


# ---------------------------------------------------------------------------
# range_join (bounded interval join)
# ---------------------------------------------------------------------------


def test_range_join_bounds_inclusive_and_keyed(spark):
    from mongoshake_spark.operators.temporal import range_join

    left = spark.createDataFrame(
        [(1, 100, _ts(10))], "lid bigint, k bigint, l_ts timestamp"
    )
    right = spark.createDataFrame(
        [
            (1, 100, _ts(10)),   # == l.ts: below lower bound (lower_us=1)
            (2, 100, _ts(11)),   # at lower bound: kept
            (3, 100, _ts(40)),   # inside
            (4, 100, _ts(40)),   # same instant, second row: kept too
            (5, 100, dt.datetime(2024, 1, 1, 0, 1, 10)),  # AT upper: kept
            (7, 100, dt.datetime(2024, 1, 1, 0, 1, 11)),  # > upper: dropped
            (6, 999, _ts(20)),   # other key: dropped
        ],
        "rid bigint, k bigint, r_ts timestamp",
    )
    got = sorted(
        r["rid"]
        for r in range_join(
            left, right, "l_ts", "r_ts", 1_000_000, 60_000_000, on="k"
        ).collect()
    )
    assert got == [2, 3, 4, 5]


def test_range_join_matches_naive_theta_join(spark, sf_dir):
    """Bucketized equi-join result == the naive BETWEEN theta join, pair
    for pair (window chosen so pairs span bucket boundaries)."""
    from mongoshake_spark.operators.temporal import range_join
    from mongoshake_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("lid"), "user_id", F.col("ts").alias("l_ts")
    )
    right = ev.select(
        F.col("event_id").alias("rid"), "user_id", F.col("ts").alias("r_ts")
    )
    fast = range_join(
        left, right, "l_ts", "r_ts", 1, 7_200_000_000, on="user_id"
    )
    got = {(r["lid"], r["rid"]) for r in fast.collect()}
    lus = F.unix_micros(F.col("l_ts").cast("timestamp"))
    rus = F.unix_micros(F.col("r_ts").cast("timestamp"))
    naive = left.join(right, "user_id").filter(
        (rus >= lus + 1) & (rus <= lus + 7_200_000_000)
    )
    want = {(r["lid"], r["rid"]) for r in naive.collect()}
    assert got == want and len(got) > 0


def test_range_join_plan_is_equi_join_not_nested_loop(spark, sf_dir):
    """The whole point: the plan must be a hash/sort-merge EQUI-join on
    (key, bucket) — never CartesianProduct, and never a nested-loop over
    corpus-sized inputs (broadcast of the small side is acceptable only
    because AQE sizes it; the join keys must still be equi)."""
    from mongoshake_spark.operators.temporal import range_join
    from mongoshake_spark.sources.tables import load_table
    from tests.test_plans import _plan

    ev = load_table(spark, sf_dir, "events")
    left = ev.select(F.col("event_id").alias("lid"), "user_id",
                     F.col("ts").alias("l_ts"))
    right = ev.select(F.col("event_id").alias("rid"), "user_id",
                      F.col("ts").alias("r_ts"))
    plan = _plan(range_join(left, right, "l_ts", "r_ts", 1, 3_600_000_000,
                            on="user_id"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_range_join_rejects_bad_bounds_and_collisions(spark):
    import pytest

    from mongoshake_spark.operators.temporal import range_join

    df = spark.createDataFrame([(1, _ts(0))], "k bigint, ts timestamp")
    with pytest.raises(ValueError, match="upper_us < lower_us"):
        range_join(df, df, "ts", "ts", 10, 5)
    bad = df.withColumn("_bkt", F.lit(1))
    with pytest.raises(ValueError, match="collide"):
        range_join(bad, df, "ts", "ts", 0, 10)


def test_range_join_exact_at_large_timestamps(spark):
    """Bucket ids use exact integer floor division: near 2^54 epoch
    micros (~year 2541) double division misrounds numerators at bucket
    top edges (floor((k*W-1)/W) -> k in float). The bucketized join must
    equal a brute-force theta join on a cluster of rows packed around
    exactly such an edge."""
    import datetime

    from mongoshake_spark.operators.temporal import range_join

    lower, upper = 1, 3_600_000_000
    width = upper - lower + 1
    # x = k*width - 1 with floor(x/width) misrounding in float (verified
    # witness for this width at 2^54)
    x = 18014396399999999
    assert (x + 1) % width == 0
    epoch = datetime.datetime(1970, 1, 1, tzinfo=datetime.timezone.utc)

    def ts(us):
        # exact integer micros — fromtimestamp(us/1e6) would round: float
        # spacing at 1.8e10 seconds is coarser than a microsecond
        return epoch + datetime.timedelta(microseconds=us)

    offs = [-2, -1, 0, 1, 2, width // 2, -width // 3]
    left = spark.createDataFrame(
        [(i, ts(x + o)) for i, o in enumerate(offs)], "lid long, lts timestamp"
    )
    right = spark.createDataFrame(
        [(100 + i, ts(x + o)) for i, o in enumerate(offs)],
        "rid long, rts timestamp",
    )
    got = {
        (r["lid"], r["rid"])
        for r in range_join(
            left, right, "lts", "rts", lower, upper
        ).collect()
    }
    # brute force in exact integer micros (timestamps here are micro-exact)
    lus = {i: x + o for i, o in enumerate(offs)}
    rus = {100 + i: x + o for i, o in enumerate(offs)}
    want = {
        (li, ri)
        for li, lu in lus.items()
        for ri, ru in rus.items()
        if lu + lower <= ru <= lu + upper
    }
    assert got == want and len(want) > 0
