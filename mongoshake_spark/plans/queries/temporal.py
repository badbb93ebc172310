"""Registry domain: temporal (split from plans/queries.py; registration order preserved within the file)."""

from __future__ import annotations

from mongoshake_spark.plans.queries._shared import (  # noqa: F401
    F,
    _q,
    load_table,
)



@_q(
    "asof_enrich",
    """WITH r AS (
  SELECT user_id, ts, max(value) AS value
  FROM events WHERE event_id % 10 = 0
  GROUP BY user_id, ts)
SELECT l.event_id, l.user_id, round(r.value, 6) AS asof_value
FROM events l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
ORDER BY l.event_id""",
    "As-of (latest-state) enrichment join: every event gains the value "
    "of the newest marker event (event_id % 10 = 0) for the same user at "
    "or before its timestamp — DuckDB spells the oracle with its native "
    "ASOF JOIN. The Spark side is the union-tag window form: ONE shuffle "
    "on the key and a per-key ordered window, O(n log n) per key versus "
    "the O(n*m) theta join a naive l.ts >= r.ts would plan "
    "(operators/temporal.asof_join).",
)
def asof_enrich_q(spark, sf_dir):
    from mongoshake_spark.operators.temporal import asof_join

    ev = load_table(spark, sf_dir, "events")
    left = ev.select("event_id", "user_id", "ts")
    right = (
        ev.filter(F.col("event_id") % 10 == 0)
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("value"))
    )
    out = asof_join(left, right, on="user_id", ts_col="ts", value_cols=["value"])
    return out.select(
        "event_id", "user_id", F.round("asof_value", 6).alias("asof_value")
    ).orderBy("event_id")


@_q(
    "session_windows",
    """WITH o AS (
  SELECT user_id, event_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events),
s AS (
  SELECT user_id, event_id, ts,
         sum(CASE WHEN prev IS NULL
                    OR epoch_us(ts) - epoch_us(prev) > CAST(43200 AS BIGINT) * 1000000
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS session_no
  FROM o)
SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
       count(*) AS n_events,
       min(event_id) AS first_event, max(event_id) AS last_event
FROM s GROUP BY 1, 2 ORDER BY 1, 2""",
    "Gap sessionization (12-hour gap): per-user session numbering via "
    "lag + running sum over a PER-KEY window (never partition-less), gap "
    "compared in integer microseconds so the oracle replay is exact; "
    "then one aggregate per session (operators/temporal.session_ids).",
)
def session_windows_q(spark, sf_dir):
    from mongoshake_spark.operators.temporal import session_ids

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    s = session_ids(ev, on="user_id", ts_col="ts", gap_seconds=43200,
                    tiebreak_col="event_id")
    return (
        s.groupBy("user_id", "session_no")
        .agg(
            F.count("*").alias("n_events"),
            F.min("event_id").alias("first_event"),
            F.max("event_id").alias("last_event"),
        )
        .orderBy("user_id", "session_no")
    )


@_q(
    "zorder_layout",
    """WITH m AS (
  SELECT event_id, event_id % 65536 AS x, user_id % 65536 AS y FROM events),
s1 AS (SELECT event_id,
  ((x | (x << 8)) & 16711935) AS x, ((y | (y << 8)) & 16711935) AS y FROM m),
s2 AS (SELECT event_id,
  ((x | (x << 4)) & 252645135) AS x, ((y | (y << 4)) & 252645135) AS y FROM s1),
s3 AS (SELECT event_id,
  ((x | (x << 2)) & 858993459) AS x, ((y | (y << 2)) & 858993459) AS y FROM s2),
s4 AS (SELECT event_id,
  ((x | (x << 1)) & 1431655765) AS x, ((y | (y << 1)) & 1431655765) AS y FROM s3)
SELECT event_id, CAST(x | (y << 1) AS BIGINT) AS zval
FROM s4 ORDER BY event_id""",
    "Z-order (Morton) layout key: bit-interleave of two 16-bit keys via "
    "the magic-mask dilation — pure JVM integer expressions, exact in "
    "any 64-bit engine. Rows sorted by zval cluster on BOTH dimensions, "
    "so per-file min/max stats prune scans filtered on either column "
    "(the multi-column data-skipping a single-column sort cannot give); "
    "write_zordered materializes the layout with range-disjoint Z per "
    "file (plans/bucketing.zorder_key, write_zordered).",
)
def zorder_layout_q(spark, sf_dir):
    from mongoshake_spark.plans.bucketing import zorder_key

    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        zorder_key(F.col("event_id") % 65536, F.col("user_id") % 65536)
        .cast("bigint")
        .alias("zval"),
    ).orderBy("event_id")


@_q(
    "session_window_agg",
    """WITH o AS (
  SELECT user_id, event_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events),
s AS (
  SELECT user_id, event_id, ts,
         sum(CASE WHEN prev IS NULL
                    OR epoch_us(ts) - epoch_us(prev) >= CAST(43200 AS BIGINT) * 1000000
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS session_no
  FROM o)
SELECT user_id, min(ts) AS session_start,
       max(ts) + INTERVAL 12 HOUR AS session_end,
       count(*) AS n_events
FROM s GROUP BY user_id, session_no ORDER BY user_id, session_start""",
    "Spark's BUILT-IN session_window aggregation cross-validated against "
    "the lag+running-sum session model: window start = first event, end "
    "= last event + gap, one row per merged session. Note the builtin "
    "merges windows that OVERLAP (strict-less gap), so the oracle splits "
    "on >= gap where session_ids splits on > gap — both conventions "
    "oracle-pinned, one query each (streaming form: the same expression "
    "under withWatermark in streaming/windows.py).",
)
def session_window_agg_q(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window(F.col("ts").cast("timestamp"), "12 hours"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )


@_q(
    "interval_join",
    """SELECT l.event_id AS anchor_id, count(*) AS n_follow,
       CAST(sum(r.event_id) AS BIGINT) AS follow_id_sum,
       round(sum(r.value), 6) AS follow_value_sum
FROM events l JOIN events r ON l.user_id = r.user_id
  AND r.ts > l.ts AND r.ts <= l.ts + INTERVAL 1 HOUR
WHERE l.event_type = 'signup'
GROUP BY 1 ORDER BY 1""",
    "Bounded interval join: for every signup, the same-user events in "
    "the following hour (strict lower bound — integer-microsecond "
    "compare). The naive BETWEEN spelling runs the range residual "
    "per equal-key group, O(n*m) on hot keys; operators/temporal."
    "range_join buckets time into window-width spans (a right row lives "
    "in ONE bucket, a left window overlaps at most two), so the plan is "
    "a hash EQUI-join on (key, bucket) with the exact range as residual "
    "— one shuffle of <=2x the left rows, parallelism by time bucket.",
)
def interval_join_q(spark, sf_dir):
    from mongoshake_spark.operators.temporal import range_join

    ev = load_table(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("anchor_id"), "user_id", F.col("ts").alias("l_ts")
    )
    right = ev.select(
        F.col("event_id").alias("r_id"),
        "user_id",
        F.col("ts").alias("r_ts"),
        "value",
    )
    pairs = range_join(left, right, "l_ts", "r_ts", 1, 3_600_000_000, on="user_id")
    return (
        pairs.groupBy("anchor_id")
        .agg(
            F.count("*").alias("n_follow"),
            F.sum("r_id").alias("follow_id_sum"),
            F.round(F.sum("value"), 6).alias("follow_value_sum"),
        )
        .orderBy("anchor_id")
    )
