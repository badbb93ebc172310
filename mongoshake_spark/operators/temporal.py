"""Temporal operators: as-of (latest-state) join and gap sessionization.

The reference engine has no join surface at all (SURVEY §2.7 — MongoShake
computes only operational aggregates), but both of these are staples of
the event/CDC analytics its replicated data feeds, and of training-data
telemetry pipelines (attach the most recent config/marker to every event;
cut user activity into sessions for dataset curation):

- ``asof_join``: for every left row, the newest right row with the same
  key and ``right.ts <= left.ts`` — the temporal enrichment join Spark
  lacks as a builtin (DuckDB spells it ASOF JOIN, which is exactly what
  the oracle uses).
- ``session_ids``: gap-based session numbering per key — consecutive
  events more than ``gap`` apart start a new session.
- ``range_join``: pair left rows with right rows whose timestamp falls
  in a bounded window around the left timestamp — bucketized into an
  EQUI-join so Spark never plans the O(n·m) broadcast-nested-loop a
  naive ``BETWEEN`` theta join produces.

Scale shape (both): ONE hash shuffle on the key, then per-key ordered
windows — never a partition-less global window. The unit of parallelism
is the key; a single pathologically hot key serializes onto one task
(same caveat and same mitigation as any keyed window: pre-split such
keys upstream if they exist — user/entity keys are naturally
high-cardinality).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    ts_col: str,
    value_cols: list[str],
    out_prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: every ``left`` row gains ``<out_prefix><c>`` for
    each ``c`` in ``value_cols``, taken from the newest ``right`` row with
    equal ``on`` keys and ``right.ts_col <= left.ts_col`` (inclusive);
    NULL when no such row exists.

    REQUIRES the right side unique per ``(on, ts_col)`` — pre-aggregate
    otherwise (ties within one timestamp have no defined "newest").

    Implementation is the union-tag form, not a join: right rows carry
    their values inside ONE non-null struct, left rows carry a NULL
    struct, and one per-key ordered window (``last(struct, ignorenulls)``
    over rows-unbounded-preceding, right sorted BEFORE left at equal
    timestamps so same-instant state is visible) fills each left row from
    the latest right ROW at-or-before it. The struct carrier matters:
    ``ignorenulls`` must skip only the left rows' placeholders — a
    genuinely NULL VALUE in the newest right row is still that row's
    answer (DuckDB ASOF JOIN semantics), and with several value columns
    all outputs come from the SAME right row, never mixed across rows.
    One shuffle on the key; no row explosion, no range join — the window
    pass is O(n log n) per key versus the O(n·m) theta join a naive
    ``l.ts >= r.ts`` spells.
    """
    on = [on] if isinstance(on, str) else list(on)
    left_only = [c for c in left.columns if c not in on and c != ts_col]
    # internal/output name collisions would silently overwrite caller data
    # (the operators/prefix.running_total precedent): fail loudly instead
    clash = (
        {"_side", "_vrow", "_fill"} | {f"{out_prefix}{c}" for c in value_cols}
    ) & set(left.columns)
    if clash:
        raise ValueError(f"asof_join: left columns collide with internals: {clash}")
    ltypes = dict(left.dtypes)
    ru = right.select(
        *on,
        ts_col,
        *[F.lit(None).cast(ltypes[c]).alias(c) for c in left_only],
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in value_cols]).alias("_vrow"),
    )
    # cast via the DataType OBJECT — a DDL string would embed the value
    # column NAMES, which fails to parse for any non-bare-identifier name
    lu = left.select(
        *on,
        ts_col,
        *left_only,
        F.lit(1).alias("_side"),
        F.lit(None).cast(ru.schema["_vrow"].dataType).alias("_vrow"),
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = lu.unionByName(ru).withColumn(
        "_fill", F.last("_vrow", ignorenulls=True).over(w)
    )
    return filled.filter(F.col("_side") == 1).select(
        *on,
        ts_col,
        *left_only,
        *[F.col("_fill")[c].alias(f"{out_prefix}{c}") for c in value_cols],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    lower_us: int,
    upper_us: int,
    on: list[str] | str | None = None,
) -> DataFrame:
    """Bounded interval join: every pair ``(l, r)`` with equal ``on`` keys
    and ``l.left_ts + lower_us <= r.right_ts <= l.left_ts + upper_us``
    (bounds inclusive, compared in integer microseconds — exact, never
    float-epsilon). Returns left columns + right columns; name collisions
    are the caller's to resolve (select/alias first).

    Spark has no interval-join operator: the naive spelling (equality key
    + two ``BETWEEN`` inequalities) plans a SortMergeJoin whose range
    residual runs per equal-key group — O(n·m) per key — and with no
    equality key at all it degenerates to BroadcastNestedLoopJoin over
    the whole input. This implementation buckets time into spans of
    ``width = upper_us - lower_us + 1`` microseconds: a right row lives
    in exactly ONE bucket, a left row's admissible window overlaps AT
    MOST TWO consecutive buckets, so exploding the left side into its
    (deduplicated) candidate bucket ids turns the whole join into a hash
    EQUI-join on ``(on..., bucket)`` with the exact range predicate as a
    residual. Each matching pair appears exactly once (the right row's
    bucket is unique), cost is one shuffle of ≤2× the left rows, and the
    unit of parallelism is the bucket — time-uniform streams spread
    evenly regardless of key skew.
    """
    if upper_us < lower_us:
        raise ValueError("range_join: upper_us < lower_us")
    on = [] if on is None else [on] if isinstance(on, str) else list(on)
    internals = {"_bkt", "_r_bkt", "_lus", "_rus"} | {f"_r_{k}" for k in on}
    clash = internals & (set(left.columns) | set(right.columns))
    if clash:
        raise ValueError(f"range_join: columns collide with internals: {clash}")
    width = int(upper_us - lower_us) + 1
    # Bucket ids use exact integer floor division: subtract the
    # non-negative pmod remainder (making the operand an exact multiple
    # of width) and divide with the integral `div` operator.
    # `F.floor(x / w)` goes through double division, which can misround
    # at a bucket boundary once |x| approaches 2^53 — epoch micros
    # multiplied against wide windows get there.
    lus = F.unix_micros(F.col(left_ts).cast("timestamp"))
    rus = F.unix_micros(F.col(right_ts).cast("timestamp"))
    lx = left.withColumn("_lus", lus).withColumn(
        "_bkt",
        F.explode(
            F.array_distinct(
                F.array(
                    F.expr(
                        f"(_lus + {int(lower_us)}L - pmod(_lus + "
                        f"{int(lower_us)}L, {width}L)) div {width}L"
                    ),
                    F.expr(
                        f"(_lus + {int(upper_us)}L - pmod(_lus + "
                        f"{int(upper_us)}L, {width}L)) div {width}L"
                    ),
                )
            )
        ),
    )
    rx = right.withColumn("_rus", rus).withColumn(
        "_r_bkt",
        F.expr(f"(_rus - pmod(_rus, {width}L)) div {width}L"),
    )
    # the right side's equality keys are renamed apart (`_r_<k>`): both
    # sides often derive from the same base frame, and `lx[k] == rx[k]`
    # then resolves to the SAME attribute — Spark warns "trivially true
    # equals predicate" even though scoped resolution keeps it correct;
    # distinct names make the join keys unambiguous in the plan
    for k in on:
        rx = rx.withColumnRenamed(k, f"_r_{k}")
    cond = [lx["_bkt"] == rx["_r_bkt"]] + [
        lx[k] == rx[f"_r_{k}"] for k in on
    ]
    return (
        lx.join(rx, cond, "inner")
        .filter(
            (rx["_rus"] >= lx["_lus"] + F.lit(int(lower_us)))
            & (rx["_rus"] <= lx["_lus"] + F.lit(int(upper_us)))
        )
        .drop("_bkt", "_r_bkt", "_lus", "_rus", *[f"_r_{k}" for k in on])
    )


def session_ids(
    df: DataFrame,
    on: list[str] | str,
    ts_col: str,
    gap_seconds: int,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Gap sessionization: adds ``session_no`` (1-based per key) — a new
    session starts whenever the previous event of the same key is more
    than ``gap_seconds`` older. The comparison is on integer microseconds
    (``unix_micros``), so an engine replaying it (the oracle's
    ``epoch_us``) is exact, never float-epsilon.

    ``tiebreak_col`` makes the per-key order total when timestamps can
    collide (recommended: the event id).
    """
    on = [on] if isinstance(on, str) else list(on)
    if "session_no" in df.columns:
        raise ValueError("session_ids: input already has a session_no column")
    order = [F.col(ts_col).asc()] + (
        [F.col(tiebreak_col).asc()] if tiebreak_col else []
    )
    w = Window.partitionBy(*on).orderBy(*order)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # cast first: parquet TIMESTAMP(isAdjustedToUTC=false) loads as
    # TIMESTAMP_NTZ, which unix_micros rejects; the cast is lossless
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev = F.lag(us).over(w)
    new_session = (
        prev.isNull() | ((us - prev) > int(gap_seconds) * 1_000_000)
    ).cast("int")
    return df.withColumn(
        "session_no", F.sum(new_session).over(run).cast("bigint")
    )
