"""Repair plane: turn a verification diff into the minimal op-set that
heals the target, and apply it.

The reference leaves a diverged target to a full re-sync (comparison.py
reports; the fix is re-running the snapshot). At 100 TB that's the wrong
unit of work: the two-phase verifier (plans/verify) already names the
divergent KEYS, so the repair is `|diff|` rows, not `|table|`:

- ``repair_ops``: classify each divergent key into the CDC op that heals
  it — ``i`` (missing_in_dst: insert the source row), ``u`` (differs:
  overwrite with the source row), ``d`` (missing_in_src: delete the
  stray target row) — carrying the source payload for i/u. The output is
  oplog-shaped on purpose: it can feed the SAME idempotent apply path as
  live replication (operators/merge), so repair is replay, not a special
  code path.
- ``apply_repair``: the batch application — delete the ``d``/``u`` keys
  from the target, then union in the ``i``/``u`` payloads.

Scale shape: ``repair_ops`` inherits the verifier's pruning (phase 2
touches only diverged buckets); the join fetching payloads is
key-on-key against the diff set, which is diff-sized — broadcast under
AQE when small, an ordinary hash join when a disaster made it big.
``apply_repair`` is one anti-join + one union.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mongoshake_spark.plans.verify import verify_sync


def repair_ops(
    src: DataFrame,
    dst: DataFrame,
    key_col: str,
    sig_cols: list[Column | str],
    payload_cols: list[str] | None = None,
    n_buckets: int = 1024,
    diffs: DataFrame | None = None,
) -> DataFrame:
    """One row per divergent key: ``(op, key_col, *payload_cols)`` with
    op in ``('i', 'u', 'd')``; payload columns are NULL for deletes.
    Empty when in sync — repairing an in-sync pair is a no-op. NULL-key
    divergence heals as a group rebuild (one NULL-key 'd' + an 'i' per
    NULL-key source row). Pass ``diffs`` (a ``verify_sync`` result) to
    reuse an already-computed diff instead of re-verifying — the CLI
    does, halving the dominant cost of a repair run."""
    if payload_cols is None:
        payload_cols = [c for c in src.columns if c != key_col]
    if diffs is None:
        diffs = verify_sync(src, dst, key_col, sig_cols, n_buckets=n_buckets)
    else:
        diffs = diffs.select(key_col, "status")
    op = (
        F.when(F.col("status") == "missing_in_dst", F.lit("i"))
        .when(F.col("status") == "differs", F.lit("u"))
        .otherwise(F.lit("d"))
    )
    # NULL-key divergence (which verify_sync deliberately reports, at
    # group granularity) cannot repair through a key join — every key
    # equality below is null-rejecting by design. The healing op for the
    # NULL-key GROUP is a rebuild: delete all NULL-key target rows, then
    # insert every NULL-key source row; apply_repair's null-safe anti
    # join makes the single 'd' marker remove the whole group.
    nonnull = diffs.filter(F.col(key_col).isNotNull())
    plan = nonnull.select(op.alias("op"), F.col(key_col))
    payload = src.select(key_col, *payload_cols)
    ops = plan.join(payload, key_col, "left").select(
        "op",
        key_col,
        *[F.when(F.col("op") != "d", F.col(c)).alias(c) for c in payload_cols],
    )
    null_diverged = diffs.filter(F.col(key_col).isNull()).limit(1)
    null_delete = null_diverged.select(
        F.lit("d").alias("op"),
        F.col(key_col),
        *[F.lit(None).cast(dict(src.dtypes)[c]).alias(c) for c in payload_cols],
    )
    null_inserts = (
        src.filter(F.col(key_col).isNull())
        .join(null_diverged.select(key_col), F.lit(True), "left_semi")
        .select(F.lit("i").alias("op"), key_col, *payload_cols)
    )
    return ops.unionByName(null_delete).unionByName(null_inserts)


def apply_repair(dst: DataFrame, ops: DataFrame, key_col: str) -> DataFrame:
    """Heal the target: drop every key the plan touches (deletes AND
    updates), then union in the insert/update payloads. Idempotent —
    applying the same plan twice leaves the same result. The anti join is
    NULL-SAFE, so a NULL-key 'd' marker removes the whole NULL-key group
    (the group-rebuild contract of ``repair_ops``)."""
    touched = ops.select(F.col(key_col).alias("_touched_key"))
    replacements = ops.filter(F.col("op") != "d").select(*dst.columns)
    return (
        dst.join(
            touched, F.col(key_col).eqNullSafe(F.col("_touched_key")), "left_anti"
        ).unionByName(replacements)
    )


# ---------------------------------------------------------------------------
# Multiset (keyless-table) form — shared by the CLI verify and repair arms
# ---------------------------------------------------------------------------

#: NULL marker distinct from every real string rendering (coalescing NULL
#: to '' would merge a NULL-valued group with an empty-string-valued one
#: into a single content key — not a hash collision, a rendering defect)
_NULL_MARK = "\x00N"


def _render_content(cols: list[str]):
    return F.concat_ws(
        "\x1f",
        *[
            F.when(F.col(c).isNull(), F.lit(_NULL_MARK)).otherwise(
                F.col(c).cast("string")
            )
            for c in cols
        ],
    )


def multiset_form(df: DataFrame) -> DataFrame:
    """Canonical form of a KEYLESS table: one row per distinct content
    with its multiplicity (``_mult``) and a numeric content key
    (``_vkey``). The rendering runs over NAME-SORTED columns, so two
    physically different column orders of the same table produce
    identical keys; NULLs render with a reserved marker so NULL and ''
    are distinct groups. ``_vkey`` is unique per group by construction
    up to xxhash64 collisions (~2^-64 per pair — the accepted residual
    of any content-addressed diff)."""
    return (
        df.groupBy(*df.columns)
        .agg(F.count("*").alias("_mult"))
        .withColumn("_vkey", F.xxhash64(_render_content(sorted(df.columns))))
    )


def apply_multiset_repair(target: DataFrame, ops: DataFrame) -> DataFrame:
    """Apply a multiset plan: drop every target row whose content key is
    touched, then rebuild each surviving op's content exactly ``_mult``
    times. Hashing uses the same name-sorted rendering as
    ``multiset_form``, so target column order is irrelevant."""
    content = [c for c in ops.columns if c not in ("op", "_vkey", "_mult")]
    kept = (
        target.withColumn("_vkey", F.xxhash64(_render_content(sorted(content))))
        .join(ops.select("_vkey"), "_vkey", "left_anti")
        .drop("_vkey")
    )
    inserts = (
        ops.filter(F.col("op") != "d")
        .withColumn("_i", F.explode(F.sequence(F.lit(1), F.col("_mult"))))
        .select(*content)
    )
    return kept.unionByName(inserts)
