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
) -> DataFrame:
    """One row per divergent key: ``(op, key_col, *payload_cols)`` with
    op in ``('i', 'u', 'd')``; payload columns are NULL for deletes.
    Empty when in sync — repairing an in-sync pair is a no-op."""
    if payload_cols is None:
        payload_cols = [c for c in src.columns if c != key_col]
    diffs = verify_sync(src, dst, key_col, sig_cols, n_buckets=n_buckets)
    op = (
        F.when(F.col("status") == "missing_in_dst", F.lit("i"))
        .when(F.col("status") == "differs", F.lit("u"))
        .otherwise(F.lit("d"))
    )
    plan = diffs.select(op.alias("op"), F.col(key_col))
    payload = src.select(key_col, *payload_cols)
    return (
        plan.join(payload, key_col, "left")
        .select(
            "op",
            key_col,
            *[
                F.when(F.col("op") != "d", F.col(c)).alias(c)
                for c in payload_cols
            ],
        )
    )


def apply_repair(dst: DataFrame, ops: DataFrame, key_col: str) -> DataFrame:
    """Heal the target: drop every key the plan touches (deletes AND
    updates), then union in the insert/update payloads. Idempotent —
    applying the same plan twice leaves the same result."""
    touched = ops.select(key_col)
    replacements = ops.filter(F.col("op") != "d").select(*dst.columns)
    return dst.join(touched, key_col, "left_anti").unionByName(replacements)
