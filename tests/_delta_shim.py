"""Protocol-faithful emulation of the ``delta.tables`` API surface the
ApplyKernel delta plane drives — so the kernel's REAL ``state_format=
"delta"`` code path executes end-to-end in a container where delta-spark
cannot be installed (no package index; the round rules forbid pip).

What this verifies: that ``streaming/apply.py`` drives the DeltaTable
API correctly — the merge condition and update-set expression strings
parse and evaluate under Spark SQL, the insert-all schema aligns by
name, the delete predicate is valid, the overwrite/first-write path
creates a recognizable table, and the whole semantic matrix (last-writer
-wins, tombstones, replay idempotence, barriers, watermark compaction,
resume, bucket-count refusal) converges to the same end state as the
parquet plane. What it cannot verify: delta-spark's own engine — that
lane stays behind the ``needs_delta`` marker for a delta-equipped CI
environment (see COVERAGE.md "Delta state plane").

Emulated subset (exactly what the kernel uses, nothing more):

- ``DeltaTable.isDeltaTable(spark, path)`` / ``DeltaTable.forPath``
- ``table.alias(a).merge(sourceDF.alias(b), cond)
  .whenMatchedUpdate(condition=..., set={...})
  .whenNotMatchedInsertAll().execute()``
- ``table.delete(predicate)`` (SQL-NULL predicate keeps the row, like
  Delta)
- ``df.write.format("delta").partitionBy(...).mode("overwrite")
  .save(path)`` and ``spark.read.format("delta").load(path)`` via
  monkeypatched reader/writer ``format`` (only the "delta" source is
  intercepted)

Faithfulness details carried over from the Delta protocol:

- a MERGE where MULTIPLE source rows match one target row raises (the
  ``DELTA_MULTIPLE_SOURCE_ROW_MATCHING_TARGET_ROW_IN_MERGE`` contract)
  — the kernel's net segments are per-key unique, and this shim keeps
  the same tripwire so a regression in that invariant fails loudly;
- ``whenMatchedUpdate(condition=...)`` with a NULL-valued condition
  updates nothing (three-valued logic, not Python truthiness);
- ``whenNotMatchedInsertAll`` aligns columns BY NAME and requires the
  source to carry every target column;
- storage is partitioned parquet under the table path plus a
  ``_delta_log/<version>.json`` commit marker (schema recorded per
  commit, so an empty table still reads with its schema). Commits stage
  into a sibling dir and swap, so a reader plan built before a commit
  never half-reads it.
"""

from __future__ import annotations

import contextlib
import json
import os
import re
import shutil
import sys
import types

from pyspark.sql import functions as F
from pyspark.sql.types import StructType

_ALIAS_RE = re.compile(r"(\w+)\.")


def _log_dir(path: str) -> str:
    return os.path.join(path, "_delta_log")


def _versions(path: str) -> list[int]:
    if not os.path.isdir(_log_dir(path)):
        return []
    return sorted(
        int(f.split(".")[0])
        for f in os.listdir(_log_dir(path))
        if f.endswith(".json")
    )


def _read_table(spark, path: str):
    vs = _versions(path)
    if not vs:
        raise ValueError(f"{path} is not a (shim) Delta table")
    buckets = [
        d for d in os.listdir(path) if d.startswith("_bucket=")
    ]
    if not buckets:
        with open(os.path.join(_log_dir(path), f"{vs[-1]:020d}.json")) as f:
            schema = StructType.fromJson(json.loads(f.read())["schema"])
        return spark.createDataFrame([], schema)
    return spark.read.option("basePath", path).parquet(
        *[os.path.join(path, b) for b in buckets]
    )


def _commit(df, path: str) -> None:
    """Full-table rewrite + version bump (test-scale simplicity; the
    semantics, not the I/O granularity, are what the shim models)."""
    staged = path.rstrip("/") + ".__shimtxn__"
    if os.path.isdir(staged):
        shutil.rmtree(staged)
    df.write.mode("overwrite").partitionBy("_bucket").parquet(staged)
    os.makedirs(path, exist_ok=True)
    for d in os.listdir(path):
        if d.startswith("_bucket="):
            shutil.rmtree(os.path.join(path, d))
    for d in os.listdir(staged):
        if d.startswith("_bucket="):
            os.rename(os.path.join(staged, d), os.path.join(path, d))
    shutil.rmtree(staged)
    v = (_versions(path) or [-1])[-1] + 1
    os.makedirs(_log_dir(path), exist_ok=True)
    tmp = os.path.join(_log_dir(path), f"{v:020d}.json.tmp")
    with open(tmp, "w") as f:
        json.dump({"schema": df.schema.jsonValue()}, f)
    os.replace(tmp, os.path.join(_log_dir(path), f"{v:020d}.json"))


class _MergeBuilder:
    def __init__(self, table: "DeltaTable", source, condition: str):
        self._table = table
        self._source = source
        self._cond = condition
        self._upd_cond: str | None = None
        self._upd_set: dict | None = None
        self._insert_all = False

    def whenMatchedUpdate(self, condition=None, set=None):  # noqa: A002
        self._upd_set = dict(set or {})
        self._upd_cond = condition
        return self

    def whenNotMatchedInsertAll(self):
        self._insert_all = True
        return self

    def execute(self) -> None:
        spark, path = self._table._spark, self._table._path
        ta = self._table._alias or "t"
        aliases = set(_ALIAS_RE.findall(self._cond))
        others = aliases - {ta}
        if len(others) != 1:
            raise ValueError(
                f"shim merge: cannot infer source alias from {self._cond!r}"
            )
        sa = others.pop()
        base = _read_table(spark, path)
        target_cols = [f.name for f in base.schema.fields]
        tdf = (
            base.withColumn("__t_rid", F.monotonically_increasing_id())
            .withColumn("__t_present", F.lit(True))
            .alias(ta)
        )
        sdf = self._source.withColumn("__s_present", F.lit(True)).alias(sa)
        joined = tdf.join(sdf, F.expr(self._cond), "full_outer")
        tp = F.col("__t_present").isNotNull()
        sp = F.col("__s_present").isNotNull()
        n_dup = (
            joined.filter(tp & sp)
            .groupBy("__t_rid")
            .count()
            .filter(F.col("count") > 1)
            .count()
        )
        if n_dup:
            raise Exception(
                "DELTA_MULTIPLE_SOURCE_ROW_MATCHING_TARGET_ROW_IN_MERGE: "
                f"{n_dup} target rows matched by multiple source rows"
            )
        if self._insert_all:
            missing = [c for c in target_cols if c not in self._source.columns]
            if missing:
                raise ValueError(
                    f"shim merge insertAll: source lacks target columns {missing}"
                )
        upd_cond = (
            F.expr(self._upd_cond)
            if self._upd_cond is not None
            else F.lit(True)
        )
        out = []
        for c in target_cols:
            tcol = F.col(f"{ta}.{c}")
            scol = F.col(f"{sa}.{c}")
            upd = (
                F.expr(self._upd_set[c])
                if self._upd_set and c in self._upd_set
                else tcol
            )
            # NULL update condition = no update (three-valued logic)
            matched = F.when(F.coalesce(upd_cond, F.lit(False)), upd).otherwise(
                tcol
            )
            val = F.when(tp & sp, matched).when(tp, tcol)
            if self._insert_all:
                val = val.otherwise(scol)
            out.append(val.alias(c))
        new = joined.filter(tp | F.lit(self._insert_all)).select(*out)
        _commit(new, path)


class DeltaTable:
    def __init__(self, spark, path: str, alias: str | None = None):
        self._spark = spark
        self._path = path
        self._alias = alias

    @classmethod
    def isDeltaTable(cls, spark, path: str) -> bool:
        return bool(_versions(path))

    @classmethod
    def forPath(cls, spark, path: str) -> "DeltaTable":
        if not cls.isDeltaTable(spark, path):
            raise ValueError(f"{path} is not a (shim) Delta table")
        return cls(spark, path)

    def alias(self, a: str) -> "DeltaTable":
        return DeltaTable(self._spark, self._path, a)

    def toDF(self):
        return _read_table(self._spark, self._path)

    def merge(self, source, condition: str) -> _MergeBuilder:
        return _MergeBuilder(self, source, condition)

    def delete(self, condition: str) -> None:
        df = _read_table(self._spark, self._path)
        # Delta deletes rows where the predicate is TRUE; NULL keeps
        keep = df.filter(~F.coalesce(F.expr(condition), F.lit(False)))
        _commit(keep, self._path)


class _ShimWriter:
    def __init__(self, df):
        self._df = df
        self._mode = "errorifexists"
        self._partition: tuple = ()

    def partitionBy(self, *cols):
        self._partition = tuple(
            c for group in cols for c in (group if isinstance(group, (list, tuple)) else [group])
        )
        return self

    def mode(self, m: str):
        self._mode = m
        return self

    def option(self, *_a, **_k):
        return self

    def save(self, path: str) -> None:
        if self._partition != ("_bucket",):
            raise ValueError(
                f"shim delta writer models partitionBy('_bucket') tables, got {self._partition}"
            )
        if self._mode != "overwrite" and DeltaTable.isDeltaTable(None, path):
            raise ValueError(f"shim delta writer: table exists and mode={self._mode}")
        _commit(self._df, path)


class _ShimReader:
    def __init__(self, spark):
        self._spark = spark

    def option(self, *_a, **_k):
        return self

    def load(self, path: str):
        return _read_table(self._spark, path)


@contextlib.contextmanager
def installed():
    """Install the shim: ``delta``/``delta.tables`` modules in
    sys.modules plus reader/writer ``format("delta")`` interception.
    Restores everything on exit (including a pre-existing real delta
    module, though the caller should not install the shim over one)."""
    import pyspark.sql.readwriter as rw

    fake = types.ModuleType("delta")
    fake_tables = types.ModuleType("delta.tables")
    fake_tables.DeltaTable = DeltaTable
    fake.tables = fake_tables
    saved = {k: sys.modules.get(k) for k in ("delta", "delta.tables")}
    sys.modules["delta"] = fake
    sys.modules["delta.tables"] = fake_tables
    orig_w = rw.DataFrameWriter.format
    orig_r = rw.DataFrameReader.format

    def wformat(self, source):
        if source == "delta":
            return _ShimWriter(self._df)
        return orig_w(self, source)

    def rformat(self, source):
        if source == "delta":
            return _ShimReader(self._spark)
        return orig_r(self, source)

    rw.DataFrameWriter.format = wformat
    rw.DataFrameReader.format = rformat
    try:
        yield
    finally:
        rw.DataFrameWriter.format = orig_w
        rw.DataFrameReader.format = orig_r
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
