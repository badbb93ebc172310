"""Partitioners (P1-P3) — the reference's hash-for-ordered-parallelism layer.

Reference: oplog/hasher.go. The contract is *per-key ordering under
parallelism*: all rows for one table (or one _id) land in the same worker,
in ts order. Spark form: ``repartition(n, key)`` + ``sortWithinPartitions``
— one shuffle establishes both placement and, with the sort, intra-key
order. DDL rows are pinned to partition 0 (hasher.go:37-40) — reproduced by
hashing a constant for DDL rows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def java_string_hash(col: Column) -> Column:
    """The reference's TableHasher uses Java's String.hashCode
    (oplog/hasher.go:141-152: ``h = 31*h + ch`` with signed-32-bit
    wraparound). Pure column expression (codegen, no UDF); the wrap is
    emulated explicitly in BIGINT because Spark's default ANSI mode makes
    a genuine int overflow a runtime error: after each step
    h = pmod(h*31 + c + 2^31, 2^32) - 2^31 keeps h in signed-32 range."""
    two31 = F.lit(2_147_483_648)
    two32 = F.lit(4_294_967_296)
    empty_guard = F.when(
        col.isNull() | (F.length(col) == 0), F.lit(0).cast("bigint")
    )
    wrapped = F.aggregate(
        F.sequence(F.lit(1), F.length(col)),
        F.lit(0).cast("bigint"),
        lambda acc, i: F.pmod(
            acc * F.lit(31) + F.ascii(F.substring(col, i, F.lit(1))) + two31, two32
        )
        - two31,
    )
    return empty_guard.otherwise(wrapped)


def worker_by_ns(df: DataFrame, n: int, ns_col: str = "ns", op_col: str = "op") -> DataFrame:
    """P1 TableHasher (oplog/hasher.go:29-43): worker = hash(ns) % n with
    DDL pinned to worker 0; per-table ordering preserved by the sort."""
    key = F.when(F.col(op_col) == "c", F.lit("")).otherwise(F.col(ns_col))
    out = df.withColumn(
        "worker", F.when(F.col(op_col) == "c", F.lit(0)).otherwise(F.pmod(F.abs(java_string_hash(key)), F.lit(n)))
    )
    return out.repartition(n, "worker").sortWithinPartitions("ts", "id")


def worker_by_id(
    df: DataFrame, n: int, key_col: str = "user_id", ord_col: str = "id"
) -> DataFrame:
    """P2 PrimaryKeyHasher (oplog/hasher.go:54-74): worker = hash(_id) % n
    where _id is the DOCUMENT key (``key_col`` — ``user_id`` in this
    repo's oplog schema), NOT the per-op ordinal: two ops on the same
    document must land on the same worker or they can apply out of order,
    which is the entire point of P2. ``ord_col`` (the unique op ordinal)
    only tie-breaks the intra-partition sort."""
    out = df.withColumn("worker", F.pmod(F.abs(F.hash(F.col(key_col))), F.lit(n)))
    return out.repartition(n, "worker").sortWithinPartitions("ts", ord_col)


def worker_by_whitelist(
    df: DataFrame,
    n: int,
    id_collections: Sequence[str],
    ns_col: str = "ns",
    key_col: str = "user_id",
    ord_col: str = "id",
) -> DataFrame:
    """P3 WhiteListObjectIdHasher (oplog/hasher.go:87-110): listed
    collections hash by the DOCUMENT key (``key_col``), the rest by ns."""
    key = F.when(
        F.col(ns_col).isin(list(id_collections)), F.col(key_col).cast("string")
    ).otherwise(F.col(ns_col))
    out = df.withColumn("worker", F.pmod(F.abs(F.hash(key)), F.lit(n)))
    return out.repartition(n, "worker").sortWithinPartitions("ts", ord_col)
