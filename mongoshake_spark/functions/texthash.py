"""Deterministic, dialect-portable hashing primitives.

The reference computes ad-hoc per-value signatures for collision detection
(executor/collision_matrix.go:167-222 calculateSignature). For our dedup /
fingerprint operators we need hashes that (a) run JVM-side in whole-stage
codegen (no Python), and (b) are *bit-identical* in DuckDB so the oracle
can verify results value-for-value. A 31-base polynomial rolling hash mod
(1e9+7) over the character codes satisfies both: in Spark it is an
``aggregate`` higher-order function; in DuckDB a ``list_reduce``.

For production-scale fingerprinting where oracle parity is not needed,
``xxhash64`` (Spark built-in, 64-bit, far better mixing) is the right
choice — the dedup operators take the hash expression as a parameter.
"""

from __future__ import annotations

MOD = 1_000_000_007


def poly_hash_spark(col: str) -> str:
    """Spark SQL expression: polynomial hash of a string column.
    Empty/null strings hash to 0 (guard needed: Spark's sequence(1,0)
    produces a DESCENDING sequence, not an empty one)."""
    return (
        f"CASE WHEN {col} IS NULL OR length({col}) = 0 THEN CAST(0 AS BIGINT) "
        f"ELSE aggregate(sequence(1, length({col})), CAST(0 AS BIGINT), "
        f"(acc, i) -> (acc * 31 + ascii(substring({col}, i, 1))) % {MOD}) END"
    )


def poly_hash_duckdb(col: str) -> str:
    """DuckDB expression computing the identical value."""
    return (
        f"CASE WHEN {col} IS NULL OR length({col}) = 0 THEN CAST(0 AS BIGINT) "
        f"ELSE list_reduce([CAST(0 AS BIGINT)] || "
        f"list_transform(range(1, length({col}) + 1), i -> ascii({col}[i:i])), "
        f"(acc, x) -> (acc * 31 + x) % {MOD}) END"
    )
