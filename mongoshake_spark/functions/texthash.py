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


def poly_hash_numpy(strings) -> "np.ndarray":
    """Vectorized batch form of the SAME hash: one int64 per input
    string, bit-identical to :func:`poly_hash_spark` / the per-char
    Python fold. Used inside Arrow-batched UDFs (minhash/simhash
    signatures) where a per-character Python loop is the throughput
    ceiling: the fold runs column-by-column over a padded codepoint
    matrix — O(max_len) numpy passes over the batch instead of
    O(total_chars) Python bytecodes, measured ~20x per core.

    Intermediates stay in int64: h < MOD < 2^30, so h*31 + c < 2^36.
    Codepoints come from a UTF-32-LE view, matching ``ord`` (and
    Spark/DuckDB ``ascii``) for non-ASCII text."""
    import numpy as np

    n = len(strings)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    lens = np.fromiter((len(s) for s in strings), dtype=np.int64, count=n)
    total = int(lens.sum())
    if total == 0:
        return np.zeros(n, dtype=np.int64)
    codes = np.frombuffer(
        "".join(strings).encode("utf-32-le"), dtype=np.uint32
    ).astype(np.int64)
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    h = np.zeros(n, dtype=np.int64)
    max_len = int(lens.max())
    for j in range(max_len):
        active = lens > j
        idx = starts[active] + j
        h[active] = (h[active] * 31 + codes[idx]) % MOD
    return h
