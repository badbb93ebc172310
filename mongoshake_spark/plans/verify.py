"""Post-sync data verification — the engine analog of the reference's
``scripts/comparison.py`` (the tool MongoShake users run after every
migration: database/collection counts, per-collection record counts, and
per-document comparison in ``all``/``sample``/``no`` modes).

The reference tool compares documents by looping ``$sample`` batches on
the source and issuing a ``find_one(_id)`` round trip per document
(comparison.py:148-180) — O(N) driver-side lookups, unusable at 100 TB.
The Spark-first re-expression is a TWO-PHASE bucketed comparison:

1. **Bucket summaries** (one aggregation per side, map-side partial
   combine): per hash bucket of the key, ``(row count, sum of row
   signatures)``. The summary table is ``n_buckets`` rows — metadata —
   regardless of data size; a full outer join of the two summaries names
   every diverged bucket.
2. **Key-level diff, only inside diverged buckets**: both sides filter to
   the mismatched buckets (an ``isin`` on the tiny bucket list — for an
   in-sync corpus this prunes EVERYTHING and phase 2 touches zero rows),
   then a full outer join on the key classifies each divergent key as
   ``missing_in_dst`` / ``missing_in_src`` / ``differs``.

Everything is dialect-portable so a DuckDB oracle can replay it exactly:
buckets come from the Knuth multiplicative hash (functions/packing), row
signatures from the polynomial text hash (functions/texthash) over a
canonicalized column rendering; sums are exact integer arithmetic.

``sample`` mode is the deterministic ``u(key) < rate`` subset on BOTH
sides (same Knuth hash as functions/packing.sample_strata), so a sampled
verification is reproducible and its verdict is a strict subset of the
full run's — no ``$sample`` randomness.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mongoshake_spark.functions.packing import HASH_MOD, knuth_u32
from mongoshake_spark.functions.texthash import poly_hash_spark

#: unit separator — cannot occur in the fixture values; keeps ("ab","c")
#: and ("a","bc") from rendering identically
_SEP = "\x1f"


def row_signature(cols: list[Column | str]) -> Column:
    """Portable row signature: the polynomial hash of the canonical
    ``\\x1f``-joined rendering of the given columns. Callers canonicalize
    lossy types FIRST (e.g. doubles to integer cents) — raw float-to-string
    rendering differs between engines and is not part of the contract.

    Each column is null-coalesced to '' BEFORE joining: ``concat_ws``
    silently DROPS null arguments together with their separator, so
    ``('a', NULL, 'b')`` and ``('a', 'b', NULL)`` would otherwise render
    identically and a value sliding between columns would go undetected.
    With the coalesce, separators are always present and only the
    NULL-vs-empty-string flip within one column remains blind — the same
    blind spot the reference tool's dict equality has for missing-vs-null
    fields."""
    rendered = F.concat_ws(
        _SEP,
        *[
            F.coalesce(F.col(c) if isinstance(c, str) else c, F.lit(""))
            for c in cols
        ],
    )
    # bind the rendering once (transforms.bind_command_map pattern): the
    # polynomial fold references its input per character position
    return F.get(F.transform(F.array(rendered), _poly_of), F.lit(0))


def _poly_of(col: Column) -> Column:
    """poly_hash of an arbitrary (lambda-bound) string column — the
    Column form of texthash.poly_hash_spark, which is string-templated on
    a column NAME and cannot take a lambda variable. Identical integers."""
    from mongoshake_spark.functions.texthash import MOD

    agg = F.aggregate(
        F.sequence(F.lit(1), F.length(col)),
        F.lit(0).cast("bigint"),
        lambda acc, i: (acc * 31 + F.ascii(F.substring(col, i, F.lit(1)))) % F.lit(MOD),
    )
    return F.when(col.isNull() | (F.length(col) == 0), F.lit(0).cast("bigint")).otherwise(agg)


def bucket_of(key_col: Column | str, n_buckets: int) -> Column:
    """Portable bucket id: ``knuth_u32(key) % n_buckets`` — reproducible
    in any engine with 64-bit integers (no engine-private hash).

    NULL keys hash to the reserved bucket ``-1`` rather than propagating
    NULL: a NULL bucket id silently drops the row from BOTH phases (the
    full-outer summary join never matches a NULL bucket, and the phase-2
    semi-join's ``_b == bucket`` is null-rejecting too), so a dst-side
    mutation of a NULL-key row would report in_sync — the one failure
    mode a verifier must not have."""
    return F.coalesce(
        (knuth_u32(key_col) % F.lit(int(n_buckets))).cast("int"), F.lit(-1)
    )


def bucket_summary(
    df: DataFrame, key_col: str, sig: Column, n_buckets: int = 1024
) -> DataFrame:
    """Phase 1: ``(bucket, cnt, sig_sum, sig_sq_sum)`` per bucket.

    TWO moments, not one: the polynomial hash is LINEAR in character
    values, so two same-length rows swapping payloads at aligned
    positions change their individual hashes while leaving the plain sum
    exactly unchanged (h_a + h_b is preserved) — a first-moment-only
    summary provably misses that divergence (pinned by
    tests/test_verify.py::test_payload_swap_within_bucket_is_detected).
    Adding ``sum(h^2 mod M)`` breaks the cancellation: equal sums with an
    unequal multiset cannot also match on squares unless the hash pairs
    coincide. Each addend < 1e9+7, so BIGINT overflow needs ~9e9 rows in
    ONE bucket — size ``n_buckets`` accordingly, the same sizing exercise
    as any aggregate."""
    from mongoshake_spark.functions.texthash import MOD

    return (
        df.select(bucket_of(key_col, n_buckets).alias("bucket"), sig.alias("_sig"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("cnt"),
            F.sum("_sig").alias("sig_sum"),
            F.sum((F.col("_sig") * F.col("_sig")) % F.lit(MOD)).alias("sig_sq_sum"),
        )
    )


def diverged_buckets(
    src: DataFrame, dst: DataFrame, key_col: str, sig: Column, n_buckets: int = 1024
) -> DataFrame:
    """Buckets whose (count, signature-sum) differ between the two sides:
    ``(bucket, src_cnt, dst_cnt, src_sum, dst_sum)``. Empty = in sync
    (up to the signature's collision bound)."""
    a = bucket_summary(src, key_col, sig, n_buckets)
    b = bucket_summary(dst, key_col, sig, n_buckets)
    sa = a.select(
        "bucket",
        F.col("cnt").alias("src_cnt"),
        F.col("sig_sum").alias("src_sum"),
        F.col("sig_sq_sum").alias("src_sq"),
    )
    sb = b.select(
        "bucket",
        F.col("cnt").alias("dst_cnt"),
        F.col("sig_sum").alias("dst_sum"),
        F.col("sig_sq_sum").alias("dst_sq"),
    )
    joined = sa.join(sb, "bucket", "full_outer").select(
        "bucket",
        *[
            F.coalesce(c, F.lit(0)).alias(c)
            for c in ("src_cnt", "dst_cnt", "src_sum", "dst_sum", "src_sq", "dst_sq")
        ],
    )
    return joined.filter(
        (F.col("src_cnt") != F.col("dst_cnt"))
        | (F.col("src_sum") != F.col("dst_sum"))
        | (F.col("src_sq") != F.col("dst_sq"))
    )


def verify_sync(
    src: DataFrame,
    dst: DataFrame,
    key_col: str,
    sig_cols: list[Column | str],
    n_buckets: int = 1024,
    sample_num: int | None = None,
    sample_den: int = 1,
    attribute_columns: bool = False,
    sig_col_names: list[str] | None = None,
) -> DataFrame:
    """The full two-phase comparison (module doc): returns one row per
    DIVERGENT key — ``(key_col, status)`` with status in
    ``('missing_in_dst', 'missing_in_src', 'differs')`` — empty when in
    sync. ``sample_num/sample_den`` enable the deterministic sample mode:
    only keys with ``u32(key) * den < num * 2^32`` are verified (both
    sides apply the identical cut, so sampling can never fabricate a
    missing-row diff).

    ``attribute_columns=True`` adds ``diff_cols`` — for ``differs`` rows,
    the NAMES of the signature columns whose values disagree (NULL for
    missing rows); the fix-up tool then knows what to patch without a
    second pass. Per-column signatures are computed ONLY in phase 2, on
    rows already pruned to the diverged buckets, so an in-sync corpus
    pays nothing for the attribution. Names come from ``sig_col_names``
    when given, else the string entries of ``sig_cols`` (Column entries
    fall back to ``col_<i>``).

    Scale shape: phase 1 is two aggregates + a bucket-count-sized join;
    phase 2 filters both sides to the diverged buckets — broadcast of a
    metadata-sized bucket list, pruning everything when in sync — and
    joins only those rows on the key. The reference tool's per-document
    ``find_one`` loop (comparison.py:166-171) is exactly what this
    replaces.

    NULL keys are verified, not skipped: they hash to the reserved bucket
    -1 (phase 1) and are paired null-safely in phase 2. Several NULL-key
    rows on a side compare as one cross-paired group — a payload change
    among them reports ``differs`` rows rather than a precise per-row
    attribution (there is no key to attribute BY).

    The key column is prepended to the signature rendering: a bucket's
    ``sig_sum`` is permutation-invariant, so WITHOUT the key two rows
    swapping their payloads between keys of the same bucket would leave
    the summary unchanged and phase 1 would miss the divergence; keyed
    signatures make every such swap visible."""
    sig = row_signature([F.col(key_col).cast("string"), *sig_cols])
    if sample_num is not None:
        # coalesce the hash so NULL keys are ALWAYS in the sample (a NULL
        # predicate would silently exclude them from a sampled run)
        cut = (
            F.coalesce(knuth_u32(key_col), F.lit(0)) * F.lit(int(sample_den))
            < F.lit(int(sample_num)) * F.lit(HASH_MOD)
        )
        src = src.filter(cut)
        dst = dst.filter(cut)
    bad = diverged_buckets(src, dst, key_col, sig, n_buckets).select("bucket")
    if attribute_columns:
        if sig_col_names is None:
            sig_col_names = [
                c if isinstance(c, str) else f"col_{i}"
                for i, c in enumerate(sig_cols)
            ]
        per_col = F.array(
            *[
                _poly_of(
                    F.coalesce(
                        (F.col(c) if isinstance(c, str) else c).cast("string"),
                        F.lit(""),
                    )
                )
                for c in sig_cols
            ]
        )
        src_extra = [per_col.alias("_src_cs")]
        dst_extra = [per_col.alias("_dst_cs")]
    else:
        src_extra = dst_extra = []
    sj = (
        src.select(F.col(key_col).alias("_src_key"), bucket_of(key_col, n_buckets).alias("_b"), sig.alias("src_sig"), *src_extra)
        .join(F.broadcast(bad), F.col("_b") == F.col("bucket"), "left_semi")
    )
    dj = (
        dst.select(F.col(key_col).alias("_dst_key"), bucket_of(key_col, n_buckets).alias("_b"), sig.alias("dst_sig"), *dst_extra)
        .join(F.broadcast(bad), F.col("_b") == F.col("bucket"), "left_semi")
    )
    # null-safe key equality: plain `==` is null-rejecting, so a NULL-key
    # row surviving phase 2 (bucket -1 diverged) would show up as BOTH
    # missing_in_dst and missing_in_src even when only its payload changed.
    # eqNullSafe pairs the NULL-key rows; with several NULL-key rows per
    # side they compare as one group (cross-paired) — divergence is still
    # reported, just at group granularity, which the docstring states.
    full = sj.drop("_b").join(
        dj.drop("_b"), F.col("_src_key").eqNullSafe(F.col("_dst_key")), "full_outer"
    )
    status = (
        F.when(F.col("dst_sig").isNull(), F.lit("missing_in_dst"))
        .when(F.col("src_sig").isNull(), F.lit("missing_in_src"))
        .when(F.col("src_sig") != F.col("dst_sig"), F.lit("differs"))
    )
    out_cols = [
        F.coalesce(F.col("_src_key"), F.col("_dst_key")).alias(key_col),
        F.col("status"),
    ]
    if attribute_columns:
        diff_cols = F.when(
            F.col("status") == "differs",
            F.array_compact(
                F.array(
                    *[
                        F.when(
                            ~F.col("_src_cs")[i].eqNullSafe(F.col("_dst_cs")[i]),
                            F.lit(name),
                        )
                        for i, name in enumerate(sig_col_names)
                    ]
                )
            ),
        )
        out_cols.append(diff_cols.alias("diff_cols"))
    return (
        full.withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .select(*out_cols)
    )
