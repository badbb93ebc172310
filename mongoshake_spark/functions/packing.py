"""Training-data pipeline: sequence packing and deterministic stratified
sampling — the batch-shaping steps between a deduped corpus and a
training run.

Both are pure DataFrame compositions (no UDFs, no driver loops):

- ``pack_sequences``: concat-and-chop packing. Documents are laid out in
  ``id_col`` order as one virtual token stream; training sequences are
  consecutive ``budget``-token windows of that stream. Each document gets
  the sequence id and intra-sequence offset where it STARTS (a document
  longer than the remaining room straddles the boundary and is chopped by
  the consumer — the standard pretraining layout, which keeps every
  sequence exactly full). The document->position map is a global prefix
  sum over token counts (operators/prefix.running_total: one range
  exchange, no single-partition window), so the operator scales to a
  corpus that no single task could order.

- ``sample_strata``: per-stratum downsampling with a PORTABLE
  multiplicative hash — ``u(id) = ((id * 2654435761) mod 2^32) / 2^32``
  (Knuth's multiplier) — so the keep decision is reproducible across
  engines and runs, needs no RNG state, and any oracle can recompute it
  with integer arithmetic. This is the "data mixing" step: rates express
  the target corpus composition per language/source.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mongoshake_spark.functions.text import token_count
from mongoshake_spark.operators.prefix import running_total

KNUTH_MULT = 2654435761  # 2^32 / golden ratio, Knuth multiplicative hash
HASH_MOD = 2**32


def knuth_u32(id_col: Column | str, seed: int = 0) -> Column:
    """``((id + seed) * KNUTH_MULT) mod 2^32`` WITHOUT 64-bit overflow.

    The naive ``id * 2654435761`` overflows bigint for id > ~3.47e9 —
    Spark 4's ANSI mode then throws ARITHMETIC_OVERFLOW at runtime (and
    with ANSI off would silently wrap, diverging from the documented
    contract and the oracles). Ids that large are routine at corpus scale
    (``monotonically_increasing_id`` starts at 2^33 in partition 1). Only
    the low 32 bits of (id + seed) matter mod 2^32, so split them as
    ``hi*2^16 + lo``:

        (hi*2^16 + lo) * K  ≡  ((hi*K mod 2^16) * 2^16 + lo*K)  (mod 2^32)

    and every intermediate stays < 2^48 — exact in bigint, identical to
    the oracles' HUGEINT arithmetic for every id.
    """
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    # reduce BEFORE adding the seed so even id = 2^63-1 cannot overflow
    x = F.pmod(F.pmod(c.cast("bigint"), F.lit(HASH_MOD)) + F.lit(int(seed)), F.lit(HASH_MOD))
    hi = (x / F.lit(65536)).cast("bigint")  # x < 2^32: binary division, exact
    lo = x % F.lit(65536)
    return F.pmod(
        F.pmod(hi * F.lit(KNUTH_MULT), F.lit(65536)) * F.lit(65536)
        + lo * F.lit(KNUTH_MULT),
        F.lit(HASH_MOD),
    )


def pack_sequences(
    docs: DataFrame,
    budget: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int | None = None,
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """(id, [carry_cols...], n_tokens, seq_id, offset): where each document
    starts in the chopped ``budget``-token training-sequence stream (see
    module doc).

    ``carry_cols`` rides metadata columns (language, source, quality tier)
    through the prefix sum instead of joining them back afterwards — the
    join-back form re-evaluates the whole upstream pipeline a second time
    (the prefix sum's checkpoint materializes upstream once, but a second
    reference to ``docs`` does not share it)."""
    carry = list(carry_cols or [])
    with_counts = docs.select(
        id_col, *carry, token_count(F.col(text_col)).alias("n_tokens")
    )
    summed = running_total(
        with_counts, [id_col], F.col("n_tokens"), "_cum", num_partitions
    )
    start = F.col("_cum") - F.col("n_tokens")  # exclusive prefix = start pos
    return summed.select(
        id_col,
        *carry,
        "n_tokens",
        F.floor(start / F.lit(budget)).cast("bigint").alias("seq_id"),
        (start % F.lit(budget)).cast("bigint").alias("offset"),
    )


def sample_strata(
    docs: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "lang",
    default_rate: float = 1.0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep each row iff u(id) < rate(stratum); u is the portable
    multiplicative hash above. Deterministic, engine-reproducible, and a
    stratum's kept set is a SUBSET of any higher rate's kept set (the
    keep threshold moves, the hash does not) — re-mixing with new rates
    never resamples from scratch."""
    u = knuth_u32(id_col) / F.lit(float(HASH_MOD))
    rate = F.lit(float(default_rate))
    for stratum, r in sorted(rates.items()):
        rate = F.when(F.col(stratum_col) == stratum, F.lit(float(r))).otherwise(rate)
    return docs.filter(u < rate)


def epoch_mix(
    docs: DataFrame,
    weights_pct: dict[str, int],
    stratum_col: str = "lang",
    default_pct: int = 100,
    id_col: str = "doc_id",
) -> DataFrame:
    """Epoch-weighted corpus mixing (upsampling): materialize each document
    ``weight`` times, where weight is a per-stratum epoch count in integer
    PERCENT (240 = 2.4 epochs). Whole epochs replicate every document; the
    fractional epoch keeps the deterministic ``u(id) < frac`` subset (same
    Knuth hash as ``sample_strata``, so the fractional subset is stable
    across remixes and nests across rates).

    Adds ``_copy`` (1-based epoch index) and drops rows with zero copies.
    All-integer keep arithmetic: ``u*100 < (pct % 100) * 2^32`` — exact on
    any engine, no float thresholds. Explode-by-sequence is map-only (no
    shuffle); output size = sum of weights, which is the point.
    """
    pct = F.lit(int(default_pct))
    for stratum, p in sorted(weights_pct.items()):
        pct = F.when(F.col(stratum_col) == stratum, F.lit(int(p))).otherwise(pct)
    u = knuth_u32(id_col)
    extra = (u * 100 < (pct % 100) * F.lit(HASH_MOD)).cast("int")
    n_copies = (pct / 100).cast("int") + extra
    return (
        docs.withColumn("_n_copies", n_copies)
        .filter(F.col("_n_copies") >= 1)
        .withColumn("_copy", F.explode(F.sequence(F.lit(1), F.col("_n_copies"))))
        .drop("_n_copies")
    )
