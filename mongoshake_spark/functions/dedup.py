"""Deduplication operators for the training-data pipeline.

Four families over ``documents`` plus one over ``embeddings``:

- exact          : hash-groupBy (md5 of the text)
- minhash_pairs  : MinHash + LSH banding (shingle -> 16 minhashes ->
                   4 bands -> bucket self-join)
- simhash_pairs  : 32-bit SimHash + 8-bit-band candidate join, Hamming <= 3
- ngram_pairs    : 3-shingle Jaccard via inverted-index self-join
- (embedding near-dup lives in functions/similarity.py)

Scale notes (the reason these shapes were chosen):
- Everything is hash -> shuffle-on-small-key -> aggregate; the only wide
  rows are (doc_id, shingle_hash) pairs, never the documents themselves.
- The LSH band join shuffles on (band, band_key) — a high-cardinality key,
  so it parallelizes to any cluster size; hot buckets (boilerplate text)
  are exactly what AQE skew-join splitting handles.
- Hashes are the dialect-portable polynomial (functions/texthash.py) so the
  DuckDB oracle can verify pair sets value-for-value. For pure production
  use, swap in xxhash64 via the ``hash_expr`` parameter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mongoshake_spark.functions.texthash import MOD, poly_hash_spark

N_MINHASH = 16
N_BANDS = 4
SIMHASH_BITS = 32


def exact_groups(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup: group by content hash; keeper = min doc_id per group."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keep_id"))
    )


def shingle_rows(docs: DataFrame, text_col: str = "text", k: int = 3) -> DataFrame:
    """(doc_id, shingle) distinct rows: k-token shingles of the whitespace
    tokenization. Guard: Spark's sequence(1, n) DESCENDS when n < 1, so
    short docs must short-circuit to an empty array."""
    toks = F.split(F.col(text_col), " ")
    idx = F.sequence(F.lit(1), F.size(toks) - F.lit(k - 1))
    mk = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + F.lit(j)) for j in range(k)]),
    )
    sh = F.when(F.size(toks) >= k, mk).otherwise(F.array().cast("array<string>"))
    return docs.select(
        F.col("doc_id"), F.explode(F.array_distinct(sh)).alias("shingle")
    )


def _hashed_shingles(docs: DataFrame, text_col: str) -> DataFrame:
    return shingle_rows(docs, text_col).select(
        "doc_id", F.expr(poly_hash_spark("shingle")).alias("h")
    )


def minhash_bands(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, band, band_key) — the LSH bucket assignment.

    Minhash family h_i(x) = ((2i+1)*x + 7919*i) mod P, i in [0,16);
    4 bands of 4 signature values, band_key = comma-joined values in i
    order (collect_list is unordered, so sort (i, m) structs first).
    """
    spark = docs.sparkSession
    hashed = _hashed_shingles(docs, text_col)
    idx = spark.range(N_MINHASH).withColumnRenamed("id", "i")
    vals = hashed.crossJoin(F.broadcast(idx)).select(
        "doc_id",
        "i",
        (((2 * F.col("i") + 1) * F.col("h") + 7919 * F.col("i")) % MOD).alias("v"),
    )
    sig = vals.groupBy("doc_id", "i").agg(F.min("v").alias("m"))
    per_band = N_MINHASH // N_BANDS
    return (
        sig.groupBy("doc_id", F.floor(F.col("i") / per_band).alias("band"))
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("i", "m"))),
                    lambda x: x.getField("m").cast("string"),
                ),
                ",",
            ).alias("band_key")
        )
    )


def minhash_pairs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Candidate near-duplicate pairs: docs sharing >= 1 LSH band."""
    bands = minhash_bands(docs, text_col)
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def simhash_values(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, simhash) — 32-bit SimHash over the token multiset (term
    frequency = weight). Bit b set iff sum over tokens of ±1 (sign of bit b
    of the token hash) is positive."""
    spark = docs.sparkSession
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col(text_col), " ")).alias("tok")
    ).select("doc_id", F.expr(poly_hash_spark("tok")).alias("h"))
    bits = spark.range(SIMHASH_BITS).withColumnRenamed("id", "b")
    contrib = toks.crossJoin(F.broadcast(bits)).select(
        "doc_id",
        "b",
        F.when(F.expr("(h >> b) & 1") == 1, F.lit(1)).otherwise(F.lit(-1)).alias("c"),
    )
    bit_sums = contrib.groupBy("doc_id", "b").agg(F.sum("c").alias("s"))
    return bit_sums.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("s") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), CAST(b AS INT))")).otherwise(F.lit(0))
        ).alias("simhash")
    )


def simhash_pairs(docs: DataFrame, text_col: str = "text", max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs with Hamming distance <= 3, found via 4×8-bit band
    candidate join (pigeonhole: <=3 differing bits across 4 bands leaves at
    least one band identical, so the band join finds every qualifying pair
    — same result set as a brute-force cross join, at shuffle-join cost)."""
    spark = docs.sparkSession
    sims = simhash_values(docs, text_col)
    bands = spark.range(SIMHASH_BITS // 8).withColumnRenamed("id", "k")
    keyed = sims.crossJoin(F.broadcast(bands)).select(
        "doc_id", "simhash", "k", F.expr("(simhash >> (8 * CAST(k AS INT))) & 255").alias("band_val")
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    return (
        a.join(
            b,
            (F.col("a.k") == F.col("b.k"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.expr("CAST(bit_count(a.simhash ^ b.simhash) AS INT)").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame, text_col: str = "text", num: int = 1, den: int = 5
) -> DataFrame:
    """Pairs with 3-shingle Jaccard >= num/den (default 0.2), computed with
    integer arithmetic only: |A∩B|*den >= num*(|A|+|B|-|A∩B|).

    Inverted-index self-join on the shingle: only docs sharing a shingle
    ever meet, which equals the brute-force result because disjoint pairs
    have Jaccard 0. This is the scalable shape — cost is sum of squared
    posting-list lengths, not |docs|².
    """
    sh = shingle_rows(docs, text_col)
    counts = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("common"))
    )
    ca = counts.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    cb = counts.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        common.join(F.broadcast(ca), "doc_a")
        .join(F.broadcast(cb), "doc_b")
        .filter(
            F.col("common") * den >= num * (F.col("na") + F.col("nb") - F.col("common"))
        )
        .select("doc_a", "doc_b", "common", "na", "nb")
    )
