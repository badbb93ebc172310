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
    short docs must short-circuit to an empty array.

    The input is repartitioned first: shingling is CPU-bound, and a small
    parquet file arrives as a single split — without the repartition every
    downstream expression runs in one task (observed 5s -> 0.3s here).
    At real scale the scan already has many splits and AQE keeps this
    exchange cheap."""
    docs = docs.repartition(docs.sparkSession.sparkContext.defaultParallelism, "doc_id")
    # Materialize the token array ONCE per row in its own projection.
    # Referencing the split() expression directly inside the transform
    # lambda would re-split the text for every element_at (observed ~180
    # re-splits per row); Catalyst keeps a non-cheap multi-referenced
    # alias as a separate project, so this stays a single split.
    with_toks = docs.select("doc_id", F.split(F.col(text_col), " ").alias("toks"))
    toks = F.col("toks")
    idx = F.sequence(F.lit(1), F.size(toks) - F.lit(k - 1))
    mk = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + F.lit(j)) for j in range(k)]),
    )
    sh = F.when(F.size(toks) >= k, mk).otherwise(F.array().cast("array<string>"))
    return with_toks.select(
        F.col("doc_id"), F.explode(F.array_distinct(sh)).alias("shingle")
    )


def _hashed_shingles(docs: DataFrame, text_col: str) -> DataFrame:
    return shingle_rows(docs, text_col).select(
        "doc_id", F.expr(poly_hash_spark("shingle")).alias("h")
    )


def _poly(s: str) -> int:
    """Python twin of texthash.poly_hash_spark — identical integers."""
    h = 0
    for ch in s:
        h = (h * 31 + ord(ch)) % MOD
    return h


def minhash_signatures(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, m0..m15) signature matrix via an Arrow-batched mapInPandas.

    Why a pandas UDF here and not the pure-expression form: the equivalent
    JVM plan is a HashAggregate with 16 modular-arithmetic agg expressions
    over a polynomial-hash projection — correct, but its generated code
    takes seconds of Janino compilation per session and the hash runs
    interpreted per character. The UDF computes the *identical* integers
    (Python int mod arithmetic == the oracle), memoizes shingle hashes
    (corpora repeat shingles heavily), and vectorizes the 16 minima with
    numpy. Rows never widen: in (doc_id, text), out (doc_id, 16 longs).
    """
    import numpy as np
    import pandas as pd

    coef_a = np.array([2 * i + 1 for i in range(N_MINHASH)], dtype=np.int64)
    coef_b = np.array([7919 * i for i in range(N_MINHASH)], dtype=np.int64)

    def sig_batches(batches):
        cache: dict[str, int] = {}
        for pdf in batches:
            out_ids, out_sigs = [], []
            for doc_id, txt in zip(pdf["doc_id"], pdf[text_col]):
                toks = txt.split(" ") if txt else []
                if len(toks) < 3:
                    continue
                hs = set()
                for i in range(len(toks) - 2):
                    sh = " ".join(toks[i : i + 3])
                    h = cache.get(sh)
                    if h is None:
                        h = _poly(sh)
                        cache[sh] = h
                    hs.add(h)
                hv = np.fromiter(hs, dtype=np.int64, count=len(hs))
                sig = ((coef_a[:, None] * hv[None, :] + coef_b[:, None]) % MOD).min(axis=1)
                out_ids.append(doc_id)
                out_sigs.append(sig)
            mat = np.vstack(out_sigs) if out_sigs else np.empty((0, N_MINHASH), np.int64)
            yield pd.DataFrame(
                {"doc_id": out_ids, **{f"m{i}": mat[:, i] for i in range(N_MINHASH)}}
            )

    schema = "doc_id bigint, " + ", ".join(f"m{i} bigint" for i in range(N_MINHASH))
    parallel = docs.sparkSession.sparkContext.defaultParallelism
    return docs.repartition(parallel, "doc_id").select("doc_id", text_col).mapInPandas(
        sig_batches, schema=schema
    )


def minhash_bands(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, band, band_key) — the LSH bucket assignment.

    Minhash family h_i(x) = ((2i+1)*x + 7919*i) mod P, i in [0,16);
    4 bands of 4 signature values, band_key = comma-joined values in i
    order.

    The signature matrix comes from minhash_signatures (Arrow-vectorized,
    no shuffle — the repartition inside doubles as the distribution);
    bands explode from the in-row signature columns, JVM-side.
    """
    sig = minhash_signatures(docs, text_col)
    per_band = N_MINHASH // N_BANDS
    bands_arr = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    ",",
                    *[F.col(f"m{b * per_band + j}").cast("string") for j in range(per_band)],
                ).alias("band_key"),
            )
            for b in range(N_BANDS)
        ]
    )
    return sig.select("doc_id", F.explode(bands_arr).alias("bk")).select(
        "doc_id", F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key")
    )


def minhash_pairs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Candidate near-duplicate pairs: docs sharing >= 1 LSH band.
    The band table is persisted — both sides of the self-join reuse it
    instead of recomputing the shingle+hash pipeline twice."""
    bands = minhash_bands(docs, text_col).persist()
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
    frequency = weight). Bit b set iff the sum over tokens of ±1 (sign of
    bit b of the token hash) is positive.

    Arrow-batched mapInPandas, same rationale as minhash_signatures: the
    expression form is a 32-wide conditional-sum HashAggregate whose
    generated code costs seconds to compile; the UDF computes identical
    integers with a memoized token->hash map and one numpy bit-unpack +
    matmul per document batch, and emits exactly one row per doc with no
    shuffle at all.
    """
    import numpy as np
    import pandas as pd

    weights = (np.int64(1) << np.arange(SIMHASH_BITS, dtype=np.int64))

    def sim_batches(batches):
        cache: dict[str, int] = {}
        for pdf in batches:
            out_ids, out_sims = [], []
            for doc_id, txt in zip(pdf["doc_id"], pdf[text_col]):
                toks = txt.split(" ") if txt else [""]
                hv = np.empty(len(toks), dtype=np.int64)
                for j, t in enumerate(toks):
                    h = cache.get(t)
                    if h is None:
                        h = _poly(t)
                        cache[t] = h
                    hv[j] = h
                bits = ((hv[:, None] >> np.arange(SIMHASH_BITS)) & 1) * 2 - 1
                sums = bits.sum(axis=0)
                out_ids.append(doc_id)
                out_sims.append(int(weights[sums > 0].sum()))
            yield pd.DataFrame({"doc_id": out_ids, "simhash": out_sims})

    parallel = docs.sparkSession.sparkContext.defaultParallelism
    return (
        docs.repartition(parallel, "doc_id")
        .select("doc_id", text_col)
        .mapInPandas(sim_batches, schema="doc_id bigint, simhash bigint")
    )


def simhash_pairs(docs: DataFrame, text_col: str = "text", max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs with Hamming distance <= 3, found via 4×8-bit band
    candidate join (pigeonhole: <=3 differing bits across 4 bands leaves at
    least one band identical, so the band join finds every qualifying pair
    — same result set as a brute-force cross join, at shuffle-join cost)."""
    spark = docs.sparkSession
    sims = simhash_values(docs, text_col).persist()
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
    sh = shingle_rows(docs, text_col).persist()
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
