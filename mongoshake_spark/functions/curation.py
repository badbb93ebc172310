"""Corpus-curation operators for a large-scale training-data pipeline:
train/test decontamination, token-budget sharding, per-domain caps, and
corpus-level token document-frequency quality signals.

These are the stages between a deduped corpus and a training run that no
single-document operator covers — each needs corpus-global state (an eval
n-gram set, a global token order, per-domain ranks, a vocabulary DF table)
and is expressed so that state flows through joins/aggregations rather
than driver-side collection:

- ``decontaminate``: the GPT-3/Llama-style eval-overlap check — flag any
  corpus document sharing a token n-gram with a held-out evaluation set.
  Published pipelines use 8-13-gram overlap; the n is a parameter.
- ``shard_by_token_budget``: deterministic global shuffle (portable
  multiplicative hash — no RNG state, reproducible across engines) plus
  token-budget shard assignment via the shared distributed prefix sum, so
  every output shard holds ~``budget`` tokens regardless of document
  length skew.
- ``cap_per_domain``: CCNet/RefinedWeb-style per-source document caps,
  keeping the top-``cap`` by a deterministic quality order.
- ``token_df_signals``: vocabulary document frequencies joined back per
  document — the exact-integer stand-in for an LM quality filter (rare
  garbage tokens have DF 1; boilerplate-heavy docs have high mean DF).

All outputs are integer-valued (oracle-exact, no float thresholds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mongoshake_spark.functions.packing import HASH_MOD, KNUTH_MULT, knuth_u32
from mongoshake_spark.functions.texthash import MOD
from mongoshake_spark.functions.text import _ngram_col, token_count, tokens
from mongoshake_spark.operators.parallel import fan_out_scan
from mongoshake_spark.operators.prefix import running_total


def _doc_ngrams(docs: DataFrame, n: int, text_col: str, id_col: str) -> DataFrame:
    """(id, gram) — DISTINCT token n-grams per document, exploded. The
    dedup is ``array_distinct`` IN-ROW before the explode — a map-only
    projection, no shuffle — so per-document duplicate grams never exist
    as rows at all."""
    grams = F.array_distinct(_ngram_col(tokens(F.col(text_col)), n))
    return docs.select(F.col(id_col), F.explode(grams).alias("gram"))


def decontaminate(
    corpus: DataFrame,
    eval_docs: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_eval: bool = True,
) -> DataFrame:
    """Train/test decontamination by n-gram overlap.

    Returns one row per corpus document — INCLUDING documents shorter
    than ``n`` tokens, which have ``n_grams = 0`` and can never be
    contaminated (a keep-set built as ``filter(~contaminated)`` must not
    silently lose short docs): ``(id_col, n_grams, n_contaminated,
    contaminated)`` where ``n_grams`` counts the document's distinct token
    n-grams and ``n_contaminated`` how many of those also occur anywhere
    in ``eval_docs``. Published pretraining pipelines drop or span-mask
    documents with ``contaminated = true``.

    Scale shape: the corpus side never shuffles at corpus width — per-doc
    gram totals are ``size(array_distinct(...))`` computed in-row
    (map-only), and the overlap probe is a broadcast LEFT SEMI join (the
    eval n-gram set is benchmark-sized — MBs against a 100 TB corpus).
    Only the HIT rows (contaminated grams, naturally rare) reach the
    per-doc count shuffle, and the final totals⋈hits join broadcasts the
    tiny hit side under AQE. Set ``broadcast_eval=False`` when the eval
    side is genuinely large; the probe then shuffles both sides on the
    gram (high-cardinality key, AQE-skew-safe).
    """
    corpus = fan_out_scan(corpus)  # gram explode is CPU-bound (operators/parallel)
    corpus_grams = _doc_ngrams(corpus, n, text_col, id_col)
    eval_grams = _doc_ngrams(eval_docs, n, text_col, id_col).select("gram").distinct()
    if broadcast_eval:
        eval_grams = F.broadcast(eval_grams)
    hits = (
        corpus_grams.join(eval_grams, "gram", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_contaminated"))
    )
    n_grams = F.size(F.array_distinct(_ngram_col(tokens(F.col(text_col)), n))).cast(
        "bigint"
    )
    totals = corpus.select(F.col(id_col), n_grams.alias("n_grams"))
    return (
        totals.join(hits, id_col, "left")
        .select(
            id_col,
            "n_grams",
            F.coalesce("n_contaminated", F.lit(0)).cast("bigint").alias("n_contaminated"),
        )
        .withColumn("contaminated", F.col("n_contaminated") > 0)
    )


def shard_by_token_budget(
    docs: DataFrame,
    budget: int,
    seed: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic global shuffle + token-budget shard assignment.

    Documents are ordered by ``u = ((id + seed) * KNUTH) mod 2^32`` (ties
    broken by id) — a portable multiplicative hash, so the training order
    is reproducible across engines and runs and re-keyable by seed — then
    laid out as one token stream and cut into shards of ~``budget`` tokens:
    ``shard_id = floor(start_pos / budget)`` where ``start_pos`` is the
    exclusive prefix sum of token counts in shuffle order.

    Returns ``(id_col, n_tokens, shuffle_key, shard_id)``.

    Scale shape: the prefix sum is the shared two-pass distributed form
    (operators/prefix.running_total — one range exchange, per-partition
    windows, broadcast offsets); no single-partition window, no driver
    materialization. Writing the shards afterwards is
    ``.repartition("shard_id").write.partitionBy("shard_id")`` — each
    shard lands as one unit with ~equal token mass, which is exactly the
    property downstream dataloaders want.
    """
    u = knuth_u32(id_col, seed).cast("bigint")
    with_key = docs.select(
        F.col(id_col),
        token_count(F.col(text_col)).alias("n_tokens"),
        u.alias("shuffle_key"),
    )
    summed = running_total(
        with_key,
        ["shuffle_key", id_col],
        F.col("n_tokens"),
        "_cum",
        num_partitions,
    )
    start = F.col("_cum") - F.col("n_tokens")
    return summed.select(
        id_col,
        "n_tokens",
        "shuffle_key",
        F.floor(start / F.lit(int(budget))).cast("bigint").alias("shard_id"),
    )


def write_training_shards(
    docs: DataFrame,
    path: str,
    budget: int,
    seed: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> int:
    """Materialize the training layout: assign shards with
    :func:`shard_by_token_budget`, then write one directory per shard —
    ``path/shard_id=N/`` — with documents IN training order inside each
    shard. Returns the shard count.

    Scale shape: ``repartition(shard_id)`` co-locates each shard on one
    task and ``partitionBy`` makes the shard id a partition column, so a
    dataloader reads exactly its shard's directory (partition pruning) and
    never touches the rest; ``sortWithinPartitions(shard_id, shuffle_key,
    id)`` lays rows out in training order within each file. Shards are
    ~``budget`` tokens each by construction, so reader work is balanced
    regardless of document-length skew.
    """
    assignment = shard_by_token_budget(
        docs, budget=budget, seed=seed, text_col=text_col, id_col=id_col
    )
    laid_out = (
        docs.join(assignment, id_col)
        .repartition("shard_id")
        .sortWithinPartitions("shard_id", "shuffle_key", id_col)
    )
    laid_out.write.mode("overwrite").partitionBy("shard_id").parquet(path)
    # shard ids are contiguous from 0 by construction (floor of a prefix
    # sum), so the count is max+1 from the metadata-sized assignment —
    # re-reading the just-written dataset to count distinct ids would
    # re-scan every shard file for a scalar
    row = assignment.agg(F.max("shard_id").alias("m")).first()
    return int(row["m"]) + 1 if row["m"] is not None else 0


def cap_per_domain(
    docs: DataFrame,
    cap: int,
    domain_col: str = "source",
    order_col: str = "n_chars",
    id_col: str = "doc_id",
    skew_safe: bool = True,
) -> DataFrame:
    """Keep at most ``cap`` documents per domain, preferring the highest
    ``order_col`` (ties broken by id ascending) — the CCNet/RefinedWeb
    per-domain cap that stops any one crawl domain from dominating the
    mix. Input columns are preserved; rows beyond the cap are dropped.

    Scale shape (``skew_safe``, the default): two-phase top-K. Phase 1
    ranks within (input-partition-id, domain) — the partition id acts as a
    salt, so a pathologically hot domain spreads over as many reducers as
    there are input partitions and no single task ever sorts the whole
    domain — and keeps each salt-group's top-``cap``. Any row in the
    global per-domain top-``cap`` is necessarily in its salt-group's
    top-``cap``, so phase 2's plain per-domain rank over the reduced set
    (≤ cap × n_partitions rows per domain) returns the identical result.
    ``skew_safe=False`` is the single-window form: one fewer shuffle,
    correct per-key parallelism, but a hot domain lands on one reducer —
    fine when domains are known to be balanced.
    """
    order = (F.col(order_col).desc(), F.col(id_col).asc())
    w_final = Window.partitionBy(domain_col).orderBy(*order)
    if skew_safe:
        w_local = Window.partitionBy("_salt", domain_col).orderBy(*order)
        docs = (
            docs.withColumn("_salt", F.spark_partition_id())
            .withColumn("_rk", F.row_number().over(w_local))
            .filter(F.col("_rk") <= cap)
            .drop("_rk", "_salt")
        )
    return (
        docs.withColumn("_rk", F.row_number().over(w_final))
        .filter(F.col("_rk") <= cap)
        .drop("_rk")
    )


def contaminated_spans(
    corpus: DataFrame,
    eval_docs: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Span-level decontamination: WHERE each corpus document overlaps the
    eval set, as merged token intervals — the masking-grade output (drop
    the spans, keep the document) that production pipelines prefer over
    whole-document removal when a long document merely quotes a benchmark.

    Returns ``(id_col, span_id, start_p, end_p)``: maximal merged
    intervals of token positions (end exclusive) covered by eval-matching
    ``n``-grams; ``span_id`` numbers a document's spans in order from 1.
    All integers.

    Scale shape: corpus positions explode to (doc, pos, md5(gram)) — the
    text itself never shuffles; the eval gram-hash set broadcasts (same
    contract as :func:`decontaminate`); interval merging is two windows
    partitioned by document (running max end, running island count) — per
    doc, never global.
    """
    toks = tokens(F.col(text_col))
    grams = _ngram_col(toks, n)
    pos = fan_out_scan(corpus).select(
        F.col(id_col), F.posexplode(grams).alias("p", "gram")
    ).select(id_col, "p", F.md5("gram").alias("h"))
    eval_g = (
        eval_docs.select(F.explode(_ngram_col(tokens(F.col(text_col)), n)).alias("gram"))
        .select(F.md5("gram").alias("h"))
        .distinct()
    )
    hits = pos.join(F.broadcast(eval_g), "h", "left_semi").select(id_col, "p")
    w_prev = (
        Window.partitionBy(id_col)
        .orderBy("p")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy(id_col)
        .orderBy("p")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    prev_end = F.max(F.col("p") + n).over(w_prev)
    new_span = F.when(
        prev_end.isNull() | (F.col("p") > prev_end), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        hits.withColumn("span_id", F.sum(new_span).over(w_run))
        .groupBy(id_col, "span_id")
        .agg(
            F.min("p").cast("bigint").alias("start_p"),
            (F.max("p") + n).cast("bigint").alias("end_p"),
        )
    )


def mask_contaminated(
    corpus: DataFrame,
    eval_docs: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply span-level decontamination: rewrite each corpus document with
    its eval-overlapping token spans REMOVED (the Llama-2-style masking
    rewrite — the document survives, the benchmark quote does not).

    Returns ``(id_col, n_tokens_before, n_tokens_after, clean_text)`` for
    every corpus document; clean docs pass through byte-identical.

    Scale shape: spans come from :func:`contaminated_spans` (broadcast
    eval grams, per-doc windows); they are collected per document —
    bounded by doc length, not corpus size — and joined back onto the
    corpus (hit docs are rare, so AQE broadcasts the span side). The
    rewrite itself is pure higher-order expressions (transform + filter
    + exists over the token array): whole-stage codegen, zero Python.
    """
    corpus = fan_out_scan(corpus)  # the rewrite re-tokenizes every doc in-row
    spans = (
        contaminated_spans(corpus, eval_docs, n, text_col, id_col)
        .groupBy(id_col)
        .agg(
            F.collect_list(F.struct("start_p", "end_p")).alias("_spans")
        )
    )
    toks = tokens(F.col(text_col))
    empty = F.array().cast("array<struct<start_p:bigint,end_p:bigint>>")
    sp = F.coalesce(F.col("_spans"), empty)
    indexed = F.transform(toks, lambda t, i: F.struct(t.alias("t"), i.alias("p")))
    kept = F.filter(
        indexed,
        lambda s: ~F.exists(
            sp, lambda r: (s["p"] >= r["start_p"]) & (s["p"] < r["end_p"])
        ),
    )
    clean = F.array_join(F.transform(kept, lambda s: s["t"]), " ")
    return (
        corpus.join(spans, id_col, "left")
        .select(
            F.col(id_col),
            F.size(toks).cast("bigint").alias("n_tokens_before"),
            F.size(kept).cast("bigint").alias("n_tokens_after"),
            clean.alias("clean_text"),
        )
    )


def token_df_signals(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Corpus-level token document-frequency signals per document — the
    exact-integer analog of an LM quality filter.

    Two passes: (1) build the vocabulary DF table — for each distinct
    token, in how many documents it appears; (2) join it back onto each
    document's distinct tokens and aggregate:

    - ``n_unique``   distinct tokens in the document
    - ``df_sum``     sum of corpus DF over those tokens (high mean DF =
                     boilerplate-common language; low = rare/garbage)
    - ``n_hapax``    tokens whose corpus DF is 1 — they occur in THIS
                     document only (typos, ids, binary junk)

    All integers, so the oracle matches exactly; a consumer thresholds
    ``df_sum/n_unique`` or ``n_hapax/n_unique`` as the quality score.

    Scale shape: per-doc token dedup is ``array_distinct`` IN-ROW (map-only,
    no (id, token) shuffle); the only corpus-wide shuffle is the DF
    aggregation on the token (high-cardinality key, map-side partial
    combine). The DF table is vocabulary-sized (tiny vs the corpus) and
    broadcasts back (``broadcast_vocab=False`` for a pathological
    vocabulary), so the final per-doc aggregate is again map-side-combined.
    """
    # no fan_out_scan here: the explode feeds the DF groupBy's hash
    # exchange immediately, which already spreads the work — an extra
    # round-robin hop measured ~2x slower, not faster
    doc_tokens = docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("tok"),
    )
    vocab_df = doc_tokens.groupBy("tok").agg(F.count("*").alias("_df"))
    if broadcast_vocab:
        vocab_df = F.broadcast(vocab_df)
    return (
        doc_tokens.join(vocab_df, "tok")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_unique"),
            F.sum("_df").cast("bigint").alias("df_sum"),
            F.sum((F.col("_df") == 1).cast("int")).cast("bigint").alias("n_hapax"),
        )
    )


def assign_row_ids(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "row_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Contiguous 0-based ids over a total order — the post-dedup renumber
    step (surviving documents get dense ids for shard/index addressing).

    ``monotonically_increasing_id`` is the cheap platform answer but its
    ids are sparse (partition-encoded); a dense numbering is a global
    prefix sum of 1s, so this reuses the shared two-pass distributed form
    (operators/prefix.running_total): one range exchange, per-partition
    windows, broadcast offsets — never a single-partition window and never
    a driver-side zipWithIndex collect."""
    numbered = running_total(df, order_cols, F.lit(1), out_col, num_partitions)
    return numbered.withColumn(out_col, (F.col(out_col) - 1).cast("bigint"))


def lm_score(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_digits: int = 4,
) -> DataFrame:
    """Corpus bigram language-model scoring — the CCNet/Gopher perplexity
    quality filter re-expressed relationally: train an add-one-smoothed
    bigram LM on the corpus itself, then score every document by its
    average per-bigram surprisal in bits,

        bits_per_token = -1/n * sum log2((C(a,b) + 1) / (C(a,·) + V))

    where ``C(a,b)`` is the corpus count of bigram (a,b), ``C(a,·)`` the
    count of bigrams starting with ``a`` and ``V`` the corpus vocabulary
    size. High scores = improbable token sequences (garbled text, wrong
    language, random strings); low scores = boilerplate. Published
    pipelines threshold on exactly this statistic (a held-out KenLM model
    in CCNet; self-trained here so the operator is closed over its input —
    pass a different ``docs`` to ``train`` on a reference corpus).

    Returns ``(id_col, n_bigrams, bits_per_token)`` for documents with at
    least one bigram; ``bits_per_token`` is rounded so the float crosses
    the oracle boundary deterministically (the log2 sum is over ≤ a few
    hundred doubles per doc — order drift is absorbed by the rounding).

    Scale shape: bigram extraction is a map-only in-row explode (the text
    never shuffles, only (id, a, b) triples); the model is two hash
    aggregates with map-side partial combine — C2 on the (a,b) key, C1
    derived from the ALREADY-aggregated C2 (model-sized, never re-reads
    the corpus); scoring joins the corpus triples to the model on the
    high-cardinality (a,b) key (AQE-skew-safe, no broadcast of a
    corpus-proportional model); the vocabulary size is a 1-row aggregate
    broadcast into the scoring join. Per-doc reduction is one more
    partial-combine aggregate. Nothing driver-side, nothing quadratic.
    """
    # no fan_out_scan here: the bigram explode feeds the model/scoring
    # hash exchanges immediately (which already parallelize), and the
    # multi-referenced input defeats exchange reuse — measured ~1.8x
    # slower with a fan-out hop
    toks = tokens(F.col(text_col))
    pairs = F.when(
        F.size(toks) >= 2,
        F.zip_with(
            F.slice(toks, F.lit(1), F.size(toks) - 1),
            F.slice(toks, F.lit(2), F.size(toks) - 1),
            lambda x, y: F.struct(x.alias("a"), y.alias("b")),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
    bg = docs.select(F.col(id_col), F.explode(pairs).alias("bg")).select(
        id_col, F.col("bg.a").alias("a"), F.col("bg.b").alias("b")
    )
    c2 = bg.groupBy("a", "b").agg(F.count("*").alias("c2"))
    c1 = c2.groupBy("a").agg(F.sum("c2").alias("c1"))
    vocab = docs.select(
        F.explode(tokens(F.col(text_col))).alias("tok")
    ).agg(F.count_distinct("tok").alias("v"))
    model = c2.join(c1, "a")
    surprisal = -F.log2(
        (F.col("c2") + F.lit(1)).cast("double")
        / (F.col("c1") + F.col("v")).cast("double")
    )
    return (
        bg.join(model, ["a", "b"])
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.sum(surprisal) / F.count("*"), round_digits).alias(
                "bits_per_token"
            ),
        )
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 64,
    stride: int = 48,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Overlapping token-window chunking — the context-window prep step
    between a curated corpus and sequence packing: every document is cut
    into windows of ``chunk_tokens`` tokens advancing by ``stride``
    (``chunk_tokens - stride`` tokens of overlap carry context across
    window boundaries, the standard LM pretraining layout).

    Returns ``(id, chunk_id, chunk_start, chunk_len, chunk_text)`` —
    ``chunk_start`` is the 0-based token offset, so spans can be mapped
    back to the source document without re-tokenizing.

    Scale shape: map-ONLY — split, a ``sequence`` explode, and an array
    slice are all per-row JVM expressions inside one projection; there is
    no shuffle, no state, and the operator pipelines with whatever scan
    feeds it. A document shorter than one window yields exactly one
    (short) chunk; the final window is truncated, never padded (padding
    is the packer's job, functions/packing.pack_sequences).
    """
    if stride < 1 or chunk_tokens < 1:
        raise ValueError("chunk_tokens and stride must be >= 1")
    if stride > chunk_tokens:
        # stride > window is GAP SAMPLING, not overlap chunking — and the
        # chunk-count formula would emit an empty phantom tail whenever
        # the last stride lands past the final token (found by the
        # reconstruction property test)
        raise ValueError("stride must be <= chunk_tokens (overlap >= 0)")
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    # extra windows beyond the first: ceil((n - chunk) / stride), int form
    extra = F.greatest(
        F.lit(0),
        F.floor((n - F.lit(chunk_tokens) + F.lit(stride - 1)) / F.lit(stride)),
    ).cast("int")
    start = (F.col("chunk_id") * stride).cast("int")
    return (
        docs.select(
            F.col(id_col),
            toks.alias("_toks"),
            n.alias("_n"),
            F.explode(F.sequence(F.lit(0), extra)).alias("chunk_id"),
        )
        .select(
            id_col,
            "chunk_id",
            start.alias("chunk_start"),
            F.least(F.lit(chunk_tokens), F.col("_n") - start).alias("chunk_len"),
            F.array_join(
                F.slice(F.col("_toks"), start + 1, chunk_tokens), " "
            ).alias("chunk_text"),
        )
    )


def _cdc_chunks_arrow(
    docs: DataFrame, window: int, divisor: int, text_col: str, id_col: str
) -> DataFrame:
    """Vectorized CDC kernel: per Arrow batch, the rolling window hash is
    ``window`` shifted int64 adds over the flat UTF-32 codepoint array of
    ALL texts at once (no per-character Python); windows crossing a doc
    boundary and the cut-at-end no-op are masked out; per-doc cut lists
    split out via one searchsorted. Bit-identical to the expression form
    (same Σ code[i-t]·31^t mod 1e9+7 integers, same md5 of the same
    slices) — pinned by the property test running both."""

    def batches(it):
        import hashlib

        import numpy as np
        import pandas as pd

        pows = [31**t for t in range(window)]
        empty = pd.DataFrame(
            {
                id_col: pd.Series(dtype=object),
                "chunk_idx": pd.Series(dtype="int32"),
                "start": pd.Series(dtype="int32"),
                "n_chars_chunk": pd.Series(dtype="int32"),
                "chunk_md5": pd.Series(dtype="object"),
            }
        )
        for pdf in it:
            texts, ids = [], []
            for did, txt in zip(pdf[id_col], pdf[text_col]):
                if txt:
                    ids.append(did)
                    texts.append(txt)
            if not ids:
                yield empty
                continue
            n = len(texts)
            lens = np.fromiter((len(s) for s in texts), dtype=np.int64, count=n)
            total = int(lens.sum())
            codes = np.frombuffer(
                "".join(texts).encode("utf-32-le"), dtype=np.uint32
            ).astype(np.int64)
            starts = np.zeros(n, dtype=np.int64)
            np.cumsum(lens[:-1], out=starts[1:])
            ends = starts + lens
            cut_lists: list[list[int]] = [[] for _ in range(n)]
            if total >= window:
                # h[j] = sum_t codes[j - t] * 31^t (mod M) for flat j in
                # [window-1, total): `window` shifted adds, no Python loop
                # over characters. Each term uses the MODDED power
                # ((31^t mod M) < 2^30, codes < 0x110000 < 2^21, so a
                # term < 2^51) and acc reduces mod M every step — exact
                # int64 for ANY window, where raw 31^t would wrap at
                # window>=10 (numpy wrap + numpy-vs-JVM `%` sign would
                # silently diverge from the expr form).
                acc = np.zeros(total - window + 1, dtype=np.int64)
                for t in range(window):
                    acc = (
                        acc + (pows[t] % MOD) * codes[window - 1 - t : total - t]
                    ) % MOD
                # flat j hosts a cut iff the window [j-window+1, j] sits
                # inside ONE doc and the cut is not at the doc's end
                j = np.arange(window - 1, total, dtype=np.int64)
                doc_of = np.searchsorted(ends, j, side="right")
                ok = (
                    (acc % divisor == 0)
                    & (j - window + 1 >= starts[doc_of])
                    & (j < ends[doc_of] - 1)
                )
                hits = j[ok]
                hit_docs = doc_of[ok]
                # in-doc 1-based cut positions, grouped per doc
                pos = hits - starts[hit_docs] + 1
                split_at = np.searchsorted(hit_docs, np.arange(1, n))
                for d, chunk in enumerate(np.split(pos, split_at)):
                    cut_lists[d] = chunk.tolist()
            out_id, out_idx, out_start, out_len, out_md5 = [], [], [], [], []
            for d in range(n):
                bounds = [0] + cut_lists[d] + [int(lens[d])]
                text = texts[d]
                for ci in range(len(bounds) - 1):
                    lo, hi = bounds[ci], bounds[ci + 1]
                    out_id.append(ids[d])
                    out_idx.append(ci + 1)
                    out_start.append(lo + 1)
                    out_len.append(hi - lo)
                    out_md5.append(
                        hashlib.md5(text[lo:hi].encode("utf-8")).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    # no forced dtype: Arrow casts to the declared schema,
                    # which carries the CALLER's id type through
                    id_col: pd.Series(out_id, dtype=object),
                    "chunk_idx": pd.Series(out_idx, dtype="int32"),
                    "start": pd.Series(out_start, dtype="int32"),
                    "n_chars_chunk": pd.Series(out_len, dtype="int32"),
                    "chunk_md5": out_md5,
                }
            )

    # the id column keeps the input's type (string ObjectIds, int32, ...)
    id_type = docs.schema[id_col].dataType.simpleString()
    schema = (
        f"{id_col} {id_type}, chunk_idx int, start int, "
        "n_chars_chunk int, chunk_md5 string"
    )
    return docs.select(id_col, text_col).mapInPandas(batches, schema=schema)


def cdc_chunks(
    docs: DataFrame,
    window: int = 8,
    divisor: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    impl: str = "arrow",
) -> DataFrame:
    """Content-defined chunking (the LBFS/Rabin scheme storage dedup and
    rsync-style delta pipelines use): a chunk boundary falls AFTER every
    character position whose ``window``-character rolling hash is ≡ 0
    (mod ``divisor``), so boundaries depend only on LOCAL content —
    insert a sentence into a document and every chunk outside the edited
    region keeps its identity, where fixed-size chunking shifts ALL
    downstream chunks. Chunk-level dedup over these hashes is the
    insertion-robust complement to document minhash (near-identical docs
    with splices share most CDC chunks) and the storage-dedup answer at
    100 TB (expected chunk size ≈ ``divisor`` chars).

    Returns ``(id_col, chunk_idx, start, n_chars_chunk, chunk_md5)``:
    1-based chunk index and character start, and md5 of the chunk text
    (dedup by grouping on ``chunk_md5``). Empty documents yield no rows.

    The window hash is Σ_{t=0..window-1} code[i-t]·31^t (mod 1e9+7) —
    exact integer arithmetic, every intermediate < 2.5e17, reproduced
    literally by the DuckDB oracle. Scale shape: map-ONLY either way —
    no shuffle, and the input partitioning flows through.

    Two bit-identical implementations (``impl``):

    - ``"arrow"`` (default): the rolling hash runs as ``window`` shifted
      numpy adds over the batch's flat UTF-32 codepoint array inside a
      ``mapInPandas`` (the ``texthash.poly_hash_numpy`` pattern) — one
      doc-boundary mask keeps windows in-document, per-doc cut lists
      come from one ``searchsorted`` split. Measured ~6x the expression
      form at sf0.1 warm (0.47 vs 3.08 s; the HOF path pays 8
      ``element_at`` probes per character in interpreted codegen).
    - ``"expr"``: pure in-row higher-order expressions in one
      whole-stage-codegen projection — zero Python, the form the oracle
      replays literally; the fallback where Python workers are
      unavailable (and the cross-check for the arrow kernel: the
      property test runs both against the serial model).
    """
    if window < 1 or divisor < 1:
        raise ValueError("cdc_chunks: window and divisor must be >= 1")
    # map-only means the input partitioning flows through UNCHANGED — an
    # under-split corpus file serializes the whole rolling-hash kernel on
    # its scan width (probed 1.7 s on ONE task of a 32-core run at
    # sf0.1); the chunk rows are per-document, so the fan-out is
    # result-invariant (same rule as the curation gram lanes)
    docs = fan_out_scan(docs)
    if impl == "arrow":
        return _cdc_chunks_arrow(docs, window, divisor, text_col, id_col)
    if impl != "expr":
        raise ValueError(f"cdc_chunks: unknown impl {impl!r}")
    if window > 9:
        # code * 31^9 already exceeds int64 for astral codepoints — ANSI
        # mode would throw ARITHMETIC_OVERFLOW mid-scan (and the DuckDB
        # twin would wrap). The arrow kernel folds mod M per term and
        # handles any window.
        raise ValueError("cdc_chunks: impl='expr' supports window <= 9; use impl='arrow'")
    pows = [31**t for t in range(window)]
    terms = " + ".join(
        f"element_at(_codes, CAST(i AS INT) - {t}) * {pows[t]}"
        for t in range(window)
    )
    cuts = (
        f"CASE WHEN _n > {window} THEN "
        f"filter(sequence({window}, _n - 1), i -> "
        f"(({terms}) % {MOD}) % {divisor} = 0) "
        f"ELSE CAST(array() AS array<int>) END"
    )
    return (
        docs.select(id_col, text_col)
        .filter(F.length(text_col) > 0)
        .withColumn("_n", F.length(text_col))
        .withColumn(
            "_codes",
            F.expr(
                # BIGINT elements: ANSI mode overflows INT on code*31^t
                f"transform(sequence(1, length({text_col})), "
                f"i -> CAST(ascii(substring({text_col}, i, 1)) AS BIGINT))"
            ),
        )
        .withColumn("_bounds", F.expr(f"concat(array(0), {cuts}, array(_n))"))
        .select(
            id_col,
            text_col,
            F.expr(
                "inline(transform(sequence(1, size(_bounds) - 1), j -> struct("
                "CAST(j AS INT) AS chunk_idx, "
                "element_at(_bounds, j) + 1 AS start, "
                "element_at(_bounds, j + 1) - element_at(_bounds, j) AS len)))"
            ),
        )
        .select(
            id_col,
            "chunk_idx",
            F.col("start").cast("int").alias("start"),
            F.col("len").cast("int").alias("n_chars_chunk"),
            F.md5(F.expr(f"substring({text_col}, start, len)")).alias("chunk_md5"),
        )
    )


def temperature_rebalance(
    docs: DataFrame,
    alpha: float = 0.5,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-based language/domain rebalancing (the multilingual
    sampling rule of XLM/mBERT-style pipelines): target share q_l ∝
    p_l^alpha flattens the corpus distribution toward uniform as alpha
    falls from 1 to 0. Realized as deterministic SUBSAMPLING — the
    per-stratum keep fraction has the closed form

        keep_frac_l = (n_min / n_l) ^ (1 - alpha)

    (q_l/p_l ∝ n_l^(alpha-1), normalized so the rarest stratum keeps
    100%; alpha=1 keeps everything, alpha=0 equalizes counts). The keep
    decision is the same portable hash cut as ``sample_strata`` —
    engine-reproducible, no RNG, and lowering alpha keeps a strict
    SUBSET of any higher alpha's rows.

    Returns the input rows that survive, plus the ``keep_frac`` applied
    to each row's stratum.

    Scale shape: one tiny per-stratum count aggregate (map-side partial
    combine; #strata rows), a scalar min over it folded in a second tiny
    aggregate, one broadcast join of the #strata-row rate table onto the
    corpus, and a filter — the corpus itself is never shuffled.
    """
    if not 0.0 <= alpha <= 1.0:
        raise ValueError("alpha must be in [0, 1]")
    counts = docs.groupBy(stratum_col).agg(F.count("*").alias("_n"))
    n_min = counts.agg(F.min("_n").alias("_n_min"))
    rates = counts.crossJoin(F.broadcast(n_min)).select(
        F.col(stratum_col).alias("_stratum"),
        F.pow(F.col("_n_min") / F.col("_n"), F.lit(1.0 - alpha)).alias("keep_frac"),
    )
    u = knuth_u32(id_col) / F.lit(float(HASH_MOD))
    # null-SAFE stratum equality: groupBy treats NULL as its own stratum,
    # so the rate table has a row for it — a plain `==` join would then
    # silently DROP every NULL-stratum document instead of sampling it at
    # its own stratum's rate
    return (
        docs.join(
            F.broadcast(rates),
            F.col(stratum_col).eqNullSafe(F.col("_stratum")),
        )
        .filter(u < F.col("keep_frac"))
        .drop("_stratum")
    )


def vocab_encode(
    docs: DataFrame,
    vocab_size: int = 32768,
    text_col: str = "text",
    id_col: str = "doc_id",
    unk_id: int | None = None,
) -> DataFrame:
    """Frequency-ranked vocabulary encoding: assign ids 0..vocab_size-1
    to the corpus's most frequent tokens (rank by count descending, ties
    by token ascending — a total, engine-reproducible order) and rewrite
    every document as its token-id sequence; out-of-vocabulary tokens map
    to ``unk_id`` (default ``vocab_size``). The integer layout a trainer
    consumes, and the exact-arithmetic stand-in for a learned tokenizer
    (the id-assignment/encode plumbing is identical; only the merge rules
    differ).

    Returns ``(id, ids array<int>)``.

    Scale shape: the token-count aggregate is the one corpus-wide shuffle
    (map-side partial combine on the token key). The vocabulary itself is
    produced by a distributed top-K (per-partition sort + limit merge),
    then RANKED IN-ROW: the <= vocab_size survivors collapse into one
    array, ``array_sort`` by (count desc, token asc) orders it, and a
    ``map_from_arrays`` against ``sequence(0, K-1)`` assigns ids — no
    window operator anywhere, so no global-window funnel even as a
    degenerate bounded case. The one-row token->id map is broadcast and
    each token resolves via ``element_at`` (OOV -> ``unk``); the per-doc
    re-aggregation with an in-row sort is the second and last shuffle.
    """
    unk = vocab_size if unk_id is None else unk_id
    toks = docs.select(
        F.col(id_col), F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "tok")
    )
    counts = toks.groupBy("tok").agg(F.count("*").alias("_cnt"))
    # distributed top-K (TakeOrderedAndProject), bounded by the constant K
    top = counts.orderBy(F.desc("_cnt"), F.asc("tok")).limit(int(vocab_size))
    # (-count, token) sorts ascending == (count desc, token asc)
    order_struct = F.struct((-F.col("_cnt")).alias("_neg"), F.col("tok").alias("tok"))
    vocab_row = (
        top.agg(F.array_sort(F.collect_list(order_struct)).alias("_arr"))
        .select(
            F.when(
                F.size("_arr") > 0,
                F.map_from_arrays(
                    F.transform(F.col("_arr"), lambda s: s["tok"]),
                    F.sequence(F.lit(0), F.size("_arr") - 1),
                ),
            )
            .otherwise(F.map_from_arrays(F.array(), F.array()))
            .alias("_vocab")
        )
    )
    enc = toks.crossJoin(F.broadcast(vocab_row)).select(
        id_col,
        "pos",
        F.coalesce(
            F.element_at(F.col("_vocab"), F.col("tok")), F.lit(int(unk))
        ).alias("tok_id"),
    )
    return enc.groupBy(id_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "tok_id"))),
            lambda s: s["tok_id"],
        ).alias("ids")
    )


def sample_exact_k(
    docs: DataFrame,
    k: int,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Exactly-``k``-per-stratum deterministic uniform sample. Rate-based
    sampling (``sample_strata``) yields a BINOMIAL count per stratum;
    mixture designs that promise "k docs per language" need the exact
    count. Rows rank within their stratum by the portable hash (ties are
    impossible: the id breaks hash collisions) and the top ``k`` survive
    — engine-reproducible, no RNG, and k' < k keeps a strict subset of
    k's rows (ranks only truncate).

    Scale shape: REUSES ``cap_per_domain``'s skew-safe two-phase top-K
    with the hash as the quality order — a hot stratum spreads over the
    scan's partitions in phase 1, so no single task ever sorts a whole
    stratum.
    """
    hashed = docs.withColumn("_neg_u", -knuth_u32(id_col, seed))
    return cap_per_domain(
        hashed, k, domain_col=stratum_col, order_col="_neg_u", id_col=id_col
    ).drop("_neg_u")


def sample_weighted(
    docs: DataFrame,
    k: int,
    weight_col: str = "n_chars",
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement — sequential
    Poisson sampling (Ohlsson 1998, the πps design survey and stream
    pipelines use): row i draws the uniform ``u_i = knuth_u32(id)+1``
    (scale cancels in ranking) and survives iff its priority
    ``ξ_i = u_i / w_i`` is in the global bottom-``k``, so inclusion
    probability ≈ ``k·w_i/Σw``. Mixture builders use this to sample a
    quality- or length-weighted subset in ONE pass, no RNG state.

    Why this key and not Efraimidis–Spirakis ``u^(1/w)``: the E-S key
    needs pow/ln whose libm rounding differs per engine; ``ξ`` is one
    bigint→double division — IEEE-identical in Spark and the DuckDB
    oracle, so the selected SET matches exactly. Rows with NULL or
    non-positive weight carry zero mass and are excluded.

    Scale shape: the key is computed in-row (map-only); the global
    bottom-k materializes through ``orderBy(ξ).limit(k)``, which
    Catalyst plans as TakeOrderedAndProject — per-partition top-k then
    a k-row merge, never a global sort/exchange of the corpus.
    """
    w = F.col(weight_col).cast("double")
    key = (knuth_u32(id_col, seed) + F.lit(1)).cast("double") / w
    return (
        docs.filter(w > 0)
        .withColumn("_xi", key)
        .orderBy(F.col("_xi").asc(), F.col(id_col).asc())
        .limit(k)
        .drop("_xi")
    )


def quality_deciles(
    docs: DataFrame,
    score_col: str = "n_chars",
    n_buckets: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """Rank-exact quality binning: bucket d holds rows whose global rank r
    (by ``score_col`` DESC, ties by id) satisfies ``floor(r*n/N) == d`` —
    bucket 0 is the best ~N/n rows, the cut a "keep the top 30%" quality
    gate consumes. Exact integer arithmetic end to end: no float
    percentile estimation, so the oracle's ``row_number``-based replay
    matches row for row.

    Scale shape: the global rank REUSES the distributed prefix sum
    (``assign_row_ids``: one range exchange, per-partition windows,
    broadcast offsets — no single-partition window); the row count N
    joins as a broadcast scalar. The oracle's own single-partition
    ``row_number`` window is exactly the plan this avoids.
    """
    ranked = assign_row_ids(
        docs.withColumn("_neg_score", -F.col(score_col)),
        ["_neg_score", id_col],
        out_col="_rank",
    ).drop("_neg_score")
    total = docs.agg(F.count("*").alias("_total"))
    return (
        ranked.crossJoin(F.broadcast(total))
        .withColumn(
            "decile",
            # integral `div`, not double division: the docstring promises
            # exact integer arithmetic, and floor-via-binary64 can misbin
            # boundary ranks once rank*n approaches 2^53
            F.expr(f"(_rank * {int(n_buckets)}) div _total").cast("int"),
        )
        .drop("_rank", "_total")
    )


def decontaminate_bloom(
    corpus: DataFrame,
    eval_docs: DataFrame,
    n: int = 5,
    m_bits: int = 1 << 20,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Bloom-filter decontamination — the fixed-size-broadcast variant of
    ``decontaminate``. The eval side compresses to an ``m_bits``-position
    Bloom filter (``k`` dialect-portable polynomial hash positions per
    distinct n-gram); the corpus side is checked entirely IN-ROW against
    the broadcast filter.

    Why it exists at 100 TB: ``decontaminate`` broadcasts the eval gram
    SET, whose size grows with the eval suite; here the broadcast is
    ``m_bits`` regardless (choose m for the target false-positive rate
    ``(1-e^{-k·g/m})^k``), and the corpus plan has NO join, aggregate, or
    shuffle at all — gram extraction, probing, and the per-doc verdict
    are one map-only projection over the scan. The error is one-sided:
    false POSITIVES only (a clean doc may flag; a contaminated doc never
    escapes), which is the safe direction for decontamination — you only
    ever over-drop.

    Deterministic end to end: position ``i`` of gram g is
    ``(poly(g)·(2i+1) + 7919·i) mod m_bits`` with the texthash
    polynomial, so a DuckDB oracle reproduces the filter bit-for-bit —
    including which false positives fire.

    Returns ``(id_col, n_grams, n_flagged, contaminated)`` with the same
    every-document contract as ``decontaminate`` (short docs have
    ``n_grams = 0`` and are never contaminated).

    The filter is represented as a one-row ``map<int,boolean>`` (hash
    lookup per probe); a production build would pack it to ``m/64``
    longs, which changes constants, not shape — the broadcast is O(m)
    and the probe O(1) either way.
    """
    from mongoshake_spark.functions.texthash import poly_hash_spark

    ph = poly_hash_spark("gram")
    eval_grams = _doc_ngrams(eval_docs, n, text_col, id_col).select("gram").distinct()
    # hash once per gram, THEN derive the k positions — the character-fold
    # aggregate is O(len(gram)) and must not run k times per gram
    pos = (
        eval_grams.select(F.expr(ph).alias("_h"))
        .select(
            F.explode(
                F.array(
                    *[
                        F.expr(
                            f"CAST(((_h * {2 * i + 1} + {7919 * i}) % {int(m_bits)}) AS INT)"
                        )
                        for i in range(int(k))
                    ]
                )
            ).alias("p")
        )
        .distinct()
    )
    bloom_row = pos.agg(F.collect_list("p").alias("_ps")).select(
        F.when(
            F.size("_ps") > 0,
            F.map_from_arrays("_ps", F.transform("_ps", lambda _: F.lit(True))),
        )
        .otherwise(
            F.map_from_arrays(
                F.array().cast("array<int>"), F.array().cast("array<boolean>")
            )
        )
        .alias("_bloom")
    )
    gh = poly_hash_spark("g")
    hit = " AND ".join(
        f"element_at(_bloom, CAST(((h * {2 * i + 1} + {7919 * i}) % {int(m_bits)}) AS INT)) IS NOT NULL"
        for i in range(int(k))
    )
    return (
        fan_out_scan(corpus)  # gram explode + k probes are CPU-bound
        .crossJoin(F.broadcast(bloom_row))
        .withColumn(
            "_grams", F.array_distinct(_ngram_col(tokens(F.col(text_col)), n))
        )
        .withColumn("_hashes", F.expr(f"transform(_grams, g -> {gh})"))
        .select(
            F.col(id_col),
            F.size("_hashes").cast("bigint").alias("n_grams"),
            F.expr(f"CAST(size(filter(_hashes, h -> {hit})) AS BIGINT)").alias(
                "n_flagged"
            ),
        )
        .withColumn("contaminated", F.col("n_flagged") > 0)
    )


def assign_splits(
    docs: DataFrame,
    fractions: dict[str, int] | None = None,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Deterministic train/validation/test split assignment: bucket =
    ``knuth_u32(id, seed) mod total_weight`` mapped through cumulative
    integer weight ranges. ``fractions`` maps split name -> INTEGER
    weight (default ``{"train": 90, "val": 5, "test": 5}``), so the
    contract is exact integer arithmetic — no float thresholds to
    diverge between engines — and the assignment is a pure per-row
    projection: no shuffle, no RNG state, reproducible for the same ids
    under any partitioning or re-run (the property a training pipeline
    needs so a re-materialized corpus never leaks val docs into train).

    Names are assigned in INSERTION order of ``fractions`` — the caller's
    dict order is the range order.
    """
    if fractions is None:
        fractions = {"train": 90, "val": 5, "test": 5}
    if not fractions or any(
        (not isinstance(w, int)) or w <= 0 for w in fractions.values()
    ):
        raise ValueError("fractions must map names to positive integer weights")
    total = sum(fractions.values())
    bucket = F.pmod(knuth_u32(id_col, seed=seed), F.lit(total))
    expr = None
    cum = 0
    for name, w in fractions.items():
        cum += w
        cond = bucket < F.lit(cum)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return docs.withColumn("split", expr)


def classifier_score(
    docs: DataFrame,
    n_buckets: int = 4096,
    scale: int = 1000,
    text_col: str = "text",
    id_col: str = "doc_id",
    weights: DataFrame | None = None,
) -> DataFrame:
    """Feature-hashed LINEAR quality classifier (the fasttext /
    logistic-regression filtering pass every production corpus runs —
    CCNet's LM filter, GPT-3's WebText classifier): each token hashes
    into one of ``n_buckets`` feature buckets (feature hashing,
    Weinberger et al. 2009), the document score is the bucket-weight sum
    over token OCCURRENCES normalized by length, keep = score > 0.

    ``weights`` is the trained model: a ``(bucket, wint)`` DataFrame of
    integer weights in [-scale, scale] (fixed-point: wint = round(w *
    scale)). It is model-sized — broadcast, never shuffled. When omitted,
    weights derive IN-ROW from the bucket id (``(bucket * 2654435761) %
    (2*scale+1) - scale`` — a deterministic stand-in that makes the whole
    computation engine-portable for the oracle; real deployments pass the
    trained table).

    The operator is float-free END-TO-END: integer weight sums are
    order-free (no accumulation drift across engines or partitionings)
    and the normalized score is fixed-point parts-per-million of full
    scale (sign-split integer division — engines disagree on negative
    integer-division conventions and on rounding near-tie float
    quotients, so neither is allowed near the result). Scale shape: the
    default path is MAP-ONLY (nested higher-order aggregate per row —
    zero exchanges, zero joins); the trained-weights path explodes to
    (doc, bucket) rows and broadcast-joins the model, one groupBy(doc)
    shuffle.

    Returns ``(id_col, n_tokens, score_ppm, keep)`` for docs with >= 1
    token; ``score_ppm = score_int * 1e6 / (scale * n_tokens)``
    truncated toward zero, in [-1e6, 1e6].
    """
    mod = 2 * scale + 1
    if weights is not None:
        toks = docs.select(
            F.col(id_col),
            F.explode(
                F.filter(
                    F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
                    lambda t: t != "",
                )
            ).alias("_tok"),
        )
        from mongoshake_spark.functions.texthash import poly_hash_spark

        bucketed = toks.select(
            id_col,
            (F.expr(poly_hash_spark("_tok")) % n_buckets).alias("bucket"),
        )
        # LEFT join: a bucket absent from the model weighs 0 but its
        # token still counts toward the length normalizer (an inner join
        # would silently shrink n_tokens and inflate |score|)
        scored = (
            bucketed.join(F.broadcast(weights), "bucket", "left")
            .groupBy(id_col)
            .agg(
                F.count("*").alias("n_tokens"),
                F.sum(F.coalesce(F.col("wint"), F.lit(0))).alias("_score_int"),
            )
        )
    else:
        # in-row: score_int = sum over tokens of wint(poly_hash(tok) % nb)
        from mongoshake_spark.functions.texthash import MOD

        expr = (
            f"aggregate(filter(split(lower({text_col}), '[^a-z0-9]+'), "
            f"t -> t != ''), CAST(0 AS BIGINT), (s, t) -> s + "
            f"((aggregate(sequence(1, length(t)), CAST(0 AS BIGINT), "
            f"(acc, i) -> (acc * 31 + ascii(substring(t, i, 1))) % {MOD}) "
            f"% {n_buckets}) * 2654435761) % {mod} - {scale})"
        )
        ntok = (
            f"size(filter(split(lower({text_col}), '[^a-z0-9]+'), "
            f"t -> t != ''))"
        )
        scored = docs.select(
            F.col(id_col),
            F.expr(ntok).cast("bigint").alias("n_tokens"),
            F.expr(expr).alias("_score_int"),
        )
    ppm = (
        F.when(F.col("_score_int") < 0, F.lit(-1)).otherwise(F.lit(1)).cast("long")
        * F.expr(f"(abs(_score_int) * 1000000) div ({scale} * n_tokens)")
    )
    return (
        scored.filter(F.col("n_tokens") > 0)
        .select(
            id_col,
            "n_tokens",
            ppm.alias("score_ppm"),
            (F.col("_score_int") > 0).alias("keep"),
        )
    )
