"""Text-analysis functions for the training-data pipeline, over the
``documents`` table: tokenization, quality signals, language-ID heuristic,
document fingerprinting.

All pure column expressions (whole-stage codegen; zero Python in the hot
path) and all integer-valued or exact — every output is DuckDB-oracle
checkable without float-rounding hazards.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mongoshake_spark.functions.texthash import poly_hash_spark

# A tiny high-frequency English stopword set for the n-gram/stopword
# language heuristic (public-knowledge word list).
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")

WORD_RE = "[a-zA-Z0-9]+"


def tokens(col: Column) -> Column:
    """Whitespace tokenization (single-space delimiter, matching the
    fixture corpus and the DuckDB ``string_split`` oracle)."""
    return F.split(col, " ")


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def word_count(col: Column) -> Column:
    """BPE-ish regex token count: alnum runs."""
    return F.regexp_count(col, F.lit(WORD_RE))


def stopword_count(col: Column) -> Column:
    toks = tokens(col)
    return F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))


def quality_signals(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / token / stopword quality signals + an integer quality class.

    Class rule (integer arithmetic only, so the oracle matches exactly):
      2 (good)   : >= 20 tokens and stopwords >= 5% of tokens
      1 (short)  : < 20 tokens
      0 (lowq)   : everything else
    """
    c = F.col(text_col)
    out = docs.select(
        F.col("doc_id"),
        F.length(c).alias("n_chars_calc"),
        token_count(c).alias("n_tokens"),
        word_count(c).alias("n_words"),
        stopword_count(c).alias("n_stopwords"),
    )
    return out.withColumn(
        "quality_class",
        F.when(F.col("n_tokens") < 20, F.lit(1))
        .when(F.col("n_stopwords") * 20 >= F.col("n_tokens"), F.lit(2))
        .otherwise(F.lit(0)),
    )


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-based language heuristic: classify as 'en' when English
    stopwords make up >= 2% of tokens (and at least 2 occur), else 'other'.
    """
    c = F.col(text_col)
    n_stop = stopword_count(c)
    n_tok = token_count(c)
    pred = F.when((n_stop >= 2) & (n_stop * 50 >= n_tok), F.lit("en")).otherwise(
        F.lit("other")
    )
    return docs.select(
        F.col("doc_id"), pred.alias("lang_pred"), F.col("lang").alias("lang_actual")
    )


# --- Repetition signals (Gopher-style repetition filters) ---------------
#
# Training-corpus quality filters flag documents dominated by repeated
# n-grams. Two standard signals, both exact integers so the DuckDB oracle
# matches bit-for-bit:
#   top_bigram_n     : occurrences of the document's most frequent bigram
#   dup_trigram_n    : number of trigram instances whose trigram occurs
#                      more than once within the document
# The fraction forms (top_bigram_n*2/n_tokens etc.) are left to the caller
# so no float crosses the oracle boundary.


def _ngram_col(toks: Column, n: int) -> Column:
    """Token n-grams as an array column — pure higher-order expressions,
    whole-stage codegen, empty array when the doc is shorter than n."""
    joined = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )
    return F.when(F.size(toks) >= n, joined).otherwise(
        F.array().cast("array<string>")
    )


def repetition_signals(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document repetition statistics over token bigrams/trigrams.

    Scale shape: explode -> groupBy(doc_id, gram) -> count runs with
    map-side partial aggregation; the per-document argmax is a second
    hash aggregate (max of a (count, gram) struct — NO window, so no
    single-partition hazard and partial combine applies). Shuffles carry
    (doc_id, gram) pairs only, never the document text.
    """
    toks = tokens(F.col(text_col))
    base = docs.select("doc_id", toks.alias("toks")).select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        _ngram_col(F.col("toks"), 2).alias("bigrams"),
        _ngram_col(F.col("toks"), 3).alias("trigrams"),
    )
    bi = (
        base.select("doc_id", F.explode("bigrams").alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count("*").alias("cnt"))
        .groupBy("doc_id")
        .agg(F.max(F.struct(F.col("cnt"), F.col("gram"))).alias("m"))
        .select(
            "doc_id",
            F.col("m.gram").alias("top_bigram"),
            F.col("m.cnt").alias("top_bigram_n"),
        )
    )
    tri = (
        base.select("doc_id", F.explode("trigrams").alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count("*").alias("cnt"))
        .groupBy("doc_id")
        .agg(
            F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(F.lit(0))).alias(
                "dup_trigram_n"
            )
        )
    )
    return (
        base.select("doc_id", "n_tokens")
        .join(bi, "doc_id", "left")
        .join(tri, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("top_bigram", F.lit("")).alias("top_bigram"),
            F.coalesce("top_bigram_n", F.lit(0)).alias("top_bigram_n"),
            F.coalesce("dup_trigram_n", F.lit(0)).alias("dup_trigram_n"),
        )
    )


# --- PII scrubbing -------------------------------------------------------
#
# Regexes restricted to the Java-regex / RE2 common subset (no lookaround,
# no backrefs) so Spark and the DuckDB oracle agree literally.
EMAIL_RE = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
PHONE_RE = r"\b[0-9]{3}-[0-9]{4}\b"


def scrub_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact email addresses and phone-shaped numbers, reporting match
    counts and a fingerprint of the scrubbed text. Pure column expressions
    (regexp_count / regexp_replace are JVM-side; replace-all semantics on
    both engines)."""
    c = F.col(text_col)
    after_email = F.regexp_replace(c, EMAIL_RE, "<EMAIL>")
    scrubbed = F.regexp_replace(after_email, PHONE_RE, "<PHONE>")
    return docs.select(
        "doc_id",
        F.regexp_count(c, F.lit(EMAIL_RE)).alias("n_emails"),
        # phones counted on the EMAIL-SCRUBBED text, matching the
        # replacement order — a phone-shaped run inside an email address
        # (john@555-1234.com) is redacted as part of the <EMAIL> and must
        # not be reported as a <PHONE> that does not exist in the output
        F.regexp_count(after_email, F.lit(PHONE_RE)).alias("n_phones"),
        F.md5(scrubbed).alias("fp_scrubbed"),
    )


def term_filter(
    docs: DataFrame,
    terms,
    max_hits: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
    bloom: bool = False,
    m_bits: int = 1 << 16,
    k: int = 3,
) -> DataFrame:
    """Token term-list filter — the C4 "badwords" rule shape (and its
    allowlist dual): count each document's tokens that appear in
    ``terms`` and keep documents with at most ``max_hits`` of them.
    Published pipelines drop a document on ANY blocklist hit
    (``max_hits=0``, the default); quality variants allow a budget.

    Returns ``(doc_id, n_hits, keep)`` so callers can either filter on
    ``keep`` or feed ``n_hits`` into a composite score.

    Scale shape: the term list rides as an in-row broadcast array
    literal and the count is one higher-order ``filter``/``size``
    expression — pure map inside whole-stage codegen, zero shuffles,
    zero UDFs, term-list size bounded by the expression tree.

    ``bloom=True`` is the 100k+-term path (multilingual badword lists):
    the term list compresses to an ``m_bits``-position Bloom filter —
    ``k`` dialect-portable polynomial hash positions per term, the same
    family as ``decontaminate_bloom`` — broadcast as ONE row regardless
    of list size, and each token is probed in-row (no join, no
    shuffle; the exact-array form's expression tree would grow with the
    list instead). The error is one-sided: false POSITIVES only, i.e.
    ``n_hits`` can only overcount and ``keep`` can only over-drop —
    the safe direction for a blocklist (a listed term never escapes);
    for an ALLOWLIST use the exact form, where over-matching would
    over-keep. Hash positions are ``(poly(t)·(2i+1) + 7919·i) mod
    m_bits``, so a DuckDB oracle reproduces the filter bit-for-bit —
    including which false positives fire.
    """
    terms = list(terms)
    if not terms:
        raise ValueError("term_filter: empty term list")
    toks = tokens(F.col(text_col))
    if not bloom:
        arr = F.array(*[F.lit(t) for t in terms])
        n = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
        return docs.select(
            id_col,
            n.alias("n_hits"),
            (n <= F.lit(int(max_hits))).alias("keep"),
        )
    from mongoshake_spark.functions.texthash import MOD, poly_hash_spark

    m_bits, k = int(m_bits), int(k)
    # the term list is driver-side already, so its positions fold here
    # with the SAME polynomial the in-row probe uses (ord == Spark ascii
    # == DuckDB ascii on the full codepoint range)
    positions: set[int] = set()
    for t in terms:
        h = 0
        for ch in t:
            h = (h * 31 + ord(ch)) % MOD
        for i in range(k):
            positions.add((h * (2 * i + 1) + 7919 * i) % m_bits)
    bloom_row = docs.sparkSession.createDataFrame(
        [(sorted(positions),)], "_ps array<int>"
    ).select(
        F.map_from_arrays(
            "_ps", F.transform("_ps", lambda _: F.lit(True))
        ).alias("_bloom")
    )
    th = poly_hash_spark("t")
    hit = " AND ".join(
        f"element_at(_bloom, CAST(((h * {2 * i + 1} + {7919 * i}) "
        f"% {m_bits}) AS INT)) IS NOT NULL"
        for i in range(k)
    )
    return (
        docs.crossJoin(F.broadcast(bloom_row))
        # drop empty tokens BEFORE probing: consecutive/leading spaces
        # split to '' which hashes to 0, and if the three h=0 positions
        # happen to be set, whitespace alone would count as a hit — a
        # false-positive class the exact-array form cannot produce
        # (round-10 advice; the oracle mirrors this filter)
        .withColumn(
            "_hs",
            F.expr(
                f"transform(filter({_toks_sql(text_col)}, t -> t != ''), "
                f"t -> {th})"
            ),
        )
        .select(
            id_col,
            F.expr(f"size(filter(_hs, h -> {hit}))").alias("n_hits"),
        )
        .withColumn("keep", F.col("n_hits") <= F.lit(int(max_hits)))
    )


def _toks_sql(text_col: str) -> str:
    """SQL-expression twin of :func:`tokens` (single-space split), for
    composition inside higher-order ``F.expr`` strings."""
    return f"split({text_col}, ' ')"


def entropy_signals(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document word-distribution signals: Shannon entropy (bits) of
    the token frequency distribution and the type-token ratio — the
    standard gibberish/boilerplate detectors complementing the Gopher
    repetition counts (a keyboard-mash doc has HIGH type-token ratio but
    low stopword mass; a template doc has LOW entropy for its length).

    Entropy folds as ``log2(n) - (Σ c·log2 c)/n`` over the per-token
    counts c (algebraically identical to ``-Σ (c/n)·log2(c/n)`` but one
    aggregate instead of a per-row p·log p after a second join). The
    Σ c·log2 c partials merge in nondeterministic order, so the entropy
    crosses the oracle boundary rounded to 4 digits — ``lm_score``'s
    contract, where the rounding absorbs the order drift (the
    type-token ratio is ONE exact division and keeps 6).

    Scale shape: explode → groupBy(doc_id, tok) → count with map-side
    partial aggregation, then one more hash aggregate per doc_id; the
    shuffles carry (doc_id, token) pairs, never the text. No windows.
    """
    toks = tokens(F.col(text_col))
    counts = (
        docs.select(id_col, F.explode(toks).alias("tok"))
        .groupBy(id_col, "tok")
        .agg(F.count("*").alias("cnt"))
    )
    n = F.sum("cnt").cast("double")
    return (
        counts.groupBy(id_col)
        .agg(
            F.sum("cnt").alias("n_tokens"),
            F.count("*").alias("n_types"),
            (
                F.log2(n) - F.sum(F.col("cnt") * F.log2("cnt")) / n
            ).alias("_h"),
        )
        .select(
            id_col,
            "n_tokens",
            "n_types",
            F.round(F.col("n_types") / F.col("n_tokens"), 6).alias("type_token_ratio"),
            F.round("_h", 4).alias("entropy_bits"),
        )
    )


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: rolling polynomial hash (oracle-portable) plus
    md5 (both engines agree on md5 of the raw text). For pure-Spark use at
    scale, xxhash64(text) is the faster 64-bit alternative."""
    return docs.select(
        F.col("doc_id"),
        F.expr(poly_hash_spark(text_col)).alias("fp_poly"),
        F.md5(F.col(text_col)).alias("fp_md5"),
    )
