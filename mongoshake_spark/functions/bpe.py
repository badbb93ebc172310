"""Distributed BPE merge learning — the tokenizer-training step of a
training-data pipeline (Sennrich, Haddow, Birch, "Neural Machine
Translation of Rare Words with Subword Units", ACL 2016).

No reference analog (MongoShake moves documents; it does not train
tokenizers); this is core LLM-corpus infrastructure: the corpus the
engine curates is what the tokenizer is fitted on, and at 100 TB the
fit must be distributed.

Algorithm, re-expressed Spark-first:

- the corpus collapses to its DISTINCT-WORD table once
  (:func:`bpe_word_table`): BPE statistics are over word TYPES weighted
  by frequency, so every later pass is bounded by vocabulary size, not
  corpus size — the one shuffle that touches the corpus;
- each merge step is (1) a pair-count aggregation over adjacent symbol
  pairs (map-side combined, weighted by word count) — maintained with
  exact DELTAS over the affected word slice in the default incremental
  form (pair statistics are word-TYPE-bounded model state, held
  driver-side like k-means seeds; see ``bpe_train``), (2) an argmax
  with a total deterministic order (count desc, then pair
  lexicographic) — free on the driver table, or ONE collected row in
  the recount form — and (3) an in-row rewrite of the symbol arrays of
  the words that CAN change (left-to-right non-overlapping, a single
  ``F.aggregate`` fold behind an adjacency predicate — no Python, no
  shuffle);
- the word table is lineage-truncated per step (``localCheckpoint``),
  the iterative-algorithm rule every Lloyd-style loop here follows.

Encoding (:func:`bpe_encode`) replays the merge list over the
distinct-word table — vocabulary-sized work — then joins the encoded
words back to documents, so encoding a 100 TB corpus is one broadcast
word-table join, not a per-document merge loop.

Symbols are the word's codepoints plus a terminal ``</w>`` marker (the
published formulation, so ``er`` mid-word and ``er</w>`` word-final
learn separate merges).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

END_OF_WORD = "</w>"


def bpe_word_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt, syms) — the distinct-word table with initial symbol
    arrays (codepoints + the end-of-word marker), lineage-truncated."""
    words = (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
    syms = F.concat(
        F.split(F.col("word"), ""), F.array(F.lit(END_OF_WORD))
    )
    # explicit-width repartition before the eager checkpoint: AQE
    # coalesces the distinct-word shuffle to ~1 partition by BYTES, and
    # the checkpoint freezes that width — every downstream interpreted
    # merge_rewrite fold (4 chained HOFs per word in bpe_encode) then ran
    # single-task (probed ~1 s on one task of a 32-core run at sf0.1).
    # An explicit repartition is exempt from AQE coalescing; the rewrite
    # is per-word, so the fan-out is result-invariant.
    fan = docs.sparkSession.sparkContext.defaultParallelism
    return (
        words.withColumn("syms", syms)
        .repartition(fan)
        .localCheckpoint(eager=True)
    )


def _adjacent_pairs(syms) -> Column:
    """array<struct<l,r>> of the adjacent symbol pairs of one word."""
    n = F.size(syms)
    return F.when(
        n >= 2,
        F.zip_with(
            F.slice(syms, 1, n - 1),
            F.slice(syms, 2, n - 1),
            lambda a, b: F.struct(a.alias("l"), b.alias("r")),
        ),
    ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))


def _pair_counts(words: DataFrame) -> DataFrame:
    """(l, r, c): adjacent symbol pairs weighted by word frequency —
    map-side combined aggregation over the vocabulary."""
    return (
        words.select("cnt", F.explode(_adjacent_pairs(F.col("syms"))).alias("p"))
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("cnt").alias("c"))
    )


def _has_adjacent_pair(syms, left: Column, right: Column) -> Column:
    """True when the word contains the (left, right) adjacency — the
    membership test that restricts each merge step's work to the words
    the merge can actually change."""
    return F.exists(
        _adjacent_pairs(syms),
        lambda p: (p["l"] == left) & (p["r"] == right),
    )


def merge_rewrite(syms: Column, left: Column, right: Column, merged: Column) -> Column:
    """Left-to-right non-overlapping replacement of the (left, right)
    symbol pair with ``merged`` inside one symbol array — a single
    in-row fold: the accumulator carries (emitted symbols, one pending
    symbol); a merge consumes the pending ``left`` and the incoming
    ``right`` without re-matching the merged token in the same pass
    (``aaa`` + (a,a) -> [aa, a], the BPE scan order)."""
    init = F.struct(
        F.array().cast("array<string>").alias("done"),
        F.lit(None).cast("string").alias("pv"),
    )

    def step(acc, s):
        is_merge = acc["pv"].eqNullSafe(left) & s.eqNullSafe(right)
        return F.when(
            is_merge, F.struct(acc["done"].alias("done"), merged.alias("pv"))
        ).otherwise(
            F.struct(
                F.when(acc["pv"].isNull(), acc["done"])
                .otherwise(F.concat(acc["done"], F.array(acc["pv"])))
                .alias("done"),
                s.alias("pv"),
            )
        )

    def fin(acc):
        return F.when(acc["pv"].isNull(), acc["done"]).otherwise(
            F.concat(acc["done"], F.array(acc["pv"]))
        )

    return F.aggregate(syms, init, step, fin)


def _train_local(word_rows, n_merges: int) -> list[tuple]:
    """Driver-local BPE fit over the collected word-TYPE table — the
    production shape (Sennrich's own trainer, HF tokenizers): corpus-
    bounded work stays distributed (the word count), vocabulary-bounded
    work runs in one process's RAM where a merge step costs the affected
    slice with NO per-step job scheduling. Exact delta maintenance with
    a pair -> word-ids inverted index; stale index entries are guarded
    by a containment re-check (the standard trick), so the maintained
    counts stay exact and the merge table is identical to the
    distributed forms (property-tested). Same deterministic tie-break:
    count desc, then pair lexicographic."""
    from collections import Counter, defaultdict

    vocab = [[list(syms), int(cnt)] for syms, cnt in word_rows]
    pair_counts: Counter = Counter()
    pair_words: dict = defaultdict(set)
    for wid, (syms, cnt) in enumerate(vocab):
        for p in zip(syms, syms[1:]):
            pair_counts[p] += cnt
            pair_words[p].add(wid)
    merges: list[tuple] = []
    for step in range(n_merges):
        if not pair_counts:
            break
        (l, r), c = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merged = l + r
        merges.append((step, l, r, merged, int(c)))
        for wid in sorted(pair_words.pop((l, r), ())):
            syms, cnt = vocab[wid]
            # stale index entry: the word was rewritten since it was
            # indexed under this pair and no longer holds the adjacency
            if not any(a == l and b == r for a, b in zip(syms, syms[1:])):
                continue
            for p in zip(syms, syms[1:]):
                pair_counts[p] -= cnt
                if pair_counts[p] <= 0:
                    del pair_counts[p]
            new, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    new.append(merged)
                    i += 2
                else:
                    new.append(syms[i])
                    i += 1
            vocab[wid][0] = new
            for p in zip(new, new[1:]):
                pair_counts[p] += cnt
                pair_words[p].add(wid)
    return merges


#: TOTAL SYMBOL count (sum of per-type symbol-list lengths) above which
#: ``bpe_train``'s auto mode falls back to the distributed per-merge
#: forms. Driver RAM for the local fit scales with total symbols, NOT
#: word types: ``pair_words`` holds one set entry per adjacent-pair
#: occurrence (~100–150 B of Python object overhead each) and ``vocab``
#: one string list per type, so gating on type count alone lets
#: long-word corpora (URLs, unsegmented CJK) blow the estimate at far
#: fewer types. At 20M symbols the index is ~2–3 GiB — the "few GiB in
#: one process" class every standard BPE trainer occupies. Override per
#: deployment with ``SPARK_GRAFT_BPE_LOCAL_MAX_SYMBOLS``.
LOCAL_MAX_SYMBOLS = int(
    os.environ.get("SPARK_GRAFT_BPE_LOCAL_MAX_SYMBOLS", 20_000_000)
)

#: retained alias for the old type-count cap; the auto gate now checks
#: :data:`LOCAL_MAX_SYMBOLS` (round-10 advice: type count under-predicts
#: driver RAM for long-word corpora)
LOCAL_MAX_TYPES = 10_000_000


def bpe_train(
    docs: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    words: DataFrame | None = None,
    incremental: bool | None = None,
    local: bool | None = None,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges; returns the merge table
    ``(step, lhs, rhs, merged, pair_count)`` in learning order. Stops
    early if the vocabulary runs out of adjacent pairs. Pass a
    pre-built ``words`` table to share it with other passes.

    ``incremental=True`` maintains the distributed pair-count table with
    DELTAS — Sennrich's own optimization: a merge of ``(l, r)`` only
    changes the pair statistics of words that CONTAIN the ``(l, r)``
    adjacency, so each step subtracts those words' old pairs and adds
    their rewritten pairs instead of re-exploding the whole vocabulary.
    At a production 32k-merge fit this is the difference between 2·32k
    full-vocabulary jobs and affected-fraction work (late-stage merges
    touch a vanishing share of words — see the A/B in BASELINE.md).
    ``incremental=False`` keeps the full-recount form; both produce the
    identical merge table (property-tested) because the maintained
    counts are exact, not approximate.

    ``local`` (default auto) is the PRODUCTION strategy: collect the
    word-TYPE table to the driver and fit in RAM (:func:`_train_local`).
    Round-10 measurement (BASELINE.md) settled the strategy question:
    per-merge distributed jobs are the wrong shape at EVERY scale —
    map-side combine already collapses the recount shuffle to distinct
    pairs per partition, so both distributed forms pay a full
    vocabulary scan plus job scheduling per step (recount 91.6 s /
    incremental 241.5 s for 32 merges over 210k types; the late-stage
    window favors recount too), while the local fit runs the same 32
    merges in under a second after one collect. The type table is
    model-sized by construction — O(total symbols) driver RAM, ~5 MB
    of payload at 210k types — and auto mode falls back to the
    distributed ``incremental`` form past :data:`LOCAL_MAX_SYMBOLS`
    (where the ~few-GB index would crowd the driver). Explicitly
    passing ``incremental=`` selects that DISTRIBUTED form — auto-local
    steps aside, so an A/B of the distributed strategies never silently
    measures the local one. The distributed forms remain for the >cap
    regime and as the oracle for the property tests."""
    if n_merges < 1:
        raise ValueError("bpe_train: n_merges must be >= 1")
    spark = docs.sparkSession
    if words is None:
        words = bpe_word_table(docs, text_col)
    if local is None:
        # a caller who explicitly picks a distributed form (incremental=
        # True/False) gets that form — auto-local must not silently
        # benchmark/run the wrong strategy (round-10 review finding);
        # with neither knob set, auto picks local when the TOTAL SYMBOL
        # count fits the driver-RAM cap (round-10 advice: type count
        # under-predicts RAM for long-word corpora — the index is
        # O(total symbols), one ~100 B entry per adjacent pair)
        local = (
            incremental is None
            and int(
                words.agg(
                    F.coalesce(F.sum(F.size("syms")), F.lit(0)).alias("s")
                ).collect()[0]["s"]
            )
            <= LOCAL_MAX_SYMBOLS
        )
    if incremental is None:
        incremental = True
    if local:
        rows = [
            (list(r["syms"]), int(r["cnt"]))
            for r in words.select("syms", "cnt").collect()
        ]
        return spark.createDataFrame(
            _train_local(rows, n_merges),
            "step int, lhs string, rhs string, merged string, pair_count long",
        )
    merges: list[tuple] = []
    counts: dict[tuple[str, str], int] | None = None
    if incremental:
        # The pair-statistics table is over word TYPES — its size is
        # O(active distinct symbol pairs), the same bound every standard
        # BPE trainer (Sennrich's own, HF tokenizers) holds in one
        # process's RAM even for 32k-merge fits over web-scale corpora.
        # Holding it driver-side (like k-means seeds: bounded model
        # state, not corpus state) makes the argmax free and leaves
        # exactly ONE distributed job per merge — the affected-slice
        # delta below. The CORPUS-bounded work (word table build) and
        # the VOCABULARY-bounded work (rewrites, delta scans) stay
        # distributed.
        counts = {
            (r["l"], r["r"]): int(r["c"]) for r in _pair_counts(words).collect()
        }
    for stp in range(n_merges):
        if incremental:
            if not counts:
                break
            (l, r), c = min(
                counts.items(), key=lambda kv: (-kv[1], kv[0])
            )
        else:
            top = (
                _pair_counts(words)
                .orderBy(F.col("c").desc(), F.col("l"), F.col("r"))
                .limit(1)
                .collect()
            )
            if not top:
                break
            l, r, c = top[0]["l"], top[0]["r"], int(top[0]["c"])
        merged = l + r
        merges.append((stp, l, r, merged, c))
        has_pair = _has_adjacent_pair(F.col("syms"), F.lit(l), F.lit(r))
        rewrite = merge_rewrite(F.col("syms"), F.lit(l), F.lit(r), F.lit(merged))
        if incremental:
            # exact delta, computed in ONE scan: only words holding the
            # (l, r) adjacency change, so each affected word emits its
            # old adjacent pairs with weight -cnt and its rewritten
            # pairs with weight +cnt; unaffected words are pruned BEFORE
            # the explode — which is where the recount form pays
            # V·len shuffle rows every step. The collected delta is
            # bounded by the affected slice's distinct pairs.
            signed = F.concat(
                F.transform(
                    _adjacent_pairs(F.col("syms")),
                    lambda p: F.struct(
                        p["l"].alias("l"), p["r"].alias("r"),
                        (-F.col("cnt")).alias("w"),
                    ),
                ),
                F.transform(
                    _adjacent_pairs(rewrite),
                    lambda p: F.struct(
                        p["l"].alias("l"), p["r"].alias("r"),
                        F.col("cnt").alias("w"),
                    ),
                ),
            )
            delta = (
                words.filter(has_pair)
                .select(F.explode(signed).alias("x"))
                .groupBy(F.col("x.l").alias("l"), F.col("x.r").alias("r"))
                .agg(F.sum("x.w").alias("c"))
                .collect()
            )
            for row in delta:
                key = (row["l"], row["r"])
                nc = counts.get(key, 0) + int(row["c"])
                if nc > 0:
                    counts[key] = nc
                else:
                    counts.pop(key, None)
        # the rewrite fold only runs on words that can change — everything
        # else passes through untouched (no fold evaluation, no copy)
        words = words.withColumn(
            "syms", F.when(has_pair, rewrite).otherwise(F.col("syms"))
        )
        if stp % 2 == 1:
            # truncate lineage every OTHER step: each skipped checkpoint
            # saves a vocabulary materialization job, and two nested
            # rewrite folds stay cheap to re-evaluate for the next
            # step's pair count
            words = words.localCheckpoint(eager=True)
    return spark.createDataFrame(
        merges,
        "step int, lhs string, rhs string, merged string, pair_count long",
    )


def bpe_encode(
    docs: DataFrame,
    merges: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Apply a learned merge table: encode each DISTINCT word once
    (vocabulary-sized replay of the merges, in learning order), then
    join the encoded words back onto the documents — the scale shape
    for encoding a 100 TB corpus. Output: ``(id_col, out_col)`` with
    the document's BPE symbols in order."""
    rules = [
        (r["lhs"], r["rhs"], r["merged"])
        for r in merges.orderBy("step").collect()  # bounded by n_merges
    ]
    vocab = bpe_word_table(docs, text_col)
    col = F.col("syms")
    for i, (l, r, m) in enumerate(rules):
        vocab = vocab.withColumn(
            "syms", merge_rewrite(F.col("syms"), F.lit(l), F.lit(r), F.lit(m))
        )
        if (i + 1) % 4 == 0:  # bound the fold-nesting / plan depth
            vocab = vocab.localCheckpoint(eager=True)
    encoded = vocab.select("word", F.col("syms").alias("_enc"))
    tokens = docs.select(
        id_col, F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "word")
    ).filter(F.col("word") != "")
    return (
        tokens.join(encoded, "word")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "_enc"))),
                    lambda s: s["_enc"],
                )
            ).alias(out_col)
        )
    )


def tokenizer_fertility(
    docs: DataFrame,
    merges: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-group tokenizer health rollup — the dashboard every
    tokenizer fit is judged by: ``fertility`` (BPE tokens emitted per
    whitespace word; a tokenizer that fits one language poorly shows
    fertility blowup on that group) and ``chars_per_token`` (the
    compression the token budget actually buys, the number that turns
    a char-count corpus size into a token-count training cost).
    Grouped by ``group_col`` (source/crawl/language), returning
    ``(group, n_docs, n_words, n_bpe_tokens, fertility,
    chars_per_token)``.

    Scale shape: rides entirely on :func:`bpe_encode`'s
    vocabulary-replay join (the corpus is tokenized once, words join a
    broadcast-sized encoded vocabulary), then ONE map-side-combined
    aggregate per group — no extra corpus shuffle beyond the encode
    itself. Ratios are one IEEE division of two exact integer sums,
    rounded to 6 digits on both engines.
    """
    enc = bpe_encode(docs, merges, text_col=text_col, id_col=id_col)
    base = docs.select(
        id_col,
        group_col,
        F.size(
            F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
        ).alias("_nw"),
        F.length(text_col).alias("_nc"),
    )
    nbpe = F.sum(F.size("bpe_tokens").cast("long"))
    return (
        base.join(enc, id_col)
        .groupBy(group_col)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("_nw").cast("long")).alias("n_words"),
            nbpe.alias("n_bpe_tokens"),
            F.round(nbpe / F.sum(F.col("_nw").cast("long")), 6).alias(
                "fertility"
            ),
            F.round(F.sum(F.col("_nc").cast("long")) / nbpe, 6).alias(
                "chars_per_token"
            ),
        )
    )
