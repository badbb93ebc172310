"""Unit tests for the corpus-curation operators: train/test
decontamination, token-budget sharding, per-domain caps, and token-DF
quality signals (functions/curation.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mongoshake_spark.functions.curation import (
    cap_per_domain,
    decontaminate,
    shard_by_token_budget,
    token_df_signals,
)
from mongoshake_spark.functions.packing import HASH_MOD, KNUTH_MULT


def _docs(spark, rows, schema="doc_id bigint, text string"):
    return spark.createDataFrame(rows, schema)


def test_decontaminate_flags_overlapping_ngrams(spark):
    eval_docs = _docs(spark, [(100, "the quick brown fox jumps over me")])
    corpus = _docs(
        spark,
        [
            # shares the 5-gram 'the quick brown fox jumps'
            (1, "look the quick brown fox jumps here today"),
            # same words, different order -> no shared 5-gram
            (2, "fox jumps brown quick the over me again"),
            (3, "completely unrelated text about data engines here"),
        ],
    )
    got = {r["doc_id"]: r for r in decontaminate(corpus, eval_docs, n=5).collect()}
    assert got[1]["contaminated"] and got[1]["n_contaminated"] >= 1
    assert not got[2]["contaminated"] and got[2]["n_contaminated"] == 0
    assert not got[3]["contaminated"]
    # doc 1 has 8 tokens -> 4 distinct 5-grams
    assert got[1]["n_grams"] == 4


def test_decontaminate_counts_distinct_grams_once(spark):
    # the shared gram appears twice in the corpus doc but counts once
    eval_docs = _docs(spark, [(100, "a b c d e")])
    corpus = _docs(spark, [(1, "a b c d e x a b c d e")])
    row = decontaminate(corpus, eval_docs, n=5).collect()[0]
    assert row["n_contaminated"] == 1


def test_decontaminate_keeps_short_docs_uncontaminated(spark):
    # a doc shorter than n has no n-grams and can never be contaminated,
    # but it must still appear in the output (keep-set consumers filter on
    # ~contaminated and would otherwise silently lose it)
    eval_docs = _docs(spark, [(100, "a b c d e")])
    corpus = _docs(spark, [(1, "too short")])
    rows = decontaminate(corpus, eval_docs, n=5).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_grams"] == 0 and r["n_contaminated"] == 0 and not r["contaminated"]


def test_shard_by_token_budget_matches_serial_recompute(spark):
    rows = [(i, " ".join(["w"] * (5 + i % 7))) for i in range(40)]
    got = {
        r["doc_id"]: r
        for r in shard_by_token_budget(
            _docs(spark, rows), budget=20, seed=3
        ).collect()
    }
    # serial reference: same hash, same order, same chop
    order = sorted(
        rows, key=lambda r: (((r[0] + 3) * KNUTH_MULT) % HASH_MOD, r[0])
    )
    pos = 0
    for doc_id, text in order:
        n = len(text.split(" "))
        r = got[doc_id]
        assert r["n_tokens"] == n
        assert r["shuffle_key"] == ((doc_id + 3) * KNUTH_MULT) % HASH_MOD
        assert r["shard_id"] == pos // 20, doc_id
        pos += n


def test_shard_reorder_is_seed_dependent(spark):
    rows = [(i, "w w w") for i in range(30)]
    df = _docs(spark, rows)
    a = {r["doc_id"]: r["shard_id"] for r in shard_by_token_budget(df, 9, seed=1).collect()}
    b = {r["doc_id"]: r["shard_id"] for r in shard_by_token_budget(df, 9, seed=2).collect()}
    assert a != b  # different seed, different training order
    # deterministic: same seed reproduces exactly
    a2 = {r["doc_id"]: r["shard_id"] for r in shard_by_token_budget(df, 9, seed=1).collect()}
    assert a == a2


def test_cap_per_domain_keeps_top_by_order_then_id(spark):
    rows = [
        (1, "s1", 50),
        (2, "s1", 90),
        (3, "s1", 90),  # ties with 2 -> lower doc_id (2) ranks first
        (4, "s1", 70),
        (5, "s2", 10),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, source string, n_chars bigint")
    kept = {
        r["doc_id"]
        for r in cap_per_domain(docs, cap=2, order_col="n_chars").collect()
    }
    assert kept == {2, 3, 5}
    # cap=1 exercises the tiebreak: doc 2 beats doc 3
    kept1 = {
        r["doc_id"]
        for r in cap_per_domain(docs, cap=1, order_col="n_chars").collect()
    }
    assert kept1 == {2, 5}


def test_cap_per_domain_preserves_columns(spark):
    docs = spark.createDataFrame(
        [(1, "s1", 5, "x")], "doc_id bigint, source string, n_chars bigint, text string"
    )
    assert cap_per_domain(docs, cap=3).columns == ["doc_id", "source", "n_chars", "text"]


def test_token_df_signals_hand_example(spark):
    docs = _docs(
        spark,
        [
            (1, "the cat sat"),      # the:2 cat:2 sat:1
            (2, "the cat ran ran"),  # ran:1 (distinct within doc)
        ],
    )
    got = {r["doc_id"]: r for r in token_df_signals(docs).collect()}
    assert got[1]["n_unique"] == 3
    assert got[1]["df_sum"] == 2 + 2 + 1
    assert got[1]["n_hapax"] == 1  # 'sat'
    assert got[2]["n_unique"] == 3
    assert got[2]["df_sum"] == 2 + 2 + 1
    assert got[2]["n_hapax"] == 1  # 'ran' counted once despite 2 occurrences


def test_contaminated_spans_merges_overlapping_intervals(spark):
    from mongoshake_spark.functions.curation import contaminated_spans

    eval_docs = _docs(spark, [(100, "a b c d e f x p q r s t")])
    # doc 1: positions 0 ('a b c d e') and 1 ('b c d e f') hit -> one merged
    # span [0, 6); position 8 ('p q r s t') hits -> second span [8, 13)
    corpus = _docs(spark, [(1, "a b c d e f z z p q r s t"),
                           (2, "nothing here matches anything at all ok")])
    rows = sorted(
        (r["doc_id"], r["span_id"], r["start_p"], r["end_p"])
        for r in contaminated_spans(corpus, eval_docs, n=5).collect()
    )
    assert rows == [(1, 1, 0, 6), (1, 2, 8, 13)]


def test_contaminated_spans_adjacent_windows_merge(spark):
    from mongoshake_spark.functions.curation import contaminated_spans

    # hits at p=0 and p=5: [0,5) and [5,10) touch (p == prev_end) -> merged
    eval_docs = _docs(spark, [(100, "a b c d e"), (101, "f g h i j")])
    corpus = _docs(spark, [(1, "a b c d e f g h i j")])
    rows = [
        (r["span_id"], r["start_p"], r["end_p"])
        for r in contaminated_spans(corpus, eval_docs, n=5).collect()
    ]
    assert rows == [(1, 0, 10)]


def test_cap_per_domain_skew_safe_equals_single_window(spark):
    import random

    rng = random.Random(7)
    rows = [(i, f"s{rng.randrange(3)}", rng.randrange(100)) for i in range(200)]
    docs = spark.createDataFrame(
        rows, "doc_id bigint, source string, n_chars bigint"
    ).repartition(8)
    a = {r["doc_id"] for r in cap_per_domain(docs, cap=5, skew_safe=True).collect()}
    b = {r["doc_id"] for r in cap_per_domain(docs, cap=5, skew_safe=False).collect()}
    assert a == b and len(a) == 15


def test_write_training_shards_layout_and_order(spark, tmp_path):
    import os

    from mongoshake_spark.functions.curation import write_training_shards

    rows = [(i, " ".join(["w"] * (4 + i % 5))) for i in range(60)]
    df = _docs(spark, rows)
    out = str(tmp_path / "shards")
    n = write_training_shards(df, out, budget=30, seed=1)
    dirs = sorted(d for d in os.listdir(out) if d.startswith("shard_id="))
    assert len(dirs) == n > 1
    back = spark.read.parquet(out)
    # every doc exactly once, full columns survive
    assert sorted(r["doc_id"] for r in back.collect()) == list(range(60))
    assert {"doc_id", "text", "n_tokens", "shuffle_key", "shard_id"} <= set(back.columns)
    # a single shard directory read is pruned to that shard (the dataloader
    # contract) and is internally in training order
    one = spark.read.parquet(f"{out}/shard_id=0")
    rows0 = one.select("shuffle_key", "doc_id").collect()
    keys = [(r["shuffle_key"], r["doc_id"]) for r in rows0]
    assert keys == sorted(keys)
    # token mass per shard ~ budget: all but the last shard reach it
    per = {r["shard_id"]: r["s"] for r in back.groupBy("shard_id").agg(
        F.sum("n_tokens").alias("s")).collect()}
    last = max(per)
    assert all(v >= 30 - 8 for k, v in per.items() if k != last)  # 8 = max doc len


def test_mask_contaminated_rewrites_only_spans(spark):
    from mongoshake_spark.functions.curation import mask_contaminated

    eval_docs = _docs(spark, [(100, "p q r s t")])
    corpus = _docs(
        spark,
        [
            (1, "a b p q r s t c d"),       # span [2,7) removed
            (2, "totally clean document here unchanged"),
            (3, "p q r s t"),               # fully masked -> empty
        ],
    )
    got = {r["doc_id"]: r for r in mask_contaminated(corpus, eval_docs, n=5).collect()}
    assert got[1]["clean_text"] == "a b c d"
    assert (got[1]["n_tokens_before"], got[1]["n_tokens_after"]) == (9, 4)
    assert got[2]["clean_text"] == "totally clean document here unchanged"
    assert got[2]["n_tokens_before"] == got[2]["n_tokens_after"] == 5
    assert got[3]["clean_text"] == "" and got[3]["n_tokens_after"] == 0


def test_assign_row_ids_dense_and_order_respecting(spark):
    from mongoshake_spark.functions.curation import assign_row_ids

    docs = spark.createDataFrame(
        [(10, "b"), (3, "a"), (7, "a"), (1, "c")], "doc_id bigint, lang string"
    )
    got = {r["doc_id"]: r["row_id"] for r in assign_row_ids(docs, ["lang", "doc_id"]).collect()}
    assert got == {3: 0, 7: 1, 10: 2, 1: 3}


def test_lm_score_hand_example(spark):
    import math

    from mongoshake_spark.functions.curation import lm_score

    # corpus: "a b a b" and "a b c"
    # bigrams: (a,b)x2 +1 = 3 occurrences of (a,b); (b,a)x1; (b,c)x1
    # C1: a->3, b->2 ; V = 3 (a, b, c)
    docs = _docs(spark, [(1, "a b a b"), (2, "a b c")])
    got = {r["doc_id"]: r for r in lm_score(docs).collect()}
    p_ab = (3 + 1) / (3 + 3)  # C2(a,b)=3, C1(a)=3, V=3
    p_ba = (1 + 1) / (2 + 3)
    p_bc = (1 + 1) / (2 + 3)
    exp1 = -(2 * math.log2(p_ab) + math.log2(p_ba)) / 3
    exp2 = -(math.log2(p_ab) + math.log2(p_bc)) / 2
    assert got[1]["n_bigrams"] == 3
    assert got[2]["n_bigrams"] == 2
    assert abs(got[1]["bits_per_token"] - round(exp1, 4)) < 1e-9
    assert abs(got[2]["bits_per_token"] - round(exp2, 4)) < 1e-9


def test_lm_score_skips_short_docs(spark):
    from mongoshake_spark.functions.curation import lm_score

    docs = _docs(spark, [(1, "solo"), (2, "two tokens")])
    rows = lm_score(docs).collect()
    assert [r["doc_id"] for r in rows] == [2]


def test_knuth_u32_no_overflow_on_huge_ids(spark):
    """ids beyond ~3.47e9 overflow the naive id*2654435761 bigint product
    (ARITHMETIC_OVERFLOW under ANSI mode) — the split-arithmetic form must
    stay exact up to 2^63-1, matching Python's unbounded integers."""
    from mongoshake_spark.functions.packing import HASH_MOD, KNUTH_MULT, knuth_u32

    ids = [0, 1, 3_470_000_000, 4_000_000_000, 2**33, 2**40 + 123, 2**63 - 1]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id bigint")
    for seed in (0, 7):
        got = [r["u"] for r in df.select(knuth_u32("doc_id", seed).alias("u")).collect()]
        exp = [((i % HASH_MOD + seed) % HASH_MOD) * KNUTH_MULT % HASH_MOD for i in ids]
        assert got == exp


def test_sample_strata_works_beyond_32bit_ids(spark):
    from mongoshake_spark.functions.packing import sample_strata

    docs = spark.createDataFrame(
        [(2**33 + i, "x", "en") for i in range(20)],
        "doc_id bigint, text string, lang string",
    )
    kept = sample_strata(docs, {"en": 0.5}).count()
    assert 0 <= kept <= 20  # must not throw; subset property holds


def test_chunk_documents_hand_example(spark):
    from mongoshake_spark.functions.curation import chunk_documents

    docs = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "x y"), (3, "")],
        "doc_id bigint, text string",
    )
    rows = {
        (r["doc_id"], r["chunk_id"]): (r["chunk_start"], r["chunk_len"], r["chunk_text"])
        for r in chunk_documents(docs, chunk_tokens=4, stride=2).collect()
    }
    assert rows == {
        (1, 0): (0, 4, "a b c d"),
        (1, 1): (2, 4, "c d e f"),
        (1, 2): (4, 3, "e f g"),
        (2, 0): (0, 2, "x y"),
        # split('') yields [''] — one empty-token chunk, same as the oracle
        (3, 0): (0, 1, ""),
    }
    # overlap contract: consecutive windows share chunk_tokens - stride tokens
    assert rows[(1, 1)][2].split()[:2] == rows[(1, 0)][2].split()[2:]


def test_chunk_documents_exact_multiple_has_no_empty_tail(spark):
    from mongoshake_spark.functions.curation import chunk_documents

    docs = spark.createDataFrame([(1, "a b c d")], "doc_id bigint, text string")
    got = chunk_documents(docs, chunk_tokens=4, stride=2).collect()
    assert len(got) == 1 and got[0]["chunk_text"] == "a b c d"


def test_temperature_rebalance_closed_form(spark):
    """keep_frac = (n_min/n_l)^(1-alpha): alpha=1 keeps everything; alpha=0
    targets equal counts; and a lower alpha keeps a SUBSET of a higher
    alpha's rows (hash cut, thresholds only move)."""
    from mongoshake_spark.functions.curation import temperature_rebalance

    rows = [(i, "big") for i in range(400)] + [(1000 + i, "small") for i in range(100)]
    docs = spark.createDataFrame(rows, "doc_id bigint, lang string")
    all_kept = temperature_rebalance(docs, alpha=1.0).collect()
    assert len(all_kept) == 500 and all(r["keep_frac"] == 1.0 for r in all_kept)

    half = temperature_rebalance(docs, alpha=0.5)
    fracs = {r["lang"]: r["keep_frac"] for r in half.select("lang", "keep_frac").distinct().collect()}
    assert fracs["small"] == 1.0
    assert abs(fracs["big"] - 0.5) < 1e-12  # (100/400)^0.5

    flat = temperature_rebalance(docs, alpha=0.0)
    keys_flat = {r["doc_id"] for r in flat.collect()}
    keys_half = {r["doc_id"] for r in half.collect()}
    assert keys_flat <= keys_half  # subset monotonicity in alpha


def test_vocab_encode_rank_and_unk(spark):
    from mongoshake_spark.functions.curation import vocab_encode

    docs = spark.createDataFrame(
        [(1, "b a b c b a"), (2, "a z")], "doc_id bigint, text string"
    )
    # counts: b=3, a=3, c=1, z=1 -> rank by (cnt desc, tok asc): a=0, b=1, c=2
    got = {r["doc_id"]: r["ids"] for r in vocab_encode(docs, vocab_size=3).collect()}
    assert got == {1: [1, 0, 1, 2, 1, 0], 2: [0, 3]}  # z is OOV -> unk=3


def test_sample_exact_k_count_and_subset_monotonicity(spark):
    from mongoshake_spark.functions.curation import sample_exact_k

    rows = [(i, "a" if i % 3 else "b") for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id bigint, lang string")
    k10 = sample_exact_k(docs, 10)
    per = {r["lang"]: r["n"] for r in k10.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert per == {"a": 10, "b": 10}
    # smaller k keeps a strict subset (ranks only truncate)
    ids5 = {r["doc_id"] for r in sample_exact_k(docs, 5).collect()}
    ids10 = {r["doc_id"] for r in k10.collect()}
    assert ids5 < ids10
    # k above the stratum size keeps the whole stratum, no padding
    assert sample_exact_k(docs, 500).count() == 200
    # input columns are preserved (no helper columns leak)
    assert set(k10.columns) == {"doc_id", "lang"}


def test_quality_deciles_rank_exact(spark):
    from mongoshake_spark.functions.curation import quality_deciles

    # scores with heavy ties: deciles must follow (score desc, id asc) rank
    rows = [(i, 100 - (i // 10)) for i in range(100)]
    docs = spark.createDataFrame(rows, "doc_id bigint, score bigint")
    got = {r["doc_id"]: r["decile"] for r in quality_deciles(docs, "score").collect()}
    # rank of doc i is exactly i (scores descend with i, ties broken by id)
    assert got == {i: i // 10 for i in range(100)}
    # bucket populations are exactly N/n
    from collections import Counter

    assert set(Counter(got.values()).values()) == {10}


def test_temperature_rebalance_null_stratum_is_its_own_group(spark):
    """A NULL stratum must sample at its own rate, not vanish through a
    null-rejecting join."""
    from mongoshake_spark.functions.curation import temperature_rebalance

    rows = [(i, "a") for i in range(50)] + [(100 + i, None) for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id bigint, lang string")
    kept = temperature_rebalance(docs, alpha=1.0)  # keep_frac == 1 everywhere
    assert kept.count() == 60  # nothing dropped, NULL stratum included
    assert kept.filter(F.col("lang").isNull()).count() == 10


def test_decontaminate_bloom_one_sided_error(spark, sf_dir):
    """Bloom decontamination must be a SUPERSET of the exact overlap set
    (false positives allowed, false negatives never) and converge to the
    exact set as m grows."""
    from pyspark.sql import functions as F

    from mongoshake_spark.functions.curation import decontaminate, decontaminate_bloom
    from mongoshake_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 20 != 0)
    ev = docs.filter(F.col("doc_id") % 20 == 0)
    exact = {
        r["doc_id"] for r in decontaminate(corpus, ev).filter("contaminated").collect()
    }
    # tiny filter: saturated, everything superset holds trivially but FN=0
    small = {
        r["doc_id"]
        for r in decontaminate_bloom(corpus, ev, m_bits=1 << 10)
        .filter("contaminated")
        .collect()
    }
    assert exact <= small
    # big filter: FP rate ~0 -> equals the exact set
    big = {
        r["doc_id"]
        for r in decontaminate_bloom(corpus, ev, m_bits=1 << 24)
        .filter("contaminated")
        .collect()
    }
    assert exact <= big
    assert len(big - exact) <= len(small - exact)
    # every-document contract: one output row per corpus doc
    assert decontaminate_bloom(corpus, ev, m_bits=1 << 12).count() == corpus.count()


def test_assign_splits_deterministic_and_exhaustive(spark, sf_dir):
    import pytest
    from pyspark.sql import functions as F

    from mongoshake_spark.functions.curation import assign_splits
    from mongoshake_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    a = {r["doc_id"]: r["split"] for r in assign_splits(docs).collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in assign_splits(docs.repartition(7)).collect()
    }
    assert a == b  # partitioning-independent
    counts = {
        r["split"]: r["n"]
        for r in assign_splits(docs).groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert sum(counts.values()) == docs.count()  # every doc assigned once
    assert counts.get("train", 0) > counts.get("val", 0)
    assert counts.get("train", 0) > counts.get("test", 0)
    # a different seed reshuffles membership
    c = {r["doc_id"]: r["split"] for r in assign_splits(docs, seed=7).collect()}
    assert c != a
    with pytest.raises(ValueError, match="positive integer"):
        assign_splits(docs, fractions={"train": 0})
    with pytest.raises(ValueError, match="positive integer"):
        assign_splits(docs, fractions={"train": 0.9})


def test_decontaminate_bloom_composes_with_streaming(spark, sf_dir, tmp_path):
    """The corpus side of decontaminate_bloom is a map-only projection, so
    the SAME call works unchanged on a streaming corpus (the on-ingest
    curation shape at scale): stream the documents table through it and
    assert the drained result equals the batch result."""
    from pyspark.sql import functions as F

    from mongoshake_spark.functions.curation import decontaminate_bloom
    from mongoshake_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    ev = docs.filter(F.col("doc_id") % 20 == 0)
    corpus = docs.filter(F.col("doc_id") % 20 != 0)

    src = str(tmp_path / "src")
    corpus.write.parquet(src)
    stream_corpus = spark.readStream.schema(corpus.schema).parquet(src)
    out = str(tmp_path / "out")
    q = (
        decontaminate_bloom(stream_corpus, ev, m_bits=1 << 14)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        r["doc_id"]: (r["n_grams"], r["n_flagged"], r["contaminated"])
        for r in spark.read.parquet(out).collect()
    }
    want = {
        r["doc_id"]: (r["n_grams"], r["n_flagged"], r["contaminated"])
        for r in decontaminate_bloom(corpus, ev, m_bits=1 << 14).collect()
    }
    assert got == want


def test_classifier_score_trained_weights_path(spark):
    """The broadcast-model path must agree with the in-row derivation
    when the weights table materializes the same rule, and a bucket
    MISSING from the model weighs 0 while its token still counts toward
    the length normalizer (left join, not inner)."""
    from mongoshake_spark.functions.curation import classifier_score

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma alpha"), (2, "delta epsilon"), (3, "zeta")],
        "doc_id long, text string",
    )
    base = {
        r["doc_id"]: (r["n_tokens"], r["score_ppm"], r["keep"])
        for r in classifier_score(docs).collect()
    }
    assert set(base) == {1, 2, 3} and base[1][0] == 4
    full = spark.createDataFrame(
        [(b, (b * 2654435761) % 2001 - 1000) for b in range(4096)],
        "bucket long, wint long",
    )
    trained = {
        r["doc_id"]: (r["n_tokens"], r["score_ppm"], r["keep"])
        for r in classifier_score(docs, weights=full).collect()
    }
    assert trained == base
    # empty model: every token weighs 0, lengths unchanged, nothing kept
    empty = spark.createDataFrame([], "bucket long, wint long")
    zeroed = {
        r["doc_id"]: (r["n_tokens"], r["score_ppm"], r["keep"])
        for r in classifier_score(docs, weights=empty).collect()
    }
    assert zeroed == {
        d: (base[d][0], 0, False) for d in base
    }


def test_bpe_train_classic_example(spark):
    """The Sennrich et al. corpus shape: merges follow frequency order
    with deterministic lexicographic tie-breaks, word-final contexts
    learn distinct merges via the </w> marker, and the scan is
    left-to-right non-overlapping."""
    from mongoshake_spark.functions import bpe

    docs = spark.createDataFrame(
        [
            (1, "low low low low low"),
            (2, "lower lower newest newest"),
            (3, "newest newest newest newest widest widest widest"),
        ],
        "doc_id long, text string",
    )
    m = {r["step"]: (r["lhs"], r["rhs"], r["merged"], r["pair_count"])
         for r in bpe.bpe_train(docs, n_merges=4).collect()}
    # 'es' appears in newest(6) + widest(3) = 9, the top pair
    assert m[0] == ("e", "s", "es", 9)
    assert m[1] == ("es", "t", "est", 9)
    assert m[2] == ("est", "</w>", "est</w>", 9)
    # then 'lo' from low(5) + lower(2) = 7
    assert m[3] == ("l", "o", "lo", 7)


def test_bpe_rewrite_nonoverlapping_and_encode_roundtrip(spark):
    """'aaaa' under merge (a,a) becomes [aa, aa] (left-to-right,
    non-overlapping — never [aa,a,a] or a re-merged [aaaa]); encoding
    joins the per-word symbols back in document order and concatenating
    the decoded symbols reproduces the original words."""
    from pyspark.sql import functions as F

    from mongoshake_spark.functions import bpe

    docs = spark.createDataFrame(
        [(1, "aaaa aaa banana"), (2, "banana aaaa")],
        "doc_id long, text string",
    )
    merges = bpe.bpe_train(docs, n_merges=3)
    rules = {r["step"]: r["merged"] for r in merges.collect()}
    assert rules[0] == "aa"  # (a,a) dominates
    enc = {
        r["doc_id"]: list(r["bpe_tokens"])
        for r in bpe.bpe_encode(docs, merges).collect()
    }
    # every doc decodes back to its text: strip </w>, join symbols
    for doc_id, text in ((1, "aaaa aaa banana"), (2, "banana aaaa")):
        # merges may absorb </w> into a symbol ('a</w>') — decode by
        # substring replacement, not by matching the bare marker
        decoded = "".join(enc[doc_id]).replace(bpe.END_OF_WORD, " ").strip()
        assert decoded == text, (doc_id, enc[doc_id])
    # non-overlapping scan inside the encoded tokens for 'aaaa'/'aaa'
    first_word_tokens = []
    for s in enc[1]:
        if s == bpe.END_OF_WORD:
            break
        first_word_tokens.append(s)
    assert first_word_tokens == ["aa", "aa"]


def test_sample_weighted_matches_reference_selection(spark):
    from mongoshake_spark.functions.curation import sample_weighted

    rows = [(i, f"doc {i}", (i % 7) + 1) for i in range(1, 101)]
    docs = _docs(spark, rows, "doc_id bigint, text string, w int")
    got = sorted(
        r["doc_id"] for r in sample_weighted(docs, k=10, weight_col="w").collect()
    )
    # reference: same priority formula in plain Python
    def key(i, w):
        return (((i * KNUTH_MULT) % HASH_MOD) + 1) / w

    expect = sorted(
        i for i, _, w in sorted(rows, key=lambda r: (key(r[0], r[2]), r[0]))[:10]
    )
    assert got == expect


def test_sample_weighted_excludes_nonpositive_weights(spark):
    from mongoshake_spark.functions.curation import sample_weighted

    rows = [(1, "a", 0), (2, "b", -3), (3, "c", None), (4, "d", 5), (5, "e", 1)]
    docs = _docs(spark, rows, "doc_id bigint, text string, w int")
    got = {r["doc_id"] for r in sample_weighted(docs, k=10, weight_col="w").collect()}
    assert got == {4, 5}


def test_sample_weighted_heavier_rows_sampled_more(spark):
    from mongoshake_spark.functions.curation import sample_weighted

    # half the corpus carries weight 100, half weight 1: the heavy rows
    # should dominate any fixed-k sample (statistical but with a 100x
    # weight ratio over 200 rows the expectation is overwhelming)
    rows = [(i, "t", 100 if i % 2 == 0 else 1) for i in range(200)]
    docs = _docs(spark, rows, "doc_id bigint, text string, w int")
    got = [r["doc_id"] for r in sample_weighted(docs, k=20, weight_col="w").collect()]
    heavy = sum(1 for i in got if i % 2 == 0)
    assert heavy >= 15


def test_cdc_chunks_reconstruct_and_short_doc(spark):
    from mongoshake_spark.functions.curation import cdc_chunks

    t1 = "the quick brown fox jumps over the lazy dog and runs far away"
    docs = _docs(spark, [(1, t1), (2, "tiny"), (3, "")])
    rows = sorted(
        (r["doc_id"], r["chunk_idx"], r["start"], r["n_chars_chunk"])
        for r in cdc_chunks(docs).collect()
    )
    by_doc = {}
    for d, i, s, ln in rows:
        by_doc.setdefault(d, []).append((i, s, ln))
    # chunks tile the document exactly: starts chain, lengths sum to len
    for d, chunks in by_doc.items():
        text_len = {1: len(t1), 2: 4}[d]
        assert chunks[0][1] == 1
        assert sum(ln for _, _, ln in chunks) == text_len
        for (i1, s1, l1), (i2, s2, _) in zip(chunks, chunks[1:]):
            assert i2 == i1 + 1 and s2 == s1 + l1
    assert by_doc[2] == [(1, 1, 4)]  # shorter than the window: one chunk
    assert 3 not in by_doc  # empty doc yields no rows


def test_cdc_chunks_boundaries_survive_prefix_insertion(spark):
    from mongoshake_spark.functions.curation import cdc_chunks

    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda "
        "mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega "
        "one two three four five six seven eight nine ten eleven twelve"
    )
    edited = "INSERTED PREAMBLE SENTENCE. " + base
    docs = _docs(spark, [(1, base), (2, edited)])
    got = {}
    for r in cdc_chunks(docs).collect():
        got.setdefault(r["doc_id"], set()).add(r["chunk_md5"])
    # content-defined boundaries re-sync after the edit: the unedited
    # tail's chunks keep their hashes (fixed-size chunking would share 0)
    shared = got[1] & got[2]
    assert len(shared) >= len(got[1]) - 2
    assert len(shared) >= 1


def test_cdc_chunks_large_window_arrow_and_expr_bound(spark):
    """window >= 10 overflows the raw 31^t fold (ANSI overflow in expr,
    int64 wrap in naive numpy): the arrow kernel folds mod M per term
    and must match the arbitrary-precision serial model; the expr form
    refuses the window instead of corrupting boundaries."""
    import hashlib

    import pytest

    from mongoshake_spark.functions.curation import cdc_chunks
    from mongoshake_spark.functions.texthash import MOD

    w, d = 12, 8
    # astral codepoints push code * 31^11 far past int64
    text = ("lorem ipsum dolor sit amet " + "\U0001F600" * 3 + " consectetur") * 4

    def model(t):
        n = len(t)
        codes = [ord(c) for c in t]
        cuts = [
            i for i in range(w, n)
            if (sum(codes[i - 1 - k] * (31**k) for k in range(w)) % MOD) % d == 0
        ]
        bounds = [0] + cuts + [n]
        return [
            (j + 1, bounds[j] + 1, bounds[j + 1] - bounds[j],
             hashlib.md5(t[bounds[j]:bounds[j + 1]].encode()).hexdigest())
            for j in range(len(bounds) - 1)
        ]

    docs = _docs(spark, [(1, text)])
    got = [
        (r["chunk_idx"], r["start"], r["n_chars_chunk"], r["chunk_md5"])
        for r in cdc_chunks(docs, window=w, divisor=d)
        .orderBy("chunk_idx")
        .collect()
    ]
    assert got == model(text)
    with pytest.raises(ValueError, match="expr"):
        cdc_chunks(docs, window=w, divisor=d, impl="expr")


def test_cdc_chunks_preserves_string_id_type(spark):
    from mongoshake_spark.functions.curation import cdc_chunks

    docs = spark.createDataFrame(
        [("65a1b2c3", "some content here that chunks")],
        "oid string, text string",
    )
    out = cdc_chunks(docs, id_col="oid")
    assert dict(out.dtypes)["oid"] == "string"
    rows = out.collect()
    assert rows and all(r["oid"] == "65a1b2c3" for r in rows)


def test_tokenizer_fertility_exact_on_known_corpus(spark):
    """Hand-checkable fertility: with zero learned merges every word
    encodes to its characters + </w>, so fertility per group is exactly
    (chars + words) / words and chars_per_token is chars/(chars+words)
    — one IEEE division of exact integer sums."""
    from mongoshake_spark.functions.bpe import bpe_train, tokenizer_fertility

    docs = spark.createDataFrame(
        [
            (1, "ab cd", "s1"),      # 4 chars-in-words, 2 words
            (2, "abc", "s1"),        # 3 chars, 1 word
            (3, "a b c d", "s2"),    # 4 chars, 4 words
        ],
        "doc_id long, text string, source string",
    )
    merges = bpe_train(docs.select("doc_id", "text"), n_merges=1)
    # one learned merge: n_bpe_tokens lands between n_words (everything
    # merged) and chars+words (nothing merged), and the ratio columns
    # equal their integer-sum divisions exactly
    got = {r["source"]: r for r in tokenizer_fertility(docs, merges).collect()}
    assert set(got) == {"s1", "s2"}
    for r in got.values():
        assert r["n_words"] <= r["n_bpe_tokens"]
        assert r["fertility"] == round(r["n_bpe_tokens"] / r["n_words"], 6)
    assert got["s1"]["n_docs"] == 2 and got["s1"]["n_words"] == 3
    assert got["s2"]["n_words"] == 4
    # s2: single-char words 'a b c d' -> each word is [ch, </w>] and the
    # 1 learned merge can fuse at most one pair per word type
    assert 4 <= got["s2"]["n_bpe_tokens"] <= 8
