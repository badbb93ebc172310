"""Unit tests for the round-4 corpus-curation operators: repetition
signals, PII scrubbing, the composed keep-set, and IVF ANN."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from mongoshake_spark.functions import similarity
from mongoshake_spark.functions import text as textfn
from mongoshake_spark.sources.tables import load_table


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_repetition_signals_counts(spark):
    docs = _docs(
        spark,
        [
            # bigrams: 'a b' x3, 'b a' x2, 'b c' x1 -> top 'a b' 3
            # trigrams: 'a b a' x2, 'b a b' x2, 'a b c' x1 -> dup instances 4
            (1, "a b a b a b c"),
            (2, "x"),  # too short for any n-gram
            (3, "p q r"),  # all unique
        ],
    )
    got = {
        r["doc_id"]: r
        for r in textfn.repetition_signals(docs).collect()
    }
    assert got[1]["top_bigram"] == "a b"
    assert got[1]["top_bigram_n"] == 3
    assert got[1]["dup_trigram_n"] == 4
    assert got[1]["n_tokens"] == 7
    assert got[2]["top_bigram"] == "" and got[2]["top_bigram_n"] == 0
    assert got[2]["dup_trigram_n"] == 0
    assert got[3]["top_bigram_n"] == 1 and got[3]["dup_trigram_n"] == 0


def test_repetition_top_bigram_tiebreak_is_lexicographic_max(spark):
    # two bigrams tie at 2 ('a b' and 'c d'); struct-max picks the
    # lexicographically greatest gram — pinned so the oracle (row_number
    # ORDER BY cnt DESC, gram DESC) stays in lockstep
    docs = _docs(spark, [(1, "a b x c d y a b z c d")])
    row = textfn.repetition_signals(docs).collect()[0]
    assert row["top_bigram"] == "c d"
    assert row["top_bigram_n"] == 2


def test_scrub_pii_counts_and_fingerprint(spark):
    text = "mail bob.smith@corp.io and x@y.net or dial 555-0199 now"
    expect = "mail <EMAIL> and <EMAIL> or dial <PHONE> now"
    docs = _docs(spark, [(7, text)])
    row = textfn.scrub_pii(docs).collect()[0]
    assert row["n_emails"] == 2
    assert row["n_phones"] == 1
    assert row["fp_scrubbed"] == hashlib.md5(expect.encode()).hexdigest()


def test_scrub_pii_leaves_clean_text_alone(spark):
    text = "no contact info here at all"
    docs = _docs(spark, [(1, text)])
    row = textfn.scrub_pii(docs).collect()[0]
    assert row["n_emails"] == 0 and row["n_phones"] == 0
    assert row["fp_scrubbed"] == hashlib.md5(text.encode()).hexdigest()


def test_ivf_assign_covers_corpus(spark, sf_dir):
    vecs = load_table(spark, sf_dir, "embeddings")
    cents = vecs.filter(F.col("vec_id") % 29 == 0).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )
    assign = similarity.ivf_assign(vecs, cents)
    n = vecs.count()
    assert assign.count() == n  # every vector assigned exactly once
    cells = {r["cell"] for r in assign.select("cell").distinct().collect()}
    cids = {r["cid"] for r in cents.collect()}
    assert cells <= cids


def test_ivf_topk_overlaps_brute_force(spark, sf_dir):
    vecs = load_table(spark, sf_dir, "embeddings")
    qids = list(range(5))
    ivf = similarity.ivf_topk(vecs, qids, k=5, n_probe=2).collect()
    brute = similarity.brute_topk(vecs, qids, k=5).collect()
    assert ivf, "ivf returned nothing"
    per_q = {}
    for r in ivf:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
        assert r["neighbor_id"] != r["query_id"]
    for q, ranks in per_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
    # approximate index: demand SOME overlap with the exact answer, not
    # perfect recall (n_probe=2 of ~n/29 cells)
    bset = {(r["query_id"], r["neighbor_id"]) for r in brute}
    iset = {(r["query_id"], r["neighbor_id"]) for r in ivf}
    assert len(bset & iset) > 0


def test_quality_keepset_is_filtered_and_unique(spark, sf_dir):
    from mongoshake_spark.plans import QUERIES

    kept = QUERIES["quality_keepset"].fn(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    joined = kept.join(docs, "doc_id").select("doc_id", "text", "n_tokens")
    rows = joined.collect()
    assert rows
    texts = [r["text"] for r in rows]
    assert len(texts) == len(set(texts))  # exact-dedup held
    for r in rows:
        assert r["n_tokens"] >= 20


def test_duplicate_spans_interval_union(spark):
    from mongoshake_spark.functions.dedup import duplicate_spans

    # w=4: docs 1 and 2 share the window 'a b c d'; doc 1 contains it at
    # p=0 and p=4, and its middle windows ('b c d a', 'c d a b', 'd a b c')
    # occur only once corpus-wide
    docs = _docs(
        spark,
        [
            (1, "a b c d a b c d"),
            (2, "x y a b c d z w"),
            (3, "q r s t u v"),  # no duplicated window
        ],
    )
    got = {r["doc_id"]: r for r in duplicate_spans(docs, w=4).collect()}
    assert 3 not in got
    # doc2: only 'a b c d' at p=2 duplicated -> cov 4, positions 1
    assert got[2]["n_dup_positions"] == 1 and got[2]["dup_token_cov"] == 4
    # doc1: 'a b c d' at p=0 and p=4; middle windows 'b c d a','c d a b',
    # 'd a b c' each appear TWICE within doc1? (p=1..3 only once) -> dup
    # positions are 0 and 4, spans [0,4) u [4,8) = 8 tokens
    assert got[1]["n_dup_positions"] == 2 and got[1]["dup_token_cov"] == 8


def test_duplicate_spans_overlap_merges(spark):
    from mongoshake_spark.functions.dedup import duplicate_spans

    # 'a b c a b c a b' (w=3): the six windows are abc/bca/cab/abc/bca/cab
    # — every window duplicated, and their union covers the whole 8-token
    # doc despite heavy overlap
    docs = _docs(spark, [(1, "a b c a b c a b")])
    row = duplicate_spans(docs, w=3).collect()[0]
    assert row["n_dup_positions"] == 6
    assert row["dup_token_cov"] == 8


def test_epoch_mix_copy_counts(spark):
    from mongoshake_spark.functions.packing import epoch_mix, KNUTH_MULT, HASH_MOD

    rows = [(i, "t", "en" if i % 2 == 0 else "zh") for i in range(100)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    mixed = epoch_mix(docs, {"en": 250, "zh": 100}, default_pct=100)
    per = {
        (r["doc_id"]): r["copies"]
        for r in mixed.groupBy("doc_id").agg(F.count("*").alias("copies")).collect()
    }
    for i in range(100):
        u = (i * KNUTH_MULT) % HASH_MOD
        if i % 2 == 0:
            expect = 2 + (1 if u * 100 < 50 * HASH_MOD else 0)
        else:
            expect = 1
        assert per.get(i, 0) == expect, (i, per.get(i), expect)
    # _copy is a 1-based contiguous epoch index
    copies = mixed.filter(F.col("doc_id") == 0).select("_copy").collect()
    assert sorted(c["_copy"] for c in copies) == list(range(1, len(copies) + 1))


def test_extract_features_deterministic_and_ann_composable(spark):
    from mongoshake_spark.functions.texthash import MOD
    from mongoshake_spark.operators import multimodal

    docs = _docs(spark, [(1, "alpha beta"), (2, "gamma delta"), (3, "alpha beta")])
    media = multimodal.attach_fake_media(docs)
    feats = {r["doc_id"]: r["features"] for r in multimodal.extract_features(media).collect()}
    assert all(len(v) == multimodal.FEATURE_DIM for v in feats.values())
    # identical payload body -> identical features; python recompute matches
    assert feats[1] == feats[3] != feats[2]
    h = 0
    for ch in "alpha beta":
        h = (h * 31 + ord(ch)) % MOD
    assert feats[1] == [float((h * (2 * j + 1) + 7919 * j) % 997) for j in range(16)]
    # the link into the ANN operators: media features rank as embeddings
    vecs = multimodal.extract_features(media).withColumnRenamed(
        "doc_id", "vec_id"
    ).withColumnRenamed("features", "embedding")
    top = similarity.brute_topk(vecs, [1], k=2).collect()
    assert [r["neighbor_id"] for r in top] == [3, 2]  # exact dup first


def test_semantic_neardup_restricts_pairs_to_cells(spark):
    from mongoshake_spark.functions.similarity import semantic_neardup

    # centroid_mod=3 -> centroids are ids 0 and 3: [1,0] and [0,1].
    # ids 1,2 sit near [1,0] (cell 0); ids 4,5 near [0,1] (cell 3).
    rows = [
        (0, [1.0, 0.0]),
        (1, [1.0, 0.1]),
        (2, [1.0, 0.11]),
        (3, [0.0, 1.0]),
        (4, [0.1, 1.0]),
        (5, [0.11, 1.0]),
    ]
    vecs = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    got = {
        (r["doc_a"], r["doc_b"]): r["cell"]
        for r in semantic_neardup(vecs, threshold_num=99, threshold_den=100,
                                  centroid_mod=3).collect()
    }
    # high threshold: only the truly-close same-cell pairs survive
    assert got[(0, 1)] == 0 and got[(1, 2)] == 0 and got[(0, 2)] == 0
    assert got[(3, 4)] == 3 and got[(4, 5)] == 3 and got[(3, 5)] == 3
    # no cross-cell pair exists even though e.g. cos(2,4) is well-defined
    assert all(
        (a < 3 and b < 3) or (a >= 3 and b >= 3) for a, b in got
    )


def test_zero_norm_vectors_excluded_everywhere(spark):
    """One zero embedding (padding row / failed encode) must neither
    become the NaN rank-1 neighbor of every query nor pair with everything
    in the threshold scans."""
    from mongoshake_spark.functions.similarity import brute_topk, neardup_pairs

    rows = [
        (0, [1.0, 0.0]),
        (1, [0.9, 0.1]),
        (2, [0.0, 0.0]),  # zero-norm
        (3, [0.0, 1.0]),
    ]
    vecs = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    top = brute_topk(vecs, [0], k=3).collect()
    assert all(r["neighbor_id"] != 2 for r in top)
    assert all(r["cos_sim"] == r["cos_sim"] for r in top)  # no NaN
    pairs = neardup_pairs(vecs, threshold_num=0, threshold_den=10).collect()
    assert not any(2 in (r["doc_a"], r["doc_b"]) for r in pairs)


def test_neardup_lsh_prebucket_matches_exact_and_skips_tile_explode(spark):
    """prebucket='lsh' returns the identical pair set (the registry query
    pins this against the brute-force oracle too) and its plan carries NO
    tile replication — the |corpus| x n_tiles explode is exactly what the
    escape hatch removes; zero-norm rows still never pair."""
    from mongoshake_spark.functions.similarity import neardup_pairs

    vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = {
        (r["doc_a"], r["doc_b"]): r["cos_sim"]
        for r in neardup_pairs(vecs, 9, 20).collect()
    }
    lsh_df = neardup_pairs(vecs, 9, 20, prebucket="lsh", n_bands=24, band_planes=3)
    lsh = {(r["doc_a"], r["doc_b"]): r["cos_sim"] for r in lsh_df.collect()}
    assert lsh == exact and len(exact) > 0

    tile_plan = neardup_pairs(vecs, 9, 20)._jdf.queryExecution().toString()
    lsh_plan = lsh_df._jdf.queryExecution().toString()
    assert "sequence(0" in tile_plan  # the tile path replicates by explode
    assert "sequence(0" not in lsh_plan and "explode" not in lsh_plan.lower()

    zn = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.95, 0.05]), (2, [0.0, 0.0])],
        "vec_id bigint, embedding array<float>",
    )
    got = neardup_pairs(zn, 9, 10, prebucket="lsh").collect()
    assert {(r["doc_a"], r["doc_b"]) for r in got} == {(0, 1)}

    import pytest

    with pytest.raises(ValueError, match="unknown prebucket"):
        neardup_pairs(vecs, prebucket="minhash")


def test_semantic_neardup_raises_without_centroids(spark):
    import pytest

    from mongoshake_spark.functions.similarity import semantic_neardup

    vecs = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1])], "vec_id bigint, embedding array<double>"
    )
    with pytest.raises(ValueError, match="no centroids"):
        semantic_neardup(vecs, centroid_mod=29).count()


def test_word_count_mixed_case():
    import re

    from mongoshake_spark.functions.text import WORD_RE

    assert len(re.findall(WORD_RE, "Hello World FOO bar9")) == 4


def test_scrub_pii_mixed_case_and_phone_inside_email(spark):
    from mongoshake_spark.functions.text import scrub_pii

    docs = spark.createDataFrame(
        [(1, "contact Bob.Smith@Corp.IO or john@555-1234.com now call 555-9876 ok")],
        "doc_id bigint, text string",
    )
    r = scrub_pii(docs).collect()[0]
    # both emails redacted incl. the uppercase one; the phone-shaped run
    # INSIDE the second email is part of the <EMAIL>, not a phone
    assert r["n_emails"] == 2
    assert r["n_phones"] == 1


def test_entropy_signals_exact_values(spark):
    import math

    docs = _docs(
        spark,
        [
            (1, "a a a a"),      # one type: entropy 0, ttr 1/4
            (2, "a b c d"),      # uniform over 4: entropy 2 bits, ttr 1
            (3, "a a b"),        # H = log2(3) - (2*1)/3 = 1.584963-0.666667
        ],
    )
    got = {r["doc_id"]: r for r in textfn.entropy_signals(docs).collect()}
    assert got[1]["entropy_bits"] == 0.0
    assert got[1]["n_tokens"] == 4 and got[1]["n_types"] == 1
    assert got[1]["type_token_ratio"] == 0.25
    assert got[2]["entropy_bits"] == 2.0
    assert got[2]["type_token_ratio"] == 1.0
    h3 = round(math.log2(3) - (2 * math.log2(2)) / 3, 4)
    assert got[3]["entropy_bits"] == h3
    assert got[3]["n_types"] == 2


def test_entropy_single_token_doc_is_zero(spark):
    docs = _docs(spark, [(9, "lonely")])
    row = textfn.entropy_signals(docs).collect()[0]
    assert row["entropy_bits"] == 0.0
    assert row["n_tokens"] == 1 and row["n_types"] == 1


def test_term_filter_counts_and_budget(spark):
    import pytest

    docs = _docs(
        spark,
        [
            (1, "clean words only here"),
            (2, "one bad word"),
            (3, "bad bad and worse"),
        ],
    )
    got = {
        r["doc_id"]: (r["n_hits"], r["keep"])
        for r in textfn.term_filter(docs, ["bad", "worse"], max_hits=1).collect()
    }
    assert got == {1: (0, True), 2: (1, True), 3: (3, False)}
    strict = {
        r["doc_id"]: r["keep"]
        for r in textfn.term_filter(docs, ["bad"], max_hits=0).collect()
    }
    assert strict == {1: True, 2: False, 3: False}
    with pytest.raises(ValueError, match="empty"):
        textfn.term_filter(docs, [])


def test_term_filter_and_entropy_respect_id_col(spark):
    # sibling operators (cdc_chunks, sample_weighted, tfidf_top_terms)
    # take id_col; these two must too (round-9 ADVICE)
    docs = spark.createDataFrame(
        [(7, "bad words here"), (8, "clean text")], "uid long, text string"
    )
    got = {
        r["uid"]: r["n_hits"]
        for r in textfn.term_filter(docs, ["bad"], id_col="uid").collect()
    }
    assert got == {7: 1, 8: 0}
    ent = {r["uid"]: r["n_types"] for r in textfn.entropy_signals(docs, id_col="uid").collect()}
    assert ent == {7: 3, 8: 2}


def test_term_filter_bloom_one_sided_vs_exact(spark):
    """bloom=True must agree with the exact array form up to ONE-SIDED
    error: n_hits never undercounts, keep never over-keeps (a listed
    term can never escape). At a generous m_bits the fixture list has
    no false positives, so the outputs match exactly; at a tiny m_bits
    false positives MUST fire (one-sided, deterministic)."""
    rows = [(i, f"tok{i} bad tok{i+1} filler word{i}") for i in range(0, 40, 2)]
    rows += [(99, "completely clean text here")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    terms = ["bad", "worse", "evil"]
    exact = {
        r["doc_id"]: (r["n_hits"], r["keep"])
        for r in textfn.term_filter(docs, terms, max_hits=0).collect()
    }
    wide = {
        r["doc_id"]: (r["n_hits"], r["keep"])
        for r in textfn.term_filter(
            docs, terms, max_hits=0, bloom=True, m_bits=1 << 20
        ).collect()
    }
    assert wide == exact
    tiny = {
        r["doc_id"]: (r["n_hits"], r["keep"])
        for r in textfn.term_filter(
            docs, terms, max_hits=0, bloom=True, m_bits=16
        ).collect()
    }
    assert set(tiny) == set(exact)
    fp = 0
    for d, (n, keep) in exact.items():
        tn, tkeep = tiny[d]
        assert tn >= n, d  # never undercounts
        # one-sided both ways: bloom-kept implies exact-kept (the filter
        # can only ADD hits), and an exact drop is always a bloom drop
        assert not tkeep or keep, d
        if not keep:
            assert not tkeep, d  # a real hit never escapes
        fp += tn - n
    assert fp > 0  # the tiny filter actually exercised false positives
