"""Registry domain: curation (split from plans/queries.py; registration order preserved within the file)."""

from __future__ import annotations

from mongoshake_spark.plans.queries._shared import (  # noqa: F401
    F,
    Window,
    _STOP_IN,
    _dd_dot,
    _q,
    dedup,
    load_table,
    merge,
    poly_hash_duckdb,
    similarity,
    textfn,
)



@_q(
    "pack_sequences",
    """WITH t AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents
), c AS (
  SELECT doc_id, n_tokens,
         sum(n_tokens) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS start
  FROM t
)
SELECT doc_id, n_tokens,
       CAST(floor(start / 2048.0) AS BIGINT) AS seq_id,
       CAST(start % 2048 AS BIGINT) AS "offset"
FROM c ORDER BY doc_id""",
    "Training-sequence packing (concat-and-chop): documents laid out in "
    "doc_id order as one token stream, chopped into 2048-token sequences; "
    "each doc's (seq_id, offset) via a two-pass distributed prefix sum — "
    "the oracle's single-partition window is exactly the plan shape the "
    "operator exists to avoid (plan-gated in tests/test_plans.py).",
)
def pack_sequences_q(spark, sf_dir):
    from mongoshake_spark.functions.packing import pack_sequences

    docs = load_table(spark, sf_dir, "documents")
    return pack_sequences(docs, budget=2048).orderBy("doc_id")


@_q(
    "sample_stratified",
    """SELECT lang, count(*) AS kept, CAST(sum(doc_id) AS BIGINT) AS id_sum
FROM documents
WHERE (CAST(doc_id * 2654435761 AS BIGINT) % 4294967296) / 4294967296.0 <
      CASE lang WHEN 'en' THEN 0.35 WHEN 'zh' THEN 0.6 ELSE 0.9 END
GROUP BY lang ORDER BY lang""",
    "Deterministic stratified sampling (data mixing): per-language keep "
    "rates via a portable Knuth multiplicative hash of doc_id — "
    "reproducible across engines/runs, no RNG state, and lower rates keep "
    "subsets of higher rates (re-mixing never resamples from scratch).",
)
def sample_stratified_q(spark, sf_dir):
    from mongoshake_spark.functions.packing import sample_strata

    docs = load_table(spark, sf_dir, "documents")
    kept = sample_strata(docs, {"en": 0.35, "zh": 0.6}, default_rate=0.9)
    return (
        kept.groupBy("lang")
        .agg(F.count("*").alias("kept"), F.sum("doc_id").alias("id_sum"))
        .orderBy("lang")
    )


_KEEPSET_ORACLE = f"""WITH sig AS (
  SELECT doc_id, text,
         len(string_split(text, ' ')) AS n_tokens,
         len(list_filter(string_split(text, ' '), x -> x IN ({_STOP_IN}))) AS n_stopwords
  FROM documents),
kept AS (
  SELECT doc_id, text, n_tokens FROM sig
  WHERE n_tokens >= 20 AND n_stopwords * 20 >= n_tokens
    AND n_stopwords >= 2 AND n_stopwords * 50 >= n_tokens),
dedup AS (
  SELECT min(doc_id) AS doc_id, any_value(n_tokens) AS n_tokens
  FROM kept GROUP BY md5(text))
SELECT doc_id, n_tokens FROM dedup ORDER BY doc_id"""


@_q(
    "quality_keepset",
    _KEEPSET_ORACLE,
    "Composed corpus-curation pipeline: quality-class filter + language-ID "
    "gate + exact dedup (keep lowest doc_id) in one pass — the keep-set a "
    "training-data pipeline actually materializes. Signals are computed "
    "once per document; the only shuffle carries (md5, doc_id, n_tokens).",
)
def quality_keepset(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    c = F.col("text")
    sig = docs.select(
        "doc_id",
        "text",
        textfn.token_count(c).alias("n_tokens"),
        textfn.stopword_count(c).alias("n_stopwords"),
    )
    kept = sig.filter(
        (F.col("n_tokens") >= 20)
        & (F.col("n_stopwords") * 20 >= F.col("n_tokens"))
        & (F.col("n_stopwords") >= 2)
        & (F.col("n_stopwords") * 50 >= F.col("n_tokens"))
    )
    return (
        kept.groupBy(F.md5("text"))
        .agg(F.min("doc_id").alias("doc_id"), F.any_value("n_tokens").alias("n_tokens"))
        .select("doc_id", "n_tokens")
        .orderBy("doc_id")
    )


_EPOCH_MIX_ORACLE = """WITH w AS (
  SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens,
         CASE lang WHEN 'en' THEN 240 WHEN 'zh' THEN 150 ELSE 100 END AS pct,
         (CAST(doc_id * 2654435761 AS BIGINT) % 4294967296) AS u
  FROM documents),
c AS (
  SELECT lang, n_tokens,
         pct // 100 + CASE WHEN u * 100 < (pct % 100) * 4294967296 THEN 1 ELSE 0 END AS n_copies
  FROM w)
SELECT lang, CAST(sum(n_copies) AS BIGINT) AS copies,
       CAST(sum(n_copies * n_tokens) AS BIGINT) AS tok_sum
FROM c WHERE n_copies >= 1 GROUP BY lang ORDER BY lang"""


@_q(
    "epoch_mix",
    _EPOCH_MIX_ORACLE,
    "Epoch-weighted corpus mixing: en x2.4, zh x1.5, rest x1.0 — whole "
    "epochs replicate every doc, the fractional epoch keeps a "
    "deterministic hash subset (integer-exact keep rule). The Spark side "
    "MATERIALIZES the mixed corpus (explode-by-sequence, map-only) and "
    "aggregates it; the oracle recomputes the arithmetic equivalent.",
)
def epoch_mix_q(spark, sf_dir):
    from mongoshake_spark.functions.packing import epoch_mix

    docs = load_table(spark, sf_dir, "documents")
    mixed = epoch_mix(docs, {"en": 240, "zh": 150}, default_pct=100)
    return (
        mixed.groupBy("lang")
        .agg(
            F.count("*").alias("copies"),
            F.sum(textfn.token_count(F.col("text"))).alias("tok_sum"),
        )
        .orderBy("lang")
    )


# 5-gram expression shared by the decontamination oracle's corpus and eval
# sides (i ranges 1 .. len-4, DuckDB range() end-exclusive).
_G5 = (
    "CASE WHEN len(t) >= 5 THEN list_transform(range(1, len(t) - 3), "
    "i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4]) "
    "ELSE [] END"
)

_DECONTAM_ORACLE = f"""WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
cg AS (
  SELECT doc_id, unnest(list_distinct({_G5})) AS gram
  FROM toks WHERE doc_id % 20 != 0),
eg AS (
  SELECT DISTINCT unnest(list_distinct({_G5})) AS gram
  FROM toks WHERE doc_id % 20 = 0),
hits AS (
  SELECT doc_id, count(*) AS n_contaminated FROM cg
  WHERE gram IN (SELECT gram FROM eg) GROUP BY doc_id),
tot AS (
  SELECT doc_id, len(list_distinct({_G5})) AS n_grams
  FROM toks WHERE doc_id % 20 != 0)
SELECT t.doc_id, t.n_grams,
       CAST(coalesce(h.n_contaminated, 0) AS BIGINT) AS n_contaminated,
       coalesce(h.n_contaminated, 0) > 0 AS contaminated
FROM tot t LEFT JOIN hits h USING (doc_id) ORDER BY t.doc_id"""


@_q(
    "decontaminate",
    _DECONTAM_ORACLE,
    "Train/test decontamination (GPT-3/Llama pipeline stage): corpus docs "
    "(doc_id % 20 != 0) checked for 5-gram overlap against a held-out "
    "eval split (doc_id % 20 = 0); per-doc distinct-gram totals and hit "
    "counts, broadcast semi-join against the eval gram set.",
)
def decontaminate_q(spark, sf_dir):
    from mongoshake_spark.functions.curation import decontaminate

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 20 != 0)
    eval_docs = docs.filter(F.col("doc_id") % 20 == 0)
    return decontaminate(corpus, eval_docs, n=5).orderBy("doc_id")


_SHARD_ORACLE = """WITH t AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
         CAST((doc_id + 7) * 2654435761 % 4294967296 AS BIGINT) AS shuffle_key
  FROM documents),
c AS (
  SELECT doc_id, n_tokens, shuffle_key,
         sum(n_tokens) OVER (ORDER BY shuffle_key, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS start
  FROM t)
SELECT doc_id, n_tokens, shuffle_key,
       CAST(floor(start / 1000.0) AS BIGINT) AS shard_id
FROM c ORDER BY doc_id"""


@_q(
    "shard_tokens",
    _SHARD_ORACLE,
    "Token-budget sharding: deterministic global shuffle (Knuth hash of "
    "doc_id, seed 7) then ~1000-token shards via the shared two-pass "
    "distributed prefix sum — the oracle's single-partition window is the "
    "plan shape the operator avoids (gated in tests/test_plans.py).",
)
def shard_tokens_q(spark, sf_dir):
    from mongoshake_spark.functions.curation import shard_by_token_budget

    docs = load_table(spark, sf_dir, "documents")
    return shard_by_token_budget(docs, budget=1000, seed=7).orderBy("doc_id")


_DOMAIN_CAP_ORACLE = """WITH r AS (
  SELECT doc_id, source, n_chars,
         row_number() OVER (PARTITION BY source
             ORDER BY n_chars DESC, doc_id) AS rk
  FROM documents)
SELECT source, count(*) AS kept, CAST(sum(doc_id) AS BIGINT) AS id_sum,
       CAST(sum(n_chars) AS BIGINT) AS chars_sum
FROM r WHERE rk <= 10 GROUP BY source ORDER BY source"""


@_q(
    "domain_cap",
    _DOMAIN_CAP_ORACLE,
    "Per-domain document cap (CCNet/RefinedWeb): keep the top-10 docs per "
    "source by (n_chars DESC, doc_id) — per-key parallel ranking, no "
    "global sort; verified via per-source count and id/char checksums.",
)
def domain_cap_q(spark, sf_dir):
    from mongoshake_spark.functions.curation import cap_per_domain

    docs = load_table(spark, sf_dir, "documents")
    kept = cap_per_domain(docs, cap=10)
    return (
        kept.groupBy("source")
        .agg(
            F.count("*").alias("kept"),
            F.sum("doc_id").alias("id_sum"),
            F.sum("n_chars").alias("chars_sum"),
        )
        .orderBy("source")
    )


_SPAN_DECON_ORACLE = f"""WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
pos AS (
  SELECT doc_id, unnest(list_transform(range(1, len(t) - 3),
    i -> struct_pack(p := i - 1,
      g := t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4]))) AS s
  FROM toks WHERE doc_id % 20 != 0 AND len(t) >= 5),
eg AS (
  SELECT DISTINCT unnest(list_distinct({_G5})) AS gram
  FROM toks WHERE doc_id % 20 = 0),
hits AS (
  SELECT doc_id, s.p AS p FROM pos WHERE s.g IN (SELECT gram FROM eg)),
m AS (
  SELECT doc_id, p,
         max(p + 5) OVER (PARTITION BY doc_id ORDER BY p
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
  FROM hits),
isl AS (
  SELECT doc_id, p,
         sum(CASE WHEN prev_end IS NULL OR p > prev_end THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY p
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_id
  FROM m)
SELECT doc_id, CAST(span_id AS BIGINT) AS span_id,
       CAST(min(p) AS BIGINT) AS start_p, CAST(max(p) + 5 AS BIGINT) AS end_p
FROM isl GROUP BY doc_id, span_id ORDER BY doc_id, span_id"""


@_q(
    "decontaminate_spans",
    _SPAN_DECON_ORACLE,
    "Span-level decontamination (masking-grade): merged token intervals of "
    "each corpus doc covered by eval-set 5-grams — drop the span, keep the "
    "document; broadcast eval gram hashes, per-doc interval-merge windows.",
)
def decontaminate_spans_q(spark, sf_dir):
    from mongoshake_spark.functions.curation import contaminated_spans

    docs = load_table(spark, sf_dir, "documents")
    return contaminated_spans(
        docs.filter(F.col("doc_id") % 20 != 0),
        docs.filter(F.col("doc_id") % 20 == 0),
        n=5,
    ).orderBy("doc_id", "span_id")


_MASK_ORACLE = f"""WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
pos AS (
  SELECT doc_id, unnest(list_transform(range(1, len(t) - 3),
    i -> struct_pack(p := i - 1,
      g := t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4]))) AS s
  FROM toks WHERE doc_id % 20 != 0 AND len(t) >= 5),
eg AS (
  SELECT DISTINCT unnest(list_distinct({_G5})) AS gram
  FROM toks WHERE doc_id % 20 = 0),
hits AS (
  SELECT doc_id, s.p AS p FROM pos WHERE s.g IN (SELECT gram FROM eg)),
m AS (
  SELECT doc_id, p,
         max(p + 5) OVER (PARTITION BY doc_id ORDER BY p
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
  FROM hits),
isl AS (
  SELECT doc_id, p,
         sum(CASE WHEN prev_end IS NULL OR p > prev_end THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY p
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_id
  FROM m),
spanrows AS (
  SELECT doc_id, min(p) AS s, max(p) + 5 AS e
  FROM isl GROUP BY doc_id, span_id),
spans AS (
  SELECT doc_id, list(struct_pack(s := s, e := e)) AS sp
  FROM spanrows GROUP BY doc_id),
base AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents WHERE doc_id % 20 != 0),
j AS (
  SELECT b.doc_id, b.t,
         coalesce(s.sp, CAST([] AS STRUCT(s BIGINT, e BIGINT)[])) AS sp
  FROM base b LEFT JOIN spans s USING (doc_id)),
k AS (
  SELECT doc_id, len(t) AS nb,
         list_filter(
           list_transform(range(1, len(t) + 1), i -> struct_pack(tk := t[i], p := i - 1)),
           x -> NOT len(list_filter(sp, r -> x.p >= r.s AND x.p < r.e)) > 0) AS keptl
  FROM j)
SELECT doc_id, CAST(nb AS BIGINT) AS n_tokens_before,
       CAST(len(keptl) AS BIGINT) AS n_tokens_after,
       -- a fully-masked doc is the EMPTY STRING (Spark's array_join), not
       -- NULL (DuckDB's array_to_string on an empty list)
       coalesce(array_to_string(list_transform(keptl, x -> x.tk), ' '), '') AS clean_text
FROM k ORDER BY doc_id"""


@_q(
    "decontaminate_mask",
    _MASK_ORACLE,
    "Masking rewrite: every corpus doc re-emitted with its eval-"
    "overlapping token spans removed (clean docs byte-identical). Span "
    "detection = decontaminate_spans; the rewrite is pure higher-order "
    "expressions (transform/filter/exists over the token array) — zero "
    "Python; the oracle replays detection AND rewrite in SQL and "
    "value-compares the rewritten text itself.",
)
def decontaminate_mask_q(spark, sf_dir):
    from mongoshake_spark.functions.curation import mask_contaminated

    docs = load_table(spark, sf_dir, "documents")
    return mask_contaminated(
        docs.filter(F.col("doc_id") % 20 != 0),
        docs.filter(F.col("doc_id") % 20 == 0),
        n=5,
    ).orderBy("doc_id")


_PIPELINE_ORACLE = f"""WITH corpus AS (
  SELECT * FROM documents WHERE doc_id % 20 != 0),
keep AS (
  SELECT min(doc_id) AS doc_id FROM corpus
  GROUP BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))),
dd AS (SELECT c.* FROM corpus c JOIN keep USING (doc_id)),
q AS (
  SELECT * FROM dd
  WHERE len(string_split(text, ' ')) >= 20
    AND len(list_filter(string_split(text, ' '), x -> x IN ({_STOP_IN}))) * 20
        >= len(string_split(text, ' '))),
eg AS (
  SELECT DISTINCT unnest(list_distinct({_G5})) AS gram
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents
        WHERE doc_id % 20 = 0)),
cg AS (
  SELECT doc_id, unnest(list_distinct({_G5})) AS gram
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM q)),
dirty AS (SELECT DISTINCT doc_id FROM cg WHERE gram IN (SELECT gram FROM eg)),
clean AS (SELECT * FROM q WHERE doc_id NOT IN (SELECT doc_id FROM dirty)),
sampled AS (
  SELECT * FROM clean
  WHERE (CAST(doc_id * 2654435761 AS BIGINT) % 4294967296) / 4294967296.0 <
        CASE lang WHEN 'en' THEN 0.5 WHEN 'zh' THEN 0.7 ELSE 0.9 END),
t AS (SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens FROM sampled),
c AS (
  SELECT doc_id, lang, n_tokens,
         sum(n_tokens) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS start
  FROM t)
SELECT doc_id, lang, n_tokens,
       CAST(floor(start / 512.0) AS BIGINT) AS seq_id,
       CAST(start % 512 AS BIGINT) AS "offset"
FROM c ORDER BY doc_id"""


@_q(
    "pipeline_curation",
    _PIPELINE_ORACLE,
    "The end-to-end curation pipeline: exact dedup (min-id keep per "
    "normalized hash) -> quality gate (token count + stopword ratio) -> "
    "decontamination vs the eval split -> stratified down-sampling -> "
    "sequence packing. Every stage is an operator declared elsewhere; "
    "this query proves they COMPOSE. Two deliberate lineage breaks: the "
    "quality-gated branch is lazily checkpointed (it feeds both "
    "decontaminate and the anti-join) and the prefix sum checkpoints its "
    "ranged exchange; everything else is one Catalyst plan, and the "
    "oracle replays the whole chain in SQL.",
)
def pipeline_curation_q(spark, sf_dir):
    from mongoshake_spark.functions.curation import decontaminate
    from mongoshake_spark.functions.packing import pack_sequences, sample_strata

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 20 != 0)
    eval_docs = docs.filter(F.col("doc_id") % 20 == 0)
    # dedup keep: min doc_id per normalized content hash (THE shared
    # canonicalization — dedup.normalize_text — so this pipeline and
    # dedup_exact_normalized cannot drift on which doc survives).
    # Computed as a hash-partitioned window min instead of the former
    # aggregate + left-semi join-back: identical surviving rows, but ONE
    # corpus exchange instead of three (the keep-id table was itself
    # corpus-sized, so the semi-join re-shuffled both sides by doc_id —
    # guide §2.4).
    keep_w = Window.partitionBy(F.md5(dedup.normalize_text("text")))
    dd = (
        corpus.withColumn("_keep_id", F.min("doc_id").over(keep_w))
        .filter(F.col("doc_id") == F.col("_keep_id"))
        .drop("_keep_id")
    )
    # quality gate (the quality_signals class-2 rule, inline)
    n_tok = textfn.token_count(F.col("text"))
    n_stop = textfn.stopword_count(F.col("text"))
    q = dd.filter((n_tok >= 20) & (n_stop * 20 >= n_tok))
    # lazy checkpoint: `q` feeds BOTH decontaminate and the anti-join —
    # checkpointed on first materialization, the second branch reuses the
    # blocks instead of re-running scan+dedup+quality (2x cold-run win)
    q = q.localCheckpoint(eager=False)
    # decontamination: drop docs sharing any 5-gram with the eval split
    dirty = decontaminate(q, eval_docs, n=5).filter(F.col("contaminated"))
    clean = q.join(dirty.select("doc_id"), "doc_id", "left_anti")
    sampled = sample_strata(clean, {"en": 0.5, "zh": 0.7}, default_rate=0.9)
    # lang rides through the prefix sum (carry_cols) — a join-back against
    # `sampled` would re-evaluate the entire upstream pipeline a second time
    packed = pack_sequences(sampled, budget=512, carry_cols=["lang"])
    return packed.select(
        "doc_id", "lang", "n_tokens", "seq_id", "offset"
    ).orderBy("doc_id")


@_q(
    "assign_row_ids",
    """SELECT doc_id, lang,
       CAST(row_number() OVER (ORDER BY lang, doc_id) - 1 AS BIGINT) AS row_id
FROM documents ORDER BY doc_id""",
    "Dense contiguous 0-based ids over a total order (the post-dedup "
    "renumber): a global prefix sum of 1s via the shared two-pass form — "
    "the oracle's single-partition row_number is exactly the plan the "
    "operator avoids.",
)
def assign_row_ids_q(spark, sf_dir):
    from mongoshake_spark.functions.curation import assign_row_ids

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return assign_row_ids(docs, ["lang", "doc_id"]).orderBy("doc_id")


@_q(
    "lang_rebalance",
    """WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
k AS (SELECT lang, n,
        power((SELECT min(n) FROM c) / (n * 1.0), 0.5) AS keep_frac
      FROM c)
SELECT d.lang, count(*) AS kept, CAST(sum(d.doc_id) AS BIGINT) AS id_sum,
       round(any_value(k.keep_frac), 6) AS keep_frac
FROM documents d JOIN k ON d.lang = k.lang
WHERE (CAST(d.doc_id * 2654435761 AS BIGINT) % 4294967296) / 4294967296.0
      < k.keep_frac
GROUP BY d.lang ORDER BY d.lang""",
    "Temperature rebalancing (XLM-style multilingual sampling, "
    "alpha=0.5): keep_frac_l = (n_min/n_l)^(1-alpha) — the rarest "
    "language keeps 100%, dominant ones subsample toward uniform; the "
    "keep cut is the portable Knuth hash, so the oracle replays it "
    "exactly. Two #strata-row aggregates + one broadcast join; the "
    "corpus is never shuffled (functions/curation.temperature_rebalance).",
)
def lang_rebalance_q(spark, sf_dir):
    from mongoshake_spark.functions.curation import temperature_rebalance

    docs = load_table(spark, sf_dir, "documents")
    return (
        temperature_rebalance(docs, alpha=0.5)
        .groupBy("lang")
        .agg(
            F.count("*").alias("kept"),
            F.sum("doc_id").alias("id_sum"),
            F.round(F.first("keep_frac"), 6).alias("keep_frac"),
        )
        .orderBy("lang")
    )


@_q(
    "sample_exact_k",
    """WITH ranked AS (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY (CAST(doc_id * 2654435761 AS BIGINT) % 4294967296), doc_id
         ) AS rk
  FROM documents)
SELECT doc_id, lang FROM ranked WHERE rk <= 30 ORDER BY doc_id""",
    "Exactly-k-per-stratum sampling (k=30 per language): rate-based "
    "sampling gives binomial counts, mixture designs that promise k docs "
    "per language need the exact count. Rank-by-portable-hash, top-k per "
    "stratum, via cap_per_domain's skew-safe two-phase top-K "
    "(functions/curation.sample_exact_k).",
)
def sample_exact_k_q(spark, sf_dir):
    from mongoshake_spark.functions.curation import sample_exact_k

    docs = load_table(spark, sf_dir, "documents")
    return sample_exact_k(docs, k=30).select("doc_id", "lang").orderBy("doc_id")


_SEMDECON_ORACLE = f"""WITH v AS (
  SELECT vec_id, embedding, sqrt({_dd_dot('embedding', 'embedding')}) AS vnorm
  FROM embeddings),
c AS (SELECT * FROM v WHERE vec_id % 5 <> 0),
ev AS (SELECT * FROM v WHERE vec_id % 5 = 0),
hits AS (
  SELECT c.vec_id, count(*) AS n_hits
  FROM c JOIN ev
    ON {_dd_dot('c.embedding', 'ev.embedding')} * 20 >= 9 * (c.vnorm * ev.vnorm)
  GROUP BY c.vec_id)
SELECT c.vec_id, CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       coalesce(h.n_hits, 0) > 0 AS contaminated
FROM c LEFT JOIN hits h ON c.vec_id = h.vec_id
ORDER BY c.vec_id"""


@_q(
    "decontaminate_semantic",
    _SEMDECON_ORACLE,
    "Semantic decontamination: corpus vectors within cosine 0.45 of ANY "
    "eval vector (vec_id % 5 = 0 is the held-out split) — the "
    "embedding-space complement of n-gram decontamination for paraphrased "
    "eval material. Eval side broadcast with pre-materialized norms, "
    "corpus never shuffled; the dot is a sequential JVM fold, "
    "bit-identical to the oracle's list_reduce "
    "(functions/similarity.semantic_decontaminate).",
)
def decontaminate_semantic_q(spark, sf_dir):
    from mongoshake_spark.functions.similarity import semantic_decontaminate

    vecs = load_table(spark, sf_dir, "embeddings")
    corpus = vecs.filter(F.col("vec_id") % 5 != 0)
    eval_vecs = vecs.filter(F.col("vec_id") % 5 == 0)
    return semantic_decontaminate(corpus, eval_vecs, 9, 20).orderBy("vec_id")


_BLOOM_M = 262144
_PH_GRAM = poly_hash_duckdb("gram")
_PH_G = poly_hash_duckdb("g")
_BLOOM_POS = (
    f"[CAST(h % {_BLOOM_M} AS INT), CAST((h * 3 + 7919) % {_BLOOM_M} AS INT), "
    f"CAST((h * 5 + 15838) % {_BLOOM_M} AS INT)]"
)


@_q(
    "decontaminate_bloom",
    f"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
eg AS (SELECT DISTINCT unnest(list_distinct({_G5})) AS gram
       FROM toks WHERE doc_id % 20 = 0),
ph AS (SELECT {_PH_GRAM} AS h FROM eg),
pos AS (SELECT DISTINCT unnest({_BLOOM_POS}) AS p FROM ph),
plist AS (SELECT list(p) AS ps FROM pos),
corp AS (SELECT doc_id, list_distinct({_G5}) AS gs FROM toks WHERE doc_id % 20 != 0),
gh AS (SELECT doc_id, list_transform(gs, g -> {_PH_G}) AS hs FROM corp),
flags AS (
  SELECT doc_id,
         CAST(len(hs) AS BIGINT) AS n_grams,
         CAST(len(list_filter(hs, h -> list_has_all(ps, {_BLOOM_POS})))
              AS BIGINT) AS n_flagged
  FROM gh CROSS JOIN plist)
SELECT doc_id, n_grams, n_flagged, n_flagged > 0 AS contaminated
FROM flags ORDER BY doc_id""",
    "Bloom-filter decontamination (m=2^18 bits, k=3 polynomial hashes — "
    "at sf0.1 the fill ratio still yields real false positives, and "
    "both engines agree on exactly which): the eval grams compress to an "
    "m-position filter broadcast as ONE row, and the corpus verdict is a "
    "single map-only projection — no corpus-side join, aggregate, or "
    "shuffle at all, and the broadcast is O(m) however large the eval "
    "suite grows (functions/curation.decontaminate_bloom). One-sided "
    "error: over-drop only, never a missed contamination.",
)
def decontaminate_bloom_q(spark, sf_dir):
    from mongoshake_spark.functions.curation import decontaminate_bloom

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 20 != 0)
    eval_docs = docs.filter(F.col("doc_id") % 20 == 0)
    return decontaminate_bloom(
        corpus, eval_docs, n=5, m_bits=_BLOOM_M, k=3
    ).orderBy("doc_id")


@_q(
    "split_assign",
    """SELECT doc_id,
       CASE WHEN (doc_id * 2654435761) % 4294967296 % 100 < 90 THEN 'train'
            WHEN (doc_id * 2654435761) % 4294967296 % 100 < 95 THEN 'val'
            ELSE 'test' END AS split
FROM documents ORDER BY doc_id""",
    "Deterministic train/val/test assignment (90/5/5 integer weights): "
    "bucket = knuth multiplicative hash of the id mod the weight total, "
    "mapped through cumulative ranges — a pure per-row projection with "
    "no shuffle and no RNG state, so re-materializing the corpus under "
    "any partitioning reproduces the identical split (no val->train "
    "leakage across runs) (functions/curation.assign_splits).",
)
def split_assign_q(spark, sf_dir):
    from mongoshake_spark.functions.curation import assign_splits

    docs = load_table(spark, sf_dir, "documents")
    return assign_splits(docs).select("doc_id", "split").orderBy("doc_id")


@_q(
    "sample_weighted",
    """SELECT doc_id, n_chars FROM (
  SELECT doc_id, n_chars,
         row_number() OVER (
           ORDER BY (CAST(doc_id * 2654435761 AS BIGINT) % 4294967296 + 1.0)
                    / n_chars, doc_id) AS rk
  FROM documents WHERE n_chars > 0)
WHERE rk <= 40 ORDER BY doc_id""",
    "Weighted sampling without replacement (sequential Poisson / Ohlsson "
    "pps sampling, k=40 weighted by document length): each row's "
    "priority is u/w with u the portable multiplicative hash — inclusion "
    "probability ~ k*w/sum(w) in ONE pass, no RNG state, and the key is "
    "a single bigint->double division so the selected SET reproduces "
    "bit-identically cross-engine (the Efraimidis-Spirakis u^(1/w) key "
    "would ride on libm pow). The global bottom-k plans as "
    "TakeOrderedAndProject: per-partition top-k, k-row driver merge, "
    "never a corpus sort (functions/curation.sample_weighted).",
)
def sample_weighted_q(spark, sf_dir):
    from mongoshake_spark.functions.curation import sample_weighted

    docs = load_table(spark, sf_dir, "documents")
    return sample_weighted(docs, k=40).select("doc_id", "n_chars").orderBy("doc_id")


@_q(
    "corpus_shuffle",
    """WITH k AS (
  SELECT doc_id,
         md5(concat('seed42:', CAST(doc_id AS VARCHAR))) AS shuffle_key
  FROM documents),
r AS (
  SELECT doc_id, shuffle_key,
         CAST(row_number() OVER (ORDER BY shuffle_key, doc_id) - 1 AS BIGINT)
           AS shuffle_pos
  FROM k)
SELECT doc_id, shuffle_key, shuffle_pos,
       CAST(shuffle_pos % 8 AS INT) AS shard
FROM r ORDER BY doc_id""",
    "Seeded deterministic global shuffle (the training-order permutation "
    "every epoch pipeline needs): order by md5(seed || doc_id) — a "
    "reproducible pseudo-random key both engines hash identically — and "
    "assign dense positions via the shared two-pass distributed prefix "
    "sum (one range exchange + broadcast offsets, never a "
    "single-partition window), then round-robin positions into 8 output "
    "shards. Changing the seed literal re-deals the permutation; the "
    "oracle's global row_number is the very plan the operator avoids.",
)
def corpus_shuffle_q(spark, sf_dir):
    from mongoshake_spark.functions.curation import assign_row_ids

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    keyed = docs.withColumn(
        "shuffle_key",
        F.md5(F.concat(F.lit("seed42:"), F.col("doc_id").cast("string"))),
    )
    out = assign_row_ids(
        keyed, ["shuffle_key", "doc_id"], out_col="shuffle_pos"
    )
    return out.select(
        "doc_id",
        "shuffle_key",
        "shuffle_pos",
        (F.col("shuffle_pos") % 8).cast("int").alias("shard"),
    ).orderBy("doc_id")
