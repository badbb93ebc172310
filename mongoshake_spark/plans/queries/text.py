"""Registry domain: text (split from plans/queries.py; registration order preserved within the file)."""

from __future__ import annotations

from mongoshake_spark.plans.queries._shared import (  # noqa: F401
    F,
    _POLY_TEXT,
    _STOP_IN,
    _q,
    filters,
    load_table,
    merge,
    poly_hash_duckdb,
    textfn,
)



@_q(
    "text_vocab_top50",
    """SELECT tok, count(*) AS freq FROM (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents) t
GROUP BY tok ORDER BY freq DESC, tok LIMIT 50""",
    "Vocabulary statistics: corpus-wide token frequencies, top 50 — the "
    "explode+aggregate shape every tokenizer-training pipeline needs.",
)
def text_vocab(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("tok").asc())
        .limit(50)
    )


@_q(
    "text_tokens",
    """SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
       len(regexp_extract_all(text, '[a-zA-Z0-9]+')) AS n_words,
       length(text) AS n_chars_calc
FROM documents ORDER BY doc_id""",
    "Token counting: whitespace + regex word tokens.",
)
def text_tokens(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    c = F.col("text")
    return docs.select(
        "doc_id",
        textfn.token_count(c).alias("n_tokens"),
        textfn.word_count(c).alias("n_words"),
        F.length(c).alias("n_chars_calc"),
    ).orderBy("doc_id")

_QUALITY_ORACLE = f"""WITH sig AS (
  SELECT doc_id, length(text) AS n_chars_calc,
         len(string_split(text, ' ')) AS n_tokens,
         len(regexp_extract_all(text, '[a-zA-Z0-9]+')) AS n_words,
         len(list_filter(string_split(text, ' '), x -> x IN ({_STOP_IN}))) AS n_stopwords
  FROM documents)
SELECT doc_id, n_chars_calc, n_tokens, n_words, n_stopwords,
       CASE WHEN n_tokens < 20 THEN 1
            WHEN n_stopwords * 20 >= n_tokens THEN 2
            ELSE 0 END AS quality_class
FROM sig ORDER BY doc_id"""


@_q(
    "text_quality",
    _QUALITY_ORACLE,
    "Quality scoring: length/token/stopword signals, integer quality class.",
)
def text_quality(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return textfn.quality_signals(docs).orderBy("doc_id")


_LANGID_ORACLE = f"""WITH sig AS (
  SELECT doc_id, lang,
         len(string_split(text, ' ')) AS n_tok,
         len(list_filter(string_split(text, ' '), x -> x IN ({_STOP_IN}))) AS n_stop
  FROM documents)
SELECT doc_id,
       CASE WHEN n_stop >= 2 AND n_stop * 50 >= n_tok THEN 'en' ELSE 'other' END AS lang_pred,
       lang AS lang_actual
FROM sig ORDER BY doc_id"""


@_q(
    "text_langid",
    _LANGID_ORACLE,
    "Language-ID heuristic: English stopword density.",
)
def text_langid(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return textfn.lang_id(docs).orderBy("doc_id")


@_q(
    "text_fingerprint",
    f"""SELECT doc_id, {_POLY_TEXT} AS fp_poly, md5(text) AS fp_md5
FROM documents ORDER BY doc_id""",
    "Document fingerprinting: rolling polynomial hash + md5.",
)
def text_fingerprint(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return textfn.fingerprint(docs).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Training-pipeline quality filters (round 4): repetition, PII, composed
# keep-set, IVF ANN
# ---------------------------------------------------------------------------

_REPETITION_ORACLE = """WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sized AS (SELECT doc_id, t, len(t) AS n_tokens FROM base),
bg AS (
  SELECT doc_id, unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS gram
  FROM sized),
bgc AS (SELECT doc_id, gram, count(*) AS cnt FROM bg GROUP BY doc_id, gram),
bgtop AS (
  SELECT doc_id, gram AS top_bigram, cnt AS top_bigram_n FROM (
    SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, gram DESC) AS rn
    FROM bgc) WHERE rn = 1),
tg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS gram
  FROM sized WHERE len(t) >= 3),
tgc AS (SELECT doc_id, gram, count(*) AS cnt FROM tg GROUP BY doc_id, gram),
tgdup AS (
  SELECT doc_id, CAST(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS BIGINT) AS dup_trigram_n
  FROM tgc GROUP BY doc_id)
SELECT s.doc_id, s.n_tokens,
       coalesce(b.top_bigram, '') AS top_bigram,
       coalesce(b.top_bigram_n, 0) AS top_bigram_n,
       coalesce(d.dup_trigram_n, 0) AS dup_trigram_n
FROM sized s LEFT JOIN bgtop b ON s.doc_id = b.doc_id
LEFT JOIN tgdup d ON s.doc_id = d.doc_id
ORDER BY s.doc_id"""


@_q(
    "text_repetition",
    _REPETITION_ORACLE,
    "Repetition quality filters (Gopher-style): per-document most-frequent "
    "bigram count + duplicated-trigram instance count. Explode -> "
    "map-side-combined counts -> struct-max argmax (no corpus-wide window).",
)
def text_repetition(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return textfn.repetition_signals(docs).orderBy("doc_id")


# PII scrubbing over a constructed corpus variant: the fixture text is
# synthetic lowercase tokens with no contact strings, so both engines
# append deterministic email/phone-shaped suffixes derived from doc_id —
# the q29 construction-variable oracle pattern — making redaction counts
# and the scrubbed fingerprint non-vacuous.
_PII_AUG_SQL = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com or "
    "call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' now'"
)

_PII_ORACLE = rf"""WITH aug AS (
  SELECT doc_id, {_PII_AUG_SQL} AS text FROM documents)
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{{2,}}')) AS INT) AS n_emails,
       CAST(len(regexp_extract_all(regexp_replace(text,
             '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{{2,}}', '<EMAIL>', 'g'),
             '\b[0-9]{{3}}-[0-9]{{4}}\b')) AS INT) AS n_phones,
       md5(regexp_replace(regexp_replace(text,
             '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{{2,}}', '<EMAIL>', 'g'),
             '\b[0-9]{{3}}-[0-9]{{4}}\b', '<PHONE>', 'g')) AS fp_scrubbed
FROM aug ORDER BY doc_id"""


@_q(
    "text_pii_scrub",
    _PII_ORACLE,
    "PII redaction: email + phone regex scrub with match counts and a "
    "fingerprint of the scrubbed text (regexes in the Java/RE2 common subset).",
)
def text_pii_scrub(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or call 555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" now"),
        ).alias("text"),
    )
    return textfn.scrub_pii(aug).orderBy("doc_id")


_TOKEN_DF_ORACLE = """WITH dt AS (
  SELECT DISTINCT doc_id, tok FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)),
vdf AS (SELECT tok, count(*) AS df FROM dt GROUP BY tok)
SELECT doc_id, count(*) AS n_unique, CAST(sum(df) AS BIGINT) AS df_sum,
       CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
FROM dt JOIN vdf USING (tok)
GROUP BY doc_id ORDER BY doc_id"""


@_q(
    "token_df_quality",
    _TOKEN_DF_ORACLE,
    "Corpus-level token document-frequency quality signals: vocabulary DF "
    "table broadcast-joined back per document — distinct-token count, DF "
    "checksum, and hapax (DF=1) count; the exact-integer stand-in for an "
    "LM quality filter.",
)
def token_df_q(spark, sf_dir):
    from mongoshake_spark.functions.curation import token_df_signals

    docs = load_table(spark, sf_dir, "documents")
    return token_df_signals(docs).orderBy("doc_id")


_CORPUS_STATS_ORACLE = """WITH t AS (
  SELECT source, len(string_split(text, ' ')) AS n_tokens, n_chars
  FROM documents)
SELECT source, count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       round(quantile_cont(n_tokens, 0.5), 4) AS p50_tokens,
       round(quantile_cont(n_tokens, 0.9), 4) AS p90_tokens,
       round(avg(n_chars), 4) AS avg_chars
FROM t GROUP BY source ORDER BY source"""


@_q(
    "corpus_stats",
    _CORPUS_STATS_ORACLE,
    "Per-source corpus monitoring summary: doc counts, token totals, exact "
    "p50/p90 token-length quantiles (Spark `percentile` == DuckDB "
    "quantile_cont, both linear-interpolated), mean chars. One partial-"
    "combine aggregate; at 100 TB swap `percentile` for approx_percentile "
    "(t-digest, mergeable sketch) — the exact form pins the oracle.",
)
def corpus_stats_q(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("n_tokens", textfn.token_count(F.col("text")))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.expr("percentile(n_tokens, 0.5)"), 4).alias("p50_tokens"),
            F.round(F.expr("percentile(n_tokens, 0.9)"), 4).alias("p90_tokens"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        )
        .orderBy("source")
    )


_LM_SCORE_ORACLE = """WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
bg AS (
  SELECT doc_id, unnest(list_transform(range(1, len(t)),
                                       i -> {'a': t[i], 'b': t[i+1]})) AS p
  FROM toks WHERE len(t) >= 2),
b2 AS (SELECT doc_id, p.a AS a, p.b AS b FROM bg),
c2 AS (SELECT a, b, count(*) AS c2 FROM b2 GROUP BY a, b),
c1 AS (SELECT a, CAST(sum(c2) AS BIGINT) AS c1 FROM c2 GROUP BY a),
v AS (SELECT count(DISTINCT tok) AS v
      FROM (SELECT unnest(t) AS tok FROM toks))
SELECT doc_id, count(*) AS n_bigrams,
       round(-sum(log2((c2 + 1.0) / (c1 + v))) / count(*), 4)
         AS bits_per_token
FROM b2 JOIN c2 USING (a, b) JOIN c1 USING (a) CROSS JOIN v
GROUP BY doc_id ORDER BY doc_id"""


@_q(
    "text_lm_score",
    _LM_SCORE_ORACLE,
    "Bigram LM quality scoring (the CCNet perplexity-filter shape): "
    "add-one-smoothed bigram model trained on the corpus, per-doc average "
    "surprisal in bits. Model = two partial-combine aggregates; scoring = "
    "one shuffle join on the (a,b) key; vocab scalar broadcast.",
)
def text_lm_score_q(spark, sf_dir):
    from mongoshake_spark.functions.curation import lm_score

    docs = load_table(spark, sf_dir, "documents")
    return lm_score(docs).orderBy("doc_id")


@_q(
    "vocab_encode",
    """WITH s AS (SELECT doc_id, string_split(text, ' ') AS arr FROM documents),
toks AS (SELECT doc_id, unnest(arr) AS tok,
                generate_subscripts(arr, 1) - 1 AS pos FROM s),
counts AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
vocab AS (SELECT tok, row_number() OVER (ORDER BY cnt DESC, tok) - 1 AS tok_id
          FROM counts ORDER BY cnt DESC, tok LIMIT 32),
enc AS (SELECT t.doc_id, t.pos, coalesce(v.tok_id, 32) AS tok_id
        FROM toks t LEFT JOIN vocab v ON t.tok = v.tok)
SELECT doc_id, array_to_string(list(tok_id ORDER BY pos), ',') AS ids
FROM enc GROUP BY doc_id ORDER BY doc_id""",
    "Frequency-ranked vocabulary encoding (vocab_size=32, so the fixture "
    "exercises the OOV->unk path): ids by (count desc, token asc) — a "
    "total engine-reproducible order — then every document rewritten as "
    "its token-id sequence. One corpus shuffle for the count aggregate; "
    "the rank window covers at most vocab_size rows (bounded constant), "
    "and the encode join broadcasts the vocabulary "
    "(functions/curation.vocab_encode). The id sequence is projected to "
    "a comma-joined string on BOTH sides: the round driver's pandas "
    "canonicalizer cannot sort array cells (CORRECTNESS_r05 ERR), and "
    "the string carries the identical information.",
)
def vocab_encode_q(spark, sf_dir):
    from mongoshake_spark.functions.curation import vocab_encode

    docs = load_table(spark, sf_dir, "documents")
    enc = vocab_encode(docs, vocab_size=32)
    return enc.select(
        "doc_id",
        F.array_join(F.col("ids").cast("array<string>"), ",").alias("ids"),
    ).orderBy("doc_id")


@_q(
    "quality_deciles",
    """SELECT doc_id, n_chars,
       CAST(((row_number() OVER (ORDER BY n_chars DESC, doc_id) - 1) * 10)
            // (SELECT count(*) FROM documents) AS INT) AS decile
FROM documents ORDER BY doc_id""",
    "Rank-exact quality binning: decile d = floor(rank*10/N) over "
    "(n_chars desc, id) — the 'keep the top 30%' quality gate, exact "
    "integer arithmetic. The global rank reuses the distributed prefix "
    "sum (no single-partition window); the oracle's own row_number "
    "window is exactly the plan the operator avoids "
    "(functions/curation.quality_deciles).",
)
def quality_deciles_q(spark, sf_dir):
    from mongoshake_spark.functions.curation import quality_deciles

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return quality_deciles(docs, score_col="n_chars").orderBy("doc_id")


_PH_T = poly_hash_duckdb("t")

@_q(
    "quality_classifier",
    f"""WITH tok AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     t -> t != '') AS toks
  FROM documents),
s AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
    list_reduce([CAST(0 AS BIGINT)] || list_transform(toks,
      t -> ((({_PH_T}) % 4096) * 2654435761) % 2001 - 1000),
      (s0, x0) -> s0 + x0) AS si
  FROM tok)
SELECT doc_id, n_tokens,
       CAST(CASE WHEN si < 0 THEN -1 ELSE 1 END
            * ((abs(si) * 1000000) // (1000 * n_tokens)) AS BIGINT)
         AS score_ppm,
       si > 0 AS keep
FROM s WHERE n_tokens > 0 ORDER BY doc_id""",
    "Feature-hashed linear quality classifier (the fasttext/logreg "
    "filtering pass — CCNet, GPT-3 WebText filter): tokens hash into "
    "4096 feature buckets, the doc score is the integer bucket-weight "
    "sum over occurrences normalized by length, keep = score > 0. "
    "Weights here derive in-row from the bucket id so the oracle replays "
    "the full computation; a trained model is a broadcast (bucket, wint) "
    "table on the same operator. MAP-ONLY — nested higher-order "
    "aggregate per row, zero exchanges; FLOAT-FREE end-to-end (integer "
    "sums, fixed-point ppm score via sign-split integer division — "
    "near-tie float rounding diverged between engines at sf0.1) "
    "(functions/curation.classifier_score).",
)
def quality_classifier_q(spark, sf_dir):
    from mongoshake_spark.functions.curation import classifier_score

    docs = load_table(spark, sf_dir, "documents")
    return classifier_score(docs).orderBy("doc_id")


def _bpe_stages(n_merges: int) -> str:
    """The staged BPE-merge CTE chain shared by the train and encode
    oracles: one (pair-count, argmax, rewrite) CTE triple per merge.
    Symbol sequences ride as chr(31)-joined strings; pairs pack as
    l||chr(30)||r.

    The rewrite step is a plain string ``replace`` over the
    DOUBLE-DELIMITED form — each token wrapped as |tok| so adjacent
    tokens share '||' and the pattern '|l||r|' consumes exactly one
    adjacency per match: replace()'s left-to-right non-overlapping
    semantics then EQUAL bpe.merge_rewrite's BPE scan ('aaa' + (a,a)
    -> [aa, a], because the second 'a' has its own delimiters and the
    consumed span cannot be re-matched). Tokens never contain chr(31)
    by construction (split characters + their concatenations).

    Why not a list_reduce fold (the original form): DuckDB evaluates a
    lambda referencing a cross-joined column MISALIGNED against the
    outer row under multi-threaded execution — (word, s) pairings come
    back scrambled nondeterministically at sf0.1 (observed: 'filter'
    carrying 'hasher''s symbols; PRAGMA threads=1 is stable and
    correct). A scalar replace() over the materialized one-row merge
    has no lambda, so no misalignment surface (verified stable across
    repeated multi-threaded runs, equal to the single-threaded
    result). m{{i}} is MATERIALIZED: inlined scalar references would
    re-derive the whole prior stage chain per evaluation."""
    base = """WITH w0 AS (
  SELECT word, count(*) AS cnt,
         array_to_string(list_transform(range(1, length(word) + 1),
           i -> word[i:i]) || ['</w>'], chr(31)) AS s
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE word <> '' GROUP BY word)"""
    stages = [base]
    for i in range(n_merges):
        stages.append(f"""p{i} AS (
  SELECT string_split(pair, chr(30))[1] AS l,
         string_split(pair, chr(30))[2] AS r, sum(cnt) AS c
  FROM (
    SELECT cnt, unnest(list_transform(range(1, len(sv)),
             j -> sv[j] || chr(30) || sv[j+1])) AS pair
    FROM (SELECT cnt, string_split(s, chr(31)) AS sv FROM w{i})
    WHERE len(sv) >= 2)
  GROUP BY 1, 2),
m{i} AS MATERIALIZED (SELECT l, r, l || r AS m, c FROM p{i}
         ORDER BY c DESC, l, r LIMIT 1),
w{i + 1} AS (
  SELECT word, cnt,
         replace(substr(x, 2, len(x) - 2),
                 chr(31) || chr(31), chr(31)) AS s
  FROM (
    SELECT word, cnt,
      replace(
        chr(31) || replace(s, chr(31), chr(31) || chr(31)) || chr(31),
        chr(31) || m{i}.l || chr(31) || chr(31) || m{i}.r || chr(31),
        chr(31) || m{i}.m || chr(31)
      ) AS x
    FROM w{i} CROSS JOIN m{i}))""")
    return ",\n".join(stages)


def _bpe_oracle(n_merges: int) -> str:
    union = "\nUNION ALL\n".join(
        f"SELECT {i} AS step, l AS lhs, r AS rhs, m AS merged, "
        f"CAST(c AS BIGINT) AS pair_count FROM m{i}"
        for i in range(n_merges)
    )
    return _bpe_stages(n_merges) + "\n" + union + "\nORDER BY step"


def _bpe_encode_oracle(n_merges: int) -> str:
    """Encode oracle: replay the merges to the final word table, then
    join each document's words (in position order) to their encoded
    symbol strings — exactly the vocabulary-replay + join-back shape
    bpe_encode runs."""
    return f"""{_bpe_stages(n_merges)},
tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents),
enc AS (
  SELECT t.doc_id, t.pos, w.s
  FROM tok t JOIN w{n_merges} w ON w.word = t.word
  WHERE t.word <> '')
SELECT doc_id,
       array_to_string(list(s ORDER BY pos), chr(31)) AS bpe,
       CAST(sum(len(string_split(s, chr(31)))) AS BIGINT) AS n_tokens
FROM enc GROUP BY doc_id ORDER BY doc_id"""


@_q(
    "bpe_train",
    _bpe_oracle(6),
    "BPE merge learning (Sennrich et al. 2016) — the tokenizer-fit step "
    "of the training pipeline, in its production shape: the corpus "
    "collapses to its distinct-word table in ONE distributed pass (the "
    "only corpus-bounded work), then the model-sized type table fits "
    "driver-locally with exact delta-maintained pair counts (count "
    "desc / pair-lexicographic tie-break). Round-10 A/B settled the "
    "strategy: per-merge distributed jobs lose at every scale because "
    "map-side combine already collapses the recount shuffle, so the "
    "local fit replaces 2n vocabulary jobs with one collect "
    "(functions/bpe.bpe_train; distributed forms remain past "
    "LOCAL_MAX_TYPES and as the property-test oracle).",
)
def bpe_train_q(spark, sf_dir):
    from mongoshake_spark.functions.bpe import bpe_train

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # auto strategy -> driver-local fit at fixture scale; the merge
    # table is property-tested identical across all three strategies
    return bpe_train(docs, n_merges=6).orderBy("step")


@_q(
    "bpe_encode",
    _bpe_encode_oracle(4),
    "BPE corpus encoding at scale (the deploy side of bpe_train): the "
    "learned merge list replays over the DISTINCT-WORD table only "
    "(vocabulary-sized work, lineage-bounded fold chain), then encoded "
    "words join back onto documents by position — encoding a 100 TB "
    "corpus is one word-table join, never a per-document merge loop. "
    "Output is each document's full subword sequence (chr(31)-joined) "
    "plus its token count; the oracle replays the identical staged "
    "merge chain and join (functions/bpe.bpe_encode).",
)
def bpe_encode_q(spark, sf_dir):
    from mongoshake_spark.functions.bpe import bpe_encode, bpe_train

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    merges = bpe_train(docs, n_merges=4)
    enc = bpe_encode(docs, merges)
    return enc.select(
        "doc_id",
        F.array_join("bpe_tokens", "\x1f").alias("bpe"),
        F.size("bpe_tokens").cast("long").alias("n_tokens"),
    ).orderBy("doc_id")


@_q(
    "tokenizer_fertility",
    _bpe_stages(4)
    + """,
tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word
  FROM documents),
enc AS (
  SELECT t.doc_id, CAST(len(string_split(w.s, chr(31))) AS BIGINT) AS ntok
  FROM tok t JOIN w4 w ON w.word = t.word
  WHERE t.word <> ''),
per AS (
  SELECT doc_id, CAST(sum(ntok) AS BIGINT) AS nbpe,
         CAST(count(*) AS BIGINT) AS nw
  FROM enc GROUP BY 1)
SELECT d.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(p.nw) AS BIGINT) AS n_words,
       CAST(sum(p.nbpe) AS BIGINT) AS n_bpe_tokens,
       round(CAST(sum(p.nbpe) AS DOUBLE) / CAST(sum(p.nw) AS DOUBLE), 6)
         AS fertility,
       round(CAST(sum(length(d.text)) AS DOUBLE)
             / CAST(sum(p.nbpe) AS DOUBLE), 6) AS chars_per_token
FROM per p JOIN documents d USING (doc_id)
GROUP BY d.source ORDER BY d.source""",
    "Per-source tokenizer health rollup — the dashboard a tokenizer fit "
    "is judged by: fertility (BPE tokens per whitespace word; blows up "
    "on a group the tokenizer fits poorly) and chars-per-token (the "
    "compression that converts a char-count corpus size into a "
    "token-count training cost). Rides entirely on bpe_encode's "
    "vocabulary-replay broadcast join plus ONE map-side-combined "
    "aggregate per source — no corpus shuffle beyond the encode; ratios "
    "are single IEEE divisions of exact integer sums "
    "(functions/bpe.tokenizer_fertility).",
)
def tokenizer_fertility_q(spark, sf_dir):
    from mongoshake_spark.functions.bpe import bpe_train, tokenizer_fertility

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_train(docs.select("doc_id", "text"), n_merges=4)
    return tokenizer_fertility(docs, merges).orderBy("source")


_BLOCKLIST = ["vector", "slow", "merge"]


@_q(
    "text_blocklist",
    f"""SELECT doc_id,
       CAST(len(list_filter(string_split(text, ' '),
                t -> list_contains({_BLOCKLIST!r}, t))) AS INT) AS n_hits,
       len(list_filter(string_split(text, ' '),
           t -> list_contains({_BLOCKLIST!r}, t))) <= 1 AS keep
FROM documents ORDER BY doc_id""",
    "Token term-list filtering — the C4 badwords rule (and its "
    "allowlist dual): per-doc count of tokens in the list, keep iff "
    "count <= budget (1 here so the fixture exercises both outcomes). "
    "The list rides as an in-row broadcast array literal; the count is "
    "one filter/size higher-order expression — pure map in whole-stage "
    "codegen, zero shuffles, zero UDFs "
    "(functions/text.term_filter).",
)
def text_blocklist_q(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return textfn.term_filter(docs, _BLOCKLIST, max_hits=1).orderBy("doc_id")


_BLOOM_TERMS = ["merge", "join", "skew", "spill", "scan", "slow", "vector", "shuffle"]
_BLM = 256  # deliberately tiny so false positives fire on BOTH engines
_BLOOM_TERM_POS = (
    f"[CAST(h % {_BLM} AS INT), CAST((h * 3 + 7919) % {_BLM} AS INT), "
    f"CAST((h * 5 + 15838) % {_BLM} AS INT)]"
)


@_q(
    "text_blocklist_bloom",
    f"""WITH terms(t) AS (VALUES {", ".join(f"('{t}')" for t in _BLOOM_TERMS)}),
ph AS (SELECT {poly_hash_duckdb("t")} AS h FROM terms),
pos AS (SELECT DISTINCT unnest({_BLOOM_TERM_POS}) AS p FROM ph),
plist AS (SELECT list(p) AS ps FROM pos),
hs AS (SELECT doc_id,
              list_transform(list_filter(string_split(text, ' '),
                                         t -> t != ''),
                             t -> {poly_hash_duckdb("t")}) AS hs
       FROM documents),
flags AS (SELECT doc_id,
                 CAST(len(list_filter(hs, h -> list_has_all(ps, {_BLOOM_TERM_POS})))
                      AS INT) AS n_hits
          FROM hs CROSS JOIN plist)
SELECT doc_id, n_hits, n_hits <= 1 AS keep FROM flags ORDER BY doc_id""",
    "Bloom-filter term blocklisting — term_filter's 100k+-term path "
    "(multilingual badword lists): the list compresses to an m-position "
    "filter (m=256 HERE so the fixture exercises real false positives; "
    "both engines agree on exactly which), broadcast as ONE row "
    "regardless of list size, and every token is probed in-row with k=3 "
    "polynomial hashes — no join, no shuffle, no expression tree growth "
    "with the list. One-sided error: n_hits only overcounts and keep "
    "only over-drops — the safe direction for a blocklist "
    "(functions/text.term_filter bloom=True; same hash family as "
    "decontaminate_bloom).",
)
def text_blocklist_bloom_q(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return textfn.term_filter(
        docs, _BLOOM_TERMS, max_hits=1, bloom=True, m_bits=_BLM
    ).orderBy("doc_id")


@_q(
    "text_entropy",
    """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
           FROM documents),
c AS (SELECT doc_id, tok, count(*) AS cnt FROM t GROUP BY 1, 2),
a AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tokens,
             count(*) AS n_types,
             log2(CAST(sum(cnt) AS DOUBLE))
               - sum(cnt * log2(CAST(cnt AS DOUBLE)))
                 / CAST(sum(cnt) AS DOUBLE) AS h
      FROM c GROUP BY 1)
SELECT doc_id, n_tokens, n_types,
       round(n_types / CAST(n_tokens AS DOUBLE), 6) AS type_token_ratio,
       round(h, 4) AS entropy_bits
FROM a ORDER BY doc_id""",
    "Word-distribution quality signals: Shannon entropy (bits) of each "
    "document's token frequency distribution plus the type-token ratio "
    "— the gibberish/boilerplate detectors complementing the Gopher "
    "repetition counts. Entropy folds as log2(n) - sum(c*log2 c)/n in "
    "ONE aggregate (no second pass over per-token probabilities); the "
    "float sum merges partials in nondeterministic order, so entropy "
    "crosses the oracle boundary rounded to 4 digits — lm_score's "
    "order-drift contract (functions/text.entropy_signals).",
)
def text_entropy_q(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return textfn.entropy_signals(docs).orderBy("doc_id")
