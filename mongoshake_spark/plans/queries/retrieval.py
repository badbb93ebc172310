"""Registry domain: retrieval (split from plans/queries.py; registration order preserved within the file)."""

from __future__ import annotations

from mongoshake_spark.plans.queries._shared import (  # noqa: F401
    _dd_dot,
    _q,
    load_table,
    merge,
)



_BM25_TERMS = ["spark", "merge", "window", "vector", "customer"]


@_q(
    "bm25_topk",
    f"""WITH tok AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     t -> t != '') AS toks
  FROM documents),
d AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS dl FROM tok),
st AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
              avg(CAST(dl AS DOUBLE)) AS avgdl FROM d),
hits AS (SELECT doc_id, dl,
                unnest(list_filter(toks, t -> list_contains(
                  {_BM25_TERMS!r}, t))) AS term
         FROM d),
tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf,
              first(dl) AS dl FROM hits GROUP BY 1, 2),
dfq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
idf AS (SELECT term, ln(1 + (n_docs - df + 0.5) / (df + 0.5)) AS idf, avgdl
        FROM dfq CROSS JOIN st),
sc AS (SELECT t.doc_id,
         sum(i.idf * t.tf * (1.2 + 1.0)
             / (t.tf + 1.2 * (1.0 - 0.75 + 0.75 * t.dl / i.avgdl))) AS score
       FROM tf t JOIN idf i ON t.term = i.term GROUP BY 1)
SELECT doc_id, round(score, 6) AS score FROM sc
ORDER BY score DESC, doc_id LIMIT 20""",
    "BM25 top-20 relevance retrieval (Okapi, Lucene's +1 idf smoothing) "
    "for a 5-term query. Corpus-wide state is two scalars (N, avgdl) "
    "plus a |query|-row idf table joined back as a broadcast; the "
    "per-doc term restriction happens IN-ROW before the explode, so at "
    "most |terms| rows per doc reach the one corpus shuffle, and the "
    "global top-k is TakeOrderedAndProject — per-partition partial "
    "top-k, k-row driver merge (functions/retrieval.bm25_topk).",
)
def bm25_topk_q(spark, sf_dir):
    from mongoshake_spark.functions.retrieval import bm25_topk

    docs = load_table(spark, sf_dir, "documents")
    return bm25_topk(docs, _BM25_TERMS, k=20)


@_q(
    "hybrid_rrf_topk",
    f"""WITH tok AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     t -> t != '') AS toks
  FROM documents),
d AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS dl FROM tok),
st AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
              avg(CAST(dl AS DOUBLE)) AS avgdl FROM d),
hits AS (SELECT doc_id, dl,
                unnest(list_filter(toks, t -> list_contains(
                  {_BM25_TERMS!r}, t))) AS term
         FROM d),
tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf,
              first(dl) AS dl FROM hits GROUP BY 1, 2),
dfq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
idf AS (SELECT term, ln(1 + (n_docs - df + 0.5) / (df + 0.5)) AS idf, avgdl
        FROM dfq CROSS JOIN st),
sc AS (SELECT t.doc_id,
         round(sum(i.idf * t.tf * (1.2 + 1.0)
             / (t.tf + 1.2 * (1.0 - 0.75 + 0.75 * t.dl / i.avgdl))), 6) AS score
       FROM tf t JOIN idf i ON t.term = i.term GROUP BY 1),
lexr AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id)
                             AS BIGINT) AS lex_rank FROM sc),
lex50 AS (SELECT doc_id, lex_rank FROM lexr WHERE lex_rank <= 50),
v AS (SELECT vec_id, embedding,
             sqrt({_dd_dot('embedding', 'embedding')}) AS vnorm
      FROM embeddings),
q AS (SELECT embedding AS qvec, vnorm AS qnorm FROM v WHERE vec_id = 0),
sem AS (SELECT v.vec_id AS doc_id,
               round({_dd_dot('qvec', 'embedding')} / (qnorm * vnorm), 6) AS cos
        FROM v CROSS JOIN q),
semr AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY cos DESC, doc_id)
                             AS BIGINT) AS sem_rank FROM sem),
sem50 AS (SELECT doc_id, sem_rank FROM semr WHERE sem_rank <= 50),
f AS (SELECT coalesce(l.doc_id, s.doc_id) AS doc_id, l.lex_rank, s.sem_rank,
             round(coalesce(1.0 / (60 + l.lex_rank), 0)
                 + coalesce(1.0 / (60 + s.sem_rank), 0), 6) AS rrf_score
      FROM lex50 l FULL OUTER JOIN sem50 s ON l.doc_id = s.doc_id)
SELECT doc_id, lex_rank, sem_rank, rrf_score FROM f
ORDER BY rrf_score DESC, doc_id LIMIT 15""",
    "Hybrid retrieval: BM25 top-50 lexical candidates fused with "
    "embedding-cosine top-50 semantic candidates (query vector = corpus "
    "row 0, a stand-in for an encoded query) by reciprocal-rank fusion "
    "(1/(60+rank), Cormack et al.). Each candidate list is a "
    "TakeOrderedAndProject top-k over (rounded score desc, id) — no "
    "partition-less window, no corpus exchange — ranked at the k-row "
    "driver merge, so the fusion join is candidate-list-sized and the "
    "fused scores are bit-identical across engines "
    "(functions/retrieval.hybrid_rrf_topk).",
)
def hybrid_rrf_topk_q(spark, sf_dir):
    from mongoshake_spark.functions.retrieval import hybrid_rrf_topk

    docs = load_table(spark, sf_dir, "documents")
    vecs = load_table(spark, sf_dir, "embeddings")
    return hybrid_rrf_topk(docs, vecs, _BM25_TERMS, query_vec_id=0, k=15)


@_q(
    "tfidf_topterms",
    """WITH tok AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             t -> t != '') AS toks
  FROM documents),
t AS (SELECT doc_id, unnest(toks) AS term FROM tok),
tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
st AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
sc AS (SELECT tf.doc_id, tf.term,
              CAST(tf.tf AS DOUBLE) * n_docs / df AS score
       FROM tf JOIN dfq ON tf.term = dfq.term CROSS JOIN st),
r AS (SELECT doc_id, term, score,
             row_number() OVER (PARTITION BY doc_id
               ORDER BY score DESC, term) AS rank
      FROM sc)
SELECT doc_id, term, CAST(rank AS INT) AS rank, round(score, 6) AS score
FROM r WHERE rank <= 3 ORDER BY doc_id, rank""",
    "Per-document keyword extraction: top-3 terms by tf-idf with the "
    "LINEAR idf variant (score = tf*N/df — three exact integers through "
    "one IEEE division, so ranks and scores are engine-identical with "
    "no libm dependence; BM25 covers the log-idf shape). tf and df are "
    "map-side-combined aggregates, the tf-df join is vocabulary-keyed "
    "on both sides, and the rank window partitions per doc — bounded "
    "groups, nothing corpus-global "
    "(functions/retrieval.tfidf_top_terms).",
)
def tfidf_topterms_q(spark, sf_dir):
    from mongoshake_spark.functions.retrieval import tfidf_top_terms

    docs = load_table(spark, sf_dir, "documents")
    return tfidf_top_terms(docs, top_k=3).orderBy("doc_id", "rank")


@_q(
    "mine_hard_negatives",
    """WITH tok AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             t -> t != '') AS toks
  FROM documents),
d AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS dl FROM tok),
st AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
              avg(CAST(dl AS DOUBLE)) AS avgdl FROM d),
t AS (SELECT doc_id, unnest(toks) AS term FROM d),
tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
sc AS (SELECT tf.doc_id, tf.term,
              CAST(tf.tf AS DOUBLE) * n_docs / df AS score
       FROM tf JOIN dfq ON tf.term = dfq.term CROSS JOIN st),
at AS (SELECT doc_id AS anchor_id, term FROM (
         SELECT doc_id, term,
                row_number() OVER (PARTITION BY doc_id
                  ORDER BY score DESC, term) AS rk
         FROM sc WHERE doc_id < 5) WHERE rk <= 3),
idf AS (SELECT term, ln(1 + (n_docs - df + 0.5) / (df + 0.5)) AS idf, avgdl
        FROM dfq CROSS JOIN st),
tfdl AS (SELECT tf.doc_id, tf.term, CAST(tf.tf AS DOUBLE) AS tf, d.dl
         FROM tf JOIN d ON tf.doc_id = d.doc_id),
cand AS (SELECT at.anchor_id, tfdl.doc_id AS neg_id,
                round(sum(idf.idf * tfdl.tf * (1.2 + 1.0)
                      / (tfdl.tf + 1.2 * (1.0 - 0.75
                         + 0.75 * tfdl.dl / idf.avgdl))), 6) AS score
         FROM tfdl
         JOIN at ON at.term = tfdl.term
         JOIN idf ON idf.term = tfdl.term
         WHERE tfdl.doc_id <> at.anchor_id
         GROUP BY 1, 2),
sp AS (SELECT doc_id, string_split(text, ' ') AS stoks FROM documents),
gr AS (SELECT DISTINCT doc_id, array_to_string(stoks[u.i:u.i + 7], ' ') AS gram
       FROM sp, unnest(range(1, len(stoks) - 6)) AS u(i)),
ag AS (SELECT doc_id AS anchor_id, gram FROM gr WHERE doc_id < 5),
ov AS (SELECT DISTINCT ag.anchor_id, gr.doc_id AS neg_id
       FROM gr JOIN ag ON ag.gram = gr.gram),
flt AS (SELECT c.anchor_id, c.neg_id, c.score FROM cand c
        LEFT JOIN ov ON ov.anchor_id = c.anchor_id AND ov.neg_id = c.neg_id
        WHERE ov.neg_id IS NULL)
SELECT anchor_id, neg_id, CAST(rank AS INT) AS rank, score FROM (
  SELECT *, row_number() OVER (PARTITION BY anchor_id
    ORDER BY score DESC, neg_id) AS rank
  FROM flt) WHERE rank <= 5
ORDER BY anchor_id, rank""",
    "Hard-negative mining for retrieval/embedding training (the DPR / "
    "sentence-transformers recipe): per anchor doc, the top-5 documents "
    "scoring high on the anchor's top-3 tf-idf keywords under BM25 "
    "(lexically confusable) that share NO 8-token-gram with the anchor "
    "(copies would be false negatives). Composes three existing planes "
    "— tfidf_top_terms keyword extraction, broadcast-term BM25, "
    "decontaminate-shaped gram exclusion; everything anchor-sized "
    "broadcasts, candidates bounded by the term hits, no doc-to-doc "
    "pair blowup (functions/retrieval.hard_negatives).",
)
def mine_hard_negatives_q(spark, sf_dir):
    from mongoshake_spark.functions.retrieval import hard_negatives

    docs = load_table(spark, sf_dir, "documents")
    return hard_negatives(docs, anchor_ids=list(range(5))).orderBy(
        "anchor_id", "rank"
    )


# ---- hashed TF-IDF vectors (text -> vector plane bridge) -------------

from mongoshake_spark.plans.queries._shared import F, poly_hash_duckdb  # noqa: E402

_HTV_POLY = poly_hash_duckdb("t.tok")

_HTV_CTES = f"""toks AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
         FROM documents),
tf AS (SELECT doc_id, lang, tok, count(*) AS tf
       FROM toks WHERE tok <> '' GROUP BY 1, 2, 3),
dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM documents),
t2 AS (SELECT t.doc_id, t.lang, t.tok, t.tf, d.df FROM tf t JOIN dfreq d USING (tok)),
wt AS (SELECT t.doc_id, t.lang, {_HTV_POLY} % 64 AS dim,
              t.tf * round(ln((n.n_docs + 1.0) / (t.df + 1.0)) + 1, 6) AS wt
       FROM t2 t, n),
sparse AS (SELECT doc_id, lang, dim, round(sum(wt), 6) AS w FROM wt GROUP BY 1, 2, 3),
dims AS (SELECT CAST(range AS INT) AS dim FROM range(0, 64)),
grid AS (SELECT d.doc_id, d.lang, m.dim FROM documents d, dims m),
dense AS (SELECT g.doc_id, g.lang, list(coalesce(s.w, 0.0) ORDER BY g.dim) AS tvec
          FROM grid g LEFT JOIN sparse s ON s.doc_id = g.doc_id AND s.dim = g.dim
          GROUP BY 1, 2),
v AS (SELECT doc_id, lang, tvec, sqrt({_dd_dot('tvec', 'tvec')}) AS vnorm
      FROM dense)"""


@_q(
    "text_hash_embed",
    f"""WITH {_HTV_CTES}
SELECT doc_id,
       round(vnorm, 6) AS l2norm,
       CAST(len(list_filter(tvec, x -> x <> 0)) AS INT) AS nnz,
       CAST(list_position(tvec, list_max(tvec)) - 1 AS INT) AS top_dim,
       list_max(tvec) AS top_w
FROM v ORDER BY doc_id""",
    "Feature-hashed TF-IDF document vectors (the hashing trick, "
    "Weinberger et al. 2009): whitespace tokens weighted "
    "tf*(ln((N+1)/(df+1))+1) and bucket-summed by poly_hash(token) % 64 "
    "into a dense array<double> — a model-free, vocabulary-table-free "
    "text embedding that drops documents straight into the vector plane "
    "(near-dup, LSH, PCA/OPQ, ANN unchanged). df is a token-keyed "
    "aggregate joined on the token shuffle key, never a vocabulary "
    "broadcast; weights round AFTER the bucket sum so both engines fold "
    "identical doubles. Checked per-doc: L2 norm, nonzero bucket count, "
    "argmax bucket and weight "
    "(functions/retrieval.hash_tfidf_vectors).",
)
def text_hash_embed_q(spark, sf_dir):
    from mongoshake_spark.functions.retrieval import hash_tfidf_vectors
    from mongoshake_spark.functions.similarity import dot_expr

    docs = load_table(spark, sf_dir, "documents")
    vecs = hash_tfidf_vectors(docs.select("doc_id", "text"))
    return (
        vecs.select(
            "doc_id",
            F.round(F.expr(f"sqrt({dot_expr('tvec', 'tvec')})"), 6).alias(
                "l2norm"
            ),
            F.size(F.expr("filter(tvec, x -> x != 0D)")).alias("nnz"),
            (F.array_position("tvec", F.array_max("tvec")) - 1)
            .cast("int")
            .alias("top_dim"),
            F.array_max("tvec").alias("top_w"),
        )
        .orderBy("doc_id")
    )


@_q(
    "text_vector_neardup",
    f"""WITH {_HTV_CTES}
SELECT doc_a, doc_b, cos_sim FROM (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         round({_dd_dot('a.tvec', 'b.tvec')} / (a.vnorm * b.vnorm), 6) AS cos_sim
  FROM v a JOIN v b ON a.lang = b.lang AND a.doc_id < b.doc_id
  WHERE a.vnorm > 0 AND b.vnorm > 0)
WHERE cos_sim >= 0.95 ORDER BY doc_a, doc_b""",
    "Text near-duplicate pairs through the VECTOR plane: cosine >= 0.95 "
    "over the hashed TF-IDF vectors, blocked on language (the standard "
    "metadata blocking step — candidates are sum-of-blocks², never "
    "corpus²; for unblocked scale the same vectors drop into "
    "similarity.neardup_pairs(prebucket='lsh'), the recall-gated path). "
    "Weighted-cosine semantics catch reorderings and heavy-overlap "
    "rewrites that byte/shingle dedup scores differently; scoring is "
    "the tiled numpy block scan — one vectorized A @ B-transpose per "
    "(block, tile, tile) group, every same-block pair in exactly one "
    "group (functions/retrieval.hash_vector_neardup).",
)
def text_vector_neardup_q(spark, sf_dir):
    from mongoshake_spark.functions.retrieval import hash_vector_neardup

    docs = load_table(spark, sf_dir, "documents")
    return hash_vector_neardup(docs, threshold=0.95).orderBy(
        "doc_a", "doc_b"
    )
