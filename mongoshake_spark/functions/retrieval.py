"""Full-text relevance retrieval: BM25 scoring over the document corpus.

The reference engine replicates document stores; the pipelines its data
feeds (and any training-data curation stack) need a relevance primitive —
select the documents most relevant to a query — for targeted corpus
slicing, eval-set mining, and quality-by-topicality filters. BM25
(Robertson et al., the Okapi form with the standard "+1" idf smoothing
used by Lucene) is the canonical lexical ranker.

Scale shape: the ONLY corpus-wide aggregates are two scalars (N, avgdl)
and one |query|-row idf table. Per-document term frequencies for the
query terms are computed IN-ROW (``filter(tokens, t -> t IN terms)``
before any explode), so the per-doc work is map-side; the explode emits
at most |terms| rows per document — never the vocabulary — and the idf
table joins back as a broadcast. One corpus shuffle total (the per-doc
score aggregation), then a global top-k which Spark executes as
per-partition partial top-k + a k-row driver merge (TakeOrderedAndProject).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: tokenizer shared with the oracle: lowercase, split on non-alphanumeric
TOKEN_SPLIT = "[^a-z0-9]+"


def tokenize(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds ``tokens`` (lowercased, non-alphanumeric-delimited, empties
    dropped) and ``dl`` (document length in tokens)."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), TOKEN_SPLIT), lambda t: t != ""
    )
    return df.withColumn("tokens", toks).withColumn(
        "dl", F.size("tokens").cast("bigint")
    )


def bm25_scores(
    docs: DataFrame,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document BM25 score against ``terms``:

        score(d) = sum_t idf(t) * tf(t,d)*(k1+1) / (tf(t,d) + k1*(1 - b + b*dl/avgdl))
        idf(t)   = ln(1 + (N - df(t) + 0.5) / (df(t) + 0.5))

    Only documents matching at least one term appear (score > 0 by
    construction — the +1 keeps idf positive even for terms in every doc).
    Returns ``(id_col, score)`` with the raw double score; callers round
    for cross-engine comparison.
    """
    if not terms:
        raise ValueError("bm25_scores: empty term list")
    tok = tokenize(docs.select(id_col, text_col), text_col)
    # two corpus scalars; computed once, joined in as a broadcast row
    stats = tok.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    terms_arr = F.array(*[F.lit(t) for t in terms])
    # in-row restriction to the query terms BEFORE explode: per-doc emit
    # is <= |terms| rows, the vocabulary never hits an exchange
    hits = tok.select(
        id_col,
        "dl",
        F.explode(F.filter("tokens", lambda t: F.array_contains(terms_arr, t))).alias(
            "term"
        ),
    )
    tf = hits.groupBy(id_col, "term").agg(
        F.count("*").cast("double").alias("tf"), F.first("dl").alias("dl")
    )
    df_t = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    idf = df_t.crossJoin(F.broadcast(stats)).select(
        "term",
        F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)).alias(
            "idf"
        ),
        "avgdl",
    )
    scored = tf.join(F.broadcast(idf), "term").select(
        id_col,
        (
            F.col("idf")
            * F.col("tf")
            * (k1 + 1.0)
            / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
        ).alias("part"),
    )
    return scored.groupBy(id_col).agg(F.sum("part").alias("score"))


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` documents by BM25 score (rounded to 6 decimals for a
    portable total order), ties broken by ascending id. The global sort
    is a ``TakeOrderedAndProject`` — per-partition top-k then a k-row
    driver merge, never a full-corpus ordered shuffle."""
    scored = bm25_scores(docs, terms, k1=k1, b=b, id_col=id_col, text_col=text_col)
    return (
        scored.select(id_col, F.round("score", 6).alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )
