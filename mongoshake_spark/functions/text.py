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

WORD_RE = "[a-z0-9]+"


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


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: rolling polynomial hash (oracle-portable) plus
    md5 (both engines agree on md5 of the raw text). For pure-Spark use at
    scale, xxhash64(text) is the faster 64-bit alternative."""
    return docs.select(
        F.col("doc_id"),
        F.expr(poly_hash_spark(text_col)).alias("fp_poly"),
        F.md5(F.col(text_col)).alias("fp_md5"),
    )
