"""Scale-proof experiment for the dedup plane's quadratic-term bounds.

Mirrors scripts/scale_proof.py (the apply-kernel I/O proof): one measured
A/B per claimed bound, printed as a single JSON line and recorded in
BASELINE.md, so the "100 TB OK" grades on ngram_jaccard and simhash64 are
auditable numbers, not docstring assertions.

Claims under test:

A. ``ngram_jaccard_pairs(max_df=...)`` bounds the inverted-index join's
   quadratic term. The join cost is sum over shingles of C(df,2) candidate
   pairs; boilerplate shingles (df in the thousands) dominate it while
   carrying no dedup signal. With a skewed fixture (sf0.1 documents plus
   BOILER_DOCS sharing one template), the proof measures the candidate-
   pair sum and max posting length with max_df=None vs max_df=MAX_DF.

B. ``simhash_pairs64(bucket_cap=...)`` re-splits hot band buckets. The
   band join's cost is sum over (k, band_val) buckets of C(n,2); a
   boilerplate cluster lands its docs in the same 4 buckets. The proof
   measures bucket-census candidates with cap=None vs cap=BUCKET_CAP,
   asserts the re-split ENGAGED (over-cap census non-empty), and asserts
   zero recall loss on true duplicates (identical fingerprints stay
   together under any re-split — the docstring's safety argument).

The fixture skew is deliberately pathological: every boilerplate doc is
the SAME template plus a one-token suffix, the worst case both operators
document. Run: ``python scripts/dedup_scale_proof.py [sf_dir]``.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mongoshake_spark.functions import dedup  # noqa: E402
from mongoshake_spark.session import get_spark  # noqa: E402
from mongoshake_spark.sources.tables import load_table  # noqa: E402

BOILER_DOCS = 2000
MAX_DF = 100
BUCKET_CAP = 64

TEMPLATE = (
    "terms of service copyright notice all rights reserved contact us "
    "privacy policy cookie settings subscribe newsletter follow social"
)


def skewed_corpus(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base_max = docs.agg(F.max("doc_id")).first()[0]
    boiler = (
        spark.range(BOILER_DOCS)
        .select(
            (F.col("id") + base_max + 1).alias("doc_id"),
            F.concat(
                F.lit(TEMPLATE + " variant token "),
                F.col("id").cast("string"),
            ).alias("text"),
        )
    )
    return docs.unionByName(boiler)


def posting_stats(sh):
    """(sum of C(df,2) candidate pairs, max posting length, n shingles)."""
    df_counts = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    row = df_counts.agg(
        F.sum(F.expr("df * (df - 1) / 2")).alias("cand"),
        F.max("df").alias("max_df"),
        F.count("*").alias("n_shingles"),
    ).first()
    return int(row["cand"]), int(row["max_df"]), int(row["n_shingles"])


def experiment_a(spark, corpus) -> dict:
    sh_raw = dedup.shingle_rows(corpus, "text").localCheckpoint(eager=True)
    cand_raw, maxdf_raw, _ = posting_stats(sh_raw)
    df_counts = sh_raw.groupBy("shingle").agg(F.count("*").alias("df"))
    sh_cap = sh_raw.join(
        df_counts.filter(F.col("df") <= MAX_DF).select("shingle"), "shingle"
    )
    cand_cap, maxdf_cap, _ = posting_stats(sh_cap)

    t0 = time.perf_counter()
    n_uncapped = dedup.ngram_jaccard_pairs(corpus, max_df=None).count()
    t_uncapped = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    n_capped = dedup.ngram_jaccard_pairs(corpus, max_df=MAX_DF).count()
    t_capped = round(time.perf_counter() - t0, 2)
    return {
        "candidate_pairs_uncapped": cand_raw,
        "candidate_pairs_max_df": cand_cap,
        "max_posting_uncapped": maxdf_raw,
        "max_posting_max_df": maxdf_cap,
        "pairs_uncapped": n_uncapped,
        "pairs_max_df": n_capped,
        "sec_uncapped": t_uncapped,
        "sec_max_df": t_capped,
    }


def bucket_candidates(keyed) -> int:
    cols = ["k", "band_val"] + (["sub"] if "sub" in keyed.columns else [])
    row = (
        keyed.groupBy(*cols)
        .agg(F.count("*").alias("n"))
        .agg(F.sum(F.expr("n * (n - 1) / 2")).alias("cand"))
        .first()
    )
    return int(row["cand"])


def experiment_b(spark, corpus) -> dict:
    sims = dedup.simhash_values64(corpus, "text").localCheckpoint(eager=True)
    keyed = dedup.simhash_band_keys(sims)
    cand_uncapped = bucket_candidates(keyed)
    census = keyed.groupBy("k", "band_val").agg(F.count("*").alias("n"))
    over = census.filter(F.col("n") > BUCKET_CAP).count()
    max_bucket = census.agg(F.max("n")).first()[0]

    t0 = time.perf_counter()
    pairs_exact = dedup.simhash_pairs64(corpus, sims=sims, bucket_cap=None)
    n_exact = pairs_exact.count()
    t_exact = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    pairs_capped = dedup.simhash_pairs64(corpus, sims=sims, bucket_cap=BUCKET_CAP)
    n_capped = pairs_capped.count()
    t_capped = round(time.perf_counter() - t0, 2)

    # identical-fingerprint pairs are TRUE dups; the re-split must keep
    # every one (docs with equal fingerprints share every borrowed bit)
    ident = (
        sims.groupBy("simhash")
        .agg(F.count("*").alias("n"))
        .agg(F.sum(F.expr("n * (n - 1) / 2")).alias("p"))
        .first()["p"]
    )
    ident = int(ident or 0)
    kept_ident = (
        pairs_capped.filter(F.col("hamming") == 0).count()
    )
    return {
        "over_cap_buckets": over,
        "max_bucket": int(max_bucket),
        "bucket_candidates_uncapped": cand_uncapped,
        "pairs_exact": n_exact,
        "pairs_capped": n_capped,
        "sec_exact": t_exact,
        "sec_capped": t_capped,
        "identical_fp_pairs": ident,
        "identical_fp_pairs_kept": kept_ident,
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("dedup_scale_proof")
    corpus = skewed_corpus(spark, sf_dir).localCheckpoint(eager=True)
    out = {
        "sf_dir": sf_dir,
        "n_docs": corpus.count(),
        "boiler_docs": BOILER_DOCS,
        "max_df": MAX_DF,
        "bucket_cap": BUCKET_CAP,
        "ngram_jaccard": experiment_a(spark, corpus),
        "simhash64": experiment_b(spark, corpus),
    }
    b = out["simhash64"]
    ok = (
        b["over_cap_buckets"] > 0
        and b["identical_fp_pairs_kept"] >= b["identical_fp_pairs"]
        and out["ngram_jaccard"]["candidate_pairs_max_df"]
        < out["ngram_jaccard"]["candidate_pairs_uncapped"]
    )
    out["claims_hold"] = ok
    print(json.dumps(out))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
