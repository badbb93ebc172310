"""Scale-proof experiment for bpe_train's incremental pair counts.

Mirrors scripts/scale_proof.py: one measured A/B per claimed bound, one
JSON line, numbers recorded in BASELINE.md.

Claim under test: the delta-maintained form (``incremental=True``) does
AFFECTED-FRACTION work per merge step, while the recount form re-explodes
the whole vocabulary every step — so the incremental advantage must GROW
with n_merges (late merges touch a vanishing share of word types).

The fixture's ``documents`` table has a degenerate 31-word vocabulary
(any per-step constant dominates, both forms tie — measured in
BASELINE.md), so the proof corpus is the fixture's own WORD-TRIGRAM
types: every 3-word window of every document becomes one word type
(~20-30k distinct types, ~17 symbols each at sf0.1) — real fixture
content, vocabulary-shaped like real tokenizer-fit input.

Measured per form and n_merges in (16, 64):
- wall seconds;
- identical merge tables (the exactness gate);
- the per-step affected fraction (words containing the merged pair /
  vocabulary), replayed post-hoc — the direct evidence for the
  asymptotic claim.

Gates: merge tables identical at both sizes; the mean affected fraction
over the LAST 8 of 64 merges is below half the mean over the first 8
(the work per step genuinely decays); and the incremental form's
advantage (recount_wall / incremental_wall) does not SHRINK from
n_merges=16 to 64 by more than 20% (wall is host-noisy; the fraction
curve is the load-bearing evidence).

Run: ``python scripts/bpe_scale_proof.py [sf_dir]``.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mongoshake_spark.functions import bpe  # noqa: E402
from mongoshake_spark.session import get_spark  # noqa: E402
from mongoshake_spark.sources.tables import load_table  # noqa: E402


def trigram_word_table(docs, k: int = 3):
    """Word k-GRAM types of the fixture corpus as a (word, cnt, syms)
    table — the same shape bpe_word_table emits, richer vocabulary
    (k=3: ~27k types at sf0.1; k=4: ~210k — the >=1e5-type corpus the
    round-9 brief asked the strategy question at)."""
    arr = F.filter(F.split(F.col("text"), " "), lambda w: w != "")
    # n words -> n-k+1 k-grams at offsets 0..n-k (guarded: sequence(0,-j)
    # would produce a DESCENDING range and element_at(arr, 0) throws)
    tris = F.when(
        F.size(arr) >= k,
        F.transform(
            F.sequence(F.lit(0), F.size(arr) - k),
            lambda i: F.concat_ws(
                " ", *[F.element_at(arr, i + j + 1) for j in range(k)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    words = (
        docs.select(F.explode(tris).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
    syms = F.concat(F.split(F.col("word"), ""), F.array(F.lit(bpe.END_OF_WORD)))
    return words.withColumn("syms", syms).localCheckpoint(eager=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("bpe_scale_proof")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    words = trigram_word_table(docs)
    n_types = words.count()

    runs: dict = {}
    tables: dict = {}
    for n in (16, 64):
        for label, kw in (
            ("incremental", {"incremental": True, "local": False}),
            ("recount", {"incremental": False, "local": False}),
            ("local", {"local": True}),
        ):
            t0 = time.perf_counter()
            m = bpe.bpe_train(docs, n_merges=n, words=words, **kw)
            tables[(label, n)] = [tuple(r) for r in m.collect()]
            runs[f"{label}_{n}_sec"] = round(time.perf_counter() - t0, 2)

    identical = all(
        tables[("incremental", n)] == tables[("recount", n)]
        and tables[("local", n)] == tables[("recount", n)]
        for n in (16, 64)
    )

    # replay the learned merges, measuring the affected fraction AND the
    # per-step shuffle volume each form pays — the direct measurement of
    # the claim (work per step ∝ affected): the recount form explodes
    # EVERY word's adjacent pairs every step; the delta form explodes
    # 2x the AFFECTED words' pairs (old + rewritten)
    frac = []
    rows_recount = []
    rows_delta = []
    cur = words
    for stp, l, r, merged, _c in tables[("incremental", 64)]:
        has = bpe._has_adjacent_pair(F.col("syms"), F.lit(l), F.lit(r))
        sizes = cur.agg(
            F.count("*").alias("n_all"),
            F.sum(F.size("syms") - 1).alias("p_all"),
            F.sum(F.when(has, F.size("syms") - 1).otherwise(0)).alias("p_aff"),
            F.sum(F.when(has, 1).otherwise(0)).alias("n_aff"),
        ).first()
        n_aff = int(sizes["n_aff"])
        rows_recount.append(int(sizes["p_all"]))
        rows_delta.append(2 * int(sizes["p_aff"]))
        frac.append(round(n_aff / n_types, 4))
        cur = cur.withColumn(
            "syms",
            F.when(
                has, bpe.merge_rewrite(F.col("syms"), F.lit(l), F.lit(r), F.lit(merged))
            ).otherwise(F.col("syms")),
        )
        if stp % 2 == 1:
            cur = cur.localCheckpoint(eager=True)

    head = sum(frac[:8]) / 8
    tail = sum(frac[-8:]) / 8
    adv16 = runs["recount_16_sec"] / max(runs["incremental_16_sec"], 1e-9)
    adv64 = runs["recount_64_sec"] / max(runs["incremental_64_sec"], 1e-9)
    # the scale lever: shuffle rows per step, late-stage — at a
    # production vocabulary (millions of types) this volume is what a
    # step COSTS; at this fixture's 27k types both forms are
    # scheduling-constant-dominated and wall favors the simpler recount
    # (recorded honestly in BASELINE.md; the wall ADVANTAGE still moves
    # toward the delta form as merges grow, which is the trend gate)
    vol_ratio_tail = sum(rows_delta[-8:]) / max(sum(rows_recount[-8:]), 1)
    ok = (
        identical
        and tail <= 0.5 * head  # per-step work genuinely decays
        and vol_ratio_tail <= 0.5  # late steps shuffle <=half the rows
        and adv64 >= 0.8 * adv16  # the advantage holds or grows with n
        # the round-10 strategy gate: the driver-local fit (the
        # production default) beats BOTH per-merge distributed forms on
        # wall — one collect replaces 2n vocabulary jobs
        and runs["local_64_sec"] < runs["recount_64_sec"]
        and runs["local_64_sec"] < runs["incremental_64_sec"]
    )
    out = {
        "sf_dir": sf_dir,
        "n_word_types": n_types,
        **runs,
        "advantage_16": round(adv16, 2),
        "advantage_64": round(adv64, 2),
        "affected_frac_first8_mean": round(head, 4),
        "affected_frac_last8_mean": round(tail, 4),
        "affected_frac_curve_every8": [frac[i] for i in range(0, 64, 8)],
        "shuffle_rows_recount_per_step_tail8": sum(rows_recount[-8:]) // 8,
        "shuffle_rows_delta_per_step_tail8": sum(rows_delta[-8:]) // 8,
        "shuffle_volume_ratio_tail8": round(vol_ratio_tail, 4),
        "merge_tables_identical": identical,
    }
    if "large" in sys.argv:
        # the >=1e5-type corpus (word 4-grams, ~210k types at sf0.1):
        # the regime the round-9 brief asked about. Both distributed
        # forms lose here too (round-10 measurement: recount 91.6 s /
        # incremental 241.5 s for 32 merges — map-side combine already
        # collapses the recount shuffle, and both pay a full vocabulary
        # scan + job scheduling per step), so the gate is the one that
        # matters: the driver-local fit beats the best distributed form.
        big = trigram_word_table(docs, k=4)
        out["large_n_word_types"] = big.count()
        big_tables = {}
        for label, kw in (
            ("recount", {"incremental": False, "local": False}),
            ("local", {"local": True}),
        ):
            t0 = time.perf_counter()
            m = bpe.bpe_train(docs, n_merges=32, words=big, **kw)
            big_tables[label] = [tuple(r) for r in m.collect()]
            out[f"large_{label}_32_sec"] = round(time.perf_counter() - t0, 2)
        out["large_tables_identical"] = (
            big_tables["recount"] == big_tables["local"]
        )
        ok = (
            ok
            and out["large_tables_identical"]
            and out["large_n_word_types"] >= 100_000
            and out["large_local_32_sec"] < out["large_recount_32_sec"]
        )
    out["claims_hold"] = ok
    print(json.dumps(out))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
