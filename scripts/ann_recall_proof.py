"""Scale-proof experiment for the ANN plane's recall/cost trade.

Mirrors scripts/scale_proof.py and scripts/dedup_scale_proof.py: one
measured A/B per claimed bound, one JSON line, numbers recorded in
BASELINE.md — so "IVF probes n_probe cells instead of the corpus" is an
audited recall-vs-scan-fraction curve, not a docstring assertion.

Claims under test:

A. ``ivf_topk(n_probe=p)`` scores only the probed cells' vectors —
   reported as the hard scan bound (the p biggest cells / corpus) — and
   its recall@k against the exact ``brute_topk`` ground truth (i) rises
   monotonically in p, (ii) BEATS the scanned fraction by >=2x (the
   index concentrates true neighbors into probed cells better than a
   random same-sized scan — the claim that makes an index worth having),
   and (iii) converges to recall 1.0 at p = #cells (exactness by
   construction). Absolute recall at small p depends on how clustered
   the data is; the fixture's near-isotropic vectors are the WORST case,
   so the 2x concentration factor here is a floor, not a ceiling.

B. ``lsh_buckets``'s candidate restriction: vectors sharing a bucket
   with the query are the only candidates, so the mean candidate
   fraction is the cost bound; recall@k is reported next to it.

Run: ``python scripts/ann_recall_proof.py [sf_dir]``.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mongoshake_spark.functions import similarity  # noqa: E402
from mongoshake_spark.session import get_spark  # noqa: E402
from mongoshake_spark.sources.tables import load_table  # noqa: E402

K = 10
N_QUERIES = 50
CENTROID_MOD = 29
PROBES = (1, 2, 4, 8)


def _clustered_vecs(spark, n: int, dim: int, n_clusters: int = 25,
                    seed: int = 20260816):
    """Deterministic mixture-of-Gaussians corpus: the clustered-data
    counterpart of the near-isotropic fixture. Centers at scale 4.0,
    within-cluster noise sigma 0.6 — well-separated, the regime real
    sentence/passage embeddings live in and where the IVF cell index's
    production recall claim is gated (section G). Seeded, so every run
    (and therefore every gate) sees the identical corpus."""
    import numpy as np

    rng = np.random.RandomState(seed)
    centers = rng.randn(n_clusters, dim) * 4.0
    pts = centers[np.arange(n) % n_clusters] + rng.randn(n, dim) * 0.6
    return spark.createDataFrame(
        [(int(i), [float(x) for x in pts[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )


def topk_sets(df) -> dict[int, frozenset]:
    rows = df.select("query_id", "neighbor_id").collect()
    out: dict[int, set] = {}
    for r in rows:
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return {q: frozenset(s) for q, s in out.items()}


def recall(approx: dict[int, frozenset], exact: dict[int, frozenset]) -> float:
    hit = sum(len(approx.get(q, frozenset()) & s) for q, s in exact.items())
    total = sum(len(s) for s in exact.values())
    return round(hit / total, 4) if total else 1.0


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("ann_recall_proof")
    vecs = load_table(spark, sf_dir, "embeddings").localCheckpoint(eager=True)
    n_corpus = vecs.count()
    query_ids = [r["vec_id"] for r in vecs.select("vec_id").orderBy("vec_id").limit(N_QUERIES).collect()]

    t0 = time.perf_counter()
    exact = topk_sets(similarity.brute_topk(vecs, query_ids, k=K))
    t_brute = round(time.perf_counter() - t0, 2)

    # cell census: how many corpus vectors live in each IVF cell (same
    # deterministic centroid sample ivf_topk uses)
    centroids = vecs.filter((F.col("vec_id") % CENTROID_MOD) == 0).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )
    assigned = similarity.ivf_assign(vecs, centroids)
    cell_sizes = {
        r["cell"]: r["n"]
        for r in assigned.groupBy("cell").agg(F.count("*").alias("n")).collect()
    }
    n_cells = len(cell_sizes)

    ivf_curve = []
    for p in PROBES:
        t0 = time.perf_counter()
        approx = topk_sets(
            similarity.ivf_topk(
                vecs, query_ids, k=K, n_probe=p, centroid_mod=CENTROID_MOD
            )
        )
        sec = round(time.perf_counter() - t0, 2)
        # probed-cell fraction: which cells each query probes is internal,
        # but it is bounded above by p/n_cells of the corpus on average
        # for balanced cells; report the hard upper bound from the census
        biggest = sorted(cell_sizes.values(), reverse=True)[:p]
        ivf_curve.append(
            {
                "n_probe": p,
                "recall_at_k": recall(approx, exact),
                "scan_bound_frac": round(sum(biggest) / n_corpus, 4),
                "sec": sec,
            }
        )

    # C. trained coarse quantizer: k-means centroids (k = the sampled
    # cell count, so the curves are probe-for-probe comparable) should
    # concentrate neighbors at least as well as the id-sample
    from mongoshake_spark.functions.clustering import kmeans_fit

    _, km_cents = kmeans_fit(vecs, k=n_cells, iters=2)
    km_cents = km_cents.localCheckpoint(eager=True)
    km_curve = []
    for p in PROBES:
        t0 = time.perf_counter()
        approx = topk_sets(
            similarity.ivf_topk(vecs, query_ids, k=K, n_probe=p, centroids=km_cents)
        )
        km_curve.append(
            {
                "n_probe": p,
                "recall_at_k": recall(approx, exact),
                "sec": round(time.perf_counter() - t0, 2),
            }
        )

    # D. product quantization: recall-vs-brute at increasing codebook
    # resolution (m=4 subspaces; k_code doubles per point). The cost
    # column is the COMPRESSION of the scored representation — m codes
    # per vector vs the full float vector — which is the 100TB lever
    # (the scoring pass reads 4 small ints + broadcast tables instead of
    # 64 doubles per corpus vector).
    from mongoshake_spark.functions import quantization as pq_mod

    dim = len(vecs.select("embedding").first()["embedding"])
    pq_curve = []
    for m_sub, k_code in ((4, 4), (4, 8), (4, 16), (8, 16), (16, 16)):
        t0 = time.perf_counter()
        approx = topk_sets(
            pq_mod.pq_topk(
                vecs, query_ids, k=K, m=m_sub, k_code=k_code, iters=2
            )
        )
        pq_curve.append(
            {
                "m": m_sub,
                "k_code": k_code,
                "recall_at_k": recall(approx, exact),
                "code_bytes_per_vec": m_sub,
                "compression_x": round(dim * 8 / m_sub, 1),
                "sec": round(time.perf_counter() - t0, 2),
            }
        )

    # E. two-stage PQ: ADC shortlist of C candidates, exact cosine
    # re-rank — the production finisher. Recall@k must rise in C and
    # reach >= 0.9 by C = 10k (GATED: this is the claim that makes the
    # compressed store usable for retrieval, not just storage). The
    # quantizer under the shortlist is m=16, k=32 (16-byte codes, 32x
    # store compression): re-rank recall IS the shortlist hit rate, and
    # on the fixture's worst-case isotropic vectors a 4-byte code's
    # shortlist caps out near 0.35 at C=100 — the production trade is
    # exactly this: spend bytes/vector until the shortlist captures the
    # true neighbors, let the exact re-rank fix the ordering. One
    # codebook is trained once and shared across the C sweep.
    cb = pq_mod.pq_train(vecs, m=16, k=32, iters=2)
    rr_curve = []
    for c_short in (K, 2 * K, 5 * K, 10 * K):
        t0 = time.perf_counter()
        approx = topk_sets(
            pq_mod.pq_topk(
                vecs, query_ids, k=K, codebooks=cb, rerank=c_short
            )
        )
        rr_curve.append(
            {
                "C": c_short,
                "recall_at_k": recall(approx, exact),
                "sec": round(time.perf_counter() - t0, 2),
            }
        )

    # E2. SQ8 scalar quantization: 8x compression must be near-lossless
    # for retrieval (GATED >= 0.9 recall@k) — per-dim int8 keeps ~8 bits
    # of signal per axis, the opposite end of the store/recall frontier
    # from PQ's 32-128x.
    t0 = time.perf_counter()
    sq8 = {
        "recall_at_k": recall(
            topk_sets(pq_mod.sq8_topk(vecs, query_ids, k=K)), exact
        ),
        "compression_x": 8.0,
        "sec": round(time.perf_counter() - t0, 2),
    }

    # F. IVF-PQ (IVFADC): cells + residual codes + probe-restricted ADC.
    # Reported, not gated: absolute recall stacks two approximations on
    # the worst-case isotropic fixture, and — unlike IVF-flat, whose
    # candidate scores are EXACT so widening probes only ever adds true
    # hits — the ADC-scored candidates from an extra probed cell can
    # out-rank true neighbors, so strict monotonicity in n_probe does
    # not hold for double quantization (observed: 0.072/0.068/0.076 at
    # p=1/2/4 after the cross-term fix).
    ivfpq_curve = []
    for p in (1, 2, 4):
        t0 = time.perf_counter()
        approx = topk_sets(
            pq_mod.ivfpq_topk(
                vecs, query_ids, k=K, n_probe=p, m=4, k_code=8, iters=2,
                centroid_mod=CENTROID_MOD,
            )
        )
        ivfpq_curve.append(
            {
                "n_probe": p,
                "recall_at_k": recall(approx, exact),
                "sec": round(time.perf_counter() - t0, 2),
            }
        )

    # F2. IVF-PQ + exact re-rank (the full production composition). The
    # gateable claim is STRUCTURAL: a true top-k neighbor inside the
    # shortlist always survives the exact re-rank (only k-1 vectors can
    # beat it globally, so it is within the exact top-k of ANY subset
    # containing it) — hence rerank recall >= plain IVFADC recall at the
    # same n_probe, and is monotone in C.
    ivfpq_rr_curve = []
    for c_short in (25, 100):
        t0 = time.perf_counter()
        approx = topk_sets(
            pq_mod.ivfpq_topk(
                vecs, query_ids, k=K, n_probe=2, m=4, k_code=8, iters=2,
                centroid_mod=CENTROID_MOD, rerank=c_short,
            )
        )
        ivfpq_rr_curve.append(
            {
                "n_probe": 2,
                "rerank": c_short,
                "recall_at_k": recall(approx, exact),
                "sec": round(time.perf_counter() - t0, 2),
            }
        )

    # G. clustered-corpus gates: every curve above runs on the fixture's
    # near-isotropic vectors — the WORST case for a cell index, where
    # IVF-PQ recall is honestly reported but not gateable. The
    # production claim ("IVF-PQ + re-rank is the 100 TB retrieval path")
    # lives on CLUSTERED real embeddings, so it is gated on a
    # deterministic mixture-of-Gaussians corpus (same size/dim as the
    # fixture, fixture-derived seed): 25 well-separated clusters,
    # within-cluster noise sigma=0.6 against center scale 4.0.
    cvecs = _clustered_vecs(spark, n=n_corpus, dim=dim).localCheckpoint(
        eager=True
    )
    c_exact = topk_sets(similarity.brute_topk(cvecs, query_ids, k=K))
    c_ivfpq_curve = []
    for p in (1, 2, 4):
        t0 = time.perf_counter()
        approx = topk_sets(
            pq_mod.ivfpq_topk(
                cvecs, query_ids, k=K, n_probe=p, m=4, k_code=8, iters=2,
                centroid_mod=CENTROID_MOD,
            )
        )
        c_ivfpq_curve.append(
            {
                "n_probe": p,
                "recall_at_k": recall(approx, c_exact),
                "sec": round(time.perf_counter() - t0, 2),
            }
        )
    c_rr_curve = []
    for p, c_short in ((2, 100), (4, 100)):
        t0 = time.perf_counter()
        approx = topk_sets(
            pq_mod.ivfpq_topk(
                cvecs, query_ids, k=K, n_probe=p, m=4, k_code=8, iters=2,
                centroid_mod=CENTROID_MOD, rerank=c_short,
            )
        )
        c_rr_curve.append(
            {
                "n_probe": p,
                "rerank": c_short,
                "recall_at_k": recall(approx, c_exact),
                "sec": round(time.perf_counter() - t0, 2),
            }
        )

    buckets = similarity.lsh_buckets(vecs)
    bucket_sizes = [
        r["n"] for r in buckets.groupBy("bucket").agg(F.count("*").alias("n")).collect()
    ]
    # candidate fraction for a bucket-restricted query = its bucket's size
    # over the corpus; the mean over vectors is sum(n^2)/(N^2)
    lsh_cand_frac = round(sum(n * n for n in bucket_sizes) / (n_corpus**2), 4)

    # H. banded-LSH neardup prebucket (similarity.neardup_pairs(
    # prebucket='lsh'), production default geometry: 16 planes x 8
    # bands) at the production threshold cos >= 0.9, on the clustered
    # corpus PLUS planted near-dup copies (every 10th vector re-noised
    # at sigma 0.02 -> cos ~0.999 against its original — the
    # re-encode/re-crawl class the operator exists to catch).
    # Deterministic corpus + deterministic SplitMix64 planes => the
    # gates below are stable facts, not flaky samples. Reported:
    # overall pair recall vs the exact tiled join, PLANTED-pair recall
    # (the production claim), and the cross-band candidate fraction
    # (sum over (band, bucket) of C(sz,2) / C(N,2) — the cost bound
    # the prebucket buys vs the all-pairs tile join).
    import numpy as np

    rng_h = np.random.RandomState(20260816)
    n_cl = 25
    centers_h = rng_h.randn(n_cl, dim) * 4.0
    pts_h = centers_h[np.arange(n_corpus) % n_cl] + rng_h.randn(n_corpus, dim) * 0.6
    dup_idx = np.arange(0, n_corpus, 10)
    dups_h = pts_h[dup_idx] + np.random.RandomState(7).randn(
        len(dup_idx), dim
    ) * 0.02
    all_h = np.vstack([pts_h, dups_h])
    ids_h = list(range(n_corpus)) + [1_000_000 + int(i) for i in dup_idx]
    ndvecs = spark.createDataFrame(
        [(int(ids_h[i]), [float(x) for x in all_h[i]]) for i in range(len(ids_h))],
        "vec_id long, embedding array<double>",
    ).localCheckpoint(eager=True)
    t0 = time.perf_counter()
    nd_exact = {
        (r["doc_a"], r["doc_b"])
        for r in similarity.neardup_pairs(ndvecs, 9, 10).collect()
    }
    t_nd_exact = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    nd_lsh = {
        (r["doc_a"], r["doc_b"])
        for r in similarity.neardup_pairs(ndvecs, 9, 10, prebucket="lsh").collect()
    }
    t_nd_lsh = round(time.perf_counter() - t0, 2)
    planted = {(int(i), 1_000_000 + int(i)) for i in dup_idx}
    assert planted <= nd_exact, "planted near-dups must qualify exactly"
    nd_planes = similarity._band_planes(8, 16, dim)
    w16 = np.int64(1) << np.arange(16, dtype=np.int64)
    signs_h = (all_h @ nd_planes.T) > 0
    n_h = len(all_h)
    cand = 0.0
    for b in range(8):
        bkts = (signs_h[:, b * 16 : (b + 1) * 16] * w16).sum(axis=1)
        _, cnts = np.unique(bkts, return_counts=True)
        cand += float((cnts * (cnts - 1) / 2).sum())
    neardup_lsh = {
        "n_vectors": n_h,
        "n_exact_pairs": len(nd_exact),
        "pair_recall": round(len(nd_lsh & nd_exact) / len(nd_exact), 4),
        "planted_recall": round(
            len(nd_lsh & planted) / len(planted), 4
        ),
        "candidate_frac": round(cand / (n_h * (n_h - 1) / 2), 4),
        "exact_sec": t_nd_exact,
        "lsh_sec": t_nd_lsh,
    }

    out = {
        "sf_dir": sf_dir,
        "n_corpus": n_corpus,
        "k": K,
        "n_queries": len(query_ids),
        "n_cells": n_cells,
        "brute_sec": t_brute,
        "ivf": ivf_curve,
        "ivf_kmeans": km_curve,
        "pq_adc": pq_curve,
        "pq_rerank": rr_curve,
        "sq8": sq8,
        "ivfpq": ivfpq_curve,
        "ivfpq_rerank": ivfpq_rr_curve,
        "clustered_ivfpq": c_ivfpq_curve,
        "clustered_ivfpq_rerank": c_rr_curve,
        "lsh_mean_candidate_frac": lsh_cand_frac,
        "lsh_n_buckets": len(bucket_sizes),
        "neardup_lsh_prebucket": neardup_lsh,
    }
    # convergence: probing every cell IS the exact scan
    t0 = time.perf_counter()
    full = topk_sets(
        similarity.ivf_topk(
            vecs, query_ids, k=K, n_probe=n_cells, centroid_mod=CENTROID_MOD
        )
    )
    out["full_probe"] = {
        "n_probe": n_cells,
        "recall_at_k": recall(full, exact),
        "sec": round(time.perf_counter() - t0, 2),
    }
    recalls = [c["recall_at_k"] for c in ivf_curve]
    km_recalls = [c["recall_at_k"] for c in km_curve]
    # reported, not gated: on the fixture's near-isotropic vectors a
    # trained quantizer's edge over the id-sample is small by nature
    out["kmeans_vs_sample_gain"] = round(
        sum(km_recalls) / len(km_recalls) - sum(recalls) / len(recalls), 4
    )
    pq_recalls = [c["recall_at_k"] for c in pq_curve]
    ok = (
        all(a <= b + 1e-9 for a, b in zip(recalls, recalls[1:]))  # monotone
        and all(
            c["recall_at_k"] >= 2.0 * c["scan_bound_frac"] for c in ivf_curve
        )  # concentration: beats a random same-sized scan >=2x
        and out["full_probe"]["recall_at_k"] == 1.0  # exact at p = #cells
        and all(a <= b + 1e-9 for a, b in zip(km_recalls, km_recalls[1:]))
        # PQ: recall rises monotonically along the resolution sweep
        # (k_code, then m) — the quantizer trades compression for recall,
        # never noise (absolute recall on the fixture's near-isotropic
        # vectors is the worst case; clustered real embeddings do far
        # better at the same code budget)
        and all(a <= b + 1e-9 for a, b in zip(pq_recalls, pq_recalls[1:]))
        # two-stage re-rank: monotone in C, and >= 0.9 recall by C = 10k
        # (the exact re-score can only fix ADC ordering errors INSIDE
        # the shortlist, so recall == shortlist hit rate — which is what
        # widening C buys)
        and all(
            a["recall_at_k"] <= b["recall_at_k"] + 1e-9
            for a, b in zip(rr_curve, rr_curve[1:])
        )
        and rr_curve[-1]["recall_at_k"] >= 0.9
        and sq8["recall_at_k"] >= 0.9  # int8 is near-lossless
        # (ivfpq_curve is reported, not gated — see section F)
        # IVFADC + re-rank: monotone in C, and never below the plain
        # IVFADC recall at the same n_probe (structural — see F2)
        and all(
            a["recall_at_k"] <= b["recall_at_k"] + 1e-9
            for a, b in zip(ivfpq_rr_curve, ivfpq_rr_curve[1:])
        )
        # baseline looked up by its n_probe field (the re-rank curve runs
        # at n_probe=2), not by position — reordering the probe tuples
        # above must not silently compare mismatched probe settings
        and ivfpq_rr_curve[0]["recall_at_k"]
        >= next(
            e for e in ivfpq_curve if e["n_probe"] == ivfpq_rr_curve[0]["n_probe"]
        )["recall_at_k"]
        - 1e-9
        # G gates — the production claims, on the clustered corpus where
        # they live (all inputs deterministic, so these are stable):
        # IVF-PQ + exact re-rank reaches >= 0.9 recall at n_probe=4,
        # C=100 with 64x-compressed codes (measured 1.0 on the
        # mixture-of-Gaussians fixture), and plain IVFADC at every
        # probed setting does at least as well clustered as isotropic
        # (the structural "cells concentrate real neighbors" claim)
        and next(
            e for e in c_rr_curve if e["n_probe"] == 4
        )["recall_at_k"] >= 0.9
        and all(
            c["recall_at_k"]
            >= next(
                e for e in ivfpq_curve if e["n_probe"] == c["n_probe"]
            )["recall_at_k"]
            - 1e-9
            for c in c_ivfpq_curve
        )
        # H gates: the banded prebucket must catch every planted
        # near-identical pair (the production near-dup class), keep
        # >= 0.95 of ALL qualifying pairs on the clustered corpus, and
        # restrict candidates to <= 15% of all pairs (measured 0.9569 /
        # 1.0 / 0.108 at n=2200 — deterministic, so these are facts)
        and neardup_lsh["planted_recall"] >= 0.99
        and neardup_lsh["pair_recall"] >= 0.95
        and neardup_lsh["candidate_frac"] <= 0.15
    )
    out["claims_hold"] = ok
    print(json.dumps(out))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
