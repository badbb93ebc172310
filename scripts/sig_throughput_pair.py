"""Per-core throughput micro-pair for the signature kernels.

Measures the r7-era memoized per-shingle/per-token Python loops against
the vectorized forms that replaced them (compositional polynomial hash
for minhash, factorize + numpy FNV for simhash64), on two corpora:

- ``fixture``: sf0.1 documents (heavy cross-doc shingle repetition —
  the shape that flattered the memo cache);
- ``diverse``: synthetic 5000x120-token random text (the realistic
  web-crawl shape: low cross-doc repetition, where the memo cache is
  both useless and an unbounded executor-memory liability).

Asserts bit-identical outputs, prints one JSON line per pairing.
Recorded in BASELINE.md (round 8).
"""

from __future__ import annotations

import json
import random
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, ".")

from mongoshake_spark.functions.dedup import (  # noqa: E402
    MOD,
    N_MINHASH,
    SIMHASH64_BITS,
    _fnv1a64,
    _fnv1a64_numpy,
    _poly,
)
from mongoshake_spark.functions.texthash import poly_hash_numpy  # noqa: E402

COEF_A = np.array([2 * i + 1 for i in range(N_MINHASH)], dtype=np.int64)
COEF_B = np.array([7919 * i for i in range(N_MINHASH)], dtype=np.int64)


def minhash_scalar(texts):
    cache: dict[str, int] = {}
    sigs = []
    for txt in texts:
        toks = txt.split(" ") if txt else []
        if len(toks) < 3:
            continue
        hs = set()
        for i in range(len(toks) - 2):
            sh = " ".join(toks[i : i + 3])
            h = cache.get(sh)
            if h is None:
                h = _poly(sh)
                cache[sh] = h
            hs.add(h)
        hv = np.fromiter(hs, np.int64, len(hs))
        sigs.append(
            ((COEF_A[:, None] * hv[None, :] + COEF_B[:, None]) % MOD).min(axis=1)
        )
    return np.vstack(sigs)


def minhash_vec(texts):
    all_toks, nlist = [], []
    for txt in texts:
        toks = txt.split(" ") if txt else []
        if len(toks) < 3:
            continue
        all_toks.extend(toks)
        nlist.append(len(toks))
    n_arr = np.asarray(nlist, np.int64)
    codes, distinct = pd.factorize(np.asarray(all_toks, dtype=object))
    hw = poly_hash_numpy(list(distinct))
    lw = np.fromiter((len(s) for s in distinct), np.int64, len(distinct))
    h, ln = hw[codes], lw[codes]
    max_len = int(lw.max())
    pow31 = np.empty(max_len + 1, np.int64)
    pow31[0] = 1
    for k in range(1, max_len + 1):
        pow31[k] = (pow31[k - 1] * 31) % MOD
    sh = ((h[:-2] * 31 + 32) % MOD * pow31[ln[1:-1]] + h[1:-1]) % MOD
    sh = ((sh * 31 + 32) % MOD * pow31[ln[2:]] + h[2:]) % MOD
    doc_idx = np.repeat(np.arange(len(n_arr)), n_arr)
    shv = sh[doc_idx[:-2] == doc_idx[2:]]
    wins = n_arr - 2
    starts = np.zeros(len(wins), np.int64)
    np.cumsum(wins[:-1], out=starts[1:])
    out = np.empty((len(wins), N_MINHASH), np.int64)
    for i in range(N_MINHASH):
        out[:, i] = np.minimum.reduceat((COEF_A[i] * shv + COEF_B[i]) % MOD, starts)
    return out


def simhash64_scalar(texts):
    cache: dict[str, int] = {}
    out = []
    for txt in texts:
        toks = txt.split(" ") if txt else [""]
        hv = np.empty(len(toks), dtype=np.uint64)
        for j, t in enumerate(toks):
            h = cache.get(t)
            if h is None:
                h = _fnv1a64(t)
                cache[t] = h
            hv[j] = h
        bits = (
            (hv[:, None] >> np.arange(SIMHASH64_BITS, dtype=np.uint64)) & 1
        ).astype(np.int64) * 2 - 1
        sums = bits.sum(axis=0)
        u = int(sum(1 << b for b in range(SIMHASH64_BITS) if sums[b] > 0))
        out.append(u - (1 << 64) if u >= 1 << 63 else u)
    return np.asarray(out, dtype=np.int64)


def simhash64_vec(texts):
    # mirrors the shipped hybrid: vectorized hashing, per-doc bit sums
    all_toks, bounds = [], [0]
    for txt in texts:
        toks = txt.split(" ") if txt else [""]
        all_toks.extend(toks)
        bounds.append(len(all_toks))
    codes, distinct = pd.factorize(np.asarray(all_toks, dtype=object))
    h = _fnv1a64_numpy(list(distinct))[codes]
    bit_range = np.arange(SIMHASH64_BITS, dtype=np.uint64)
    out = np.empty(len(bounds) - 1, dtype=np.int64)
    for d in range(len(bounds) - 1):
        hv = h[bounds[d] : bounds[d + 1]]
        sums = (
            ((hv[:, None] >> bit_range) & np.uint64(1)).astype(np.int64) * 2 - 1
        ).sum(axis=0)
        u = ((sums > 0).astype(np.uint64) << bit_range).sum(dtype=np.uint64)
        out[d] = np.uint64(u).view(np.int64)
    return out


def pair(name, texts, scalar_fn, vec_fn, reps=3):
    t_s = min(_timed(scalar_fn, texts) for _ in range(reps))
    t_v, out_v = np.inf, None
    for _ in range(reps):
        t0 = time.perf_counter()
        out_v = vec_fn(texts)
        t_v = min(t_v, time.perf_counter() - t0)
    out_s = scalar_fn(texts)
    assert (np.asarray(out_s) == np.asarray(out_v)).all(), name
    print(
        json.dumps(
            {
                "pair": name,
                "docs": len(texts),
                "scalar_sec": round(t_s, 3),
                "vec_sec": round(t_v, 3),
                "speedup": round(t_s / t_v, 2),
                "identical": True,
            }
        )
    )


def _timed(fn, texts):
    t0 = time.perf_counter()
    fn(texts)
    return time.perf_counter() - t0


def main():
    import duckdb

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    fixture = list(
        duckdb.sql(
            f"select text from read_parquet('{sf}/documents.parquet')"
        ).df()["text"]
    )
    random.seed(42)
    vocab = [f"w{random.randrange(10**9):x}" for _ in range(400000)]
    diverse = [
        " ".join(random.choice(vocab) for _ in range(120)) for _ in range(5000)
    ]
    for name, texts in (("fixture", fixture), ("diverse", diverse)):
        pair(f"minhash/{name}", texts, minhash_scalar, minhash_vec)
        pair(f"simhash64/{name}", texts, simhash64_scalar, simhash64_vec)


if __name__ == "__main__":
    main()
