"""Registry domain: dedup (split from plans/queries.py; registration order preserved within the file)."""

from __future__ import annotations

from mongoshake_spark.plans.queries._shared import (  # noqa: F401
    F,
    MOD,
    _MINHASH_CTES,
    _dd_dot,
    _q,
    dedup,
    load_table,
    poly_hash_duckdb,
    similarity,
)



# ---------------------------------------------------------------------------
# Training-data pipeline queries — documents / embeddings tables
# ---------------------------------------------------------------------------

_POLY_TOK = poly_hash_duckdb("tok")


@_q(
    "dedup_exact",
    """SELECT md5(text) AS text_hash, count(*) AS n_docs, min(doc_id) AS keep_id
FROM documents GROUP BY 1 ORDER BY 1""",
    "Exact dedup: content-hash groupBy; keeper = min doc_id.",
)
def dedup_exact(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return dedup.exact_groups(docs).orderBy("text_hash")


@_q(
    "dedup_exact_normalized",
    """SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS text_hash,
       count(*) AS n_docs, min(doc_id) AS keep_id
FROM documents GROUP BY 1 ORDER BY 1""",
    "Exact dedup after canonicalization (lowercase + whitespace collapse) — "
    "catches trivially-reformatted duplicates that byte-exact hashing misses. "
    "All groups are emitted so the oracle value-compares every normalized "
    "hash (regex/lower/md5 parity across engines).",
)
def dedup_exact_norm(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return dedup.normalized_exact_groups(docs).orderBy("text_hash")


@_q(
    "dedup_exact_unicode",
    """WITH u AS (
  SELECT doc_id,
         replace(replace(text, 'ss', chr(223)), 'e', 'e' || chr(769)) AS t
  FROM documents),
c AS (
  SELECT doc_id,
         trim(regexp_replace(replace(lower(nfc_normalize(t)), chr(223), 'ss'),
                             '\\s+', ' ', 'g')) AS canon
  FROM u)
SELECT md5(canon) AS text_hash, count(*) AS n_docs, min(doc_id) AS keep_id
FROM c GROUP BY 1 ORDER BY 1""",
    "Unicode-robust exact dedup (the multilingual-corpus variant of "
    "dedup_exact_normalized): NFC normalization + FULL casefold "
    "(ss-sharp-s, dotted-I — strictly stronger than lower) + whitespace "
    "collapse before hashing, so composed-vs-decomposed accent "
    "spellings and non-1:1 case pairs land in one dedup group. The "
    "ASCII fixture is made to EXERCISE it: both engines first rewrite "
    "'ss' -> U+00DF and 'e' -> e+COMBINING ACUTE (decomposed), so every "
    "group key crosses a real NFC composition and a real casefold. "
    "Spark runs the genuine unicodedata path (pandas .str kernels over "
    "whole Arrow batches — the documented justified Python case, Spark "
    "has no built-in normalizer); the oracle replays it with DuckDB's "
    "nfc_normalize + lower + the sharp-s fold the fixture needs. "
    "Map-only canonicalization, only 16-byte hashes shuffle "
    "(functions/dedup.unicode_canon, unicode_exact_groups).",
)
def dedup_exact_unicode_q(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "text",
        F.replace(
            # sharp s (casefold folds it to 'ss')
            F.replace(F.col("text"), F.lit("ss"), F.lit("\u00df")),
            F.lit("e"),
            F.lit("e\u0301"),  # DECOMPOSED e-acute: NFC must compose
        ),
    )
    return dedup.unicode_exact_groups(docs).orderBy("text_hash")


_MINHASH_ORACLE = f"""WITH {_MINHASH_CTES}
SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
FROM bands x JOIN bands y
  ON x.band = y.band AND x.band_key = y.band_key AND x.doc_id < y.doc_id
ORDER BY doc_a, doc_b"""


@_q(
    "dedup_minhash",
    _MINHASH_ORACLE,
    "MinHash+LSH near-dup candidates: 3-shingles, 16 minhashes, 4 bands.",
)
def dedup_minhash(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return dedup.minhash_pairs(docs).orderBy("doc_a", "doc_b")


_CLUSTERS_ORACLE = f"""WITH RECURSIVE {_MINHASH_CTES},
pairs AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM bands x JOIN bands y
    ON x.band = y.band AND x.band_key = y.band_key AND x.doc_id < y.doc_id),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION SELECT doc_b AS src, doc_a AS dst FROM pairs),
reach(node, comp) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, r.comp FROM reach r JOIN edges e ON e.src = r.node)
SELECT node AS doc_id, min(comp) AS cluster_id
FROM reach GROUP BY node ORDER BY doc_id"""


@_q(
    "dedup_clusters",
    _CLUSTERS_ORACLE,
    "Connected components over the MinHash near-dup graph: every document "
    "labeled with its cluster (min reachable doc_id); keep-one policy = "
    "cluster_id == doc_id. Oracle = recursive-CTE transitive closure.",
)
def dedup_clusters_query(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return dedup.duplicate_clusters(docs).orderBy("doc_id")


_SIMHASH_ORACLE = f"""WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
hashed AS (SELECT doc_id, {_POLY_TOK} AS h FROM toks),
bitsums AS (
  SELECT doc_id, b, sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM hashed, (SELECT unnest(range(0, 32)) AS b) GROUP BY doc_id, b),
sims AS (
  SELECT doc_id, CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS simhash
  FROM bitsums GROUP BY doc_id)
SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
       CAST(bit_count(xor(x.simhash, y.simhash)) AS INT) AS hamming
FROM sims x JOIN sims y ON x.doc_id < y.doc_id
WHERE bit_count(xor(x.simhash, y.simhash)) <= 3
ORDER BY doc_a, doc_b"""


@_q(
    "dedup_simhash",
    _SIMHASH_ORACLE,
    "SimHash near-dups: 32-bit fingerprint, Hamming <= 3 via 4x8-bit bands.",
)
def dedup_simhash(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return dedup.simhash_pairs(docs).orderBy("doc_a", "doc_b")


# FNV-1a 64-bit over codepoints-mod-256 (functions/dedup._fnv1a64's twin).
# HUGEINT arithmetic emulates uint64 wraparound: the xor step only touches
# the low byte (c < 256), so it is expressible as integer div/mod + BIGINT
# xor; the multiply stays within HUGEINT (2^64 * 2^40 < 2^127) then wraps
# via % 2^64.
_FNV64_DD = """list_reduce(
  [CAST(14695981039350211365 AS HUGEINT)] ||
  list_transform(range(1, length({c}) + 1), i -> CAST(ascii({c}[i:i]) % 256 AS HUGEINT)),
  (acc, ch) -> (((acc // 256) * 256 + xor(CAST(acc % 256 AS BIGINT), CAST(ch AS BIGINT)))
                * 1099511628211) % 18446744073709551616)"""

_SIMHASH64_ORACLE = f"""WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
hashed AS (SELECT doc_id, {_FNV64_DD.format(c='tok')} AS h FROM toks),
hl AS (
  SELECT doc_id, CAST(h // 4294967296 AS BIGINT) AS hi, CAST(h % 4294967296 AS BIGINT) AS lo
  FROM hashed),
bitsums AS (
  SELECT doc_id, b,
         sum((CASE WHEN b < 32 THEN (lo >> b) & 1 ELSE (hi >> (b - 32)) & 1 END) * 2 - 1) AS s
  FROM hl, (SELECT unnest(range(0, 64)) AS b) GROUP BY doc_id, b),
halves AS (
  SELECT doc_id,
         sum(CASE WHEN s > 0 AND b < 32 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS lo_f,
         sum(CASE WHEN s > 0 AND b >= 32 THEN (CAST(1 AS BIGINT) << (b - 32)) ELSE 0 END) AS hi_f
  FROM bitsums GROUP BY doc_id),
sims AS (
  SELECT doc_id,
         CAST(CASE WHEN hi_f >= 2147483648
              THEN CAST(hi_f AS HUGEINT) * 4294967296 + lo_f - 18446744073709551616
              ELSE CAST(hi_f AS HUGEINT) * 4294967296 + lo_f END AS BIGINT) AS simhash
  FROM halves)
SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
       CAST(bit_count(xor(x.simhash, y.simhash)) AS INT) AS hamming
FROM sims x JOIN sims y ON x.doc_id < y.doc_id
WHERE bit_count(xor(x.simhash, y.simhash)) <= 3
ORDER BY doc_a, doc_b"""


@_q(
    "dedup_simhash64",
    _SIMHASH64_ORACLE,
    "Production SimHash: 64-bit FNV-1a fingerprint, Hamming <= 3 via 4x16-bit "
    "bands (band-key space >= 2^16) with hot-bucket re-split capability.",
)
def dedup_simhash64(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    # bucket_cap exercises the capped code path; no fixture bucket reaches
    # 10k docs, so the result stays the exact pigeonhole pair set.
    return dedup.simhash_pairs64(docs, bucket_cap=10000).orderBy("doc_a", "doc_b")


# per-doc 64-bit dHash replay from the fixture grid — shared CTE chain
# (dedup_phash here; stream_media_neardup and pipeline_media import it)
_PHASH_CTES = f"""ph AS (
  SELECT doc_id, {poly_hash_duckdb('text')} AS h FROM documents),
g AS (SELECT doc_id,
             list_transform(range(0, 72), i -> (h * (2*i + 1) + 7919*i) % 256) AS g
      FROM ph),
bits AS (SELECT doc_id, b,
                CASE WHEN g[(b // 8) * 9 + (b % 8) + 1] > g[(b // 8) * 9 + (b % 8) + 2]
                     THEN 1 ELSE 0 END AS bit
         FROM g, (SELECT unnest(range(0, 64)) AS b)),
halves AS (SELECT doc_id,
                  sum(CASE WHEN bit = 1 AND b < 32 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS lo_f,
                  sum(CASE WHEN bit = 1 AND b >= 32 THEN (CAST(1 AS BIGINT) << (b - 32)) ELSE 0 END) AS hi_f
           FROM bits GROUP BY doc_id),
phs AS (SELECT doc_id,
               CAST(CASE WHEN hi_f >= 2147483648
                    THEN CAST(hi_f AS HUGEINT) * 4294967296 + lo_f - 18446744073709551616
                    ELSE CAST(hi_f AS HUGEINT) * 4294967296 + lo_f END AS BIGINT) AS phash
        FROM halves)"""

_PHASH_ORACLE = f"""WITH {_PHASH_CTES}
SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
       CAST(bit_count(xor(x.phash, y.phash)) AS INT) AS hamming
FROM phs x JOIN phs y ON x.doc_id < y.doc_id
WHERE bit_count(xor(x.phash, y.phash)) <= 3
ORDER BY doc_a, doc_b"""


@_q(
    "dedup_phash",
    _PHASH_ORACLE,
    "Content-level multimodal near-dup: 64-bit perceptual difference hash "
    "(dHash — grayscale mean-pooled to 8x9, bit = left cell brighter than "
    "right) per media payload, pairs at Hamming <= 3 via the SAME 4x16-bit "
    "band join the text SimHash path uses (pigeonhole-exact, never "
    "all-pairs, hot-bucket re-split cap for solid-color skew). The fixture "
    "decoder expands the payload body's polynomial hash to a deterministic "
    "pseudo-brightness grid so both engines agree bit-for-bit; 'png' "
    "decodes REAL pixels stdlib-only (CI-tested), 'pil'/'wav' cover a real "
    "media cluster (operators/multimodal.phash64, phash_pairs; band "
    "machinery functions/dedup.simhash_pairs64).",
)
def dedup_phash_q(spark, sf_dir):
    from mongoshake_spark.operators import multimodal

    docs = load_table(spark, sf_dir, "documents")
    media = multimodal.attach_fake_media(docs)
    # bucket_cap exercises the capped path; fixture buckets stay under it,
    # so the pair set remains the exact pigeonhole result.
    return multimodal.phash_pairs(media, bucket_cap=10000).orderBy(
        "doc_a", "doc_b"
    )


_NGRAM_ORACLE = """WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sh AS (
  SELECT doc_id, unnest(list_distinct(
    CASE WHEN len(t) >= 3
         THEN list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
         ELSE [] END)) AS shingle
  FROM toks),
keep AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 100),
shf AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN keep USING (shingle)),
counts AS (SELECT doc_id, count(*) AS n_sh FROM shf GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
  FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT doc_a, doc_b, common, ca.n_sh AS na, cb.n_sh AS nb
FROM common
JOIN counts ca ON ca.doc_id = doc_a
JOIN counts cb ON cb.doc_id = doc_b
WHERE common * 5 >= 1 * (ca.n_sh + cb.n_sh - common)
ORDER BY doc_a, doc_b"""


@_q(
    "dedup_ngram_jaccard",
    _NGRAM_ORACLE,
    "3-shingle Jaccard >= 0.2 pairs via inverted-index join (integer math), "
    "max-DF 100 shingle cutoff bounding posting lists.",
)
def dedup_ngram(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(docs, max_df=100).orderBy("doc_a", "doc_b")


_NEARDUP_ORACLE = f"""WITH v AS (
  SELECT vec_id, embedding, sqrt({_dd_dot('embedding', 'embedding')}) AS vnorm
  FROM embeddings)
SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
       round({_dd_dot('a.embedding', 'b.embedding')} / (a.vnorm * b.vnorm), 6) AS cos_sim
FROM v a JOIN v b ON a.vec_id < b.vec_id
WHERE {_dd_dot('a.embedding', 'b.embedding')} * 20 >= 9 * (a.vnorm * b.vnorm)
ORDER BY doc_a, doc_b"""


@_q(
    "dedup_embedding",
    _NEARDUP_ORACLE,
    "Embedding near-dup pairs: cosine >= 0.45, exact all-pairs baseline. "
    "(Fixture embeddings are near-random — max pairwise cosine ~0.51 — so "
    "a production-style 0.9 threshold would make the check vacuous.)",
)
def dedup_embedding(spark, sf_dir):
    vecs = load_table(spark, sf_dir, "embeddings")
    return similarity.neardup_pairs(vecs, 9, 20).orderBy("doc_a", "doc_b")


@_q(
    "dedup_embedding_lsh",
    _NEARDUP_ORACLE,
    "Embedding near-dup via the composed 100TB path: banded "
    "random-hyperplane LSH prebucket -> within-bucket exact rescore -> "
    "cross-band dedup (similarity.neardup_pairs(prebucket='lsh')). The "
    "oracle is the BRUTE-FORCE all-pairs SQL — a hash match PINS recall "
    "== exact on this fixture. Shuffle is |corpus| x n_bands (constant "
    "replication — no tile-count term that grows with the corpus) and "
    "the quadratic work drops to per-bucket. Band geometry follows the "
    "threshold's S-curve: the fixture's far pairs (cos 0.45-0.6) need "
    "coarse buckets (3 planes x 24 bands, verified 0 misses at all "
    "three SFs); production cos>=0.9 dedup uses the 16-plane default "
    "for 65k-bucket pruning.",
)
def dedup_embedding_lsh_q(spark, sf_dir):
    vecs = load_table(spark, sf_dir, "embeddings")
    return similarity.neardup_pairs(
        vecs, 9, 20, prebucket="lsh", n_bands=24, band_planes=3
    ).orderBy("doc_a", "doc_b")


_DUPSPAN_ORACLE = """WITH sized AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
pos AS (
  SELECT doc_id, t, unnest(range(1, len(t) - 8 + 2)) AS p
  FROM sized WHERE len(t) >= 8),
sh AS (SELECT doc_id, p, md5(array_to_string(t[p:p+7], ' ')) AS h FROM pos),
dupk AS (SELECT h FROM sh GROUP BY h HAVING count(*) > 1),
dup_pos AS (SELECT doc_id, p FROM sh JOIN dupk USING (h)),
cov AS (
  SELECT doc_id, p,
         max(p + 8) OVER (PARTITION BY doc_id ORDER BY p
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
  FROM dup_pos)
SELECT doc_id, count(*) AS n_dup_positions,
       CAST(sum(p + 8 - greatest(coalesce(prev_end, p), p)) AS BIGINT) AS dup_token_cov
FROM cov GROUP BY doc_id ORDER BY doc_id"""


@_q(
    "dedup_spans",
    _DUPSPAN_ORACLE,
    "Exact substring-level duplication (Lee et al. 2021 shape): every "
    "8-token window occurring more than once corpus-wide, reported as "
    "per-document duplicated-span coverage (interval union, exact "
    "integers). Shuffles only (doc_id, pos, md5) rows on a "
    "high-cardinality hash key; the interval union windows per doc_id.",
)
def dedup_spans_q(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    # Spark positions are 0-based, the oracle's 1-based — irrelevant to the
    # outputs, which are position-origin-free counts.
    return dedup.duplicate_spans(docs, w=8).orderBy("doc_id")


_INC_MINHASH_ORACLE = f"""WITH {_MINHASH_CTES}
SELECT doc_a, doc_b, origin FROM (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b, 'corpus' AS origin
  FROM bands x JOIN bands y
    ON x.band = y.band AND x.band_key = y.band_key
  WHERE x.doc_id % 5 != 4 AND y.doc_id % 5 = 4
  UNION ALL
  SELECT DISTINCT x.doc_id, y.doc_id, 'increment'
  FROM bands x JOIN bands y
    ON x.band = y.band AND x.band_key = y.band_key AND x.doc_id < y.doc_id
  WHERE x.doc_id % 5 = 4 AND y.doc_id % 5 = 4)
ORDER BY origin, doc_a, doc_b"""


@_q(
    "dedup_incremental",
    _INC_MINHASH_ORACLE,
    "Incremental LSH dedup (the daily-crawl shape): the increment "
    "(doc_id % 5 = 4) is deduped against the corpus's stored band index "
    "and itself — broadcast increment probe, corpus never self-joins; the "
    "oracle recomputes both pair sets from the same minhash family.",
)
def dedup_incremental_q(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 5 != 4)
    inc = docs.filter(F.col("doc_id") % 5 == 4)
    corpus_bands = dedup.minhash_bands(corpus)
    return dedup.incremental_minhash_pairs(corpus_bands, inc).orderBy(
        "origin", "doc_a", "doc_b"
    )


_MINHASH_EST_ORACLE = f"""WITH {_MINHASH_CTES},
pairs AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM bands x JOIN bands y
    ON x.band = y.band AND x.band_key = y.band_key AND x.doc_id < y.doc_id),
agree AS (
  SELECT p.doc_a, p.doc_b,
         CAST(sum(CASE WHEN sa.m = sb.m THEN 1 ELSE 0 END) AS BIGINT) AS n_agree
  FROM pairs p
  JOIN sig sa ON sa.doc_id = p.doc_a
  JOIN sig sb ON sb.doc_id = p.doc_b AND sb.i = sa.i
  GROUP BY 1, 2)
SELECT doc_a, doc_b, n_agree, round(n_agree / 16.0, 4) AS est_jaccard
FROM agree ORDER BY doc_a, doc_b"""


@_q(
    "dedup_minhash_estimate",
    _MINHASH_EST_ORACLE,
    "MinHash verify stage (Broder 1997): per LSH-candidate pair, Jaccard "
    "estimated as the fraction of agreeing signature components — "
    "O(|candidates|) signature lookups instead of re-touching shingle "
    "postings; one signature pass (checkpointed) feeds both the band join "
    "and the agreement sum, computed in-row over the 16 columns.",
)
def dedup_minhash_estimate_q(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return dedup.minhash_estimate_pairs(docs).orderBy("doc_a", "doc_b")


_SEMDEDUP_ORACLE = f"""WITH v AS (
  SELECT vec_id, embedding, sqrt({_dd_dot('embedding', 'embedding')}) AS vnorm
  FROM embeddings),
c AS (SELECT vec_id AS cid, embedding AS cvec, vnorm AS cnorm FROM v WHERE vec_id % 29 = 0),
assign AS (
  SELECT vec_id, embedding, vnorm, cid AS cell FROM (
    SELECT v.vec_id, v.embedding, v.vnorm, c.cid,
           row_number() OVER (PARTITION BY v.vec_id
             ORDER BY {_dd_dot('v.embedding', 'c.cvec')} / (v.vnorm * c.cnorm) DESC, c.cid) AS rn
    FROM v CROSS JOIN c) WHERE rn = 1)
SELECT a.vec_id AS doc_a, b.vec_id AS doc_b, a.cell,
       round({_dd_dot('a.embedding', 'b.embedding')} / (a.vnorm * b.vnorm), 6) AS cos_sim
FROM assign a JOIN assign b ON a.cell = b.cell AND a.vec_id < b.vec_id
WHERE {_dd_dot('a.embedding', 'b.embedding')} * 20 >= 7 * (a.vnorm * b.vnorm)
ORDER BY doc_a, doc_b"""


@_q(
    "dedup_semantic",
    _SEMDEDUP_ORACLE,
    "SemDedup-shaped semantic dedup: nearest-centroid clustering "
    "(deterministic sampled centroids, broadcast assignment) then "
    "near-duplicate pairs WITHIN cells only — per-cell vectorized block "
    "scoring, K-fold less dot-product work than exact all-pairs. The "
    "oracle replays the identical clustering, pinning the recall "
    "trade-off.",
)
def dedup_semantic_q(spark, sf_dir):
    vecs = load_table(spark, sf_dir, "embeddings")
    return similarity.semantic_neardup(
        vecs, threshold_num=7, threshold_den=20, centroid_mod=29
    ).orderBy("doc_a", "doc_b")


# Winnowing oracle: poly-hash each k-gram (k=3, w=4), pack h*(nk+1)+(nk-j)
# so list_min picks (min hash, rightmost), decode back to the hash. The
# single-element list_transform([gram], g -> ...) binds the gram to `g` so
# texthash's poly_hash_duckdb — the single parity-critical definition —
# applies verbatim to the lambda variable.
_WINNOW_POLY_G = poly_hash_duckdb("g")

_WINNOW_ORACLE = f"""WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
hsrc AS (
  SELECT doc_id,
         CASE WHEN len(t) >= 3 THEN list_transform(range(1, len(t) - 1),
           i -> list_transform([t[i] || ' ' || t[i+1] || ' ' || t[i+2]],
                               g -> {_WINNOW_POLY_G})[1])
         ELSE [] END AS hs
  FROM toks),
win AS (
  SELECT doc_id, len(hs) AS nk,
         CASE WHEN len(hs) >= 1 THEN list_distinct(list_transform(
             range(least(4, len(hs)), len(hs) + 1),
             e -> list_min(list_transform(range(e - least(4, len(hs)) + 1, e + 1),
                   j -> hs[j] * (len(hs) + 1) + (len(hs) - j)))))
         ELSE [] END AS wins
  FROM hsrc),
fp AS (
  SELECT DISTINCT doc_id, unnest(wins) // (nk + 1) AS h FROM win)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
FROM fp a JOIN fp b ON a.h = b.h AND a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING count(*) >= 2 ORDER BY 1, 2"""


@_q(
    "dedup_winnow",
    _WINNOW_ORACLE,
    "Winnowing fingerprints (Schleimer/Wilkerson/Aiken 2003, the MOSS "
    "scheme): k-gram hashes, per-window rightmost-minimum selection — all "
    "in-row codegen'd expressions, only selected (id, hash) pairs become "
    "rows (~2/(w+1) density) — then the postings self-join for documents "
    "sharing >= 2 fingerprints.",
)
def dedup_winnow_q(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return dedup.winnow_pairs(docs, k=3, w=4, min_shared=2).orderBy(
        "doc_a", "doc_b"
    )


@_q(
    "chunk_overlap",
    """WITH s AS (SELECT doc_id, string_split(text, ' ') AS arr FROM documents),
n AS (SELECT doc_id, arr, len(arr) AS n FROM s),
c AS (SELECT doc_id, arr, n,
        CAST(unnest(range(0, 1 + CAST(greatest(0, floor((n - 64 + 47) / 48.0)) AS BIGINT))) AS INT) AS chunk_id
      FROM n)
SELECT doc_id, chunk_id, chunk_id * 48 AS chunk_start,
       least(64, n - chunk_id * 48) AS chunk_len,
       array_to_string(arr[chunk_id * 48 + 1 : chunk_id * 48 + 64], ' ') AS chunk_text
FROM c ORDER BY doc_id, chunk_id""",
    "Overlapping token-window chunking (context-window prep): 64-token "
    "windows advancing by 48 — 16 tokens of cross-window overlap. "
    "Map-ONLY: split + sequence explode + array slice in one projection, "
    "no shuffle at any corpus size (functions/curation.chunk_documents).",
)
def chunk_overlap_q(spark, sf_dir):
    from mongoshake_spark.functions.curation import chunk_documents

    docs = load_table(spark, sf_dir, "documents")
    return chunk_documents(docs, chunk_tokens=64, stride=48).orderBy(
        "doc_id", "chunk_id"
    )


@_q(
    "source_dup_stats",
    """WITH corpus AS (
  SELECT doc_id, text, source FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text, 'mirror' FROM documents WHERE doc_id % 10 = 0),
per AS (SELECT md5(text) AS h, source, count(*) AS c FROM corpus GROUP BY 1, 2),
tot AS (SELECT h, CAST(sum(c) AS BIGINT) AS n FROM per
        WHERE h IS NOT NULL GROUP BY h)
SELECT source,
       CAST(sum(c) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN n > 1 THEN c ELSE 0 END) AS BIGINT) AS n_dup_docs,
       CAST(sum(CASE WHEN n > c THEN c ELSE 0 END) AS BIGINT)
         AS n_cross_source_dup_docs
FROM per LEFT JOIN tot USING (h) GROUP BY source ORDER BY source""",
    "Per-source duplicate governance rollup (which source feeds us "
    "duplicates, and is it mirroring another?): the fixture corpus is "
    "unioned with a shifted 'mirror' source so the cross-source path "
    "really fires. Two content-hash aggregates + one hash-keyed join; "
    "per-doc rows die at the first map-side-combined aggregate "
    "(functions/dedup.source_duplicate_stats).",
)
def source_dup_stats_q(spark, sf_dir):
    from mongoshake_spark.functions.dedup import source_duplicate_stats

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.select("doc_id", "text", "source").unionByName(
        docs.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            "text",
            F.lit("mirror").alias("source"),
        )
    )
    return source_duplicate_stats(corpus).orderBy("source")


@_q(
    "dedup_containment",
    """WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 500000,
         array_to_string(string_split(text, ' ')[1:12], ' ')
  FROM documents WHERE doc_id % 5 = 0),
toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM corpus),
sh AS (
  SELECT doc_id, unnest(list_distinct(
    CASE WHEN len(t) >= 3
         THEN list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
         ELSE [] END)) AS shingle
  FROM toks),
keep AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 100),
shf AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN keep USING (shingle)),
counts AS (SELECT doc_id, count(*) AS n_sh FROM shf GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS inner_id, b.doc_id AS outer_id, count(*) AS common
  FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.doc_id != b.doc_id
  GROUP BY 1, 2)
SELECT inner_id, outer_id, common, ci.n_sh AS n_inner
FROM common JOIN counts ci ON ci.doc_id = inner_id
WHERE common * 5 >= 4 * ci.n_sh
ORDER BY inner_id, outer_id""",
    "Asymmetric containment dedup (Broder): (inner, outer) when >=80% of "
    "inner's 3-shingles appear in outer — the doc-inside-doc case "
    "(quotes, wrapped copies, re-embedded chunks) that Jaccard misses "
    "because a short doc contained in a long one has tiny Jaccard. The "
    "fixture corpus is unioned with 12-token prefixes of every 5th doc "
    "so real containments exist. Same exact inverted-index shape and "
    "max_df posting bound as ngram_jaccard "
    "(functions/dedup.ngram_containment_pairs).",
)
def dedup_containment_q(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.unionByName(
        docs.filter(F.col("doc_id") % 5 == 0).select(
            (F.col("doc_id") + 500000).alias("doc_id"),
            F.array_join(F.slice(F.split("text", " "), 1, 12), " ").alias("text"),
        )
    )
    return dedup.ngram_containment_pairs(
        corpus, num=4, den=5, max_df=100
    ).orderBy("inner_id", "outer_id")


@_q(
    "dedup_lines",
    """WITH docs AS (SELECT doc_id, replace(text, ' row ', chr(10)) AS t FROM documents),
arr AS (SELECT doc_id, string_split(t, chr(10)) AS a FROM docs),
lines0 AS (SELECT doc_id, i AS pos, trim(a[i]) AS line
           FROM arr, unnest(range(1, len(a) + 1)) AS u(i)),
lines AS (SELECT * FROM lines0 WHERE line != ''),
dfreq AS (SELECT line, count(*) AS df
          FROM (SELECT DISTINCT line, doc_id FROM lines) GROUP BY 1),
v AS (SELECT l.doc_id, l.pos, l.line, (d.df < 2) AS keep
      FROM lines l JOIN dfreq d USING (line))
SELECT doc_id,
  coalesce(string_agg(CASE WHEN keep THEN line END, chr(10) ORDER BY pos), '')
    AS clean_text,
  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
  CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_removed
FROM v GROUP BY doc_id ORDER BY doc_id""",
    "Corpus-level duplicate-LINE removal (the CCNet/RefinedWeb/Dolma "
    "boilerplate pass): any line appearing in >= 2 distinct documents is "
    "struck from every document; survivors re-join in original order "
    "(docs losing every line keep an empty clean_text). The fixture has "
    "no newlines, so line structure is synthesized identically on both "
    "engines (' row ' -> newline, literal replace). Doc frequency is a "
    "two-level agg on md5(line) (in-doc repeats count once, no "
    "count-distinct expansion); the verdict join shuffles 16-byte keys, "
    "never documents (functions/dedup.dedup_lines).",
)
def dedup_lines_q(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "text", F.regexp_replace("text", " row ", "\n")
    )
    return dedup.dedup_lines(docs, min_df=2).orderBy("doc_id")


_OVERLAP_MINS = ",\n       ".join(
    f"min(({2 * i + 1} * h + {7919 * i}) % {MOD}) AS m{i}" for i in range(16)
)
_OVERLAP_AGREE = " + ".join(
    f"CASE WHEN a.m{i} = b.m{i} THEN 1 ELSE 0 END" for i in range(16)
)

@_q(
    "corpus_overlap",
    f"""WITH toks AS (
  SELECT source AS src, unnest(string_split(text, ' ')) AS tok FROM documents),
h AS (SELECT src, {poly_hash_duckdb('tok')} AS h FROM toks),
sig AS (SELECT src, {_OVERLAP_MINS}
        FROM h GROUP BY 1),
v AS (SELECT DISTINCT src, tok FROM toks),
sz AS (SELECT src, count(*) AS n FROM v GROUP BY 1),
inter AS (SELECT a.src AS src_a, b.src AS src_b, count(*) AS n_common
          FROM v a JOIN v b ON a.tok = b.tok AND a.src < b.src GROUP BY 1, 2),
pairs AS (SELECT a.src AS src_a, b.src AS src_b, a.n AS n_a, b.n AS n_b
          FROM sz a JOIN sz b ON a.src < b.src),
est AS (SELECT a.src AS src_a, b.src AS src_b,
               ({_OVERLAP_AGREE}) / 16.0 AS minhash_est
        FROM sig a JOIN sig b ON a.src < b.src)
SELECT p.src_a, p.src_b, p.n_a, p.n_b,
       coalesce(i.n_common, 0) AS n_common,
       round(coalesce(i.n_common, 0)
             / CAST(p.n_a + p.n_b - coalesce(i.n_common, 0) AS DOUBLE), 6)
         AS exact_jaccard,
       round(e.minhash_est, 6) AS minhash_est
FROM pairs p
LEFT JOIN inter i ON i.src_a = p.src_a AND i.src_b = p.src_b
JOIN est e ON e.src_a = p.src_a AND e.src_b = p.src_b
ORDER BY p.src_a, p.src_b""",
    "Corpus-level source overlap: for every source PAIR, the exact "
    "vocabulary Jaccard and its 16-permutation MinHash sketch estimate "
    "side by side — the dataset-mixing dashboard, with the sketch as "
    "the 100TB path (per-source signatures fold in ONE map-side-"
    "combined aggregate over the token stream — min over the multiset "
    "equals min over the set, so no distinct — and persist as "
    "n_sources x 16 longs; day-over-day overlap tracking never rejoins "
    "vocabularies) and the exact join as the fixture-scale calibration "
    "baseline. Pairwise enumerations are BroadcastNestedLoop over "
    "model-sized rollups (functions/dedup.source_overlap).",
)
def corpus_overlap_q(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return dedup.source_overlap(docs).orderBy("src_a", "src_b")


_VIDEO_PHASH_ORACLE = f"""WITH ph AS (
  SELECT doc_id, {poly_hash_duckdb('text')} AS h FROM documents),
fr AS (SELECT doc_id, h, CAST(t.f AS BIGINT) AS f
       FROM ph, unnest(range(0, (doc_id % 5) + 3)) AS t(f)),
g AS (SELECT doc_id, f,
             list_transform(range(0, 72),
                            i -> (h * (2*i + 1) + 7919*i + 104729*f) % 256) AS g
      FROM fr),
bits AS (SELECT doc_id, f, b,
                CASE WHEN g[(b // 8) * 9 + (b % 8) + 1] > g[(b // 8) * 9 + (b % 8) + 2]
                     THEN 1 ELSE 0 END AS bit
         FROM g, (SELECT unnest(range(0, 64)) AS b)),
halves AS (SELECT doc_id, f,
                  sum(CASE WHEN bit = 1 AND b < 32 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS lo_f,
                  sum(CASE WHEN bit = 1 AND b >= 32 THEN (CAST(1 AS BIGINT) << (b - 32)) ELSE 0 END) AS hi_f
           FROM bits GROUP BY doc_id, f),
phs AS (SELECT doc_id, f,
               CAST(CASE WHEN hi_f >= 2147483648
                    THEN CAST(hi_f AS HUGEINT) * 4294967296 + lo_f - 18446744073709551616
                    ELSE CAST(hi_f AS HUGEINT) * 4294967296 + lo_f END AS BIGINT) AS phash
        FROM halves),
bands AS (SELECT doc_id, f, phash, CAST(t.b AS INT) AS band,
                 (phash >> (16 * CAST(t.b AS INT))) & 65535 AS bkey
          FROM phs, unnest(range(0, 4)) AS t(b)),
cand AS (SELECT DISTINCT x.doc_id AS va, x.f AS fa, x.phash AS pa,
                         y.doc_id AS vb, y.f AS fb, y.phash AS pb
         FROM bands x JOIN bands y
           ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id),
matched AS (SELECT va, vb FROM cand WHERE bit_count(xor(pa, pb)) <= 3)
SELECT va AS video_a, vb AS video_b,
       CAST(count(*) AS BIGINT) AS n_shared_frames
FROM matched GROUP BY 1, 2 HAVING count(*) >= 2
ORDER BY video_a, video_b"""


@_q(
    "dedup_video_phash",
    _VIDEO_PHASH_ORACLE,
    "Content-level VIDEO near-dup — the frame-vote composition: "
    "frame_sample_plan picks frame indexes JVM-side (skipped frames are "
    "never decoded), one vectorized pass hashes every sampled frame "
    "(per-frame dHash, frame index mixed into the fixture grid so "
    "identical payloads give identical frame SEQUENCES), the frame "
    "hashes ride the SAME 4x16-bit Hamming band join as every other "
    "64-bit fingerprint (packed frame ids; pigeonhole-exact, never "
    "all-pairs), and one aggregate counts matched frame pairs per video "
    "pair — videos sharing >= 2 near-dup frames are re-encode/re-upload "
    "candidates. The oracle replays the band join in SQL (the brute "
    "frame cross-product would be |frames|^2). Scale: |frames| x 4 band "
    "rows of shuffle, per-bucket quadratics, one count aggregate "
    "(operators/multimodal.frame_phashes, video_phash_pairs).",
)
def dedup_video_phash_q(spark, sf_dir):
    from mongoshake_spark.operators import multimodal

    docs = load_table(spark, sf_dir, "documents")
    media = multimodal.attach_fake_media(docs).withColumn(
        "n_frames", (F.col("doc_id") % 5 + 3).cast("int")
    )
    return multimodal.video_phash_pairs(
        media, "n_frames", every_k=1, min_shared=2
    ).orderBy("video_a", "video_b")
