"""Persisted-index lifecycle — generations, compaction, re-train cutover.

The streaming dedup/ANN plane persists three append-only stores: the
MinHash band index and the perceptual band index
(streaming/neardup.py), and the IVF-PQ code table
(streaming/ann_ingest.py). Append-only is what makes the ingest
restart-idempotent — a replayed micro-batch re-appends the same rows
and the probe paths absorb duplicates (pair ``distinct`` / read-time
``dropDuplicates``). The cost is that the stores grow forever: years of
ingest plus every crash-replay, with the probe-side dedup scaling with
the FULL store. This module is the maintenance plane that bounds it:

* **Generations.** A store directory holds immutable generation
  payloads ``gen-000001/``, ``gen-000002/``, … and a ``CURRENT``
  pointer file naming the active one. Readers and the ingest streams
  resolve through :func:`resolve_store`; a store with no ``CURRENT``
  is a legacy flat layout and resolves to itself, so every pre-existing
  store keeps working unchanged. Activation is a single atomic rename
  (``os.replace`` of the pointer), the same trick WAL/LSM systems use:
  a reader sees either the old generation or the new one, never a
  half-written mix.
* **Compaction** (:func:`compact_band_index`,
  :func:`compact_ann_store`) is a planned batch job: read the current
  payload, drop the replay duplicates (full-row for band indexes —
  every column is part of the band identity; by id for the code
  table), apply an optional retention predicate, write a NEW
  generation, fold in any rows a concurrent micro-batch appended while
  we compacted (one list-diff pass — the payload files are immutable
  once written, so late arrivals are exactly the new files), flip
  ``CURRENT``, then prune inactive generations. A crash at any point
  leaves either the old pointer (job simply re-runs) or the new one
  plus unpruned garbage (the next compaction's prune removes it).
* **Re-train cutover** (:func:`retrain_ann_store`): the IVF-PQ model
  is frozen per generation — vectors encoded under different centroids
  are not comparable, so drift repair can never mutate in place. The
  job trains a fresh model over a caller-supplied corpus (codes are
  not invertible; the corpus is the system of record), re-encodes that
  corpus, writes model+codes as a complete new generation and flips
  the pointer. The old generation stays by default (``prune=False``)
  as the rollback path. Ingest streams pin their model at start —
  after a cutover, restart the stream so it picks up the new
  generation (the FAISS retrain playbook).

Scale shape: compaction is one distributed dedup pass over the store
(hash-partitioned on the duplicate key — never a driver collect), the
generation payloads are immutable parquet, and the pointer flip is a
metadata operation. Probe cost after compaction drops with the data
volume removed; the read-time ``dropDuplicates`` stays (appends resume
after compaction) but now scans one row per id plus the post-compaction
tail instead of every replay ever.

Reference parity note: the reference has no analog (its checkpoints
are position markers, not content stores) — this is lifecycle plumbing
the 100 TB streaming plane needs; closest reference concept is the
checkpoint storage abstraction (checkpoint/storage.go).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

CURRENT_FILE = "CURRENT"
GEN_PREFIX = "gen-"

#: subdirectories that make up one ANN store generation (model tables
#: frozen per generation; codes append within a generation)
ANN_PARTS = ("model_centroids", "model_codebooks", "codes")


def read_current(store_dir: str) -> str | None:
    """The active generation name, or None for a legacy flat store."""
    try:
        with open(os.path.join(store_dir, CURRENT_FILE)) as fh:
            name = fh.read().strip()
    except OSError:
        return None
    if not name.startswith(GEN_PREFIX):
        raise ValueError(
            f"index store {store_dir!r}: CURRENT names {name!r}, "
            f"not a {GEN_PREFIX}* generation"
        )
    return name


def resolve_store(store_dir: str) -> str:
    """Payload directory of the active generation. Legacy stores (no
    ``CURRENT``) resolve to themselves, so callers can resolve
    unconditionally."""
    cur = read_current(store_dir)
    return store_dir if cur is None else os.path.join(store_dir, cur)


def list_generations(store_dir: str) -> list[str]:
    try:
        names = os.listdir(store_dir)
    except OSError:
        return []
    return sorted(n for n in names if n.startswith(GEN_PREFIX))


def _next_gen_name(store_dir: str) -> str:
    gens = list_generations(store_dir)
    n = 1 + max((int(g[len(GEN_PREFIX):]) for g in gens), default=0)
    return f"{GEN_PREFIX}{n:06d}"


def activate_generation(store_dir: str, gen_name: str) -> None:
    """Atomically flip ``CURRENT`` to ``gen_name`` (write-temp +
    ``os.replace`` — readers see old or new, never a torn pointer)."""
    if not os.path.isdir(os.path.join(store_dir, gen_name)):
        raise ValueError(
            f"activate_generation: {gen_name!r} does not exist under "
            f"{store_dir!r}"
        )
    tmp = os.path.join(store_dir, f".{CURRENT_FILE}.tmp")
    with open(tmp, "w") as fh:
        fh.write(gen_name + "\n")
    os.replace(tmp, os.path.join(store_dir, CURRENT_FILE))


def prune_generations(store_dir: str, keep: int = 1) -> list[str]:
    """Delete inactive generations (and, once a generation is active,
    any legacy flat payload files), keeping the active generation plus
    the ``keep - 1`` most recent others. Returns what was removed.
    Idempotent: a crash mid-prune just leaves garbage for the next
    call."""
    cur = read_current(store_dir)
    if cur is None:
        return []  # nothing generational to prune yet
    removed: list[str] = []
    gens = list_generations(store_dir)
    keep_set = {cur} | set(
        [g for g in reversed(gens) if g != cur][: max(keep - 1, 0)]
    )
    for g in gens:
        if g not in keep_set:
            shutil.rmtree(os.path.join(store_dir, g), ignore_errors=True)
            removed.append(g)
    # legacy flat payload superseded by the generation layout
    for name in os.listdir(store_dir):
        p = os.path.join(store_dir, name)
        if name.startswith(GEN_PREFIX) or name == CURRENT_FILE:
            continue
        if (
            name in ANN_PARTS
            or name.endswith((".parquet", ".crc"))
            or name.startswith(
                ("part-", "_SUCCESS", "_committed", "_started", ".part-", "._")
            )
        ):
            (shutil.rmtree if os.path.isdir(p) else os.remove)(p)
            removed.append(name)
    return removed


def index_generations(spark: SparkSession, store_dir: str) -> DataFrame:
    """The lifecycle dashboard: one row per generation (plus the legacy
    flat payload, shown as generation ``flat``) with file count and
    byte size — driver-side listing of a metadata-sized directory
    tree, never a data scan."""
    cur = read_current(store_dir)
    rows = []

    def _stat(path: str) -> tuple[int, int]:
        n_files = n_bytes = 0
        for root, _dirs, files in os.walk(path):
            for f in files:
                if f.endswith(".parquet") or f.startswith("part-"):
                    n_files += 1
                    n_bytes += os.path.getsize(os.path.join(root, f))
        return n_files, n_bytes

    for g in list_generations(store_dir):
        n_files, n_bytes = _stat(os.path.join(store_dir, g))
        rows.append((g, g == cur, n_files, n_bytes))
    flat_files, flat_bytes = 0, 0
    for name in os.listdir(store_dir) if os.path.isdir(store_dir) else []:
        p = os.path.join(store_dir, name)
        if name.startswith(GEN_PREFIX) or name == CURRENT_FILE:
            continue
        nf, nb = _stat(p) if os.path.isdir(p) else (
            (1, os.path.getsize(p)) if name.endswith(".parquet") else (0, 0)
        )
        flat_files += nf
        flat_bytes += nb
    if flat_files:
        rows.append(("flat", cur is None, flat_files, flat_bytes))
    return spark.createDataFrame(
        rows, "generation string, is_current boolean, n_files int, n_bytes bigint"
    )


def _parquet_files(path: str) -> set[str]:
    out: set[str] = set()
    for root, _dirs, files in os.walk(path):
        if any(part.startswith(GEN_PREFIX) for part in
               os.path.relpath(root, path).split(os.sep)):
            continue  # generations under a flat store are separate payloads
        for f in files:
            if f.endswith(".parquet"):
                out.add(os.path.join(root, f))
    return out


def compact_band_index(
    spark: SparkSession,
    store_dir: str,
    retention: Column | str | None = None,
    keep_generations: int = 1,
) -> dict:
    """Rewrite the band index (text MinHash or media perceptual — both
    are plain band-row tables) as a new deduplicated generation and flip
    ``CURRENT`` to it.

    Dedup is FULL-ROW (``dropDuplicates()`` with no subset): every
    column of a band row is part of its identity, and duplicates exist
    only because crash-replays re-appended whole batches. ``retention``
    (a boolean Column or SQL string, e.g. ``"doc_id >= 1000000"``)
    drops rows that aged out. Concurrent-append safety: the payload
    files are immutable once written, so anything a live micro-batch
    appended while we compacted shows up as NEW files — one list-diff
    pass folds them into the generation before the pointer flips.
    Returns ``{"generation", "rows_before", "rows_after", "removed"}``.
    """
    return _compact(
        spark, store_dir, retention, keep_generations, dedup_subset=None
    )


def compact_ann_store(
    spark: SparkSession,
    store_dir: str,
    retention: Column | str | None = None,
    id_col: str = "vec_id",
    keep_generations: int = 1,
) -> dict:
    """Rewrite the IVF-PQ store as a new generation: codes deduplicated
    by ``id_col`` (the replay unit — a vector encodes identically under
    the frozen model, so any row per id is THE row) plus optional
    retention, model tables copied verbatim (compaction never touches
    the model — that is :func:`retrain_ann_store`). The probe-side
    ``dropDuplicates`` then scans one row per id plus only the
    post-compaction append tail."""
    src = resolve_store(store_dir)
    cent_src, cb_src, codes_src = (os.path.join(src, p) for p in ANN_PARTS)
    if not os.path.isdir(cent_src):
        raise ValueError(
            f"compact_ann_store: {src!r} has no model_centroids — not an "
            "ANN store (band indexes use compact_band_index)"
        )
    gen = _next_gen_name(store_dir)
    gen_dir = os.path.join(store_dir, gen)
    cent_dst, cb_dst, codes_dst = (os.path.join(gen_dir, p) for p in ANN_PARTS)
    before = _parquet_files(codes_src)
    codes, obs_in = _observed_count(spark.read.parquet(codes_src))
    out = codes.dropDuplicates([id_col])
    if retention is not None:
        out = out.filter(retention)
    out, obs_out = _observed_count(out)
    out.write.mode("overwrite").parquet(codes_dst)
    rows_before = int(obs_in.get["n"])
    rows_after = int(obs_out.get["n"])
    # the model tables are FROZEN for the generation's lifetime (only
    # retrain_ann_store replaces them) and parquet payloads are
    # immutable once written — a byte-verbatim file copy preserves them
    # exactly, where the former read+rewrite paid two Spark jobs to
    # re-encode identical content (guide §1.2)
    shutil.copytree(cent_src, cent_dst)
    shutil.copytree(cb_src, cb_dst)
    # fold rows appended while we compacted (new files = the whole diff)
    late = _parquet_files(codes_src) - before
    if late:
        late_df, obs_late = _observed_count(spark.read.parquet(*sorted(late)))
        late_df.write.mode("append").parquet(codes_dst)
        rows_after += int(obs_late.get["n"])
    activate_generation(store_dir, gen)
    prune_generations(store_dir, keep=keep_generations)
    return {
        "generation": gen,
        "rows_before": rows_before,
        "rows_after": rows_after,
        "removed": rows_before - rows_after,
    }


def retrain_ann_store(
    spark: SparkSession,
    store_dir: str,
    corpus: DataFrame,
    m: int = 4,
    k_code: int = 8,
    iters: int = 2,
    centroid_mod: int = 29,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    prune: bool = False,
) -> dict:
    """Centroid-drift repair: train a FRESH IVF-PQ model over
    ``corpus`` (the system of record — codes are not invertible),
    re-encode that corpus, and write model+codes as a complete new
    generation; the pointer flip is the probe-side cutover. The old
    generation stays by default as the rollback path (``prune=True``
    reclaims it). Any ingest stream pinned to the old model must be
    restarted after the cutover — generations are frozen-model by
    construction, and mixing encodings in one code table would make
    ADC distances meaningless."""
    from mongoshake_spark.functions.quantization import (
        ivfpq_assign_residuals,
        pq_encode,
    )
    from mongoshake_spark.functions.similarity import with_norm
    from mongoshake_spark.streaming.ann_ingest import ann_index_bootstrap

    gen = _next_gen_name(store_dir)
    gen_dir = os.path.join(store_dir, gen)
    ann_index_bootstrap(
        corpus,
        gen_dir,
        m=m,
        k_code=k_code,
        iters=iters,
        centroid_mod=centroid_mod,
        id_col=id_col,
        vec_col=vec_col,
    )
    cents = spark.read.parquet(os.path.join(gen_dir, "model_centroids"))
    codebooks = spark.read.parquet(os.path.join(gen_dir, "model_codebooks"))
    unit = with_norm(corpus, vec_col)
    res = ivfpq_assign_residuals(unit, cents, id_col, vec_col)
    # cell rides through the map-only encode (no re-attach join)
    codes = pq_encode(res, codebooks, id_col, "res", keep_cols=("cell",))
    codes.write.mode("overwrite").parquet(os.path.join(gen_dir, "codes"))
    activate_generation(store_dir, gen)
    if prune:
        prune_generations(store_dir, keep=1)
    n = spark.read.parquet(os.path.join(gen_dir, "codes")).count()
    return {"generation": gen, "rows": n}


def _observed_count(df: DataFrame):
    """Attach a row-count Observation at this point of the plan: the
    count is collected DURING the write action instead of costing its
    own store-sized scan (the before/after stats used to be two extra
    full passes on top of the rewrite itself)."""
    from pyspark.sql import Observation

    obs = Observation()
    return df.observe(obs, F.count(F.lit(1)).alias("n")), obs


def _compact(
    spark: SparkSession,
    store_dir: str,
    retention: Column | str | None,
    keep_generations: int,
    dedup_subset: list[str] | None,
) -> dict:
    src = resolve_store(store_dir)
    before = _parquet_files(src)
    if not before:
        raise ValueError(f"compact: no parquet payload under {src!r}")
    df, obs_in = _observed_count(spark.read.parquet(src))
    out = df.dropDuplicates(dedup_subset) if dedup_subset else df.dropDuplicates()
    if retention is not None:
        out = out.filter(retention)
    out, obs_out = _observed_count(out)
    gen = _next_gen_name(store_dir)
    gen_dir = os.path.join(store_dir, gen)
    out.write.mode("overwrite").parquet(gen_dir)
    rows_before = int(obs_in.get["n"])
    rows_after = int(obs_out.get["n"])
    late = _parquet_files(src) - before
    if late:
        late_df, obs_late = _observed_count(spark.read.parquet(*sorted(late)))
        late_df.write.mode("append").parquet(gen_dir)
        rows_after += int(obs_late.get["n"])
    activate_generation(store_dir, gen)
    prune_generations(store_dir, keep=keep_generations)
    return {
        "generation": gen,
        "rows_before": rows_before,
        "rows_after": rows_after,
        "removed": rows_before - rows_after,
    }
