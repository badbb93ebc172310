"""Synthesize a larger scale factor from sf0.1 by key-shifted replication.

Round-13 scaling-evidence tooling (VERDICT item 2): the shipped fixtures
stop at sf0.1, where every per-query serial span sits below the
parallelism floor (8 cores beat 32 outright), so the scaling block of
the bench demonstrates nothing. This script builds an sf1-shaped
directory — documents and embeddings replicated REPLICAS x with ids
shifted by ID_STRIDE per replica, every other table copied verbatim —
so the heavy non-stream queries can be timed at 8 vs 32 cores with
enough work per task for parallelism to show.

Replication semantics (documented, deliberate):
- ids shift by 10_000_000 per replica — far above every in-query id
  offset (dedup_containment +500_000, source_dup_stats +1_000_000) and
  far below the doc_id << 12 packing overflow bound;
- text/embedding PAYLOADS are copied verbatim, so replicas are exact
  duplicates of each other. That is the realistic shape for a dedup
  workload (web corpora are full of exact dups) and it keeps per-replica
  workload character identical; posting lists and band buckets grow
  10x, pair outputs grow accordingly — which is the load we WANT the
  8-vs-32-core comparison to chew on.
- This directory is for the committed BENCH_SCALING artifact only. It is
  NOT an oracle fixture: nothing here feeds CORRECTNESS runs, and
  bench.py keeps reading $SPARK_GRAFT_SF_DIR as before.

Usage: python scripts/gen_scale_sf.py [SRC] [DST] [REPLICAS]
Defaults: /root/testdata/sf0.1 /root/sfscale/sf1 10
"""

from __future__ import annotations

import os
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

ID_STRIDE = 10_000_000
REPLICATED = {"documents": "doc_id", "embeddings": "vec_id"}


def replicate(src: str, dst: str, id_col: str, replicas: int) -> int:
    t = pq.read_table(src)
    ids = t.column(id_col)
    parts = []
    for r in range(replicas):
        shifted = pa.compute.add(ids, r * ID_STRIDE)
        parts.append(t.set_column(t.schema.get_field_index(id_col), id_col, shifted))
    out = pa.concat_tables(parts)
    # several row groups so a fresh scan has splits to parallelize over
    pq.write_table(out, dst, row_group_size=max(1, out.num_rows // 32))
    return out.num_rows


def main() -> None:
    src_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/sfscale/sf1"
    replicas = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst_dir, exist_ok=True)
    for fn in sorted(os.listdir(src_dir)):
        if not fn.endswith(".parquet"):
            continue
        name = fn[: -len(".parquet")]
        src, dst = os.path.join(src_dir, fn), os.path.join(dst_dir, fn)
        if name in REPLICATED:
            n = replicate(src, dst, REPLICATED[name], replicas)
            print(f"{name}: replicated x{replicas} -> {n} rows")
        else:
            shutil.copyfile(src, dst)
            print(f"{name}: copied verbatim")


if __name__ == "__main__":
    main()
