"""Byte-exact reference FILE tunnel (`dump.data`) — S9's wire form.

Reference layout (tunnel/file_writer.go:19-21,44-51,99-123; the
scripts/filestat tool reads the same):

- file header, 32 bytes big-endian: magic ``0xeeeeeeeeee201314`` (u64),
  protocol ``1`` (u32), checksum u32 (written 0), 16 reserved bytes;
- per oplog block: cksum u32 (XOR of crc32 over the raw logs), tag u32
  (``| MsgPersistent | MsgStorageBackend``), shard u32, compressor u32,
  block magic ``0xeeeeeeee`` (u32), section length u32, then the
  section: per log a u32 size prefix + the raw bytes.

The parquet-framed tunnel in :mod:`mongoshake_spark.sources.tunnel` is
the Spark-first S9 (codec compression/checksums for free); THIS module
is for interop — files a reference ``collector`` wrote, or files its
``receiver``/``filestat`` must read back. Parsing is sequential within
a file (variable-length blocks — the same constraint file_reader.go
has) but PARALLEL across files: the Spark reader maps one task per
dump file via the binaryFile source, so a directory of per-worker
dumps scans at cluster width.
"""

from __future__ import annotations

import struct
from typing import Iterable

from pyspark.sql import DataFrame, SparkSession

# ONE checksum implementation for every wire form: the dump-file blocks
# carry the identical XOR-of-crc32 the TCP tunnel's TMessages carry
# (tunnel/tunnel.go:53-59), so the fold must never fork
from mongoshake_spark.sources.socket_tunnel import crc32_xor  # noqa: F401

FILE_MAGIC = 0xEEEEEEEEEE201314
FILE_PROTOCOL = 1
BLOCK_MAGIC = 0xEEEEEEEE
#: tunnel/tunnel.go:24-25 — the file writer ORs both into every block tag
MSG_PERSISTENT = 0x00001000
MSG_STORAGE_BACKEND = 0x00010000

_FILE_HEADER = struct.Struct(">QII16s")
_BLOCK_HEADER = struct.Struct(">IIIIII")


def write_dump_file(
    path: str,
    messages: Iterable[tuple[list[bytes], int]],
    tag: int = 0,
    compressor: int = 0,
) -> int:
    """Write a reference-readable ``dump.data``: ``messages`` yields
    ``(logs, shard)`` TMessages. ``compressor`` is the reference's
    compressor id (0 = none); per the reference module order
    (collector/write_controller.go: Compressor runs BEFORE
    ChecksumCalculator) each log is compressed first and the block
    cksum covers the COMPRESSED bytes. Returns the logs written."""
    n = 0
    with open(path, "wb") as f:
        f.write(_FILE_HEADER.pack(FILE_MAGIC, FILE_PROTOCOL, 0, b"\x00" * 16))
        for logs, shard in messages:
            if compressor:
                from mongoshake_spark.sources.socket_tunnel import (
                    _compress_one,
                )

                logs = [_compress_one(log, compressor) for log in logs]
            section = b"".join(
                struct.pack(">I", len(log)) + log for log in logs
            )
            f.write(
                _BLOCK_HEADER.pack(
                    crc32_xor(logs),
                    (tag | MSG_PERSISTENT | MSG_STORAGE_BACKEND) & 0xFFFFFFFF,
                    shard,
                    compressor,
                    BLOCK_MAGIC,
                    len(section),
                )
            )
            f.write(section)
            n += len(logs)
    return n


def parse_dump_bytes(data: bytes) -> tuple[dict, list[dict]]:
    """Parse one dump file's bytes -> (header, blocks). Each block dict
    carries shard/tag/compress/cksum/crc_ok and the raw ``logs`` list
    (decompressed when the compressor id is known). Raises ValueError on
    a wrong file or block magic — a corrupt FILE is a different failure
    class from a corrupt FRAME (checksums flag those per-block)."""
    if len(data) < _FILE_HEADER.size:
        raise ValueError("dump file shorter than its 32-byte header")
    magic, proto, _cksm, _res = _FILE_HEADER.unpack_from(data, 0)
    if magic != FILE_MAGIC:
        raise ValueError(f"bad file magic 0x{magic:x}")
    header = {"magic": magic, "protocol": proto}
    blocks = []
    off = _FILE_HEADER.size
    while off + _BLOCK_HEADER.size <= len(data):
        cksum, tag, shard, comp, bmagic, length = _BLOCK_HEADER.unpack_from(
            data, off
        )
        if bmagic != BLOCK_MAGIC:
            raise ValueError(
                f"oplog block magic is not 0x{BLOCK_MAGIC:x} at offset "
                f"{off}: 0x{bmagic:x}"
            )
        off += _BLOCK_HEADER.size
        section = data[off : off + length]
        off += length
        logs = []
        pos = 0
        while pos + 4 <= len(section):
            (size,) = struct.unpack_from(">I", section, pos)
            pos += 4
            logs.append(section[pos : pos + size])
            pos += size
        # The reference's module order is Compressor THEN
        # ChecksumCalculator (collector/write_controller.go
        # orderedModuleList), so the stored cksum covers the
        # compressed wire bytes — verify BEFORE decompressing, the
        # same order socket_tunnel's receiver uses.
        crc_ok = crc32_xor(logs) == cksum
        if comp and crc_ok:
            # only decompress verified blocks — a CRC-failed block keeps
            # its wire bytes so the caller's dead-letter policy sees the
            # block instead of a decoder crash on corrupt streams
            from mongoshake_spark.sources.socket_tunnel import _decompress_one

            logs = [_decompress_one(log, comp) for log in logs]
        blocks.append(
            {
                "shard": shard,
                "tag": tag,
                "compress": comp,
                "cksum": cksum,
                "crc_ok": crc_ok,
                "logs": logs,
            }
        )
    return header, blocks


def read_dump_files(spark: SparkSession, path: str) -> DataFrame:
    """All dump files under ``path`` as ``(shard int, crc_ok boolean,
    value binary)`` frames — one row per log, one TASK per file
    (binaryFile source; sequential within a file is the format's own
    constraint, parallelism comes from the file count). Compose with
    ``tunnel.decode_frames`` after casting value to string for JSON
    logs. CRC-failing blocks keep their rows with ``crc_ok = false`` so
    the caller owns the dead-letter policy, like decode_raw_frames.

    ``*.tmp`` staging files are skipped: a writer attempt that died
    between staging and rename (possible on object-store/FUSE mounts,
    where rename is copy+delete — see ``write_dump_files``) must not be
    read as a half-written dump."""
    from pyspark.sql import functions as F

    files = (
        spark.read.format("binaryFile")
        .load(path)
        .filter(~F.col("path").endswith(".tmp"))
        .select("content")
    )

    def explode_logs(batches):
        for pdf in batches:
            import pandas as pd

            rows = []
            for content in pdf["content"]:
                _, blocks = parse_dump_bytes(bytes(content))
                for b in blocks:
                    for log in b["logs"]:
                        rows.append((b["shard"], b["crc_ok"], log))
            yield pd.DataFrame(
                rows, columns=["shard", "crc_ok", "value"]
            ) if rows else pd.DataFrame(
                {"shard": pd.Series(dtype="int64"),
                 "crc_ok": pd.Series(dtype="bool"),
                 "value": pd.Series(dtype="object")}
            )

    return files.mapInPandas(
        explode_logs, schema="shard int, crc_ok boolean, value binary"
    )


def dump_stats(path: str) -> dict:
    """The scripts/filestat analog: header fields, total log count and
    the per-shard histogram (trailing zero shards trimmed, as the
    reference tool prints it)."""
    with open(path, "rb") as f:
        data = f.read()
    header, blocks = parse_dump_bytes(data)
    worker = [0] * 1024
    count = 0
    for b in blocks:
        worker[b["shard"] % 1024] += len(b["logs"])
        count += len(b["logs"])
    cut = 1023
    while cut >= 0 and worker[cut] == 0:
        cut -= 1
    return {
        "magic": f"{header['magic']:x}",
        "protocol": header["protocol"],
        "logs": count,
        "blocks": len(blocks),
        "worker": worker[: cut + 1],
    }


def write_dump_files(
    frames: DataFrame, directory: str, logs_per_block: int = 256
) -> int:
    """Distributed dump writer: one ``dump.data`` per partition (the
    reference runs one file tunnel per collector worker — a directory of
    per-worker dumps is its cluster shape). ``frames`` is the tunnel's
    ``(shard int, value string|binary)``; rows are grouped into
    per-shard TMessage blocks of up to ``logs_per_block`` logs (B1's
    batching), written executor-side to ``directory`` (a path every
    executor can reach — local in local mode, shared storage on a
    cluster). Returns the total log count."""
    import os

    os.makedirs(directory, exist_ok=True)

    def write_part(idx, rows):
        path = os.path.join(directory, f"part-{idx:05d}.data")
        buf: dict[int, list[bytes]] = {}

        def messages():
            for r in rows:
                shard, log = int(r[0]), r[1]
                log = log.encode() if isinstance(log, str) else bytes(log)
                buf.setdefault(shard, []).append(log)
                if len(buf[shard]) >= logs_per_block:
                    yield buf.pop(shard), shard
            for shard in sorted(buf):
                yield buf[shard], shard

        # Task retries / speculative attempts may run concurrently on
        # shared storage: stage under an attempt-unique temp name, then
        # atomically rename so the final part file is never interleaved.
        # The rename is atomic on POSIX-local filesystems only; on
        # object-store/FUSE mounts it degrades to copy+delete, and a
        # failed attempt can strand its .attempt-N.tmp — read paths
        # (read_dump_files) ignore *.tmp, so stranded stages are inert.
        from pyspark import TaskContext

        tc = TaskContext.get()
        attempt = tc.taskAttemptId() if tc is not None else 0
        tmp = f"{path}.attempt-{attempt}.tmp"
        n = write_dump_file(tmp, messages())
        os.replace(tmp, path)
        yield n

    counts = frames.select(frames.columns[0], frames.columns[1]).rdd.mapPartitionsWithIndex(
        write_part
    ).collect()
    return sum(counts)
