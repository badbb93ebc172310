"""Tunnel layer — wire encode/decode between pipeline and sinks
(S8 Kafka, S9 file, S12 receiver/replayer, M1 compression, M2 checksum).

Reference: tunnel/kafka_writer.go:116-191 encodes each oplog as raw bytes,
JSON, or canonical JSON; tunnel/file_writer.go writes length-prefixed
blocks; receiver/replayer.go:54-146 CRC-verifies, decompresses and
unmarshals on the consumer side.

Spark-first mapping: a "tunnel frame" is one serialized row; encode is
``to_json(struct(*))`` at the sink (N3: serialize once, at the edge);
decode is ``from_json`` on the consumer. Compression and checksums are the
format codec's job (parquet/Kafka both checksum and compress natively —
M1/M2 are config, not code). The Kafka sink itself needs the
spark-sql-kafka package; ``kafka_sink_options`` builds the exact writer
config so the binding is one ``.format("kafka")`` call where the package
exists — here the file tunnel exercises the same encode/decode path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

OPLOG_WIRE_SCHEMA = (
    "id bigint, ts timestamp, user_id bigint, op string, ns string, "
    "value double, o string"
)


def encode_frames(df: DataFrame, shard_cols=("ns",), n_shards: int = 8) -> DataFrame:
    """S8 producer side: key = shard route (P7: partition by shard key so
    per-key ordering survives the tunnel), value = JSON frame."""
    shard = F.pmod(F.abs(F.hash(*[F.col(c) for c in shard_cols])), F.lit(n_shards))
    return df.select(
        shard.cast("int").alias("shard"),
        F.to_json(F.struct(*df.columns)).alias("value"),
    )


def decode_frames(frames: DataFrame, schema: str | StructType = OPLOG_WIRE_SCHEMA) -> DataFrame:
    """S12 consumer side: unmarshal frames back to typed rows. Corrupt
    frames (from_json -> null struct) are routed out by the caller via
    ``col("parsed").isNull()`` — the CRC-reject path of the reference's
    replayer becomes a null check because the storage layer already
    guarantees integrity."""
    return frames.select(
        "shard", F.from_json(F.col("value"), schema).alias("parsed")
    ).select("shard", "parsed.*")


def split_corrupt_frames(
    frames: DataFrame,
    schema: str | StructType = OPLOG_WIRE_SCHEMA,
    required: str = "id",
) -> tuple[DataFrame, DataFrame]:
    """S12's reject path made explicit: returns (decoded_good, corrupt).
    ``from_json`` decodes a malformed frame to an all-NULL struct (not a
    null struct), so corruption is detected on a ``required`` field every
    valid frame must carry. Corrupt rows keep their raw ``value`` for the
    dead-letter table (W7) — without this split they would flow
    downstream as all-null rows."""
    parsed = frames.select(
        "shard", "value", F.from_json(F.col("value"), schema).alias("parsed")
    )
    ok = F.col("parsed").isNotNull() & F.col(f"parsed.{required}").isNotNull()
    good = parsed.filter(ok).select("shard", "parsed.*")
    corrupt = parsed.filter(~ok).select("shard", "value")
    return good, corrupt


def write_file_tunnel(df: DataFrame, path: str, compression: str = "snappy") -> None:
    """S9 file tunnel: framed rows in parquet with codec compression
    (M1 gzip/snappy/zlib -> parquet codec option; M2 checksum -> parquet
    page checksums)."""
    encode_frames(df).write.mode("overwrite").option(
        "compression", compression
    ).parquet(path)


def read_file_tunnel(spark, path: str, schema: str | StructType = OPLOG_WIRE_SCHEMA) -> DataFrame:
    return decode_frames(spark.read.parquet(path), schema)


def kafka_sink_options(brokers: str, topic: str) -> dict[str, str]:
    """The exact S8 binding for a cluster with the Kafka package present
    (the shard count belongs to encode_frames — topic partitioning is a
    topic property, not a producer option):

        encode_frames(df, n_shards=<topic partition count>)
          .select(col("shard").cast("string").alias("key"), "value")
          .writeStream.format("kafka").options(**kafka_sink_options(...))

    Keyed by shard so Kafka's per-partition ordering preserves the
    pipeline's per-key ordering (P7: partition = worker % partition_number,
    tunnel/tunnel.go:161-166).
    """
    return {
        "kafka.bootstrap.servers": brokers,
        "topic": topic,
        "kafka.compression.type": "snappy",
        "kafka.enable.idempotence": "true",
    }
