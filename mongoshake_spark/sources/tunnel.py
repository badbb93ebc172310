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
from pyspark.sql import types as T
from pyspark.sql.types import StructType

OPLOG_WIRE_SCHEMA = (
    "id bigint, ts timestamp, user_id bigint, op string, ns string, "
    "value double, o string"
)

#: tunnel/tunnel.go:24 — kafka/file writers OR this into every message tag.
MSG_PERSISTENT = 0x00001000


def encode_frames(
    df: DataFrame,
    shard_cols=("ns",),
    n_shards: int = 8,
    message: str = "json",
) -> DataFrame:
    """S8 producer side: key = shard route (P7: partition by shard key so
    per-key ordering survives the tunnel), value = one encoded frame.

    ``message`` mirrors the reference's ``tunnel.message`` option
    (tunnel/kafka_writer.go:119-191):

    - ``json`` — plain JSON of the row (Go ``json.Marshal``);
    - ``canonical_extended_json`` — MongoDB Extended JSON v2 canonical
      (Go ``bson.MarshalExtJSON(log, true, true)``): every typed field
      wrapped (``{"$numberLong": "..."}``, ``{"$date": {"$numberLong":
      "<ms>"}}``, ...);
    - ``raw`` — the TMessage byte block (tunnel/tunnel.go:61-72):
      big-endian checksum/tag/shard/compressor/count header followed by
      length-prefixed serialized logs, one log per frame. The checksum is
      the reference's XOR-of-crc32 (one log, so plain crc32).

    All three encoders are pure Catalyst expressions — the raw block is
    assembled as a hex string (``crc32``/``hex``/``lpad``/``concat``) and
    ``unhex``-ed to binary, so frame construction stays inside
    whole-stage codegen at any scale."""
    shard = F.pmod(
        F.abs(F.hash(*[F.col(c) for c in shard_cols])), F.lit(n_shards)
    ).cast("int")
    if message == "json":
        value = F.to_json(F.struct(*df.columns))
    elif message == "canonical_extended_json":
        value = F.to_json(
            F.struct(
                *[_ext_encode(f.name, f.dataType) for f in df.schema.fields]
            )
        )
    elif message == "raw":
        log = F.encode(F.to_json(F.struct(*df.columns)), "UTF-8")
        value = F.unhex(
            F.concat(
                _u32_hex(F.crc32(log)),
                _u32_hex(F.lit(MSG_PERSISTENT)),
                _u32_hex(shard),
                _u32_hex(F.lit(0)),  # compressor: none (codec's job here)
                _u32_hex(F.lit(1)),  # log count: one row per frame
                _u32_hex(F.length(log)),
                F.hex(log),
            )
        )
    else:
        raise ValueError(
            f"unknown tunnel message format {message!r} — one of "
            "json | canonical_extended_json | raw"
        )
    return df.select(shard.alias("shard"), value.alias("value"))


def _u32_hex(col):
    """8-hex-digit big-endian uint32 of a non-negative integral column."""
    return F.lpad(F.hex(col.cast("bigint")), 8, "0")


def _ext_encode(name: str, dt: T.DataType):
    """One column as its Extended JSON v2 CANONICAL shape (the
    ``bson.MarshalExtJSON(log, canonical=true, ...)`` the reference uses
    for tunnel.json.format = canonical_extended_json)."""
    c = F.col(name)
    if isinstance(dt, T.LongType):
        return F.struct(c.cast("string").alias("$numberLong")).alias(name)
    if isinstance(dt, (T.IntegerType, T.ShortType, T.ByteType)):
        return F.struct(c.cast("string").alias("$numberInt")).alias(name)
    if isinstance(dt, (T.DoubleType, T.FloatType)):
        return F.struct(
            c.cast("double").cast("string").alias("$numberDouble")
        ).alias(name)
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return F.struct(
            F.struct(
                F.unix_millis(c.cast("timestamp")).cast("string").alias(
                    "$numberLong"
                )
            ).alias("$date")
        ).alias(name)
    if isinstance(dt, T.BinaryType):
        return F.struct(
            F.struct(
                F.base64(c).alias("base64"), F.lit("00").alias("subType")
            ).alias("$binary")
        ).alias(name)
    if isinstance(dt, (T.StringType, T.BooleanType)):
        return c.alias(name)
    raise TypeError(
        f"canonical_extended_json: unsupported column type {dt} for {name!r}"
    )


def _ext_schema(schema: StructType) -> StructType:
    """The from_json schema matching :func:`_ext_encode`'s output."""
    out = []
    for f in schema.fields:
        dt = f.dataType
        if isinstance(dt, T.LongType):
            t = T.StructType([T.StructField("$numberLong", T.StringType())])
        elif isinstance(dt, (T.IntegerType, T.ShortType, T.ByteType)):
            t = T.StructType([T.StructField("$numberInt", T.StringType())])
        elif isinstance(dt, (T.DoubleType, T.FloatType)):
            t = T.StructType([T.StructField("$numberDouble", T.StringType())])
        elif isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
            t = T.StructType(
                [
                    T.StructField(
                        "$date",
                        T.StructType(
                            [T.StructField("$numberLong", T.StringType())]
                        ),
                    )
                ]
            )
        elif isinstance(dt, T.BinaryType):
            t = T.StructType(
                [
                    T.StructField(
                        "$binary",
                        T.StructType(
                            [
                                T.StructField("base64", T.StringType()),
                                T.StructField("subType", T.StringType()),
                            ]
                        ),
                    )
                ]
            )
        else:
            t = dt
        out.append(T.StructField(f.name, t))
    return T.StructType(out)


def _ext_decode(name: str, dt: T.DataType):
    """Unwrap one Extended JSON field back to its native type."""
    c = F.col(f"parsed.{name}")
    if isinstance(dt, T.LongType):
        return c["$numberLong"].cast("long").alias(name)
    if isinstance(dt, (T.IntegerType, T.ShortType, T.ByteType)):
        return c["$numberInt"].cast(dt).alias(name)
    if isinstance(dt, (T.DoubleType, T.FloatType)):
        return c["$numberDouble"].cast(dt).alias(name)
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return (
            F.timestamp_millis(c["$date"]["$numberLong"].cast("long"))
            .cast(dt)
            .alias(name)
        )
    if isinstance(dt, T.BinaryType):
        return F.unbase64(c["$binary"]["base64"]).alias(name)
    return c.alias(name)


def decode_ext_frames(
    frames: DataFrame, schema: str | StructType = OPLOG_WIRE_SCHEMA
) -> DataFrame:
    """S12 consumer for canonical_extended_json frames: parse the wrapped
    shapes and unwrap each field back to its native type ($date is millis
    — the Extended JSON contract — so sub-millisecond timestamp precision
    does not survive this codec, exactly as in the reference)."""
    if isinstance(schema, str):
        schema = T._parse_datatype_string(schema)
    parsed = frames.select(
        "shard", F.from_json(F.col("value"), _ext_schema(schema)).alias("parsed")
    )
    return parsed.select(
        "shard", *[_ext_decode(f.name, f.dataType) for f in schema.fields]
    )


def split_corrupt_ext_frames(
    frames: DataFrame,
    schema: str | StructType = OPLOG_WIRE_SCHEMA,
    required: str = "id",
) -> tuple[DataFrame, DataFrame]:
    """:func:`split_corrupt_frames` for canonical_extended_json frames:
    returns (decoded_good, corrupt) with corruption detected on the
    unwrapped ``required`` field (malformed frames parse to all-NULL
    wrappers)."""
    if isinstance(schema, str):
        schema = T._parse_datatype_string(schema)
    parsed = frames.select(
        "shard",
        "value",
        F.from_json(F.col("value"), _ext_schema(schema)).alias("parsed"),
    )
    decoded = [_ext_decode(f.name, f.dataType) for f in schema.fields]
    req = next(c for c, f in zip(decoded, schema.fields) if f.name == required)
    ok = F.col("parsed").isNotNull() & req.isNotNull()
    good = parsed.filter(ok).select("shard", *decoded)
    corrupt = parsed.filter(~ok).select("shard", "value")
    return good, corrupt


#: structural cap on logs per frame: a corrupt count field must not make
#: the offset fold allocate unbounded arrays. The reference batches at
#: most incr_sync.worker.batch_queue_size logs per message (hundreds);
#: a frame CLAIMING more than this is corrupt by construction here.
MAX_LOGS_PER_FRAME = 4096


def decode_raw_frames(
    frames: DataFrame, schema: str | StructType = OPLOG_WIRE_SCHEMA
) -> tuple[DataFrame, DataFrame]:
    """S12 consumer for raw TMessage frames (tunnel/tunnel.go:61-72 —
    the exact block a reference collector writes to Kafka in raw mode,
    any log count): parse the big-endian header, walk the size-prefixed
    log section with an ``aggregate`` offset fold, verify XOR-of-crc32
    over ALL logs, and unmarshal one row per log. Returns ``(good,
    corrupt)`` — corrupt keeps whole frames for the dead-letter table
    (the reference replayer's CRC-reject path, receiver/replayer.go:
    54-146, minus the retransmission it asks the live tunnel for;
    storage tunnels re-read instead). The entire variable-record parse
    is hex-string arithmetic in codegen — no Python touches the bytes.
    """
    h = F.hex(F.col("value"))

    def u32(pos: int):
        return F.conv(F.substring(h, pos, 8), 16, 10).cast("bigint")

    nlogs = u32(33)
    # clamp BEFORE the fold: sequence() materializes eagerly, so a frame
    # claiming 2^31 logs must fail the structure check, not allocate
    nlogs_c = F.least(F.greatest(nlogs, F.lit(0)), F.lit(MAX_LOGS_PER_FRAME))
    # offset fold over the hex string (1-based): o_{i+1} = o_i + 8 +
    # 2*len(o_i); the trailing element is the expected frame end
    offs = F.expr(
        "aggregate(sequence(1, CAST(_nc AS INT)), array(CAST(41 AS BIGINT)), "
        "(acc, i) -> acc || array(element_at(acc, -1) + 8 + "
        "2 * conv(substring(_h, CAST(element_at(acc, -1) AS INT), 8), 16, 10)))"
    )
    parsed = frames.select(
        "shard",
        "value",
        h.alias("_h"),
        u32(1).alias("_cksum"),
        nlogs.alias("_nlogs"),
        nlogs_c.alias("_nc"),
    ).withColumn("_offs", offs)
    logs = F.expr(
        "transform(slice(_offs, 1, CAST(_nc AS INT)), o -> unhex(substring("
        "_h, CAST(o + 8 AS INT), "
        "CAST(2 * conv(substring(_h, CAST(o AS INT), 8), 16, 10) AS INT))))"
    )
    parsed = parsed.withColumn("_logs", logs)
    # a frame shorter than its header/section parses to NULL fields,
    # making the predicate NULL — which both filter() and filter(~...)
    # drop, so the row would vanish from BOTH legs without the coalesce
    ok = F.coalesce(
        (F.col("_nlogs") == F.col("_nc"))
        & (F.col("_nlogs") >= 1)
        # compressor id 0 only: a frame a reference collector wrote with
        # compression would pass the CRC (computed over wire bytes) yet
        # from_json over compressed bytes would emit all-NULL rows into
        # the GOOD leg — route it to the dead-letter leg instead, where
        # the operator sees the frame (this pure-Catalyst decoder has no
        # codegen decompression; the socket tunnel handles compressed
        # TMessages)
        & (F.conv(F.substring(F.col("_h"), 25, 8), 16, 10).cast("bigint") == 0)
        # structural closure: the last offset is exactly one past the end
        & (F.expr("element_at(_offs, -1)") - 1 == F.length(F.col("_h")))
        & (
            F.expr(
                "aggregate(_logs, CAST(0 AS BIGINT), (acc, l) -> acc ^ crc32(l))"
            )
            == F.col("_cksum")
        ),
        F.lit(False),
    )
    good = (
        parsed.filter(ok)
        .select("shard", F.explode(F.col("_logs")).alias("_log"))
        .select(
            "shard",
            F.from_json(F.decode(F.col("_log"), "UTF-8"), schema).alias(
                "parsed"
            ),
        )
        .select("shard", "parsed.*")
    )
    corrupt = parsed.filter(~ok).select("shard", "value")
    return good, corrupt


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


def file_tunnel_mirror(path: str, message: str = "json", n_shards: int = 8):
    """S9 through the CLI (``tunnel = file`` + ``tunnel.address = dir``,
    tunnel/file_writer.go): an ``ApplyKernel(mirror=...)`` callable that
    appends each committed batch's NET per-key ops as encoded tunnel
    frames — parquet-framed with the batch id, append-only, any
    ``tunnel.message`` codec. A downstream replayer reads the directory
    with :func:`decode_frames` / :func:`decode_ext_frames` /
    :func:`decode_raw_frames` in batch-id order."""

    def mirror(net: DataFrame, batch_id: int) -> None:
        encode_frames(net, shard_cols=(net.columns[0],), n_shards=n_shards,
                      message=message).withColumn(
            "batch_id", F.lit(batch_id).cast("long")
        ).write.mode("append").parquet(path)

    return mirror


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
