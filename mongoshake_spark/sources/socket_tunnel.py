"""S10 TCP/RPC tunnel — a live socket transport with the reference's frame
contract, ack bookkeeping and reject-until-retransmit handshake.

Reference wire format (tunnel/tcp_writer.go:17-48 header comment):

  Packet header, big-endian, 12 bytes:
    magic(2B)=0xCAFE | version(1B)=0x01 | type(1B) | crc32(4B)=0 | length(4B)
  types (tcp_writer.go:52-58): GetACK=0x01, Write=0x02, ReturnACK=0x03

  PacketWrite payload = TMessage.ToBytes (tunnel/tunnel.go:61-72), big-endian:
    cksum(4B) | tag(4B) | shard(4B) | compress(4B) | number(4B)
    | { len(4B) | log bytes } * number
  cksum = XOR of crc32.IEEE over each raw log (tunnel/tunnel.go:53-59).
  tag bits (tunnel/tunnel.go:20-24): MsgRetransmission=0x1, MsgProbe=0x10.
  compress ids (modules/compress.go:18-23): 0=none, 1=gzip, 2=snappy,
  3=zlib, 4=deflate. Snappy uses Arrow's bundled codec (raw block format —
  a varint uncompressed-length header then the compressed stream — the
  same framing Go's snappy.Encode emits, so the frames interoperate); when
  the codec is unavailable the id is rejected exactly like the reference's
  unsupported-compressor path (ReplyCompressorNotSupported).

  PacketReturnACK payload: the Sync reply as int64 big-endian — negative =
  a Reply* error code (tunnel/tunnel.go:30-37), else the receiver's acked
  ordinal. (The reference comment draws ack(4B) but its replies are int64;
  its own assert at tcp_writer.go:185 checks length != 4.)

Receiver semantics reproduced from receiver/replayer.go:54-146:
  - on (re)start, Retransmit=true: every Write WITHOUT the retransmission
    tag is rejected with ReplyRetransmission until the sender resends its
    unacked window tagged MsgRetransmission
  - checksum mismatch -> Retransmit=true, ReplyChecksumInvalid
  - unknown compressor -> Retransmit=true, ReplyCompressorNotSupported
  - probe (0 logs) -> ack only
  - ack = MAX ordinal consumed on the connection (the reference replayer
    acks the last ts of an in-order feed; frames here carry the oplog id
    ordinal, and acking the batch max keeps the invariant the sender's
    purge relies on — server ack >= client ordinal for any consumed batch
    — even when a batch's logs are not id-ordered). Ack state is tracked
    PER CONNECTION (one connection = one sender = one unack window), so a
    fast peer connection can never advance the ack past frames this
    sender has not delivered; the global ``ack`` used by GetACK/probe is
    the max across connections.
  - retransmitted frames whose ordinal the connection already acked are
    dropped instead of consumed twice (the reference gets this for free
    from its idempotent apply; this receiver appends, so it dedupes)

Sender semantics from tunnel/tcp_writer.go + collector/worker.go:170-252:
  unacked frames kept (cap 32768 = MaxUnAckListLength, worker.go:18),
  purged up to each ack reply, resent in order with the retransmission tag
  when the receiver demands it.

Spark-first integration: the *executors* are the senders —
``write_socket_tunnel`` runs one client per partition inside
``foreachPartition``, so N partitions stream concurrently into the
receiver exactly like the reference's N workers share one tunnel; rows are
the same JSON frames the file/Kafka tunnels use (sources/tunnel.py), so
every sink family shares one encode/decode path.
"""

from __future__ import annotations

import gzip
import re
import socket
import struct
import threading
import zlib
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MAGIC = 0xCAFE
VERSION = 1
HEADER = struct.Struct(">HBBII")  # magic, version, type, crc32, length

PACKET_GET_ACK = 0x01
PACKET_WRITE = 0x02
PACKET_RETURN_ACK = 0x03

MSG_NORMAL = 0x0
MSG_RETRANSMISSION = 0x1
MSG_PROBE = 0x10

REPLY_RETRANSMISSION = -4
REPLY_CHECKSUM_INVALID = -6
REPLY_COMPRESSOR_NOT_SUPPORTED = -7
REPLY_DECOMPRESS_INVALID = -8

NO_COMPRESS, COMPRESS_GZIP, COMPRESS_SNAPPY, COMPRESS_ZLIB, COMPRESS_DEFLATE = 0, 1, 2, 3, 4
MAX_UNACK = 32768  # collector/worker.go:18 MaxUnAckListLength


class DecompressError(Exception):
    """Payload claims a supported compressor but the bytes don't decode —
    maps to ReplyDecompressInvalid (vs ValueError = unknown compressor id
    -> ReplyCompressorNotSupported)."""


def _snappy_codec():
    """Arrow's bundled snappy, or None when absent (then id 2 takes the
    reference's unsupported-compressor reject path)."""
    try:
        import pyarrow as pa

        return pa if pa.Codec.is_available("snappy") else None
    except ImportError:  # pragma: no cover - pyarrow is baked into this env
        return None


def _snappy_uncompressed_len(data: bytes) -> tuple[int, int]:
    """(length, header_bytes) from the raw-format varint prefix."""
    result = shift = 0
    for i in range(min(len(data), 5)):
        b = data[i]
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, i + 1
        shift += 7
    raise DecompressError("snappy: bad length varint")


#: fast ordinal extraction for json-codec logs (id is the wire
#: struct's first column); non-matching shapes take the full parse.
#: The integer must be TERMINATED by a delimiter — without it a
#: non-plain-integer id (e.g. a double serialized as 1.0E9) would match
#: its leading digits and silently corrupt the per-shard watermark;
#: anchored this way such shapes fall through to json.loads.
_ID_PREFIX_RE = re.compile(rb'^\{"id":\s*(-?\d+)\s*[,}]')


def crc32_xor(logs: list[bytes]) -> int:
    v = 0
    for log in logs:
        v ^= zlib.crc32(log)
    return v & 0xFFFFFFFF


def _ordinal(log: bytes) -> int:
    """Oplog ordinal of one json-codec log. The json tunnel codec emits
    the wire struct in column order, id first — a prefix match reads the
    ordinal without parsing the whole document (the per-log json.loads
    was the receiver's hot path: ~25x slower over a 100k-log drain).
    Any other shape falls back to the full parse, same semantics."""
    import json as _json

    m = _ID_PREFIX_RE.match(log)
    if m:
        return int(m.group(1))
    return int(_json.loads(log).get("id", 0))


def _compress_one(data: bytes, cid: int) -> bytes:
    if cid == NO_COMPRESS:
        return data
    if cid == COMPRESS_GZIP:
        return gzip.compress(data)
    if cid == COMPRESS_ZLIB:
        return zlib.compress(data)
    if cid == COMPRESS_DEFLATE:
        c = zlib.compressobj(wbits=-15)
        return c.compress(data) + c.flush()
    if cid == COMPRESS_SNAPPY:
        pa = _snappy_codec()
        if pa is not None:
            return pa.compress(data, codec="snappy", asbytes=True)
    raise ValueError(f"unsupported compressor {cid}")


def _decompress_one(data: bytes, cid: int) -> bytes:
    if cid == NO_COMPRESS:
        return data
    if cid == COMPRESS_GZIP:
        return gzip.decompress(data)
    if cid == COMPRESS_ZLIB:
        return zlib.decompress(data)
    if cid == COMPRESS_DEFLATE:
        return zlib.decompress(data, wbits=-15)
    if cid == COMPRESS_SNAPPY:
        pa = _snappy_codec()
        if pa is not None:
            n, _ = _snappy_uncompressed_len(data)
            # the varint is attacker-controlled and pa.decompress allocates
            # n bytes up front; a legal raw-snappy stream cannot expand more
            # than ~32x (a 2-byte copy tag emits at most 64 bytes), so a
            # claimed length past that bound is corruption, not data
            if n > len(data) * 64 + 64:
                raise DecompressError(
                    f"snappy: claimed length {n} exceeds max expansion of "
                    f"{len(data)} input bytes"
                )
            try:
                return pa.decompress(data, decompressed_size=n, codec="snappy", asbytes=True)
            except Exception as exc:  # ArrowInvalid subclasses ValueError,
                # which the Sync loop maps to compressor-not-supported —
                # corrupt bytes must map to ReplyDecompressInvalid instead
                raise DecompressError(str(exc)) from exc
    raise ValueError(f"unsupported compressor {cid}")


def encode_tmessage(logs: list[bytes], shard: int, tag: int = MSG_NORMAL,
                    compress: int = NO_COMPRESS) -> bytes:
    """TMessage.ToBytes (tunnel/tunnel.go:61-72). The checksum is computed
    over the wire (post-compression) logs, as the reference does
    (write_controller.go compresses before checksum)."""
    wire = [_compress_one(log, compress) for log in logs]
    out = [struct.pack(">IIIII", crc32_xor(wire), tag, shard, compress, len(wire))]
    for log in wire:
        out.append(struct.pack(">I", len(log)))
        out.append(log)
    return b"".join(out)


def decode_tmessage(payload: bytes) -> dict:
    cksum, tag, shard, compress, number = struct.unpack_from(">IIIII", payload, 0)
    off, logs = 20, []
    for _ in range(number):
        (n,) = struct.unpack_from(">I", payload, off)
        off += 4
        logs.append(payload[off : off + n])
        off += n
    return {"checksum": cksum, "tag": tag, "shard": shard, "compress": compress, "logs": logs}


def encode_packet(ptype: int, payload: bytes = b"") -> bytes:
    return HEADER.pack(MAGIC, VERSION, ptype, 0, len(payload)) + payload


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("peer closed")
        buf += chunk
    return buf


def read_packet(sock: socket.socket) -> tuple[int, bytes]:
    magic, version, ptype, _crc, length = HEADER.unpack(_recv_exact(sock, HEADER.size))
    if magic != MAGIC or version != VERSION:
        raise ValueError(f"bad packet header magic={magic:#x} version={version}")
    return ptype, _recv_exact(sock, length) if length else b""


@dataclass
class TunnelServer:
    """The receiver/replayer (receiver/replayer.go:54-146) as an embedded
    threaded TCP server. Frames are collected as (shard, json) rows,
    exposed to Spark via :meth:`to_dataframe`."""

    host: str = "127.0.0.1"
    port: int = 0  # 0 = ephemeral
    corrupt_first_n: int = 0  # test hook: flip a byte in the first n writes
    received: list = field(default_factory=list)
    #: absolute ordinal of received[0] — ``drain()`` trims consumed rows
    #: (the reference replayer releases each TMessage after handoff,
    #: receiver/replayer.go:54-146; retaining them would grow driver
    #: memory linearly for the run-until-killed daemon), and the base
    #: keeps consumer indices absolute across trims
    received_base: int = 0
    ack: int = 0
    retransmit: bool = True  # "this always happen on receiver restart"
    # per-SHARD consumed watermark: retransmit dedupe must survive sender
    # RECONNECTS (a new connection's watermark restarts at -1, but the
    # shard's does not), and shards are the unit of single-writer ordering
    # (P7 partition routing: one client per shard, ordinals monotone
    # within a shard)
    shard_ack: dict = field(default_factory=dict)
    _lock: threading.Lock = field(default_factory=threading.Lock, repr=False)
    _srv: socket.socket | None = field(default=None, repr=False)
    _threads: list = field(default_factory=list, repr=False)
    _stopping: bool = field(default=False, repr=False)

    def start(self) -> "TunnelServer":
        self._srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._srv.bind((self.host, self.port))
        self.port = self._srv.getsockname()[1]
        self._srv.listen(64)
        t = threading.Thread(target=self._accept_loop, daemon=True)
        t.start()
        self._threads.append(t)
        return self

    def _accept_loop(self) -> None:
        while not self._stopping:
            try:
                conn, _ = self._srv.accept()
            except OSError:
                return
            t = threading.Thread(target=self._serve, args=(conn,), daemon=True)
            t.start()
            self._threads.append(t)

    def _serve(self, conn: socket.socket) -> None:
        # per-connection consumed watermark (see module doc); starts BELOW
        # any valid ordinal so a retransmitted first batch containing a
        # legitimate ordinal-0 log is not deduped away
        conn_ack = [-1]
        with conn:
            while True:
                try:
                    ptype, payload = read_packet(conn)
                except (ConnectionError, ValueError, OSError):
                    return
                if ptype == PACKET_GET_ACK:
                    reply = self.ack
                elif ptype == PACKET_WRITE:
                    try:
                        reply = self._sync(payload, conn_ack)
                    except (struct.error, IndexError):
                        # a structurally malformed TMessage (log count
                        # past the payload, truncated header) must get
                        # an error REPLY and re-arm the retransmit gate
                        # — not kill this handler thread silently and
                        # leave the sender hanging until socket timeout
                        with self._lock:
                            self.retransmit = True
                        reply = REPLY_CHECKSUM_INVALID
                else:
                    return
                conn.sendall(
                    encode_packet(PACKET_RETURN_ACK, struct.pack(">q", reply))
                )

    def _sync(self, payload: bytes, conn_ack: list) -> int:
        """replayer.go Sync(): retransmit gate -> checksum -> decompress ->
        dedupe -> consume -> ack (the batch's max ordinal, per connection).

        The CPU-bound work — TMessage decode, checksum fold,
        per-log decompression and ordinal parsing — runs OUTSIDE the
        server lock, so N sender connections actually stream
        concurrently (the module's design claim); the lock covers only
        the shared-state window: the retransmit gate, the per-shard
        dedupe watermarks, and the append/ack."""
        with self._lock:
            if self.corrupt_first_n > 0:
                self.corrupt_first_n -= 1
                payload = payload[:-1] + bytes([payload[-1] ^ 0xFF])
        msg = decode_tmessage(payload)
        cksum_ok = (
            msg["checksum"] == 0 or crc32_xor(msg["logs"]) == msg["checksum"]
        )
        logs: list[bytes] = []
        decode_reply = 0
        if cksum_ok:
            try:
                logs = [
                    _decompress_one(log, msg["compress"]) for log in msg["logs"]
                ]
            except (DecompressError, zlib.error, gzip.BadGzipFile, EOFError):
                # EOFError: gzip.decompress raises it (not BadGzipFile) on a
                # TRUNCATED stream — without this clause it would kill the
                # handler thread with no reply and leave the sender hanging
                decode_reply = REPLY_DECOMPRESS_INVALID
            except ValueError:
                decode_reply = REPLY_COMPRESSOR_NOT_SUPPORTED
        ordinals = [_ordinal(log) for log in logs]
        with self._lock:
            if self.retransmit:
                if not msg["tag"] & MSG_RETRANSMISSION:
                    return REPLY_RETRANSMISSION
                self.retransmit = False
            if not cksum_ok:
                self.retransmit = True
                return REPLY_CHECKSUM_INVALID
            if decode_reply:
                self.retransmit = True
                return decode_reply
            if not logs:  # probe request
                return self.ack
            # dedupe against the PRE-batch per-SHARD watermark: the shard
            # is the single-writer ordering unit (P7 routing — ordinals
            # monotone within a shard, one sender partition per shard —
            # see write_socket_tunnel), so it is the correct dedupe key
            # both across reconnects (a fresh connection's conn_ack
            # restarts at -1, but the shard's watermark survives — without
            # it an ack-lost-in-flight retransmission appends the consumed
            # window a second time) and across shards multiplexed on one
            # connection (whose ordinal spaces are independent; conn_ack
            # spans them and must not gate)
            shard = msg["shard"]
            prev_ack = self.shard_ack.get(shard, -1)
            batch_max = prev_ack
            for log, ordinal in zip(logs, ordinals):
                # a retransmitted frame may replay logs already consumed
                # (rejection AFTER a consumed batch, or a reconnect) —
                # dropping them here is what keeps the receiver append-only
                # AND exactly-once
                if msg["tag"] & MSG_RETRANSMISSION and ordinal <= prev_ack:
                    continue
                self.received.append((shard, log.decode("utf-8")))
                batch_max = max(batch_max, ordinal)
                conn_ack[0] = max(conn_ack[0], ordinal)
            # the shard watermark advances by THIS shard's ordinals only —
            # conn_ack spans all shards on the connection and would poison
            # another shard's independent ordinal space
            self.shard_ack[shard] = max(self.shard_ack.get(shard, -1), batch_max)
            self.ack = max(self.ack, conn_ack[0])
            return conn_ack[0]

    @property
    def total_received(self) -> int:
        """Absolute count of logs ever consumed (survives ``drain`` trims).
        Read under ``_lock`` for a consistent snapshot."""
        return self.received_base + len(self.received)

    def drain(self, upto: int) -> list:
        """Remove and return the received rows with absolute index
        ``[received_base, upto)``. This is the daemon consumer's handoff:
        once a batch is applied downstream the rows are RELEASED, so
        resident memory is bounded by one pending batch (the reference
        replayer frees each TMessage the same way) instead of growing
        with the lifetime of the feed."""
        with self._lock:
            n = upto - self.received_base
            if n <= 0:
                return []
            rows = self.received[:n]
            del self.received[:n]
            self.received_base = upto
            return rows

    def to_dataframe(self, spark: SparkSession, schema: str | None = None) -> DataFrame:
        """Received frames as typed rows — the downstream of S12.
        Covers the rows not yet released via :meth:`drain` (in the
        non-daemon roundtrip uses nothing drains, so this is everything)."""
        import pandas as pd

        from mongoshake_spark.sources.tunnel import OPLOG_WIRE_SCHEMA, decode_frames

        pdf = pd.DataFrame(self.received, columns=["shard", "value"])
        frames = spark.createDataFrame(pdf, "shard int, value string") if len(pdf) else (
            spark.createDataFrame([], "shard int, value string")
        )
        return decode_frames(frames, schema or OPLOG_WIRE_SCHEMA)

    def stop(self) -> None:
        self._stopping = True
        if self._srv is not None:
            self._srv.close()


class TunnelClient:
    """tcp_writer/rpc_writer sender: synchronous ack'd sends with an unack
    window and retransmission (collector/worker.go:170-252)."""

    def __init__(self, host: str, port: int, compress: int = NO_COMPRESS):
        self.host, self.port, self.compress = host, port, compress
        self.sock = socket.create_connection((host, port), timeout=60)
        self.unacked: list[tuple[int, int, list[bytes]]] = []  # (ordinal, shard, logs)

    def _roundtrip(self, packet: bytes) -> int:
        self.sock.sendall(packet)
        ptype, payload = read_packet(self.sock)
        assert ptype == PACKET_RETURN_ACK
        return struct.unpack(">q", payload)[0]

    def _purge(self, ack: int) -> None:
        self.unacked = [u for u in self.unacked if u[0] > ack]

    def send(self, logs: list[bytes], shard: int, ordinal: int) -> int:
        """Send one batch; on a rejection reply, resend the whole unack
        window with the retransmission tag (worker.go ReplyRetransmission
        path), newest batch included. Returns the receiver ack."""
        if len(self.unacked) >= MAX_UNACK:
            raise RuntimeError("unack window full")  # worker.go stalls here
        self.unacked.append((ordinal, shard, logs))
        reply = self._roundtrip(
            encode_packet(
                PACKET_WRITE, encode_tmessage(logs, shard, MSG_NORMAL, self.compress)
            )
        )
        retries = 0
        while reply < 0:
            retries += 1
            if retries > 5:
                raise RuntimeError(f"tunnel send kept failing: reply={reply}")
            for ord_, sh, lg in self.unacked:  # ordinal order = send order
                reply = self._roundtrip(
                    encode_packet(
                        PACKET_WRITE,
                        encode_tmessage(lg, sh, MSG_RETRANSMISSION, self.compress),
                    )
                )
                if reply < 0:
                    break
        self._purge(reply)
        return reply

    def get_ack(self) -> int:
        return self._roundtrip(encode_packet(PACKET_GET_ACK))

    def probe(self) -> int:
        """B10 heartbeat: empty message solicits an ack (worker.go:227-233)."""
        return self._roundtrip(
            encode_packet(PACKET_WRITE, encode_tmessage([], 0, MSG_PROBE, NO_COMPRESS))
        )

    def close(self) -> None:
        self.sock.close()


def write_socket_tunnel(
    df: DataFrame,
    host: str,
    port: int,
    batch_size: int = 1024,
    compress: int = NO_COMPRESS,
    n_shards: int = 8,
) -> None:
    """Stream a DataFrame through the live socket tunnel: one client per
    partition (the executors are the senders — N partitions stream
    concurrently, like the reference's N workers), frames JSON-encoded via
    the shared tunnel codec, batched ``batch_size`` per TMessage (B1's
    batching knob).

    The sender is Arrow-batched (``mapInPandas``): frames cross to Python
    in columnar batches and group per shard via pandas — the previous
    row-at-a-time ``foreachPartition`` loop spent more time iterating Row
    objects than on the socket. Like any ``foreach`` sink, a task retry
    resends its partition; the receiver's per-shard ordinal watermark
    (and every downstream apply's idempotent MERGE) absorbs duplicates —
    the same at-least-once + idempotent-consumer argument the reference
    makes for its ack window.

    SINGLE WRITER PER SHARD (P7, the invariant the receiver's per-shard
    dedupe watermark is sound under): the frames repartition ON the
    shard column — every row of a shard flows through exactly one
    partition/connection — and sort within the partition by ordinal, so
    a shard's ordinals arrive monotone. Without this, two connections
    carrying one shard could interleave ordinal ranges, and a
    retransmission after a transient reject would be deduped against
    the OTHER connection's higher watermark — acked but never consumed
    (permanent loss)."""
    import pandas as pd

    from mongoshake_spark.sources.tunnel import encode_frames

    frames = (
        encode_frames(df, n_shards=n_shards)
        .withColumn(
            "_ord", F.get_json_object("value", "$.id").cast("long")
        )
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "_ord")
    )

    def send_batches(batches):
        client = None
        try:
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                if client is None:
                    client = TunnelClient(host, port, compress)
                for sh, group in pdf.groupby("shard", sort=False):
                    vals = group["value"].to_numpy()
                    ords = group["_ord"].fillna(0).to_numpy()
                    for i in range(0, len(vals), batch_size):
                        logs = [v.encode() for v in vals[i : i + batch_size]]
                        client.send(
                            logs, int(sh), int(ords[i : i + batch_size].max())
                        )
            yield pd.DataFrame({"sent": [1]})
        finally:
            if client is not None:
                client.close()

    frames.mapInPandas(send_batches, schema="sent int").count()
