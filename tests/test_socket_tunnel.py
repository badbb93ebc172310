"""S10 socket tunnel: wire codec, replayer handshake scenarios
(receiver/replayer.go:54-146), and the Spark end-to-end round trip."""

from __future__ import annotations

import json

import pytest

from mongoshake_spark.sources import socket_tunnel as st


@pytest.fixture()
def server():
    s = st.TunnelServer().start()
    yield s
    s.stop()


def _logs(ids):
    return [json.dumps({"id": i, "v": f"payload{i}"}).encode() for i in ids]


def test_tmessage_codec_roundtrip():
    cids = [st.NO_COMPRESS, st.COMPRESS_GZIP, st.COMPRESS_ZLIB, st.COMPRESS_DEFLATE]
    if st._snappy_codec() is not None:
        cids.append(st.COMPRESS_SNAPPY)
    for cid in cids:
        raw = _logs([1, 2, 3])
        msg = st.decode_tmessage(st.encode_tmessage(raw, shard=5, tag=st.MSG_NORMAL, compress=cid))
        assert msg["shard"] == 5 and msg["compress"] == cid
        assert [st._decompress_one(log, cid) for log in msg["logs"]] == raw
        assert msg["checksum"] == st.crc32_xor(msg["logs"])  # checksum over wire bytes


def test_fresh_receiver_rejects_until_retransmission(server):
    """replayer.go:55-62: a restarted receiver rejects every write without
    the retransmission tag; the tagged resend is accepted and acked."""
    import socket as pysock
    import struct

    sock = pysock.create_connection(("127.0.0.1", server.port))
    try:
        sock.sendall(st.encode_packet(st.PACKET_WRITE, st.encode_tmessage(_logs([1, 2]), 0)))
        ptype, payload = st.read_packet(sock)
        assert struct.unpack(">q", payload)[0] == st.REPLY_RETRANSMISSION
        assert server.received == []  # rejected frames are not consumed
        sock.sendall(
            st.encode_packet(
                st.PACKET_WRITE,
                st.encode_tmessage(_logs([1, 2]), 0, tag=st.MSG_RETRANSMISSION),
            )
        )
        _, payload = st.read_packet(sock)
        assert struct.unpack(">q", payload)[0] == 2  # ack = last id
        assert len(server.received) == 2
    finally:
        sock.close()


def test_client_auto_retransmits_and_purges(server):
    client = st.TunnelClient("127.0.0.1", server.port)
    try:
        ack = client.send(_logs([1, 2, 3]), shard=0, ordinal=3)
        assert ack == 3 and client.unacked == []  # purged up to ack
        ack = client.send(_logs([4]), shard=1, ordinal=4)
        assert ack == 4
        assert client.get_ack() == 4
        assert [json.loads(v)["id"] for _, v in server.received] == [1, 2, 3, 4]
    finally:
        client.close()


def test_checksum_corruption_triggers_retransmit(server):
    """replayer.go:66-75: a checksum mismatch returns ReplyChecksumInvalid
    and re-arms the retransmit gate; the sender's tagged resend recovers
    with no duplicate consumption."""
    server.retransmit = False  # past the restart handshake
    server.corrupt_first_n = 1
    client = st.TunnelClient("127.0.0.1", server.port)
    try:
        ack = client.send(_logs([7, 8]), shard=2, ordinal=8)
        assert ack == 8
        assert [json.loads(v)["id"] for _, v in server.received] == [7, 8]
    finally:
        client.close()


def test_probe_acks_without_consuming(server):
    server.retransmit = False
    client = st.TunnelClient("127.0.0.1", server.port)
    try:
        client.send(_logs([5]), shard=0, ordinal=5)
        assert client.probe() == 5
        assert len(server.received) == 1
    finally:
        client.close()


def test_unsupported_compressor_rejected(server):
    """replayer.go:79-85: unknown compressor id -> error reply + re-arm."""
    import socket as pysock
    import struct

    server.retransmit = False
    raw = st.encode_tmessage(_logs([1]), 0)
    # patch the compress field (bytes 12:16 of the TMessage) to an id the
    # registry does not know — rejected like the reference's
    # GetCompressorById failure
    bad = raw[:12] + struct.pack(">I", 99) + raw[16:]
    sock = pysock.create_connection(("127.0.0.1", server.port))
    try:
        sock.sendall(st.encode_packet(st.PACKET_WRITE, bad))
        _, payload = st.read_packet(sock)
        assert struct.unpack(">q", payload)[0] == st.REPLY_COMPRESSOR_NOT_SUPPORTED
        assert server.retransmit is True
    finally:
        sock.close()


@pytest.mark.skipif(st._snappy_codec() is None, reason="snappy codec unavailable")
def test_snappy_corrupt_payload_is_decompress_invalid(server):
    """A supported compressor id over undecodable bytes must map to
    ReplyDecompressInvalid (replayer.go decompress-failure path), NOT to
    compressor-not-supported — ArrowInvalid subclasses ValueError, so the
    codec wraps it in DecompressError to keep the two replies distinct."""
    import socket as pysock
    import struct

    server.retransmit = False
    raw = st.encode_tmessage(_logs([1]), 0)  # logs are NOT snappy-framed
    bad = raw[:12] + struct.pack(">I", st.COMPRESS_SNAPPY) + raw[16:]
    sock = pysock.create_connection(("127.0.0.1", server.port))
    try:
        sock.sendall(st.encode_packet(st.PACKET_WRITE, bad))
        _, payload = st.read_packet(sock)
        assert struct.unpack(">q", payload)[0] == st.REPLY_DECOMPRESS_INVALID
        assert server.retransmit is True
    finally:
        sock.close()


@pytest.mark.skipif(st._snappy_codec() is None, reason="snappy codec unavailable")
def test_snappy_live_roundtrip(server):
    """modules/compress.go:18-23 id 2: a snappy-compressed batch is
    decompressed and consumed; a fresh-receiver reject + tagged resend
    works under snappy too (frames re-encode with the same codec)."""
    client = st.TunnelClient("127.0.0.1", server.port, compress=st.COMPRESS_SNAPPY)
    try:
        assert client.send(_logs([1, 2]), shard=0, ordinal=2) == 2
        assert [json.loads(v)["id"] for _, v in server.received] == [1, 2]
        server.retransmit = True  # simulated receiver restart mid-stream
        assert client.send(_logs([3]), shard=0, ordinal=3) == 3
        assert sorted(json.loads(v)["id"] for _, v in server.received) == [1, 2, 3]
    finally:
        client.close()


def test_unordered_batch_acks_max_and_purges(server):
    """ADVICE round-3: a batch whose logs are not id-ordered must be acked
    at its MAX ordinal, so the sender's purge clears it — otherwise the
    consumed batch lingers in the unack window and a later rejection
    replays it into duplicate rows."""
    server.retransmit = False
    server.corrupt_first_n = 0
    client = st.TunnelClient("127.0.0.1", server.port)
    try:
        ack = client.send(_logs([3, 1, 2]), shard=0, ordinal=3)
        assert ack == 3 and client.unacked == []  # max-of-batch, purged
        # now force a rejection on the NEXT batch: the retransmit loop must
        # resend only that batch — the unordered one is gone from the window
        server.corrupt_first_n = 1
        ack = client.send(_logs([4]), shard=0, ordinal=4)
        assert ack == 4
        assert sorted(json.loads(v)["id"] for _, v in server.received) == [1, 2, 3, 4]
    finally:
        client.close()


def test_retransmitted_consumed_frames_dedupe(server):
    """Belt-and-braces for the same failure mode: if an already-consumed
    batch IS retransmitted, the receiver drops the consumed ordinals
    instead of appending them twice (the reference relies on idempotent
    apply; this receiver appends, so it dedupes)."""
    import socket as pysock
    import struct

    server.retransmit = False
    sock = pysock.create_connection(("127.0.0.1", server.port))
    try:
        sock.sendall(st.encode_packet(st.PACKET_WRITE, st.encode_tmessage(_logs([1, 2]), 0)))
        _, payload = st.read_packet(sock)
        assert struct.unpack(">q", payload)[0] == 2
        # replay the same (unordered, for good measure) frame tagged as a
        # retransmission, plus one genuinely new log
        sock.sendall(
            st.encode_packet(
                st.PACKET_WRITE,
                st.encode_tmessage(_logs([2, 1, 3]), 0, tag=st.MSG_RETRANSMISSION),
            )
        )
        _, payload = st.read_packet(sock)
        assert struct.unpack(">q", payload)[0] == 3
        assert sorted(json.loads(v)["id"] for _, v in server.received) == [1, 2, 3]
    finally:
        sock.close()


def test_per_connection_ack_isolation(server):
    """A fast peer connection must not advance another sender's ack: each
    connection tracks its own consumed watermark (the sender's unack
    window is per-connection), while GetACK reports the global max."""
    server.retransmit = False
    c1 = st.TunnelClient("127.0.0.1", server.port)
    c2 = st.TunnelClient("127.0.0.1", server.port)
    try:
        assert c2.send(_logs([1000]), shard=1, ordinal=1000) == 1000
        # c1's first consumed batch acks at ITS ordinal, not c2's 1000
        assert c1.send(_logs([5]), shard=0, ordinal=5) == 5
        assert c1.unacked == []
        assert c1.get_ack() == 1000  # global max, for B10 heartbeats
    finally:
        c1.close()
        c2.close()


def test_spark_end_to_end_roundtrip(spark, sf_dir, server):
    """Executors stream every partition through the live socket (zlib);
    the decoded receiver-side DataFrame equals the source."""
    from pyspark.sql import functions as F

    from mongoshake_spark.sources.oplog import oplog_view
    from mongoshake_spark.sources.tables import load_table

    ov = oplog_view(load_table(spark, sf_dir, "events"))
    st.write_socket_tunnel(
        ov, "127.0.0.1", server.port, batch_size=256, compress=st.COMPRESS_ZLIB
    )
    got = server.to_dataframe(spark)
    assert got.count() == ov.count()
    a = ov.agg(F.count("*"), F.round(F.sum("value"), 2), F.min("id"), F.max("id")).collect()
    b = got.agg(F.count("*"), F.round(F.sum("value"), 2), F.min("id"), F.max("id")).collect()
    assert a == b


def test_reconnect_retransmission_dedupes_across_connections(server):
    """The ack-lost-in-flight scenario: a batch is consumed but the TCP
    connection dies before the ack reaches the sender, so the sender
    reconnects and retransmits its unack window. The NEW connection's
    watermark restarts at -1 — the per-SHARD watermark is what must drop
    the replayed logs, or the receiver appends them twice."""
    import socket as pysock
    import struct

    server.retransmit = False
    s1 = pysock.create_connection(("127.0.0.1", server.port))
    try:
        s1.sendall(st.encode_packet(st.PACKET_WRITE, st.encode_tmessage(_logs([1, 2]), 0)))
        _, payload = st.read_packet(s1)
        assert struct.unpack(">q", payload)[0] == 2
    finally:
        s1.close()  # ack "lost": sender still holds 1,2 unacked
    s2 = pysock.create_connection(("127.0.0.1", server.port))
    try:
        s2.sendall(
            st.encode_packet(
                st.PACKET_WRITE,
                st.encode_tmessage(_logs([1, 2, 3]), 0, tag=st.MSG_RETRANSMISSION),
            )
        )
        _, payload = st.read_packet(s2)
        assert struct.unpack(">q", payload)[0] == 3
        assert sorted(json.loads(v)["id"] for _, v in server.received) == [1, 2, 3]
        # a different shard is NOT gated by shard 0's watermark
        s2.sendall(
            st.encode_packet(
                st.PACKET_WRITE,
                st.encode_tmessage(_logs([1]), 7, tag=st.MSG_RETRANSMISSION),
            )
        )
        _, payload = st.read_packet(s2)
        ids_by_shard = sorted((sh, json.loads(v)["id"]) for sh, v in server.received)
        assert (7, 1) in ids_by_shard and len(ids_by_shard) == 4
    finally:
        s2.close()


@pytest.mark.skipif(st._snappy_codec() is None, reason="snappy codec unavailable")
def test_snappy_absurd_length_claim_rejected_without_allocation(server):
    """The raw-snappy varint header is attacker-controlled and decompress
    allocates the claimed length up front; a claim past the format's
    maximum expansion must be rejected as DecompressInvalid instead of
    attempting a multi-GB allocation."""
    import socket as pysock
    import struct

    server.retransmit = False
    # varint for 2^35 (absurd for a 20-byte payload), then garbage
    fake_log = bytes([0x80, 0x80, 0x80, 0x80, 0x80, 0x01]) + b"junk"
    payload = struct.pack(
        ">IIIII", st.crc32_xor([fake_log]), st.MSG_NORMAL, 0, st.COMPRESS_SNAPPY, 1
    ) + struct.pack(">I", len(fake_log)) + fake_log
    sock = pysock.create_connection(("127.0.0.1", server.port))
    try:
        sock.sendall(st.encode_packet(st.PACKET_WRITE, payload))
        _, reply = st.read_packet(sock)
        assert struct.unpack(">q", reply)[0] == st.REPLY_DECOMPRESS_INVALID
    finally:
        sock.close()


def test_truncated_gzip_is_decompress_invalid_not_a_dead_thread(server):
    """ADVICE round-4: gzip.decompress of a TRUNCATED stream raises
    EOFError (not BadGzipFile); it must map to ReplyDecompressInvalid
    like every other undecodable payload — before the fix it killed the
    handler thread with no reply and the sender hung forever."""
    import gzip
    import socket as pysock
    import struct

    server.retransmit = False
    wire_log = gzip.compress(b"payload-that-will-be-cut")[:-4]
    body = struct.pack(
        ">IIIII", st.crc32_xor([wire_log]), st.MSG_NORMAL, 0, st.COMPRESS_GZIP, 1
    ) + struct.pack(">I", len(wire_log)) + wire_log
    sock = pysock.create_connection(("127.0.0.1", server.port))
    sock.settimeout(5)  # a dead handler thread -> timeout, not a hang
    try:
        sock.sendall(st.encode_packet(st.PACKET_WRITE, body))
        _, payload = st.read_packet(sock)
        assert struct.unpack(">q", payload)[0] == st.REPLY_DECOMPRESS_INVALID
        assert server.retransmit is True
    finally:
        sock.close()


def test_drain_releases_rows_with_absolute_indices(server):
    """S12 daemon memory contract: drain(upto) removes consumed rows under
    the lock and keeps indices absolute across trims, so a consumer that
    tracks a plain running count keeps working after any number of
    releases."""
    server.retransmit = False
    client = st.TunnelClient("127.0.0.1", server.port)
    try:
        client.send(_logs([1, 2, 3]), shard=0, ordinal=3)
        assert server.total_received == 3
        first = server.drain(2)
        assert [json.loads(v)["id"] for _, v in first] == [1, 2]
        assert server.received_base == 2 and len(server.received) == 1
        assert server.total_received == 3  # absolute count survives the trim
        client.send(_logs([4]), shard=0, ordinal=4)
        rest = server.drain(server.total_received)
        assert [json.loads(v)["id"] for _, v in rest] == [3, 4]
        assert server.received == [] and server.received_base == 4
        assert server.drain(4) == []  # idempotent at the watermark
    finally:
        client.close()


def test_daemon_memory_bounded_over_soak(server):
    """VERDICT round-8: the receiver daemon must not retain every received
    log for its lifetime (the reference replayer releases each consumed
    TMessage, receiver/replayer.go:54-146). Soak: 120 flush cycles at a
    constant batch size with a drain after each — the resident list must
    stay bounded by one batch, never grow with total logs received."""
    server.retransmit = False
    client = st.TunnelClient("127.0.0.1", server.port)
    batch, cycles = 50, 120
    max_resident, drained_total = 0, 0
    try:
        for c in range(cycles):
            ids = list(range(c * batch, (c + 1) * batch))
            client.send(_logs(ids), shard=0, ordinal=ids[-1])
            with server._lock:
                max_resident = max(max_resident, len(server.received))
            drained_total += len(server.drain(server.total_received))
    finally:
        client.close()
    assert drained_total == cycles * batch  # nothing lost by the trims
    assert max_resident <= batch            # flat: one pending batch, ever
    assert server.received == [] and server.received_base == cycles * batch


def test_non_integer_id_takes_full_parse_not_prefix_digits(server):
    """ADVICE round-8: a numeric-but-not-plain-integer id (a double
    serialized as 1.5E3) must NOT match the fast-path regex on its leading
    digit — that would record ordinal 1 instead of 1500 and corrupt the
    per-shard retransmission watermark. The anchored regex falls back to
    json.loads."""
    import socket as pysock
    import struct

    assert st._ID_PREFIX_RE.match(b'{"id": 1.5E3, "v": "x"}') is None
    assert st._ID_PREFIX_RE.match(b'{"id": 42, "v": "x"}').group(1) == b"42"
    assert st._ID_PREFIX_RE.match(b'{"id": -7}').group(1) == b"-7"

    server.retransmit = False
    log = b'{"id": 1.5E3, "v": "double-id"}'
    body = struct.pack(
        ">IIIII", st.crc32_xor([log]), st.MSG_NORMAL, 3, st.NO_COMPRESS, 1
    ) + struct.pack(">I", len(log)) + log
    sock = pysock.create_connection(("127.0.0.1", server.port))
    try:
        sock.sendall(st.encode_packet(st.PACKET_WRITE, body))
        _, payload = st.read_packet(sock)
        assert struct.unpack(">q", payload)[0] == 1500  # full-parse ordinal
        assert server.shard_ack[3] == 1500
    finally:
        sock.close()


def test_malformed_tmessage_gets_error_reply_not_dead_thread(server):
    """A structurally malformed TMessage (log count past the payload)
    must produce an error REPLY and re-arm the retransmit gate — before
    the fix it raised struct.error inside the handler, killing the
    thread silently and leaving the sender blocked until socket
    timeout."""
    import socket as pysock
    import struct

    server.retransmit = False
    # header claims 5 logs; payload carries none
    body = struct.pack(">IIIII", 0, st.MSG_NORMAL, 0, st.NO_COMPRESS, 5)
    sock = pysock.create_connection(("127.0.0.1", server.port))
    sock.settimeout(5)
    try:
        sock.sendall(st.encode_packet(st.PACKET_WRITE, body))
        _, payload = st.read_packet(sock)
        assert struct.unpack(">q", payload)[0] == st.REPLY_CHECKSUM_INVALID
        assert server.retransmit is True
        # the connection stays serviceable: a valid tagged resend lands
        sock.sendall(st.encode_packet(
            st.PACKET_WRITE,
            st.encode_tmessage(_logs([1]), 0, tag=st.MSG_RETRANSMISSION),
        ))
        _, payload = st.read_packet(sock)
        assert struct.unpack(">q", payload)[0] == 1
    finally:
        sock.close()
