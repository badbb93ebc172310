"""Full-sync, tunnel round-trip, and multimodal plumbing tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from mongoshake_spark.operators import multimodal
from mongoshake_spark.plans.full_sync import full_sync, select_sync_mode, sync_all
from mongoshake_spark.sources.oplog import chunks_view, oplog_view
from mongoshake_spark.sources.tables import load_table
from mongoshake_spark.sources.tunnel import (
    encode_frames,
    read_file_tunnel,
    write_file_tunnel,
)
from mongoshake_spark.streaming.replay import write_replay_feed


def test_full_sync_copies_all_tables(spark, sf_dir, tmp_path):
    report = full_sync(spark, sf_dir, str(tmp_path), tables=("region", "nation", "events"))
    src_counts = {
        t: load_table(spark, sf_dir, t).count() for t in ("region", "nation", "events")
    }
    assert report.tables == src_counts


def test_full_sync_resume_skips_completed_tables(spark, sf_dir, tmp_path):
    """An interrupted snapshot resumes per-namespace: tables with a
    completion marker are skipped untouched (same report, files not
    rewritten); a table whose marker is missing — the one in flight at
    the crash — re-copies cleanly."""
    import os

    tables = ("region", "nation", "events")
    first = full_sync(spark, sf_dir, str(tmp_path), tables=tables)
    # simulate a crash mid-'events': its marker never got written
    os.remove(tmp_path / "events" / "_sync_report.json")
    mtimes = {
        t: sorted(
            (f, os.path.getmtime(tmp_path / t / f))
            for f in os.listdir(tmp_path / t)
            if f.endswith(".parquet")
        )
        for t in ("region", "nation")
    }
    second = full_sync(spark, sf_dir, str(tmp_path), tables=tables, resume=True)
    assert second.tables == first.tables
    for t in ("region", "nation"):  # completed tables untouched
        assert mtimes[t] == sorted(
            (f, os.path.getmtime(tmp_path / t / f))
            for f in os.listdir(tmp_path / t)
            if f.endswith(".parquet")
        )
    assert (tmp_path / "events" / "_sync_report.json").is_file()  # re-copied
    got = spark.read.parquet(str(tmp_path / "events")).count()
    assert got == first.tables["events"]


def test_full_sync_orphan_filter(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem")
    chunks = chunks_view(spark, li)
    report = full_sync(
        spark, sf_dir, str(tmp_path), tables=("lineitem",), chunks=chunks, shard="shard0"
    )
    owned = li.join(
        chunks.filter(F.col("shard") == "shard0"),
        (li.l_orderkey >= F.col("min_key")) & (li.l_orderkey < F.col("max_key")),
        "left_semi",
    ).count()
    assert report.tables["lineitem"] == owned < li.count()


def test_select_sync_mode():
    """coordinator/utils_test.go truth table."""
    import pytest

    # checkpoint still within retained window -> incr
    assert select_sync_mode(100, 50, 200) == "incr"
    # boundary: checkpoint == oldest retained -> incr (no hole yet)
    assert select_sync_mode(50, 50, 200) == "incr"
    # checkpoint == newest -> incr (caught up)
    assert select_sync_mode(200, 50, 200) == "incr"
    # checkpoint older than the oldest retained entry (hole) -> all
    assert select_sync_mode(40, 50, 200) == "all"
    # no checkpoint -> all
    assert select_sync_mode(None, 50, 200) == "all"
    # checkpoint beyond the source's newest -> refuse
    with pytest.raises(ValueError, match="newer than the source"):
        select_sync_mode(300, 50, 200)


def test_sync_all_end_state(spark, sf_dir, tmp_path):
    """Mode 'all': snapshot + catch-up converges to the batch truth."""
    from mongoshake_spark.operators import merge

    feed = str(tmp_path / "feed")
    write_replay_feed(spark, sf_dir, feed, batch_rows=256)
    out = sync_all(
        spark,
        sf_dir,
        feed,
        str(tmp_path / "snap"),
        str(tmp_path / "stream_target"),
        str(tmp_path / "ckpt"),
    )
    assert out["snapshot_rows"] > 0
    got = {
        r["user_id"]: r["value"]
        for r in merge.visible(
            spark.read.parquet(str(tmp_path / "stream_target"))
        ).collect()
    }
    exp = {
        r["user_id"]: r["value"]
        for r in merge.last_writer_wins(
            oplog_view(load_table(spark, sf_dir, "events"))
        ).collect()
    }
    assert got == exp


def test_tunnel_roundtrip(spark, sf_dir, tmp_path):
    """S8/S9/S12: encode -> file tunnel -> decode preserves rows and
    shard routing keeps each ns on one shard (Q9's contract)."""
    oplog = oplog_view(load_table(spark, sf_dir, "events"))
    path = str(tmp_path / "tunnel")
    write_file_tunnel(oplog, path)
    back = read_file_tunnel(spark, path)
    assert back.count() == oplog.count()
    a = {r["id"]: (r["op"], r["ns"], r["value"]) for r in oplog.collect()}
    b = {r["id"]: (r["op"], r["ns"], r["value"]) for r in back.collect()}
    assert a == b
    shards = (
        encode_frames(oplog)
        .select("shard", F.get_json_object("value", "$.ns").alias("ns"))
        .groupBy("ns")
        .agg(F.countDistinct("shard").alias("n"))
        .collect()
    )
    assert all(r["n"] == 1 for r in shards)


def test_split_corrupt_frames(spark):
    from mongoshake_spark.sources.tunnel import split_corrupt_frames

    frames = spark.createDataFrame(
        [
            (0, '{"id": 1, "op": "i", "ns": "a.b"}'),
            (1, "NOT JSON {{{"),
            (0, '{"id": 2, "op": "d", "ns": "a.b"}'),
        ],
        "shard int, value string",
    )
    good, corrupt = split_corrupt_frames(frames)
    assert sorted(r["id"] for r in good.collect()) == [1, 2]
    bad = corrupt.collect()
    assert len(bad) == 1 and bad[0]["value"] == "NOT JSON {{{"


def _wire_row(spark):
    """One fully-typed wire row with a tz-independent timestamp (built
    from epoch millis, so the Extended JSON $date is pinned exactly)."""
    return spark.createDataFrame(
        [(3, 1704164645678, 7, "u", "db.c", -0.25, '{"k":"v"}')],
        "id bigint, ms bigint, user_id bigint, op string, ns string, "
        "value double, o string",
    ).select(
        "id",
        F.timestamp_millis(F.col("ms")).alias("ts"),
        "user_id",
        "op",
        "ns",
        "value",
        "o",
    )


def test_tunnel_canonical_extended_json(spark):
    """tunnel.message = json with canonical_extended_json format
    (tunnel/kafka_writer.go:147): typed fields carry their Extended JSON
    v2 canonical wrappers, and decode restores native types exactly (at
    the codec's millisecond timestamp precision)."""
    from mongoshake_spark.sources.tunnel import decode_ext_frames, encode_frames

    df = _wire_row(spark)
    enc = encode_frames(df, message="canonical_extended_json")
    frame = enc.collect()[0]["value"]
    assert frame == (
        '{"id":{"$numberLong":"3"},'
        '"ts":{"$date":{"$numberLong":"1704164645678"}},'
        '"user_id":{"$numberLong":"7"},'
        '"op":"u","ns":"db.c",'
        '"value":{"$numberDouble":"-0.25"},'
        '"o":"{\\"k\\":\\"v\\"}"}'
    )
    back = decode_ext_frames(enc).collect()[0]
    orig = df.collect()[0]
    assert (back["id"], back["user_id"], back["op"], back["ns"]) == (
        orig["id"],
        orig["user_id"],
        orig["op"],
        orig["ns"],
    )
    assert back["value"] == orig["value"] and back["o"] == orig["o"]
    assert back["ts"] == orig["ts"]  # source is millis-precise


def test_tunnel_raw_tmessage_wire(spark):
    """tunnel.message = raw: the frame is a byte-exact TMessage block
    (tunnel/tunnel.go:61-72) — the Python reference codec in
    socket_tunnel parses it, the checksum is XOR-of-crc32, the tag
    carries MsgPersistent (kafka_writer.go:118) — and the DataFrame-side
    decoder CRC-rejects flipped bytes into the dead-letter side."""
    import json as _json
    import zlib

    from mongoshake_spark.sources.socket_tunnel import decode_tmessage
    from mongoshake_spark.sources.tunnel import (
        MSG_PERSISTENT,
        decode_raw_frames,
        encode_frames,
    )

    df = _wire_row(spark)
    enc = encode_frames(df, message="raw")
    raw = bytes(enc.collect()[0]["value"])
    msg = decode_tmessage(raw)
    assert msg["tag"] == MSG_PERSISTENT and msg["compress"] == 0
    assert len(msg["logs"]) == 1
    assert msg["checksum"] == zlib.crc32(msg["logs"][0])
    doc = _json.loads(msg["logs"][0])
    assert doc["id"] == 3 and doc["op"] == "u" and doc["value"] == -0.25
    good, corrupt = decode_raw_frames(enc)
    assert corrupt.count() == 0
    g = good.collect()[0]
    assert (g["id"], g["op"], g["ns"], g["value"]) == (3, "u", "db.c", -0.25)
    # flip the last payload byte -> CRC mismatch -> dead-letter side
    flipped = enc.select(
        "shard",
        F.concat(
            F.col("value").substr(F.lit(1), F.length("value") - 1),
            F.lit(bytes([raw[-1] ^ 0xFF])),
        ).alias("value"),
    )
    g2, c2 = decode_raw_frames(flipped)
    assert g2.count() == 0 and c2.count() == 1


def test_encode_frames_rejects_unknown_format(spark):
    import pytest

    from mongoshake_spark.sources.tunnel import encode_frames

    with pytest.raises(ValueError, match="tunnel message format"):
        encode_frames(_wire_row(spark), message="avro")


def test_multimodal_decode_plumbing(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    media = multimodal.attach_fake_media(docs)
    assert dict(media.dtypes)["payload"] == "binary"
    decoded = multimodal.decode_media(media, decoder="fake")
    joined = decoded.join(media.select("doc_id", "meta"), "doc_id")
    bad = joined.filter(
        (F.col("width") != F.col("meta.declared_w"))
        | (F.col("height") != F.col("meta.declared_h"))
    ).count()
    assert bad == 0
    assert decoded.count() == docs.count()


def test_multimodal_unavailable_decoder_raises_clearly(spark, sf_dir):
    import pytest

    try:
        import PIL  # noqa: F401
    except ImportError:
        pass
    else:
        pytest.skip("Pillow present — the gated error path is not reachable")
    docs = load_table(spark, sf_dir, "documents").limit(2)
    media = multimodal.attach_fake_media(docs)
    with pytest.raises(Exception, match="NotImplementedError|needs Pillow"):
        multimodal.decode_media(media, decoder="pil").collect()


def test_multimodal_unknown_decoder_raises(spark, sf_dir):
    import pytest

    docs = load_table(spark, sf_dir, "documents").limit(2)
    media = multimodal.attach_fake_media(docs)
    with pytest.raises(Exception, match="NotImplementedError|unknown"):
        multimodal.decode_media(media, decoder="no_such").collect()


def test_multimodal_pil_real_decode(spark):
    """Cluster-only (importorskip): a REAL PNG decodes through the same
    mapInPandas plumbing the fake path uses — proving the decoder swap
    is the only difference."""
    import io

    import pytest

    Image = pytest.importorskip("PIL.Image")

    buf = io.BytesIO()
    Image.new("RGB", (37, 21)).save(buf, format="PNG")
    media = spark.createDataFrame(
        [(1, "image/png", bytearray(buf.getvalue()), ("f.png", 37, 21))],
        multimodal.MEDIA_SCHEMA,
    )
    row = multimodal.decode_media(media, decoder="pil").collect()[0]
    assert (row["width"], row["height"], row["channels"]) == (37, 21, 3)


def test_multimodal_soundfile_real_decode(spark):
    """Cluster-only (importorskip): a real WAV through the same plumbing;
    audio maps onto (frames, samplerate, channels)."""
    import io

    import pytest

    sf_mod = pytest.importorskip("soundfile")
    np = pytest.importorskip("numpy")

    buf = io.BytesIO()
    sf_mod.write(buf, np.zeros((800, 2)), 16000, format="WAV")
    media = spark.createDataFrame(
        [(1, "audio/wav", bytearray(buf.getvalue()), ("f.wav", 0, 0))],
        multimodal.MEDIA_SCHEMA,
    )
    row = multimodal.decode_media(media, decoder="soundfile").collect()[0]
    assert (row["width"], row["height"], row["channels"]) == (800, 16000, 2)


def test_resize_plan(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    decoded = multimodal.decode_media(multimodal.attach_fake_media(docs))
    plan = multimodal.resize_plan(decoded, max_side=256).collect()
    for r in plan:
        assert max(r["target_w"], r["target_h"]) <= 256
        if max(r["width"], r["height"]) <= 256:
            assert (r["target_w"], r["target_h"]) == (r["width"], r["height"])


def _make_png(px, color_type, filters=None):
    """Minimal in-test PNG encoder (8-bit, non-interlaced): applies the
    requested PNG filter type per scanline so the decoder's unfilter paths
    are all exercised against independently-encoded bytes."""
    import struct
    import zlib

    import numpy as np

    px = np.asarray(px, dtype=np.int64)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    flat = px.reshape(h, w * ch)
    filters = filters or [0] * h
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.int64)
    for y in range(h):
        ft = filters[y]
        cur = flat[y]
        enc = np.empty(w * ch, dtype=np.int64)
        for i in range(w * ch):
            a = cur[i - ch] if i >= ch else 0
            b = prev[i]
            c = prev[i - ch] if i >= ch else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            enc[i] = (cur[i] - pred) & 0xFF
        raw.append(ft)
        raw.extend(enc.astype(np.uint8).tobytes())
        prev = cur

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_png_pixel_decode_all_filters():
    """The stdlib PNG pixel decoder recovers the exact pixel matrix
    through every scanline filter type (None/Sub/Up/Average/Paeth) for
    gray and RGB color types."""
    import numpy as np

    rng = np.random.default_rng(7)
    gray = rng.integers(0, 256, size=(5, 11), dtype=np.int64)
    payload = _make_png(gray, color_type=0, filters=[0, 1, 2, 3, 4])
    got = multimodal._png_gray_pixels(payload)
    assert np.array_equal(got, gray.astype(np.float64))

    rgb = rng.integers(0, 256, size=(5, 7, 3), dtype=np.int64)
    payload = _make_png(rgb, color_type=2, filters=[4, 3, 2, 1, 0])
    got = multimodal._png_gray_pixels(payload)
    want = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
    assert np.allclose(got, want)


def test_phash_real_png_dhash_bits(spark):
    """REAL-pixel perceptual hash: an 8x9 gray PNG (resize is identity)
    hashes to the hand-computed dHash; a one-cell brightness bump flips
    exactly the adjacent difference bits; an inverted image is far away.
    Runs through the same Spark mapInPandas plumbing as the fixture path."""
    import numpy as np

    rng = np.random.default_rng(11)
    base = rng.integers(0, 256, size=(8, 9), dtype=np.int64)
    base[3, 4], base[3, 5] = 200, 100  # strictly unequal adjacent pair
    # hand-computed expectation (independent of the operator's numpy path)
    expect = 0
    for r in range(8):
        for c in range(8):
            if base[r, c] > base[r, c + 1]:
                expect |= 1 << (r * 8 + c)
    if expect >= 1 << 63:
        expect -= 1 << 64

    # swapping the unequal pair flips bit (3,4) for certain and can touch
    # only its two neighbors (3,3) and (3,5): Hamming in [1, 3]
    bump = base.copy()
    bump[3, 4], bump[3, 5] = base[3, 5], base[3, 4]
    inverted = 255 - base

    media = spark.createDataFrame(
        [
            (1, "image/png", bytearray(_make_png(base, 0)), ("a.png", 9, 8)),
            (2, "image/png", bytearray(_make_png(bump, 0)), ("b.png", 9, 8)),
            (3, "image/png", bytearray(_make_png(inverted, 0)), ("c.png", 9, 8)),
        ],
        multimodal.MEDIA_SCHEMA,
    )
    got = {
        r["doc_id"]: r["phash"]
        for r in multimodal.phash64(media, decoder="png").collect()
    }
    assert got[1] == expect
    ham12 = bin((got[1] ^ got[2]) & ((1 << 64) - 1)).count("1")
    ham13 = bin((got[1] ^ got[3]) & ((1 << 64) - 1)).count("1")
    assert 1 <= ham12 <= 3
    assert ham13 > 20  # inversion flips (almost) every strict difference


def test_phash_wav_envelope(spark):
    """Audio dHash: the 1-D energy-envelope fingerprint is identical for a
    bit-identical re-render, near for a mildly noised copy, far for a
    different waveform."""
    import io
    import wave

    import numpy as np

    def wav_bytes(samples):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(8000)
            w.writeframes(np.asarray(samples, dtype="<i2").tobytes())
        return buf.getvalue()

    t = np.arange(4000)
    tone = (3000 * np.sin(t / 20.0) * (1 + 0.5 * np.sin(t / 400.0))).astype(int)
    noised = tone + np.random.default_rng(3).integers(-30, 31, size=t.size)
    other = (3000 * np.sign(np.sin(t / 7.0)) * np.exp(-t / 2000.0)).astype(int)

    media = spark.createDataFrame(
        [
            (1, "audio/wav", bytearray(wav_bytes(tone)), ("a.wav", 0, 0)),
            (2, "audio/wav", bytearray(wav_bytes(tone)), ("b.wav", 0, 0)),
            (3, "audio/wav", bytearray(wav_bytes(noised)), ("c.wav", 0, 0)),
            (4, "audio/wav", bytearray(wav_bytes(other)), ("d.wav", 0, 0)),
        ],
        multimodal.MEDIA_SCHEMA,
    )
    got = {
        r["doc_id"]: r["phash"]
        for r in multimodal.phash64(media, decoder="wav").collect()
    }

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert got[1] == got[2]
    assert ham(got[1], got[3]) <= 3
    assert ham(got[1], got[4]) > 10


def test_phash_pairs_band_join_equals_bruteforce(spark, sf_dir):
    """The 4x16-bit Hamming-band candidate join returns EXACTLY the
    brute-force pair set at max_hamming <= 3 (pigeonhole), with and
    without the hot-bucket cap."""
    docs = load_table(spark, sf_dir, "documents").limit(80)
    media = multimodal.attach_fake_media(docs)
    hashes = {
        r["doc_id"]: r["phash"] for r in multimodal.phash64(media).collect()
    }
    ids = sorted(hashes)
    want = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if bin((hashes[a] ^ hashes[b]) & ((1 << 64) - 1)).count("1") <= 3:
                want.add((a, b))
    for cap in (None, 10000):
        got = {
            (r["doc_a"], r["doc_b"])
            for r in multimodal.phash_pairs(media, bucket_cap=cap).collect()
        }
        assert got == want


def test_phash_pil_parity_with_stdlib_png(spark):
    """Cluster-only (importorskip): Pillow and the stdlib PNG path produce
    the SAME perceptual hash for a grayscale PNG (no luma rounding in
    play), proving the decoder swap changes nothing downstream."""
    import pytest

    pytest.importorskip("PIL.Image")
    import numpy as np

    gray = np.random.default_rng(5).integers(0, 256, size=(32, 48), dtype=np.int64)
    media = spark.createDataFrame(
        [(1, "image/png", bytearray(_make_png(gray, 0)), ("g.png", 48, 32))],
        multimodal.MEDIA_SCHEMA,
    )
    a = multimodal.phash64(media, decoder="png").collect()[0]["phash"]
    b = multimodal.phash64(media, decoder="pil").collect()[0]["phash"]
    assert a == b


def test_index_sync_spec_emission(spark, sf_dir, tmp_path):
    """W12 (doc_syncer.go:206-287): the emitted layout spec must strip
    ns/v/background, skip single-field _id indexes, keep compound indexes
    containing _id, append the fresh background flag, and route the ns
    transform."""
    import json

    from mongoshake_spark.plans.full_sync import (
        build_index_specs,
        emit_index_specs,
        full_sync,
    )

    fixture = {
        "tpch.orders": [
            {"v": 2, "key": {"_id": 1}, "name": "_id_", "ns": "tpch.orders"},
            {"v": 2, "key": {"o_custkey": 1}, "name": "cust_1",
             "ns": "tpch.orders", "background": True},
            {"v": 2, "key": {"o_orderdate": -1, "_id": 1}, "name": "date_id",
             "ns": "tpch.orders", "unique": True},
        ],
        "tpch.nation": [
            {"v": 2, "key": {"_id": 1}, "name": "_id_", "ns": "tpch.nation"},
        ],
    }
    specs = build_index_specs(
        fixture, ns_transform=lambda ns: ns.replace("tpch.", "tgt."), background=False
    )
    assert specs == {
        "tgt.orders": [
            {"key": {"o_custkey": 1}, "name": "cust_1", "background": False},
            {"key": {"o_orderdate": -1, "_id": 1}, "name": "date_id",
             "unique": True, "background": False},
        ]
    }  # nation had only the _id index -> no emission at all

    # end-to-end through full_sync: spec lands next to the table data
    full_sync(
        spark, sf_dir, str(tmp_path), tables=("orders",),
        index_map={"tpch.orders": fixture["tpch.orders"]},
    )
    with open(tmp_path / "orders" / "_indexes.json") as f:
        emitted = json.load(f)
    assert [c["createIndexes"] for c in emitted] == ["orders", "orders"]
    assert emitted[0]["indexes"][0]["name"] == "cust_1"
    assert "ns" not in emitted[0]["indexes"][0]
    assert "v" not in emitted[0]["indexes"][0]
    # field order of the key doc is preserved (BSON ordering contract)
    assert list(emitted[1]["indexes"][0]["key"]) == ["o_orderdate", "_id"]
    _ = emit_index_specs  # imported for API surface


def test_full_sync_markers_work_on_hadoop_uris(spark, sf_dir, tmp_path):
    """ADVICE round-4: markers used to be written with local open()
    against target_root — writer.parquet accepts any Hadoop URI, so a
    sync to an hdfs://s3a:// target crashed right after the first
    table's commit. A 'file:' URI exercises the same non-local-path code
    path (os.path.isfile/open both fail on it) through the Hadoop FS
    API: sync, resume, and the marker files must all work."""
    root = "file:" + str(tmp_path / "snap")
    tables = ("region", "nation")
    first = full_sync(spark, sf_dir, root, tables=tables)
    assert (tmp_path / "snap" / "region" / "_sync_report.json").is_file()
    second = full_sync(spark, sf_dir, root, tables=tables, resume=True)
    assert second.tables == first.tables


def test_split_corrupt_ext_frames(spark):
    """canonical_extended_json consumer: malformed frames (bad JSON, or
    valid JSON missing the required wrapped field) go to the dead-letter
    side; good frames decode to native types."""
    from mongoshake_spark.sources.tunnel import (
        encode_frames,
        split_corrupt_ext_frames,
    )

    good_frames = encode_frames(_wire_row(spark), message="canonical_extended_json")
    bad = spark.createDataFrame(
        [(0, "NOT JSON {{{"), (1, '{"op":"i"}')],
        "shard int, value string",
    )
    frames = good_frames.unionByName(bad)
    good, corrupt = split_corrupt_ext_frames(frames)
    g = good.collect()
    assert len(g) == 1 and g[0]["id"] == 3 and g[0]["value"] == -0.25
    assert corrupt.count() == 2


def test_decode_raw_frames_truncated_frame_dead_letters(spark):
    """A frame shorter than the TMessage header parses to NULL fields;
    the NULL predicate must not make the row vanish from BOTH legs —
    conservation: every input frame lands in exactly one leg."""
    from mongoshake_spark.sources.tunnel import decode_raw_frames, encode_frames

    ok_frames = encode_frames(_wire_row(spark), message="raw")
    stub = spark.createDataFrame(
        [(0, bytes([1, 2, 3, 4]))], "shard int, value binary"
    )
    frames = ok_frames.unionByName(stub)
    good, corrupt = decode_raw_frames(frames)
    assert good.count() == 1 and corrupt.count() == 1


def test_dump_file_roundtrip_and_filestat(spark, tmp_path):
    """Byte-exact reference file tunnel (tunnel/file_writer.go): write a
    dump.data, read it back through the PARALLEL Spark reader (one task
    per file), verify CRC and shard routing, and check the filestat-tool
    analog's histogram. A flipped payload byte flags crc_ok=false on
    that block only; a bad file magic is a hard error."""
    import json as _json

    from mongoshake_spark.sources.file_dump import (
        FILE_MAGIC,
        MSG_PERSISTENT,
        MSG_STORAGE_BACKEND,
        dump_stats,
        parse_dump_bytes,
        read_dump_files,
        write_dump_file,
    )

    logs0 = [_json.dumps({"id": i, "op": "i"}).encode() for i in range(3)]
    logs1 = [_json.dumps({"id": 9, "op": "d"}).encode()]
    path = str(tmp_path / "dump.data")
    n = write_dump_file(path, [(logs0, 0), (logs1, 5)])
    assert n == 4
    st = dump_stats(path)
    assert st["magic"] == f"{FILE_MAGIC:x}" and st["protocol"] == 1
    assert st["logs"] == 4 and st["blocks"] == 2
    assert st["worker"] == [3, 0, 0, 0, 0, 1]  # trailing zeros trimmed
    header, blocks = parse_dump_bytes(open(path, "rb").read())
    assert all(b["crc_ok"] for b in blocks)
    assert blocks[0]["tag"] & MSG_PERSISTENT and blocks[0]["tag"] & MSG_STORAGE_BACKEND
    rows = read_dump_files(spark, path).collect()
    assert sorted((r["shard"], bytes(r["value"])) for r in rows) == sorted(
        [(0, b) for b in logs0] + [(5, b) for b in logs1]
    )
    assert all(r["crc_ok"] for r in rows)
    # corrupt one payload byte -> that block's crc flags, magic errors stay hard
    data = bytearray(open(path, "rb").read())
    data[-1] ^= 0xFF
    _, blocks2 = parse_dump_bytes(bytes(data))
    assert [b["crc_ok"] for b in blocks2] == [True, False]
    data[0] ^= 0xFF
    try:
        parse_dump_bytes(bytes(data))
        raise AssertionError("bad file magic must raise")
    except ValueError as e:
        assert "magic" in str(e)


def test_dump_file_compressed_crc_covers_wire_bytes(spark, tmp_path):
    """The reference's module order is Compressor THEN ChecksumCalculator
    (collector/write_controller.go orderedModuleList): a compressed
    dump.data stores the cksum over the COMPRESSED log bytes. The parser
    must verify CRC on the wire bytes before decompressing — checking the
    decompressed logs would flag every real compressed dump corrupt and
    silently drop all rows for crc_ok-filtering consumers."""
    import json as _json

    from mongoshake_spark.sources.file_dump import (
        crc32_xor,
        parse_dump_bytes,
        read_dump_files,
        write_dump_file,
    )
    from mongoshake_spark.sources.socket_tunnel import (
        COMPRESS_GZIP,
        COMPRESS_ZLIB,
        _compress_one,
    )

    # varied lengths: equal-length payloads whose ids XOR to zero would
    # make the XOR-of-crc32 cancel (crc32 is GF(2)-linear) and the
    # plain-vs-compressed cksum inequality below vacuous
    logs = [
        _json.dumps({"id": i, "op": "i", "pad": "x" * (40 + 7 * i)}).encode()
        for i in range(4)
    ]
    for comp in (COMPRESS_GZIP, COMPRESS_ZLIB):
        path = str(tmp_path / f"dump-{comp}.data")
        n = write_dump_file(path, [(logs, 1)], compressor=comp)
        assert n == 4
        raw = open(path, "rb").read()
        # the stored cksum equals the crc over the compressed bytes, not
        # the plaintext (the checksum-order contract itself)
        _, blocks = parse_dump_bytes(raw)
        assert blocks[0]["compress"] == comp
        assert blocks[0]["cksum"] == crc32_xor(
            [_compress_one(log, comp) for log in logs]
        )
        assert blocks[0]["cksum"] != crc32_xor(logs)
        assert blocks[0]["crc_ok"] is True
        assert blocks[0]["logs"] == logs  # decompressed payloads
        rows = read_dump_files(spark, path).collect()
        assert sorted(bytes(r["value"]) for r in rows) == sorted(logs)
        assert all(r["crc_ok"] for r in rows)
        # flip one wire byte -> crc flags the block; decompression is
        # skipped for flagged blocks (no decoder crash on corruption)
        bad = bytearray(raw)
        bad[-1] ^= 0xFF
        _, blocks2 = parse_dump_bytes(bytes(bad))
        assert blocks2[0]["crc_ok"] is False


def test_cli_filestat_flag(tmp_path, capsys):
    import json as _json

    from mongoshake_spark.__main__ import main
    from mongoshake_spark.sources.file_dump import write_dump_file

    path = str(tmp_path / "d.data")
    write_dump_file(path, [([b"abc", b"de"], 2)])
    assert main(["--filestat", path]) == 0
    out = _json.loads(capsys.readouterr().out)
    assert out["logs"] == 2 and out["worker"] == [0, 0, 2]
    assert main(["--filestat", str(tmp_path / "missing")]) == 2


def test_decode_raw_frames_multi_log_tmessage(spark):
    """Interop: a reference collector packs MULTIPLE logs per raw
    TMessage (kafka_writer.go raw mode batches message.RawLogs). The
    DataFrame decoder must walk the size-prefixed section, verify the
    XOR-of-crc32 over all logs, and emit one row per log; flipping any
    payload byte dead-letters the WHOLE frame (frame is the CRC unit)."""
    import json as _json

    from mongoshake_spark.sources.socket_tunnel import encode_tmessage
    from mongoshake_spark.sources.tunnel import decode_raw_frames

    logs = [
        _json.dumps({"id": i, "op": "i", "ns": "db.c", "value": i / 4}).encode()
        for i in range(5)
    ]
    block = encode_tmessage(logs, shard=3)
    frames = spark.createDataFrame([(3, block)], "shard int, value binary")
    good, corrupt = decode_raw_frames(
        frames, "id bigint, op string, ns string, value double"
    )
    rows = sorted((r["id"], r["value"]) for r in good.collect())
    assert rows == [(i, i / 4) for i in range(5)]
    assert corrupt.count() == 0
    flipped = bytearray(block)
    flipped[25] ^= 0xFF  # inside the first log's payload
    bad = spark.createDataFrame([(3, bytes(flipped))], "shard int, value binary")
    g2, c2 = decode_raw_frames(bad, "id bigint, op string, ns string, value double")
    assert g2.count() == 0 and c2.count() == 1
    # absurd claimed log count is corrupt by construction, not an OOM
    from mongoshake_spark.sources.tunnel import MAX_LOGS_PER_FRAME
    import struct

    huge = bytearray(block)
    huge[16:20] = struct.pack(">I", MAX_LOGS_PER_FRAME + 1)
    b3 = spark.createDataFrame([(3, bytes(huge))], "shard int, value binary")
    g3, c3 = decode_raw_frames(b3, "id bigint, op string, ns string, value double")
    assert g3.count() == 0 and c3.count() == 1


def test_infer_payload_schema_events_and_nested(spark, sf_dir):
    """tools/mongodb-schema.py gap: schema inference over the JSON
    payload column. The events fixture's props column infers its real
    key set; a synthetic nested/mixed corpus merges schemas across rows
    (union of keys, widened types) because per-partition schemas merge
    associatively; the typed parse round-trips values."""
    import pytest
    from pyspark.sql import functions as F

    from mongoshake_spark.sources.tables import infer_payload_schema, load_table

    ev = load_table(spark, sf_dir, "events")
    sch = infer_payload_schema(ev, "props")
    assert "k" in sch.fieldNames()
    typed = ev.withColumn("doc", F.from_json(F.col("props"), sch))
    row = typed.filter(F.col("props").isNotNull()).select("props", "doc").first()
    if row is not None and row["doc"] is not None:
        import json as _json

        assert row["doc"]["k"] == _json.loads(row["props"]).get("k")

    docs = spark.createDataFrame(
        [
            (1, '{"a": 1, "nested": {"x": "s"}}'),
            (2, '{"a": 2.5, "b": [1, 2]}'),
            (3, None),
        ],
        "id long, o string",
    )
    sch2 = infer_payload_schema(docs, "o")
    names = set(sch2.fieldNames())
    assert {"a", "b", "nested"} <= names
    # int + double merge widens to double
    assert sch2["a"].dataType.typeName() == "double"
    assert sch2["nested"].dataType.typeName() == "struct"
    with pytest.raises(ValueError):
        infer_payload_schema(docs, "o", sample_ratio=0)


def _minimal_png(w: int, h: int, color_type: int = 2) -> bytes:
    """Build a real, spec-valid PNG (stdlib only): signature, IHDR with
    CRC, one zlib IDAT of zero pixels, IEND."""
    import struct
    import zlib

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    channels = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + b"\x00" * (w * channels) for _ in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_multimodal_png_wav_stdlib_decoders(spark):
    """Always-on REAL decode coverage (no importorskip): genuine PNG and
    WAV bytes go through the same mapInPandas plumbing as 'fake'/'pil' —
    PNG width/height/channels from the CRC-verified IHDR, WAV
    frames/samplerate/channels via the stdlib wave module; a corrupted
    IHDR fails loudly instead of returning garbage metadata."""
    import io
    import wave

    import pytest

    png = _minimal_png(37, 21, color_type=2)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(2)
        wf.setsampwidth(2)
        wf.setframerate(16000)
        wf.writeframes(b"\x00\x00\x00\x00" * 800)
    media = spark.createDataFrame(
        [
            (1, "image/png", bytearray(png), ("f.png", 37, 21)),
        ],
        multimodal.MEDIA_SCHEMA,
    )
    row = multimodal.decode_media(media, decoder="png").collect()[0]
    assert (row["width"], row["height"], row["channels"]) == (37, 21, 3)
    # grayscale+alpha variant: channels follow the color type
    media_ga = spark.createDataFrame(
        [(2, "image/png", bytearray(_minimal_png(5, 4, color_type=4)), ("g.png", 5, 4))],
        multimodal.MEDIA_SCHEMA,
    )
    row_ga = multimodal.decode_media(media_ga, decoder="png").collect()[0]
    assert (row_ga["width"], row_ga["height"], row_ga["channels"]) == (5, 4, 2)
    wav_media = spark.createDataFrame(
        [(3, "audio/wav", bytearray(buf.getvalue()), ("f.wav", 0, 0))],
        multimodal.MEDIA_SCHEMA,
    )
    wrow = multimodal.decode_media(wav_media, decoder="wav").collect()[0]
    assert (wrow["width"], wrow["height"], wrow["channels"]) == (800, 16000, 2)
    # corrupt IHDR crc -> loud failure, not silent garbage
    bad = bytearray(png)
    bad[17] ^= 0xFF
    bad_media = spark.createDataFrame(
        [(4, "image/png", bad, ("b.png", 0, 0))], multimodal.MEDIA_SCHEMA
    )
    with pytest.raises(Exception, match="crc mismatch|bad signature"):
        multimodal.decode_media(bad_media, decoder="png").collect()


def test_decode_raw_frames_compressed_frame_dead_letters(spark):
    """A raw TMessage a reference collector wrote WITH compression
    passes the CRC (computed over the wire bytes) but cannot be decoded
    by the pure-Catalyst raw path — it must land in the CORRUPT leg
    where the operator sees the whole frame, never as all-NULL rows in
    the good leg."""
    import json as _json
    import struct
    import zlib

    from mongoshake_spark.sources.socket_tunnel import _compress_one
    from mongoshake_spark.sources.tunnel import decode_raw_frames

    raw_log = _json.dumps(
        {"id": 1, "ts": "2024-01-01 00:00:00", "user_id": 1, "op": "i",
         "ns": "db.c", "value": 1.0, "o": "{}"}
    ).encode()
    wire = _compress_one(raw_log, 1)  # gzip, reference compressor id 1
    frame = struct.pack(
        ">IIIII", zlib.crc32(wire) & 0xFFFFFFFF, 0, 0, 1, 1
    ) + struct.pack(">I", len(wire)) + wire
    frames = spark.createDataFrame([(0, bytearray(frame))],
                                   "shard int, value binary")
    good, corrupt = decode_raw_frames(frames)
    assert good.count() == 0
    assert corrupt.count() == 1


def test_video_phash_pairs_frame_vote(spark):
    """Frame-vote video dedup: identical payloads share every sampled
    frame; distinct payloads share none; every_k sampling halves the
    hashed frames (the skipped ones are never decoded); a real decoder
    request fails loudly (no video lib in this container)."""
    import pytest

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "delta five")],
        "doc_id bigint, text string",
    )
    media = multimodal.attach_fake_media(docs).withColumn(
        "n_frames", F.lit(6).cast("int")
    )
    fp = multimodal.frame_phashes(media, "n_frames").collect()
    assert len(fp) == 18  # 3 videos x 6 frames
    by_doc = {}
    for r in fp:
        by_doc.setdefault(r["doc_id"], {})[r["frame"]] = r["phash"]
    assert by_doc[1] == by_doc[2]  # same payload -> identical sequence
    assert by_doc[1] != by_doc[3]
    assert len(set(by_doc[1].values())) > 1  # frames hash apart

    pairs = multimodal.video_phash_pairs(media, "n_frames", min_shared=2).collect()
    assert [(r["video_a"], r["video_b"], r["n_shared_frames"]) for r in pairs] == [
        (1, 2, 6)
    ]

    sampled = multimodal.frame_phashes(media, "n_frames", every_k=2).collect()
    assert len(sampled) == 9  # frames 0, 2, 4 only
    assert {r["frame"] for r in sampled} == {0, 2, 4}

    with pytest.raises(NotImplementedError, match="unknown"):
        multimodal.frame_phashes(media, "n_frames", decoder="unknown-codec")


def test_frame_phashes_pyav_gate(spark):
    """Absent the av library, decoder='pyav' fails at PLAN time with the
    install hint (not minutes into the job on an executor); unknown
    decoder names get the distinct 'unknown' error. Skips on a real
    media cluster where av exists (the real-decode test covers it)."""
    import pytest

    try:
        import av  # noqa: F401

        pytest.skip("av installed — gate n/a, real-decode test covers pyav")
    except ImportError:
        pass
    docs = spark.createDataFrame([(1, "alpha")], "doc_id bigint, text string")
    media = multimodal.attach_fake_media(docs).withColumn(
        "n_frames", F.lit(3).cast("int")
    )
    with pytest.raises(NotImplementedError, match="pip install av"):
        multimodal.frame_phashes(media, "n_frames", decoder="pyav")


def test_frame_phashes_pyav_real_decode(spark):
    """Cluster-only (importorskip): a REAL tiny video — synthesized
    in-memory with av itself (mpeg4, 4 gradient frames whose brightness
    shifts per frame) — decodes through the SAME mapInPandas plumbing as
    the fixture path: one row per sampled frame, identical payloads give
    identical frame sequences, every_k skips the pixel conversion."""
    import io

    import pytest

    av = pytest.importorskip("av")
    np = pytest.importorskip("numpy")

    buf = io.BytesIO()
    with av.open(buf, "w", format="mp4") as container:
        stream = container.add_stream("mpeg4", rate=4)
        stream.width, stream.height = 64, 48
        stream.pix_fmt = "yuv420p"
        for f in range(4):
            px = np.tile(
                np.linspace(0, 255, 64, dtype=np.uint8), (48, 1)
            )
            frame = av.VideoFrame.from_ndarray(
                np.roll(px, f * 16, axis=1), format="gray"
            )
            for packet in stream.encode(frame.reformat(format="yuv420p")):
                container.mux(packet)
        for packet in stream.encode():
            container.mux(packet)
    payload = buf.getvalue()

    media = spark.createDataFrame(
        [(1, bytearray(payload), 4), (2, bytearray(payload), 4)],
        "doc_id bigint, payload binary, n_frames int",
    )
    rows = multimodal.frame_phashes(media, "n_frames", decoder="pyav").collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], {})[r["frame"]] = r["phash"]
    assert set(by_doc[1]) == {0, 1, 2, 3}
    assert by_doc[1] == by_doc[2]  # same payload -> identical sequence

    sampled = multimodal.frame_phashes(
        media, "n_frames", every_k=2, decoder="pyav"
    ).collect()
    assert {r["frame"] for r in sampled} == {0, 2}


def test_video_phash_pairs_frame_limit_guard(spark):
    """The packed frame id carries the SAMPLE ORDINAL (frame // every_k),
    so a long video is fine as long as its sampled count stays under
    VIDEO_FRAME_LIMIT — and the over-limit case raises loudly instead of
    silently colliding into the next doc_id's packed range."""
    import pytest
    from pyspark.errors import SparkRuntimeException

    lim = multimodal.VIDEO_FRAME_LIMIT
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma")],
        "doc_id bigint, text string",
    )
    # raw frame count way past the limit, but every_k keeps the ORDINAL
    # under it — this is the documented remedy and it must actually work
    long_media = multimodal.attach_fake_media(docs).withColumn(
        "n_frames", F.lit(lim + 8).cast("int")
    )
    ok = multimodal.video_phash_pairs(
        long_media, "n_frames", every_k=2, min_shared=2
    ).collect()
    assert [(r["video_a"], r["video_b"]) for r in ok] == [(1, 2)]

    # every_k=1 pushes ordinals to lim+7 -> loud failure, not collision
    with pytest.raises(SparkRuntimeException, match="VIDEO_FRAME_LIMIT"):
        multimodal.video_phash_pairs(
            long_media, "n_frames", every_k=1, min_shared=2
        ).collect()
