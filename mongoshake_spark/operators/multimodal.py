"""Multimodal column plumbing for the training-data pipeline.

Images/audio/video ride as opaque ``binary`` columns with typed metadata
structs. The Spark-side contract — schema, partitioning, Arrow batch shape,
UDF signatures — is real and tested. Decoders, in increasing dependency
weight: ``fake`` (deterministic fixture header, what the oracle queries
use), ``png`` and ``wav`` (REAL format parsing, stdlib-only — PNG
signature/IHDR with CRC check, RIFF via the ``wave`` module — always-on
in CI), and ``pil`` / ``soundfile`` (full pixel/sample decode,
availability-gated on their optional libraries for a real media
cluster).

Design: decode/feature-extract run as ``mapInPandas`` so each Arrow batch
moves binary payloads to Python exactly once; downstream filters/joins see
only the small typed metadata and can prune the binary column away (column
pruning keeps the scan from even reading the bytes when the query only
touches metadata).
"""

from __future__ import annotations

import struct as _struct

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id bigint, media_type string, payload binary, "
    "meta struct<filename:string,declared_w:int,declared_h:int>"
)

DECODED_SCHEMA = (
    "doc_id bigint, media_type string, width int, height int, channels int, "
    "n_bytes bigint, checksum bigint"
)


def attach_fake_media(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Test fixture builder: wrap each document's text bytes as a fake
    media payload with a deterministic 12-byte header
    (magic 'FMI0', width int32-be, height int32-be)."""
    payload = F.concat(
        F.lit(b"FMI0"),
        # width/height derived from doc_id so decode results are checkable
        F.expr("CAST(unhex(lpad(hex((doc_id % 64 + 1) * 16), 8, '0')) AS BINARY)"),
        F.expr("CAST(unhex(lpad(hex((doc_id % 48 + 1) * 16), 8, '0')) AS BINARY)"),
        F.encode(F.col(text_col), "utf-8"),
    )
    return docs.select(
        "doc_id",
        F.lit("image/fake").alias("media_type"),
        payload.alias("payload"),
        F.struct(
            F.concat(F.lit("doc_"), F.col("doc_id").cast("string")).alias("filename"),
            ((F.col("doc_id") % 64 + 1) * 16).cast("int").alias("declared_w"),
            ((F.col("doc_id") % 48 + 1) * 16).cast("int").alias("declared_h"),
        ).alias("meta"),
    )


def _decode_one(payload: bytes, decoder: str) -> tuple[int, int, int]:
    """Decode dispatch. ``fake`` parses the fixture header (the
    oracle-portable path — deterministic, library-free, what every
    registry query uses). ``pil`` and ``soundfile`` are the REAL
    decoders, availability-gated on their optional libraries: absent in
    this sandbox (tests importorskip them), present on a real media
    cluster, and everything around the dispatch — Arrow batching, schema,
    binary pruning — is identical either way."""
    if decoder == "fake":
        if payload[:4] != b"FMI0" or len(payload) < 12:
            raise ValueError("bad magic")
        w = _struct.unpack(">i", payload[4:8])[0]
        h = _struct.unpack(">i", payload[8:12])[0]
        return w, h, 3
    if decoder == "png":
        # REAL PNG parsing, stdlib-only: signature + IHDR chunk carry
        # width/height/color-type (ISO/IEC 15948 §5.6, §11.2.2); the
        # CRC of IHDR is verified so corrupt headers fail loudly. This
        # is the always-on CI path for real image bytes — 'pil' adds
        # full pixel decode when Pillow exists on the executors.
        if payload[:8] != b"\x89PNG\r\n\x1a\n" or len(payload) < 33:
            raise ValueError("png: bad signature")
        length = _struct.unpack(">I", payload[8:12])[0]
        if payload[12:16] != b"IHDR" or length != 13:
            raise ValueError("png: first chunk is not a 13-byte IHDR")
        import zlib as _zlib

        crc = _struct.unpack(">I", payload[29:33])[0]
        if _zlib.crc32(payload[12:29]) & 0xFFFFFFFF != crc:
            raise ValueError("png: IHDR crc mismatch")
        w, h = _struct.unpack(">II", payload[16:24])
        color_type = payload[25]
        channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
        if channels is None:
            raise ValueError(f"png: unknown color type {color_type}")
        return w, h, channels
    if decoder == "wav":
        # REAL WAV parsing via the stdlib wave module (RIFF fmt chunk):
        # same (frames, samplerate, channels) mapping as 'soundfile',
        # always-on in CI — 'soundfile' adds the non-RIFF formats.
        import io
        import wave as _wave

        with _wave.open(io.BytesIO(payload)) as snd:
            return snd.getnframes(), snd.getframerate(), snd.getnchannels()
    if decoder == "pil":
        try:
            from PIL import Image
        except ImportError as e:
            raise NotImplementedError(
                "decoder 'pil' needs Pillow on the executors "
                "(pip install Pillow); use decoder='fake' for the "
                "library-free fixture path"
            ) from e
        import io

        with Image.open(io.BytesIO(payload)) as img:
            return img.width, img.height, len(img.getbands())
    if decoder == "soundfile":
        try:
            import soundfile
        except ImportError as e:
            raise NotImplementedError(
                "decoder 'soundfile' needs soundfile on the executors "
                "(pip install soundfile); use decoder='fake' for the "
                "library-free fixture path"
            ) from e
        import io

        with soundfile.SoundFile(io.BytesIO(payload)) as snd:
            # audio maps onto the image-shaped schema: width=frames,
            # height=samplerate, channels=channels
            return snd.frames, snd.samplerate, snd.channels
    raise NotImplementedError(
        f"decoder {decoder!r}: unknown — 'fake', 'png', 'wav', 'pil', or "
        "'soundfile'"
    )


def decode_media(media: DataFrame, decoder: str = "fake") -> DataFrame:
    """Decode/feature-extract over Arrow batches (mapInPandas): emits typed
    metadata per payload; the binary column does not survive, so downstream
    stages never shuffle the heavy bytes."""
    import pandas as pd

    def batches(it):
        for pdf in it:
            rows = []
            for doc_id, mtype, payload in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                w, h, c = _decode_one(bytes(payload), decoder)
                rows.append(
                    (
                        doc_id,
                        mtype,
                        w,
                        h,
                        c,
                        len(payload),
                        sum(payload[:64]) % 1_000_000_007,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "media_type",
                    "width",
                    "height",
                    "channels",
                    "n_bytes",
                    "checksum",
                ],
            )

    return media.select("doc_id", "media_type", "payload").mapInPandas(
        batches, schema=DECODED_SCHEMA
    )


def resize_plan(decoded: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize planning is pure column math (no UDF): target dims preserving
    aspect ratio, capped at ``max_side``. The actual pixel resample would
    run in the same mapInPandas as decode_media."""
    scale = F.when(
        F.greatest("width", "height") > max_side,
        max_side / F.greatest("width", "height"),
    ).otherwise(F.lit(1.0))
    return decoded.select(
        "doc_id",
        "width",
        "height",
        F.floor(F.col("width") * scale).cast("int").alias("target_w"),
        F.floor(F.col("height") * scale).cast("int").alias("target_h"),
    )


def frame_sample_plan(n_frames_col: str, every_k: int = 10) -> F.Column:
    """Frame-sampling as an expression: indexes 0, k, 2k… bounded by the
    frame count in ``n_frames_col`` — `sequence` stays JVM-side; the
    decoder fetches only the listed frames. The column must hold a REAL
    frame count (from decoded metadata) — there is deliberately no
    default, because any byte-length stand-in would silently produce
    indexes derived from payload size."""
    n = F.col(n_frames_col).cast("int")
    return F.when(n > 0, F.sequence(F.lit(0), n - 1, F.lit(every_k))).otherwise(
        F.array().cast("array<int>")
    )


FEATURE_DIM = 16
FEATURE_MOD = 997


def extract_features(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Feature extraction over Arrow batches (mapInPandas): payload bytes →
    fixed-``dim`` ``array<float>`` embedding, the pipeline link from media
    columns into the ANN/similarity operators.

    The REAL extractor (a vision/audio model forward pass) is stubbed like
    the decoder; the fake is chosen for cross-engine checkability, not
    realism: the payload body (after the 12-byte fixture header) is hashed
    with the dialect-portable polynomial hash (functions/texthash — the
    same integers DuckDB computes from the source text), then expanded to
    ``dim`` values ``(h*(2j+1) + 7919*j) mod 997`` — integral floats, so
    an oracle value-compares the vectors exactly. The plumbing under it is
    the production shape: payload bytes cross to Python once per Arrow
    batch, the output carries only (doc_id, features), and the binary is
    pruned from every downstream stage.
    """
    import pandas as pd

    from mongoshake_spark.functions.texthash import MOD

    def batches(it):
        for pdf in it:
            ids, feats = [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                body = bytes(payload)[12:].decode("utf-8")
                h = 0
                for ch in body:
                    h = (h * 31 + ord(ch)) % MOD
                ids.append(doc_id)
                feats.append(
                    [float((h * (2 * j + 1) + 7919 * j) % FEATURE_MOD) for j in range(dim)]
                )
            yield pd.DataFrame({"doc_id": ids, "features": feats})

    return media.select("doc_id", "payload").mapInPandas(
        batches, schema="doc_id bigint, features array<float>"
    )


# ---------------------------------------------------------------------------
# Perceptual hashing — content-level media near-dup (the pipeline-brief
# dimension the metadata/decode operators above do not cover: two
# re-encodes of the same photo share no bytes and no checksum, but their
# perceptual hashes differ by a few bits). The fingerprint is dHash
# (difference hash): grayscale -> mean-pool to an 8x9 grid -> 64 bits,
# bit (r*8+c) set iff grid[r][c] > grid[r][c+1]. Near-dup pairs then
# reuse the ENTIRE 64-bit SimHash Hamming-band machinery
# (functions/dedup.simhash_band_keys / simhash_pairs64): 4x16-bit bands,
# pigeonhole-exact for Hamming <= 3, hot-bucket re-split cap — the same
# shape that already survives the 100 TB argument for text.

PHASH_ROWS = 8
PHASH_COLS = 9  # 9 columns -> 8 horizontal differences per row


def _png_gray_pixels(payload: bytes):
    """REAL stdlib-only PNG pixel decode -> float64 grayscale matrix
    (h, w). Supports 8-bit depth, color types 0/2/4/6, non-interlaced —
    the shapes every test/CI image uses; 'pil' covers the rest on a
    real media cluster. Scanline unfiltering implements all five PNG
    filter types (ISO/IEC 15948 §9); the per-byte Python loop for
    Sub/Average/Paeth is CI-grade (fixture images are small), not the
    production pixel path."""
    import zlib as _zlib

    import numpy as np

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("png: bad signature")
    pos, idat, meta = 8, [], None
    while pos + 8 <= len(payload):
        ln = _struct.unpack(">I", payload[pos : pos + 4])[0]
        typ = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        if typ == b"IHDR":
            w, h = _struct.unpack(">II", data[0:8])
            depth, color_type, _, _, interlace = data[8:13]
            meta = (w, h, depth, color_type, interlace)
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if meta is None or not idat:
        raise ValueError("png: missing IHDR or IDAT")
    w, h, depth, color_type, interlace = meta
    if depth != 8 or interlace != 0:
        raise ValueError("png: only 8-bit non-interlaced (use decoder='pil')")
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color_type)
    if channels is None:
        raise ValueError(f"png: unsupported color type {color_type}")
    raw = _zlib.decompress(b"".join(idat))
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("png: decompressed size mismatch")
    out = np.empty((h, stride), dtype=np.int64)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int64)
        if ft == 0:
            cur = line
        elif ft == 2:
            cur = (line + prev) & 0xFF
        else:
            cur = np.empty(stride, dtype=np.int64)
            for i in range(stride):
                a = cur[i - channels] if i >= channels else 0
                b = prev[i]
                c = prev[i - channels] if i >= channels else 0
                if ft == 1:
                    pred = a
                elif ft == 3:
                    pred = (a + b) // 2
                elif ft == 4:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                else:
                    raise ValueError(f"png: unknown filter type {ft}")
                cur[i] = (line[i] + pred) & 0xFF
        out[y] = cur
        prev = cur
    px = out.reshape(h, w, channels).astype(np.float64)
    if channels == 1:
        return px[:, :, 0]
    if channels == 2:  # gray + alpha
        return px[:, :, 0]
    # RGB / RGBA: ITU-R BT.601 luma, alpha ignored
    return 0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]


def _box_resize(img, out_h: int, out_w: int):
    """Deterministic mean-pool resize to (out_h, out_w); falls back to
    nearest-neighbor sampling when the source is smaller than the target
    grid (every cell must stay non-empty)."""
    import numpy as np

    h, w = img.shape
    if h < out_h or w < out_w:
        ri = np.linspace(0, h - 1, out_h).round().astype(int)
        ci = np.linspace(0, w - 1, out_w).round().astype(int)
        return img[np.ix_(ri, ci)].astype(np.float64)
    ys = (np.arange(out_h + 1) * h) // out_h
    xs = (np.arange(out_w + 1) * w) // out_w
    out = np.empty((out_h, out_w), dtype=np.float64)
    for r in range(out_h):
        band = img[ys[r] : ys[r + 1]]
        for c in range(out_w):
            out[r, c] = band[:, xs[c] : xs[c + 1]].mean()
    return out


def _gray_grid(payload: bytes, decoder: str):
    """Payload -> the 2-D brightness grid whose row-wise adjacent
    differences form exactly 64 dHash bits.

    ``fake`` is the oracle-portable fixture path: the payload body's
    polynomial hash (functions/texthash — the same integer DuckDB
    computes from the source text) expands to an 8x9 pseudo-brightness
    grid ``(h*(2i+1) + 7919*i) mod 256`` — identical duplicate payloads
    get identical grids, so Hamming-0 pairs are exactly the payload
    duplicates, and both engines agree bit-for-bit. ``png`` decodes
    real pixels stdlib-only (always-on in CI); ``pil`` and ``wav`` /
    ``soundfile`` cover the full format range on a real cluster. Audio
    maps onto the same contract as a 1x65 energy-envelope row (64
    adjacent differences — the 1-D dHash)."""
    import numpy as np

    from mongoshake_spark.functions.texthash import MOD

    if decoder == "fake":
        if payload[:4] != b"FMI0" or len(payload) < 12:
            raise ValueError("bad magic")
        body = payload[12:].decode("utf-8")
        h = 0
        for ch in body:
            h = (h * 31 + ord(ch)) % MOD
        i = np.arange(PHASH_ROWS * PHASH_COLS, dtype=np.int64)
        g = (h * (2 * i + 1) + 7919 * i) % 256
        return g.reshape(PHASH_ROWS, PHASH_COLS).astype(np.float64)
    if decoder == "png":
        return _box_resize(_png_gray_pixels(payload), PHASH_ROWS, PHASH_COLS)
    if decoder == "pil":
        try:
            from PIL import Image
        except ImportError as e:
            raise NotImplementedError(
                "decoder 'pil' needs Pillow on the executors; 'png' is the "
                "stdlib-only real-pixel path, 'fake' the fixture path"
            ) from e
        import io

        with Image.open(io.BytesIO(payload)) as img:
            px = np.asarray(img.convert("L"), dtype=np.float64)
        return _box_resize(px, PHASH_ROWS, PHASH_COLS)
    if decoder == "wav":
        import io
        import wave as _wave

        with _wave.open(io.BytesIO(payload)) as snd:
            n, width, nch = snd.getnframes(), snd.getsampwidth(), snd.getnchannels()
            frames = snd.readframes(n)
        if width == 2:
            samples = np.frombuffer(frames, dtype="<i2").astype(np.float64)
        elif width == 1:
            samples = np.frombuffer(frames, dtype=np.uint8).astype(np.float64) - 128.0
        else:
            raise ValueError("wav: only 8/16-bit PCM (use decoder='soundfile')")
        if nch > 1:
            samples = samples.reshape(-1, nch).mean(axis=1)
        n_win = PHASH_ROWS * (PHASH_COLS - 1) + 1  # 65 windows -> 64 diffs
        if samples.size < n_win:
            samples = np.pad(samples, (0, n_win - samples.size))
        env = np.array([np.abs(s).mean() for s in np.array_split(samples, n_win)])
        return env.reshape(1, n_win)
    raise NotImplementedError(
        f"phash decoder {decoder!r}: unknown — 'fake', 'png', 'pil', or 'wav'"
    )


def phash64(media: DataFrame, decoder: str = "fake") -> DataFrame:
    """(doc_id, phash) — 64-bit perceptual difference hash per media
    payload. Same mapInPandas shape as :func:`decode_media` (one row in,
    one row out, binary never survives, no shuffle); emitted as a SIGNED
    bigint (two's complement) exactly like ``dedup.simhash_values64`` so
    downstream xor/bit_count/band extraction stay JVM-side and the
    SimHash Hamming-band machinery applies unchanged."""
    import numpy as np
    import pandas as pd

    bit_range = np.arange(64, dtype=np.uint64)

    def fake_batch(pdf: pd.DataFrame) -> np.ndarray:
        """Batch-vectorized fixture path: ONE poly_hash_numpy call for
        the whole Arrow batch (the same column-fold kernel the SimHash
        signatures use), then the grid/diff/pack pipeline as 2-D numpy —
        no per-row Python in the registry's hot path. The real decoders
        stay per-row below (a pixel decode is per-payload by nature)."""
        from mongoshake_spark.functions.texthash import poly_hash_numpy

        bodies = []
        for payload in pdf["payload"]:
            b = bytes(payload)
            if b[:4] != b"FMI0" or len(b) < 12:
                raise ValueError("bad magic")
            bodies.append(b[12:].decode("utf-8"))
        h = poly_hash_numpy(bodies)  # (n,)
        i = np.arange(PHASH_ROWS * PHASH_COLS, dtype=np.int64)
        g = ((h[:, None] * (2 * i + 1) + 7919 * i) % 256).reshape(
            len(bodies), PHASH_ROWS, PHASH_COLS
        )
        bits = (g[:, :, :-1] > g[:, :, 1:]).reshape(len(bodies), 64)
        u = (bits.astype(np.uint64) << bit_range).sum(axis=1, dtype=np.uint64)
        return u.view(np.int64)

    def batches(it):
        for pdf in it:
            if len(pdf) == 0:
                yield pd.DataFrame(
                    {
                        "doc_id": pd.Series(dtype="int64"),
                        "phash": pd.Series(dtype="int64"),
                    }
                )
                continue
            if decoder == "fake":
                hashes = fake_batch(pdf)
            else:
                out = []
                for payload in pdf["payload"]:
                    grid = _gray_grid(bytes(payload), decoder)
                    bits = (grid[:, :-1] > grid[:, 1:]).ravel()
                    if bits.size != 64:
                        raise ValueError(
                            f"phash grid {grid.shape} yields {bits.size} "
                            "bits, need 64"
                        )
                    u = (bits.astype(np.uint64) << bit_range).sum(
                        dtype=np.uint64
                    )
                    out.append(int(np.uint64(u).view(np.int64)))
                hashes = np.asarray(out, dtype=np.int64)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(pdf["doc_id"].to_numpy(), dtype="int64"),
                    "phash": pd.Series(hashes, dtype="int64"),
                }
            )

    return media.select("doc_id", "payload").mapInPandas(
        batches, schema="doc_id bigint, phash bigint"
    )


def phash_pairs(
    media: DataFrame,
    decoder: str = "fake",
    max_hamming: int = 3,
    bucket_cap: int | None = None,
) -> DataFrame:
    """Content-level media near-dup pairs: (doc_a, doc_b, hamming) with
    Hamming(phash) <= ``max_hamming``. This is :func:`phash64` composed
    with the 64-bit SimHash band join (``dedup.simhash_pairs64`` with a
    caller-supplied fingerprint table): 4x16-bit Hamming bands make the
    candidate join pigeonhole-EXACT for max_hamming <= 3 — never an
    all-pairs compare — and ``bucket_cap`` re-splits pathological
    buckets (solid-color images all hash near 0) by borrowed bits, the
    same skew bound the text path carries."""
    from mongoshake_spark.functions import dedup as _dedup

    # eager checkpoint: a caller-supplied sims is used as-is by the band
    # join, and BOTH sides of the self-join would otherwise re-run the
    # decode+hash pass (the batch's dominant cost — measured 2x on the
    # registry query)
    sims = (
        phash64(media, decoder)
        .withColumnRenamed("phash", "simhash")
        .localCheckpoint(eager=True)
    )
    return _dedup.simhash_pairs64(
        media, max_hamming=max_hamming, bucket_cap=bucket_cap, sims=sims
    )


def frame_phashes(
    media: DataFrame,
    n_frames_col: str,
    every_k: int = 1,
    decoder: str = "fake",
) -> DataFrame:
    """(doc_id, frame, phash) — one perceptual hash per SAMPLED frame of
    a video payload. Each payload crosses the Arrow boundary ONCE and
    all its sampled frames hash in the same vectorized pass — the
    explode-then-hash alternative replicates every payload's bytes once
    per frame through the Arrow transfer, which at video sizes dwarfs
    the hash itself (measured 2x on the registry query even at fixture
    sizes). Sampling semantics are :func:`frame_sample_plan`'s: frames
    0, k, 2k, ... below ``n_frames_col``, and the skipped frames are
    never decoded. ``n_frames_col`` must hold a REAL frame count from
    decoded metadata, same contract as frame_sample_plan.

    The ``fake`` decoder derives frame f's brightness grid from the
    payload hash with the frame index mixed in —
    ``(h*(2i+1) + 7919*i + 104729*f) mod 256`` — so identical payloads
    produce identical frame sequences (both engines agree bit-for-bit)
    and different frames of one video hash apart. ``pyav`` is the REAL
    decoder lane (same availability-gating pattern as ``pil`` /
    ``soundfile``): each payload opens as an in-memory container, the
    codec decodes sequentially (inter-frame codecs require it) but only
    the SAMPLED frames pay the pixel conversion (``to_ndarray`` +
    grayscale reformat — the dominant per-frame cost), and each sampled
    frame runs the same box-resize + dHash as the image path. Absent the
    ``av`` library (this sandbox) it raises ``NotImplementedError`` at
    plan time; the Spark-side plumbing (sample plan, Arrow batching,
    downstream band join) is identical either way and is what the
    always-on tests pin."""
    import numpy as np
    import pandas as pd

    if decoder not in ("fake", "pyav"):
        raise NotImplementedError(
            f"frame_phashes decoder {decoder!r}: unknown — 'fake' (the "
            "deterministic fixture path) or 'pyav' (real video decode, "
            "needs the av media library on the executors)"
        )
    if decoder == "pyav":
        # eager driver-side gate (executors re-import inside the task):
        # fail at plan time, not minutes into the job
        try:
            import av  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "frame_phashes: decoder 'pyav' needs the av package on "
                "driver and executors (pip install av); 'fake' is the "
                "library-free fixture path"
            ) from e
    if every_k < 1:
        raise ValueError("frame_phashes: every_k must be >= 1")

    bit_range = np.arange(64, dtype=np.uint64)

    def pyav_batches(it):
        import av
        import io

        for pdf in it:
            ids, frs, hs = [], [], []
            for doc_id, payload, n in zip(
                pdf["doc_id"], pdf["payload"], pdf["_n_frames"]
            ):
                with av.open(io.BytesIO(bytes(payload))) as container:
                    vstream = container.streams.video[0]
                    vstream.thread_type = "AUTO"
                    for idx, frame in enumerate(container.decode(vstream)):
                        if idx >= int(n):
                            break
                        if idx % every_k:
                            continue  # skipped frames never pay to_ndarray
                        px = frame.to_ndarray(format="gray").astype(
                            np.float64
                        )
                        grid = _box_resize(px, PHASH_ROWS, PHASH_COLS)
                        bits = (grid[:, :-1] > grid[:, 1:]).ravel()
                        u = (bits.astype(np.uint64) << bit_range).sum(
                            dtype=np.uint64
                        )
                        ids.append(int(doc_id))
                        frs.append(idx)
                        hs.append(int(np.uint64(u).view(np.int64)))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame": pd.Series(frs, dtype="int64").astype("int32"),
                    "phash": pd.Series(hs, dtype="int64"),
                }
            )

    def batches(it):
        from mongoshake_spark.functions.texthash import poly_hash_numpy

        for pdf in it:
            if len(pdf) == 0:
                yield pd.DataFrame(
                    {
                        "doc_id": pd.Series(dtype="int64"),
                        "frame": pd.Series(dtype="int32"),
                        "phash": pd.Series(dtype="int64"),
                    }
                )
                continue
            bodies = []
            for payload in pdf["payload"]:
                b = bytes(payload)
                if b[:4] != b"FMI0" or len(b) < 12:
                    raise ValueError("bad magic")
                bodies.append(b[12:].decode("utf-8"))
            h = poly_hash_numpy(bodies)  # one hash per PAYLOAD, not per frame
            n_fr = pdf["_n_frames"].to_numpy().astype(np.int64)
            samples = [np.arange(0, max(int(n), 0), every_k) for n in n_fr]
            counts = np.array([len(s) for s in samples], dtype=np.int64)
            if counts.sum() == 0:
                yield pd.DataFrame(
                    {
                        "doc_id": pd.Series(dtype="int64"),
                        "frame": pd.Series(dtype="int32"),
                        "phash": pd.Series(dtype="int64"),
                    }
                )
                continue
            rep_ids = np.repeat(pdf["doc_id"].to_numpy(), counts)
            rep_h = np.repeat(h, counts)
            f_idx = np.concatenate([s for s in samples if len(s)])
            i = np.arange(PHASH_ROWS * PHASH_COLS, dtype=np.int64)
            g = (
                (rep_h[:, None] * (2 * i + 1) + 7919 * i + 104729 * f_idx[:, None])
                % 256
            ).reshape(len(f_idx), PHASH_ROWS, PHASH_COLS)
            bits = (g[:, :, :-1] > g[:, :, 1:]).reshape(len(f_idx), 64)
            u = (bits.astype(np.uint64) << bit_range).sum(
                axis=1, dtype=np.uint64
            )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(rep_ids, dtype="int64"),
                    "frame": pd.Series(f_idx, dtype="int64").astype("int32"),
                    "phash": pd.Series(u.view(np.int64), dtype="int64"),
                }
            )

    return media.select(
        "doc_id", "payload", F.col(n_frames_col).cast("int").alias("_n_frames")
    ).mapInPandas(
        pyav_batches if decoder == "pyav" else batches,
        schema="doc_id bigint, frame int, phash bigint",
    )


#: sample-ordinal width inside the packed frame id
#: (doc_id << VIDEO_FRAME_BITS | ordinal, ordinal = frame // every_k);
#: 4096 SAMPLED frames per video is the supported bound — raising
#: every_k genuinely raises the frame-count ceiling because the ordinal
#: (not the raw frame index) is what gets packed, and the guard inside
#: ``video_phash_pairs`` raises loudly instead of silently colliding
#: into the next doc_id's range (the id packing is an internal join key
#: only, so widening it is a local change if a corpus ever needs more)
VIDEO_FRAME_BITS = 12
VIDEO_FRAME_LIMIT = 1 << VIDEO_FRAME_BITS


def video_phash_pairs(
    media: DataFrame,
    n_frames_col: str,
    every_k: int = 1,
    min_shared: int = 2,
    max_hamming: int = 3,
    decoder: str = "fake",
    bucket_cap: int | None = None,
) -> DataFrame:
    """Content-level VIDEO near-dup: (video_a, video_b, n_shared_frames)
    for every video pair sharing >= ``min_shared`` near-duplicate frames
    (frame-phash Hamming <= ``max_hamming``) — the standard frame-vote
    video dedup. Composition, not new machinery: frame phashes pack into
    frame ids (``doc_id << 12 | sample_ordinal`` where ``ordinal =
    frame // every_k`` — the ordinal, NOT the raw frame index, so
    every_k genuinely bounds the packed width, and a video whose sampled
    frame count exceeds 4096 raises at runtime instead of silently
    colliding into the neighbouring doc_id's range), the 64-bit SimHash
    band join produces frame-level candidate pairs (pigeonhole-exact,
    never all-pairs), same-video matches drop, and one aggregate counts
    matched frame pairs per video pair. Frame-id ordering makes
    video_a < video_b canonical for free (fid_a < fid_b and distinct
    videos => doc_a < doc_b). Scale shape: |frames| x 4 band rows of
    shuffle, per-bucket quadratics only, one count aggregate — every
    piece already carries the 100 TB argument from the text path."""
    from mongoshake_spark.functions import dedup as _dedup

    fp = frame_phashes(media, n_frames_col, every_k, decoder)
    # frame_phashes emits raw indices 0, k, 2k, ...; `div` recovers the
    # sample ordinal exactly (indices are non-negative)
    ordinal = F.expr(f"frame div {int(every_k)}")
    fid = (
        F.when(
            ordinal >= VIDEO_FRAME_LIMIT,
            F.raise_error(
                F.format_string(
                    "video_phash_pairs: sampled frame ordinal %s >= "
                    f"VIDEO_FRAME_LIMIT={VIDEO_FRAME_LIMIT} for doc_id %s "
                    "— raise every_k (or widen VIDEO_FRAME_BITS)",
                    ordinal,
                    F.col("doc_id"),
                )
            ).cast("bigint"),
        )
        .otherwise(F.shiftleft(F.col("doc_id"), VIDEO_FRAME_BITS) + ordinal)
        .alias("doc_id")
    )
    # eager checkpoint for the same reason as phash_pairs: both sides of
    # the band self-join reuse the materialized frame hashes instead of
    # re-running the frame hashing pass
    sims = fp.select(fid, F.col("phash").alias("simhash")).localCheckpoint(
        eager=True
    )
    frame_pairs = _dedup.simhash_pairs64(
        media, max_hamming=max_hamming, bucket_cap=bucket_cap, sims=sims
    )
    return (
        frame_pairs.select(
            # arithmetic shift right = exact floor division by 2^12 for
            # ALL bigint ids (double division loses bits past 2^53 and
            # truncates negatives toward zero)
            F.shiftright(F.col("doc_a"), VIDEO_FRAME_BITS).alias("video_a"),
            F.shiftright(F.col("doc_b"), VIDEO_FRAME_BITS).alias("video_b"),
        )
        .filter(F.col("video_a") != F.col("video_b"))
        .groupBy("video_a", "video_b")
        .agg(F.count("*").alias("n_shared_frames"))
        .filter(F.col("n_shared_frames") >= F.lit(int(min_shared)))
    )
