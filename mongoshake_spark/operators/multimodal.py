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
