"""Multimodal column handling: image/audio/video as opaque binary
columns with typed metadata.

Codecs: ``'ppm'`` is a REAL image codec (binary P6 netpbm — header +
raw RGB; parsed/resampled with numpy, no imaging libraries needed), so
decode → feature-extract → resize runs genuinely end-to-end for
uncompressed images. ``'fake'`` produces deterministic pseudo-features
from arbitrary bytes (exercises the same Arrow path for payloads that
aren't images). Compressed codecs (jpeg/png/wav/mp4) raise
NotImplementedError — their decoders aren't in this container; they
would slot into the same per-batch loop. The Spark-side plumbing is
real and tested: binary schema, metadata struct, Arrow-batched
mapInPandas with bounded batch sizes, partition-preserving transforms.

At 100 TB: binary payloads ride in parquet alongside metadata;
decode/feature-extract runs as mapInPandas over row-group-sized Arrow
batches (spark.sql.execution.arrow.maxRecordsPerBatch caps batch
memory); no shuffle is introduced — the pipeline stays narrow until an
explicit grouping.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)


def attach_media_columns(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Build a multimodal frame from the documents fixture: payload =
    utf8 bytes of the text (stand-in for image bytes), typed metadata
    struct derived deterministically."""
    # note for consumers: Spark's base64() of this payload is MIME-
    # chunked (CRLF every 76 chars) — strip for canonical form
    payload = F.col(text_col).cast("binary")
    return df.select(
        F.col(id_col).alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("fake").alias("format"),
            (F.length(text_col) % 640).cast("int").alias("width"),
            (F.col(id_col) % 480).cast("int").alias("height"),
            F.octet_length(payload).cast("bigint").alias("n_bytes"),
        ).alias("meta"),
    )


FEATURE_SCHEMA = (
    "media_id long, n_bytes long, checksum long, width int, height int, feat array<double>"
)


def _parse_ppm(b: bytes):
    """Binary P6 netpbm → (h, w, 3) uint8 array. Strict no-comment
    subset: ``P6 <w> <h> <maxval≤255>`` then raw RGB."""
    import re

    import numpy as np

    m = re.match(rb"P6\s+(\d+)\s+(\d+)\s+(\d+)\s", b)
    if m is None:
        raise ValueError("not a binary P6 ppm payload")
    w, h, maxv = int(m.group(1)), int(m.group(2)), int(m.group(3))
    if maxv > 255:
        raise ValueError("16-bit ppm not supported")
    px = np.frombuffer(b, dtype=np.uint8, offset=m.end(), count=w * h * 3)
    return px.reshape(h, w, 3)


def encode_ppm(px) -> bytes:
    """(h, w, 3) uint8 array → binary P6 bytes."""
    h, w = px.shape[0], px.shape[1]
    return b"P6\n%d %d\n255\n" % (w, h) + px.tobytes()


def _parse_wav(b: bytes):
    """RIFF/WAVE PCM → (samples float64 in [-1,1] shape (n, channels),
    sample_rate). Pure struct/numpy parse — 16-bit and 8-bit PCM."""
    import struct

    import numpy as np

    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, n = 12, len(b)
    fmt = None
    while pos + 8 <= n:
        cid, size = b[pos : pos + 4], struct.unpack("<I", b[pos + 4 : pos + 8])[0]
        body = b[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels, rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if audio_fmt != 1:
                raise ValueError("only PCM (format 1) supported")
            fmt = (channels, rate, bits)
        elif cid == b"data":
            if fmt is None:
                raise ValueError("data chunk before fmt chunk")
            channels, rate, bits = fmt
            if bits == 16:
                raw = np.frombuffer(body, dtype="<i2").astype("float64") / 32768.0
            elif bits == 8:
                raw = (np.frombuffer(body, dtype="u1").astype("float64") - 128.0) / 128.0
            else:
                raise ValueError(f"{bits}-bit PCM not supported")
            return raw.reshape(-1, channels), rate
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    raise ValueError("no data chunk")


def encode_wav(samples_u8: bytes, rate: int = 8000, channels: int = 1) -> bytes:
    """RIFF/WAVE 8-bit PCM container around raw unsigned samples — the
    encode twin of ``_parse_wav`` (synthesis side of the audio
    plumbing; also how deterministic fixtures are built)."""
    import struct

    data = bytes(samples_u8)
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels, channels, 8)
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def encode_y4m(frames, w: int, h: int) -> bytes:
    """YUV4MPEG2 stream around Y-plane frames (flat U/V) — the encode
    twin of ``_parse_y4m``."""
    import numpy as np

    out = [f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C420\n".encode()]
    for y in frames:
        out.append(b"FRAME\n")
        out.append(np.asarray(y, dtype=np.uint8).tobytes())
        out.append(bytes((w // 2) * (h // 2) * 2))
    return b"".join(out)


def decode_features(df: DataFrame, codec: str = "fake", feat_dim: int = 4) -> DataFrame:
    """Decode payloads and emit fixed-width features via mapInPandas.

    ``codec='ppm'``: REAL decode of binary P6 images — width/height
    from the actual header, features = per-channel means + grayscale
    std (numpy over the pixel array, one parse per payload).
    ``codec='wav'``: REAL decode of RIFF PCM audio — features =
    [duration_s, rms, zero-crossing rate, peak]; width = sample rate,
    height = channels (the schema's generic dimension slots).
    ``codec='fake'``: deterministic features from the byte content
    (length, checksum, byte-histogram moments) — same Arrow batch path
    for non-media payloads. Compressed codecs (jpeg/png/mp3/mp4)
    require libs not present in this container.
    """
    if codec == "wav":
        import numpy as np

        def run_wav(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = []
                for mid, b in zip(pdf["media_id"], pdf["payload"]):
                    samples, rate = _parse_wav(bytes(b))
                    mono = samples.mean(axis=1)
                    zc = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) if len(mono) > 1 else 0.0
                    out.append(
                        {
                            "media_id": mid,
                            "n_bytes": len(b),
                            "checksum": int(np.abs(samples).sum() * 1000) % (1 << 31),
                            "width": rate,
                            "height": samples.shape[1],
                            "feat": [
                                float(len(mono)) / rate,
                                float(np.sqrt((mono ** 2).mean())) if len(mono) else 0.0,
                                zc,
                                float(np.abs(mono).max()) if len(mono) else 0.0,
                            ],
                        }
                    )
                yield pd.DataFrame(out, columns=[
                    "media_id", "n_bytes", "checksum", "width", "height", "feat"
                ])

        return df.mapInPandas(run_wav, schema=FEATURE_SCHEMA)
    if codec == "ppm":
        import numpy as np

        def run_ppm(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = []
                for mid, b in zip(pdf["media_id"], pdf["payload"]):
                    px = _parse_ppm(bytes(b))
                    gray = px.astype("float64").mean(axis=2)
                    out.append(
                        {
                            "media_id": mid,
                            "n_bytes": len(b),
                            "checksum": int(px.sum()) % (1 << 31),
                            "width": px.shape[1],
                            "height": px.shape[0],
                            "feat": [
                                float(px[:, :, 0].mean()),
                                float(px[:, :, 1].mean()),
                                float(px[:, :, 2].mean()),
                                float(gray.std()),
                            ],
                        }
                    )
                yield pd.DataFrame(out, columns=[
                    "media_id", "n_bytes", "checksum", "width", "height", "feat"
                ])

        return df.mapInPandas(run_ppm, schema=FEATURE_SCHEMA)
    if codec != "fake":
        raise NotImplementedError(
            f"codec {codec!r}: 'ppm' (real) and 'fake' (deterministic) are the "
            "available codecs in this environment (no imaging/audio libraries baked in)"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            n_bytes = payloads.map(lambda b: len(b) if b is not None else 0)
            checksum = payloads.map(lambda b: sum(b) % (1 << 31) if b is not None else 0)
            feats = [
                [
                    float(nb),
                    float(cs % 256),
                    float((cs >> 8) % 256),
                    float(nb % 7),
                ]
                for nb, cs in zip(n_bytes, checksum)
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": n_bytes.astype("int64"),
                    "checksum": checksum.astype("int64"),
                    "width": pdf["meta"].map(lambda m: m["width"]).astype("int32"),
                    "height": pdf["meta"].map(lambda m: m["height"]).astype("int32"),
                    "feat": feats,
                }
            )

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize(df: DataFrame, width: int, height: int, codec: str = "fake") -> DataFrame:
    """Resize. ``codec='ppm'``: REAL nearest-neighbor pixel resample
    (numpy index arithmetic over the decoded array, payload re-encoded
    as P6) with the metadata struct updated to the actual new
    dimensions. ``codec='fake'``: metadata-only rewrite for non-image
    payloads. Compressed codecs need an imaging library."""
    if codec == "ppm":
        import numpy as np

        def run_ppm(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                payloads = []
                for b in pdf["payload"]:
                    px = _parse_ppm(bytes(b))
                    in_h, in_w = px.shape[0], px.shape[1]
                    rows = (np.arange(height) * in_h) // height
                    cols = (np.arange(width) * in_w) // width
                    payloads.append(encode_ppm(np.ascontiguousarray(px[rows][:, cols])))
                out = pdf.copy()
                out["payload"] = payloads
                out["meta"] = [
                    {
                        "format": "ppm",
                        "width": width,
                        "height": height,
                        "n_bytes": len(p),
                    }
                    for p in payloads
                ]
                yield out

        return df.mapInPandas(run_ppm, schema=df.schema)
    if codec != "fake":
        raise NotImplementedError(
            f"codec {codec!r}: pixel-level resize needs an imaging library"
        )
    return df.withColumn(
        "meta",
        F.struct(
            F.col("meta.format").alias("format"),
            F.lit(width).cast("int").alias("width"),
            F.lit(height).cast("int").alias("height"),
            F.col("meta.n_bytes").alias("n_bytes"),
        ),
    )


def frame_sample(df: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' stand-in: slice the payload every N bytes
    (JVM-side substring arithmetic — the video-frame analog of a
    stride sampler)."""
    n = F.octet_length("payload")
    idx = F.explode(F.sequence(F.lit(0), ((n - 1) / every_n_bytes).cast("int")))
    return df.select("media_id", F.col("meta"), idx.alias("frame_no"),).withColumn(
        "frame_offset", F.col("frame_no") * every_n_bytes
    )


def _parse_y4m(b: bytes):
    """YUV4MPEG2 (uncompressed video) → (w, h, [frame Y-plane uint8
    arrays]). Pure parse: stream header ``YUV4MPEG2 W<w> H<h> ...\\n``
    then ``FRAME...\\n`` + raw 4:2:0 planes (Y w×h, U+V w/2×h/2)."""
    import numpy as np

    nl = b.index(b"\n")
    header = b[:nl].decode("ascii", "replace")
    if not header.startswith("YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    w = h = None
    for tok in header.split()[1:]:
        if tok[0] == "W":
            w = int(tok[1:])
        elif tok[0] == "H":
            h = int(tok[1:])
        elif tok[0] == "C" and not tok[1:].startswith("420"):
            raise ValueError(f"chroma {tok!r}: only 4:2:0 supported")
    if not w or not h:
        raise ValueError("missing W/H in stream header")
    frame_bytes = w * h + 2 * ((w // 2) * (h // 2))
    frames, pos, n = [], nl + 1, len(b)
    while pos < n:
        fnl = b.index(b"\n", pos)
        if b[pos : pos + 5] != b"FRAME":
            raise ValueError("expected FRAME marker")
        y = np.frombuffer(b, dtype=np.uint8, offset=fnl + 1, count=w * h).reshape(h, w)
        frames.append(y)
        pos = fnl + 1 + frame_bytes
    return w, h, frames


VIDEO_FRAME_SCHEMA = (
    "media_id long, frame_no int, width int, height int, "
    "y_mean double, y_std double, motion double"
)


def video_frame_sample(df: DataFrame, stride: int = 1, codec: str = "y4m") -> DataFrame:
    """REAL video frame sampling for uncompressed YUV4MPEG2: every
    ``stride``-th frame is decoded to its luma plane and summarized
    (mean/std + mean absolute luma delta vs the PREVIOUS SAMPLED frame
    — a cheap motion signal for shot-boundary-style filtering). One
    payload parse per row, frames sliced as numpy views; compressed
    containers (mp4/webm) would need a demuxer this container lacks."""
    if codec != "y4m":
        raise NotImplementedError(f"codec {codec!r}: only 'y4m' video is decodable here")
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                w, h, frames = _parse_y4m(bytes(b))
                prev = None
                for i in range(0, len(frames), stride):
                    y = frames[i].astype("float64")
                    motion = float(np.abs(y - prev).mean()) if prev is not None else 0.0
                    out.append(
                        {
                            "media_id": mid,
                            "frame_no": i,
                            "width": w,
                            "height": h,
                            "y_mean": float(y.mean()),
                            "y_std": float(y.std()),
                            "motion": motion,
                        }
                    )
                    prev = y
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "frame_no", "width", "height", "y_mean", "y_std", "motion"
                ],
            )

    return df.mapInPandas(run, schema=VIDEO_FRAME_SCHEMA)


def chunk_media(df: DataFrame, chunk_bytes: int = 64) -> DataFrame:
    """Split each binary payload into fixed-size ordered chunks —
    (media_id, chunk_idx, chunk, chunk_len). The 100 TB pattern for
    large blobs (video/audio): one multi-GB payload pins a whole task,
    chunking re-partitions decode work at byte-range granularity and
    each chunk carries its ordinal so a downstream groupBy(media_id,
    sort chunk_idx) reassembles losslessly. Pure JVM expressions:
    sequence + transform + substring-on-binary, exploded — no Python,
    no driver involvement."""
    chunks = F.expr(
        f"transform(sequence(0, int(ceil(octet_length(payload) / {chunk_bytes})) - 1),"
        f" i -> struct(i AS chunk_idx, substring(payload, i * {chunk_bytes} + 1, {chunk_bytes}) AS chunk))"
    )
    return (
        df.where(F.octet_length("payload") > 0)
        .select("media_id", F.explode(chunks).alias("__c"))
        .select(
            "media_id",
            F.col("__c.chunk_idx").cast("int").alias("chunk_idx"),
            F.col("__c.chunk").alias("chunk"),
            F.octet_length("__c.chunk").cast("int").alias("chunk_len"),
        )
    )


def image_dhash(
    df: DataFrame, payload_col: str, id_col: str, block: int = 4
) -> DataFrame:
    """Perceptual difference-hash (dHash) over ppm image payloads — the
    image near-dup fingerprint multimodal pipelines pair with text
    MinHash (aHash/dHash/pHash family; dHash = gradient signs, robust
    to brightness shifts and mild noise). Pipeline per image, ALL
    INTEGER (engine-exact, no float thresholds):

    1. decode P6 ppm -> (h, w, 3) uint8;
    2. integer luma gray = (299 R + 587 G + 114 B) // 1000;
    3. downsample to an 8 x 8 block grid by integer block mean
       (block x block pixels, floor division);
    4. bit(i, j) = 1 iff grid[i][j] > grid[i][j+1] — 7 comparisons per
       row, a 56-bit signature (BIGINT-safe on every engine; the
       classic 9x8 layout's 64th bit would overflow signed 64-bit
       accumulation in SQL oracles).

    Arrow-batched mapInPandas (numpy reshape-sum per image), map-only;
    feed the signatures to dedup.hamming_near_dup_pairs for the
    banded near-dup join. Expects h = w = 8 * block images (the
    deterministic synth fixtures use 32 x 32)."""
    import numpy as np

    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        [df.schema[id_col], StructField("dhash", LongType(), False)]
    )

    def _hash(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = []
            for payload in pdf[payload_col]:
                px = _parse_ppm(bytes(payload)).astype(np.int64)
                gray = (299 * px[..., 0] + 587 * px[..., 1]
                        + 114 * px[..., 2]) // 1000
                h, w = gray.shape
                gh, gw = h // block, w // block
                grid = (
                    gray.reshape(gh, block, gw, block).sum(axis=(1, 3))
                    // (block * block)
                )
                bits = grid[:, :-1] > grid[:, 1:]  # gh x (gw-1)
                val = 0
                for i in range(gh):
                    for j in range(gw - 1):
                        if bits[i, j]:
                            val |= 1 << (i * (gw - 1) + j)
                out.append(val)
            res = pdf[[id_col]].copy()
            res["dhash"] = out
            yield res

    return df.select(id_col, payload_col).mapInPandas(_hash, out_schema)


def audio_fingerprint(
    df: DataFrame, payload_col: str, id_col: str,
    frame: int = 64, n_frames: int = 57,
) -> DataFrame:
    """Audio FINGERPRINT over wav payloads — the audio twin of
    image_dhash (the energy-gradient-sign family: Shazam/chromaprint
    reduce audio to per-frame features and hash feature DELTAS; here
    the feature is the integer frame energy of the 8-bit PCM stream):
    bit(i) = 1 iff energy(frame i) > energy(frame i+1), over the first
    ``n_frames`` frames of ``frame`` samples — a (n_frames-1)-bit
    BIGINT signature, ALL INTEGER (8-bit PCM decodes to (u-128)/128,
    exact in float64, so the raw bytes recover exactly). Robust to
    uniform gain shifts smaller than the quantization step; pair with
    dedup.hamming_near_dup_pairs for near-dup audio. Map-only Arrow
    pass."""
    import numpy as np

    from pyspark.sql.types import LongType, StructField, StructType

    assert n_frames <= 57, "signature must fit signed 64-bit SQL math"
    out_schema = StructType(
        [df.schema[id_col], StructField("afp", LongType(), False)]
    )

    def _fp(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = []
            for payload in pdf[payload_col]:
                s, _rate = _parse_wav(bytes(payload))
                u8 = np.rint(s[:, 0] * 128.0 + 128.0).astype(np.int64)
                need = frame * n_frames
                if len(u8) < need:
                    raise ValueError(
                        f"audio_fingerprint needs >= {need} samples"
                    )
                e = u8[:need].reshape(n_frames, frame).sum(axis=1)
                val = 0
                for i in range(n_frames - 1):
                    if e[i] > e[i + 1]:
                        val |= 1 << i
                out.append(val)
            res = pdf[[id_col]].copy()
            res["afp"] = out
            yield res

    return df.select(id_col, payload_col).mapInPandas(_fp, out_schema)


def video_motion_fingerprint(
    df: DataFrame, payload_col: str, id_col: str, n_frames: int = 58,
) -> DataFrame:
    """Video FINGERPRINT over y4m payloads — the video member of the
    gradient-sign family (image_dhash / audio_fingerprint): the
    per-frame feature is MOTION, the sum of absolute Y-plane
    differences against the previous frame (the scene-change signal of
    multimodal_video_motion; shot-boundary fingerprints hash exactly
    this profile). ``n_frames`` frames yield n_frames-1 motion values
    and bit(i) = 1 iff motion(i+2) > motion(i+1) — an (n_frames-2)-bit
    BIGINT signature, ALL INTEGER (uint8 planes, exact SADs), robust
    to uniform brightness shifts which cancel in the frame difference.
    Map-only Arrow pass; pair with dedup.hamming_near_dup_pairs for
    the banded near-dup join. The reference ships no video operators —
    this extends its multimodal surface the way a training-data
    pipeline needs (SURVEY §2 multimodal row)."""
    import numpy as np

    from pyspark.sql.types import LongType, StructField, StructType

    assert n_frames <= 58, "signature must fit signed 64-bit SQL math"
    out_schema = StructType(
        [df.schema[id_col], StructField("vfp", LongType(), False)]
    )

    def _fp(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = []
            for payload in pdf[payload_col]:
                _w, _h, frames = _parse_y4m(bytes(payload))
                if len(frames) < n_frames:
                    raise ValueError(
                        f"video_motion_fingerprint needs >= {n_frames} "
                        f"frames, got {len(frames)}"
                    )
                fr = np.stack(frames[:n_frames]).astype(np.int64)
                sad = np.abs(fr[1:] - fr[:-1]).sum(axis=(1, 2))
                val = 0
                for i in range(len(sad) - 1):
                    if sad[i + 1] > sad[i]:
                        val |= 1 << i
                out.append(val)
            res = pdf[[id_col]].copy()
            res["vfp"] = out
            yield res

    return df.select(id_col, payload_col).mapInPandas(_fp, out_schema)
