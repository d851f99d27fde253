"""Multimodal binary-column plumbing tests (BASELINE.json north-star):
chunking reassembles byte-exactly; decode/resize stubs covered by
oracle queries."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_1_16_0_src_spark import tables
from flink_1_16_0_src_spark.pipeline.multimodal import attach_media_columns, chunk_media

SF_DIR = "/root/testdata/sf0.001"


def test_chunking_reassembles_byte_exact(spark):
    d = tables.load(spark, SF_DIR, "documents").where(
        (F.col("doc_id") % 37 == 0) & (F.length("text") > 0)
    )
    media = attach_media_columns(d, "text", "doc_id")
    chunks = chunk_media(media, chunk_bytes=50)

    # every chunk except possibly the last is exactly chunk_bytes long
    bad = chunks.join(
        chunks.groupBy("media_id").agg(F.max("chunk_idx").alias("last_idx")), "media_id"
    ).where((F.col("chunk_idx") < F.col("last_idx")) & (F.col("chunk_len") != 50))
    assert bad.count() == 0

    reassembled = (
        chunks.groupBy("media_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("chunk_idx", "chunk"))
            ).alias("ordered")
        )
        .select(
            "media_id",
            F.aggregate(
                "ordered",
                F.lit(b"").cast("binary"),
                lambda acc, x: F.concat(acc, x["chunk"]),
            ).alias("payload"),
        )
    )
    orig = {r.media_id: bytes(r.payload) for r in media.collect()}
    back = {r.media_id: bytes(r.payload) for r in reassembled.collect()}
    assert back == orig and len(back) > 0


def _make_ppm(w, h, seed):
    """Deterministic test image: px[y,x,c] = (seed + 3x + 7y + 11c) % 256."""
    import numpy as np

    from flink_1_16_0_src_spark.pipeline.multimodal import encode_ppm

    y, x, c = np.meshgrid(np.arange(h), np.arange(w), np.arange(3), indexing="ij")
    px = ((seed + 3 * x + 7 * y + 11 * c) % 256).astype("uint8")
    return encode_ppm(px), px


def test_ppm_decode_real_pixels(spark):
    """The 'ppm' codec is a REAL decoder: width/height come from the
    P6 header and the features are exact numpy channel statistics."""
    import numpy as np

    from flink_1_16_0_src_spark.pipeline import multimodal as mm

    imgs = {1: _make_ppm(8, 5, 0), 2: _make_ppm(16, 3, 100)}
    df = spark.createDataFrame(
        [(k, bytearray(b), ("ppm", None, None, len(b))) for k, (b, _) in imgs.items()],
        mm.MEDIA_SCHEMA,
    )
    got = {r.media_id: r for r in mm.decode_features(df, codec="ppm").collect()}
    for k, (b, px) in imgs.items():
        r = got[k]
        assert (r.width, r.height) == (px.shape[1], px.shape[0])
        gray = px.astype("float64").mean(axis=2)
        exp = [px[:, :, 0].mean(), px[:, :, 1].mean(), px[:, :, 2].mean(), gray.std()]
        assert r.feat == pytest.approx(exp)
        assert r.checksum == int(px.sum()) % (1 << 31)


def test_ppm_resize_nearest_neighbor_exact(spark):
    """Resize is a real pixel transform: output payload is byte-exact
    nearest-neighbor downsampling, and a re-decode sees the new dims."""
    import numpy as np

    from flink_1_16_0_src_spark.pipeline import multimodal as mm

    b, px = _make_ppm(10, 6, 42)
    df = spark.createDataFrame(
        [(1, bytearray(b), ("ppm", 10, 6, len(b)))], mm.MEDIA_SCHEMA
    )
    out = mm.resize(df, width=5, height=3, codec="ppm").collect()[0]
    rows = (np.arange(3) * 6) // 3
    cols = (np.arange(5) * 10) // 5
    exp = mm.encode_ppm(np.ascontiguousarray(px[rows][:, cols]))
    assert bytes(out.payload) == exp
    assert (out.meta.width, out.meta.height) == (5, 3)
    # decode of the resized frame reports the new dimensions
    r2 = mm.decode_features(
        mm.resize(df, 5, 3, codec="ppm"), codec="ppm"
    ).collect()[0]
    assert (r2.width, r2.height) == (5, 3)


def test_unknown_codec_still_raises(spark):
    from flink_1_16_0_src_spark.pipeline import multimodal as mm

    df = spark.createDataFrame([(1, bytearray(b"x"), ("jpeg", 1, 1, 1))], mm.MEDIA_SCHEMA)
    with pytest.raises(NotImplementedError):
        mm.decode_features(df, codec="jpeg")


def _make_wav(n, rate, channels, seed):
    """Deterministic 16-bit PCM sine-ish test signal."""
    import struct

    import numpy as np

    t = np.arange(n * channels, dtype="float64").reshape(n, channels)
    samples = np.round(10000 * np.sin((seed + t) * 0.1)).astype("<i2")
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * 2, channels * 2, 16)
    riff = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(riff)) + riff, samples


def test_wav_decode_real_samples(spark):
    """The 'wav' codec really parses RIFF PCM: sample rate, channel
    count, duration, RMS, and zero-crossing rate match numpy truth."""
    import numpy as np

    from flink_1_16_0_src_spark.pipeline import multimodal as mm

    b, samples = _make_wav(n=480, rate=16000, channels=2, seed=5)
    df = spark.createDataFrame([(1, bytearray(b), ("wav", None, None, len(b)))], mm.MEDIA_SCHEMA)
    r = mm.decode_features(df, codec="wav").collect()[0]
    assert (r.width, r.height) == (16000, 2)
    mono = (samples.astype("float64") / 32768.0).mean(axis=1)
    assert r.feat[0] == pytest.approx(480 / 16000)
    assert r.feat[1] == pytest.approx(float(np.sqrt((mono ** 2).mean())))
    assert r.feat[2] == pytest.approx(
        float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
    )
    assert r.feat[3] == pytest.approx(float(np.abs(mono).max()))


def _make_y4m(w, h, n_frames, seed):
    """Deterministic 4:2:0 test clip; luma ramps per frame."""
    import numpy as np

    parts = [b"YUV4MPEG2 W%d H%d F25:1 Ip A1:1 C420\n" % (w, h)]
    ys = []
    for f in range(n_frames):
        y = ((seed + 5 * f + np.arange(w * h)) % 256).astype("uint8").reshape(h, w)
        uv = np.full((w // 2) * (h // 2) * 2, 128, dtype="uint8")
        parts.append(b"FRAME\n" + y.tobytes() + uv.tobytes())
        ys.append(y)
    return b"".join(parts), ys


def test_y4m_video_frame_sample_real_decode(spark):
    """video_frame_sample really parses YUV4MPEG2: frame count honors
    the stride, luma stats are exact, and the motion signal equals the
    mean absolute delta between consecutive SAMPLED frames."""
    import numpy as np

    from flink_1_16_0_src_spark.pipeline import multimodal as mm

    b, ys = _make_y4m(w=16, h=8, n_frames=6, seed=3)
    df = spark.createDataFrame([(1, bytearray(b), ("y4m", 16, 8, len(b)))], mm.MEDIA_SCHEMA)
    rows = {r.frame_no: r for r in mm.video_frame_sample(df, stride=2).collect()}
    assert sorted(rows) == [0, 2, 4]
    for i in (0, 2, 4):
        y = ys[i].astype("float64")
        assert rows[i].y_mean == pytest.approx(y.mean())
        assert rows[i].y_std == pytest.approx(y.std())
        assert (rows[i].width, rows[i].height) == (16, 8)
    assert rows[0].motion == 0.0
    assert rows[2].motion == pytest.approx(
        float(np.abs(ys[2].astype("float64") - ys[0].astype("float64")).mean())
    )
