"""Multimodal-column pipeline queries (BASELINE.json north-star
extras): binary payloads + typed metadata + stubbed decode
(pipeline.multimodal)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_1_16_0_src_spark.pipeline.multimodal import (
    attach_media_columns,
    decode_features,
)
from flink_1_16_0_src_spark.registry import query
from flink_1_16_0_src_spark.tables import load


@query(
    "multimodal_metadata",
    oracle="""
    SELECT doc_id AS media_id,
           'fake' AS format,
           CAST(length(text) % 640 AS INT) AS width,
           CAST(doc_id % 480 AS INT) AS height,
           octet_length(encode(text)) AS n_bytes,
           to_base64(encode(text)) AS payload_b64
    FROM documents
    """,
    tags=("pipeline", "multimodal"),
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload + metadata struct plumbing: media table built from
    documents (payload = utf8 bytes standing in for image bytes)."""
    media = attach_media_columns(load(spark, sf_dir, "documents"), "text", "doc_id")
    return media.select(
        "media_id",
        F.col("meta.format").alias("format"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.n_bytes").alias("n_bytes"),
        # Spark base64 is MIME-chunked with CRLF every 76 chars; strip
        # for the canonical single-line form DuckDB emits
        F.regexp_replace(F.base64(F.col("payload")), r"[\r\n]", "").alias("payload_b64"),
    )


@query(
    "multimodal_decode_fake",
    oracle="""
    SELECT doc_id AS media_id,
           octet_length(encode(text)) AS n_bytes,
           CAST(list_aggregate(list_transform(str_split(text, ''), c -> unicode(c)), 'sum')
             % 2147483648 AS BIGINT) AS checksum,
           CAST(length(text) % 640 AS INT) AS width,
           CAST(doc_id % 480 AS INT) AS height
    FROM documents
    """,
    tags=("pipeline", "multimodal", "custom-op"),
)
def multimodal_decode_fake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mapInPandas decode path with the deterministic fake codec:
    Arrow batches in, feature rows out (real decode stubbed — no
    imaging libs in the container; oracle checks byte-sum checksum =
    sum of codepoints for the ASCII fixture text)."""
    media = attach_media_columns(load(spark, sf_dir, "documents"), "text", "doc_id")
    return decode_features(media, codec="fake").select(
        "media_id", "n_bytes", "checksum", "width", "height"
    )


@query(
    "multimodal_frame_sample",
    oracle="""
    SELECT media_id,
           CAST(frame_no AS BIGINT)      AS frame_no,
           CAST(frame_no * 64 AS BIGINT) AS frame_offset,
           CAST(n_bytes AS BIGINT)       AS n_bytes
    FROM (
      SELECT doc_id AS media_id,
             unnest(generate_series(0, (octet_length(encode(text)) - 1) // 64))
               AS frame_no,
             octet_length(encode(text)) AS n_bytes
      FROM documents
    )
    """,
    tags=("pipeline", "multimodal"),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stride frame sampler (video-frame analog): one row per 64-byte
    frame of each payload, JVM-side sequence+explode — fan-out bounded
    by payload size / stride."""
    from flink_1_16_0_src_spark.pipeline.multimodal import frame_sample

    media = attach_media_columns(load(spark, sf_dir, "documents"), "text", "doc_id")
    return frame_sample(media, every_n_bytes=64).select(
        "media_id",
        F.col("frame_no").cast("bigint").alias("frame_no"),
        F.col("frame_offset").cast("bigint").alias("frame_offset"),
        F.col("meta.n_bytes").cast("bigint").alias("n_bytes"),
    )


@query(
    "multimodal_resize",
    oracle="""
    SELECT doc_id AS media_id, 'fake' AS format,
           224 AS width, 224 AS height,
           octet_length(encode(text)) AS n_bytes
    FROM documents
    """,
    tags=("pipeline", "multimodal"),
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize stub round-trip: metadata struct rewritten to the target
    dimensions, payload byte count preserved (pixel transform stubbed —
    no imaging libs in the container)."""
    from flink_1_16_0_src_spark.pipeline.multimodal import resize

    media = attach_media_columns(load(spark, sf_dir, "documents"), "text", "doc_id")
    return resize(media, 224, 224).select(
        "media_id",
        F.col("meta.format").alias("format"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.n_bytes").alias("n_bytes"),
    )


@query(
    "multimodal_chunking",
    oracle="""
    WITH media AS (
      SELECT doc_id AS media_id, encode(text) AS payload
      FROM documents WHERE doc_id % 19 = 0 AND len(text) > 0
    ), idx AS (
      SELECT media_id, payload, unnest(range(0, CAST(ceil(octet_length(payload) / 64.0) AS BIGINT))) AS chunk_idx
      FROM media
    )
    SELECT media_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
           CAST(least(64, octet_length(payload) - chunk_idx * 64) AS INTEGER) AS chunk_len
    FROM idx
    """,
    tags=("pipeline", "multimodal"),
)
def multimodal_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary chunking for parallel decode (byte-range work units with
    reassembly ordinals); conformance on chunk count/ordinals/lengths —
    the byte slices themselves are checked by the Spark-side
    reassembly test."""
    from flink_1_16_0_src_spark.pipeline.multimodal import attach_media_columns, chunk_media

    d = load(spark, sf_dir, "documents").where(
        (F.col("doc_id") % 19 == 0) & (F.length("text") > 0)
    )
    media = attach_media_columns(d, "text", "doc_id")
    return chunk_media(media, 64).select("media_id", "chunk_idx", "chunk_len")


@query(
    "multimodal_audio_energy",
    oracle="""
    WITH s AS (
      SELECT doc_id AS media_id, i.i AS idx,
             (doc_id * 31 + i.i * 17) % 256 AS b
      FROM documents, generate_series(0, 127) i(i)
      WHERE doc_id % 23 = 0 AND i.i < 64 + doc_id % 64
    )
    SELECT media_id,
           CAST(idx // 16 AS INT) AS window_no,
           CAST(count(*) AS BIGINT) AS n_samples,
           CAST(sum((b - 128) * (b - 128)) AS BIGINT) AS energy_ssq
    FROM s GROUP BY media_id, idx // 16
    """,
    tags=("pipeline", "multimodal", "custom-op"),
)
def multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed audio energy through the REAL RIFF/WAVE codec
    round-trip: deterministic 8-bit PCM samples (doc_id-derived) are
    containerized with ``encode_wav``, decoded back by ``_parse_wav``
    (the same parser the wav feature path runs), then windowed into
    16-sample panes emitting EXACT integer sum-of-squares energy —
    8-bit PCM decodes to dyadic rationals, so the int round-trip is
    bit-exact and the DuckDB oracle reproduces it from the sample
    formula alone. Map-only Arrow-batched synth+decode (no shuffle
    before the per-window rows); at 100 TB the payload column stays
    where it is and only the tiny energy rows move."""
    import numpy as np

    from flink_1_16_0_src_spark.pipeline.multimodal import _parse_wav, encode_wav

    d = load(spark, sf_dir, "documents").where(F.col("doc_id") % 23 == 0)
    base = d.select(F.col("doc_id").alias("media_id"))

    def synth_and_energy(batches):
        import pandas as pd

        for pdf in batches:
            out = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                n = 64 + mid % 64
                raw = bytes((mid * 31 + i * 17) % 256 for i in range(n))
                samples, _rate = _parse_wav(encode_wav(raw, rate=8000))
                ints = np.rint(samples[:, 0] * 128.0).astype("int64")
                for w in range(0, len(ints), 16):
                    seg = ints[w : w + 16]
                    out.append(
                        {
                            "media_id": mid,
                            "window_no": w // 16,
                            "n_samples": len(seg),
                            "energy_ssq": int((seg * seg).sum()),
                        }
                    )
            yield pd.DataFrame(
                out, columns=["media_id", "window_no", "n_samples", "energy_ssq"]
            )

    return base.mapInPandas(
        synth_and_energy,
        "media_id bigint, window_no int, n_samples bigint, energy_ssq bigint",
    )


@query(
    "multimodal_video_motion",
    oracle="""
    WITH px AS (
      SELECT doc_id AS media_id, f.f AS frame_no, p.p AS px_idx,
             (doc_id + f.f * 7 + p.p * 13) % 256 AS y
      FROM documents, generate_series(0, 2) f(f), generate_series(0, 63) p(p)
      WHERE doc_id % 29 = 0
    )
    SELECT cur.media_id, CAST(cur.frame_no AS INT) AS frame_no,
           CAST(sum(abs(cur.y - prv.y)) AS BIGINT) AS motion_sad
    FROM px cur JOIN px prv
      ON prv.media_id = cur.media_id AND prv.px_idx = cur.px_idx
     AND prv.frame_no = cur.frame_no - 1
    GROUP BY cur.media_id, cur.frame_no
    """,
    tags=("pipeline", "multimodal", "custom-op"),
)
def multimodal_video_motion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-to-frame motion (sum of absolute Y-plane differences —
    the scene-change / keyframe-selection signal) through the REAL
    YUV4MPEG2 codec round-trip: three deterministic 8x8 frames per doc
    are containerized with ``encode_y4m``, decoded by ``_parse_y4m``,
    and consecutive frames differenced into an exact integer SAD.
    Map-only per payload; output is |frames|-1 tiny rows per video."""
    import numpy as np

    from flink_1_16_0_src_spark.pipeline.multimodal import _parse_y4m, encode_y4m

    d = load(spark, sf_dir, "documents").where(F.col("doc_id") % 29 == 0)
    base = d.select(F.col("doc_id").alias("media_id"))

    def synth_and_motion(batches):
        import pandas as pd

        for pdf in batches:
            out = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                frames = [
                    np.array(
                        [(mid + f * 7 + p * 13) % 256 for p in range(64)],
                        dtype=np.uint8,
                    ).reshape(8, 8)
                    for f in range(3)
                ]
                w, h, decoded = _parse_y4m(encode_y4m(frames, 8, 8))
                for f in range(1, len(decoded)):
                    sad = int(
                        np.abs(
                            decoded[f].astype("int64") - decoded[f - 1].astype("int64")
                        ).sum()
                    )
                    out.append({"media_id": mid, "frame_no": f, "motion_sad": sad})
            yield pd.DataFrame(out, columns=["media_id", "frame_no", "motion_sad"])

    return base.mapInPandas(
        synth_and_motion, "media_id bigint, frame_no int, motion_sad bigint"
    )


def _synth_images(spark: SparkSession, sf_dir: str, with_perturbed: bool):
    """Deterministic 32x32 ppm fixtures from the documents ids (every
    5th doc): pixel (y, x, c) = ((base*2654435761 + (x + 32c)*40503 +
    y*69427) >> 3) % 256 — integer mixing, replayable in SQL. The
    perturbed twin (media_id = base + 500000) brightens ONE 4x4 block
    (by=3, bx=2) by +8 (clipped), flipping at most the two dhash
    comparisons that touch it."""
    import numpy as np

    from pyspark.sql.types import (
        BinaryType, LongType, StructField, StructType,
    )

    from flink_1_16_0_src_spark.pipeline.multimodal import encode_ppm

    ids = (
        load(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 5 == 0)
        .select(F.col("doc_id").alias("base"), F.lit(0).alias("pert"))
    )
    if with_perturbed:
        ids = ids.unionByName(
            ids.select("base", F.lit(1).alias("pert"))
        )
    out_schema = StructType([
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
    ])

    def _gen(batches):
        y, x = np.mgrid[0:32, 0:32]
        for pdf in batches:
            rows = []
            for base, pert in zip(pdf["base"], pdf["pert"]):
                base = int(base)
                px = np.stack(
                    [
                        ((base * 2654435761 + (x + 32 * c) * 40503
                          + y * 69427) >> 3) % 256
                        for c in range(3)
                    ],
                    axis=-1,
                ).astype(np.int64)
                if pert:
                    px[12:16, 8:12, :] = np.minimum(
                        px[12:16, 8:12, :] + 8, 255
                    )
                rows.append(
                    (base + (500000 if pert else 0),
                     encode_ppm(px.astype(np.uint8)))
                )
            import pandas as pd

            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    return ids.mapInPandas(_gen, out_schema)


_DHASH_SIG_SQL = """
    px AS (
      SELECT i.mid, i.base, i.pert, xs.x, ys.y,
             (299 * (CASE WHEN i.pert = 1 AND xs.x // 4 = 2 AND ys.y // 4 = 3
                     THEN least(((i.base*2654435761 + (xs.x + 0)*40503 + ys.y*69427) >> 3) % 256 + 8, 255)
                     ELSE ((i.base*2654435761 + (xs.x + 0)*40503 + ys.y*69427) >> 3) % 256 END)
            + 587 * (CASE WHEN i.pert = 1 AND xs.x // 4 = 2 AND ys.y // 4 = 3
                     THEN least(((i.base*2654435761 + (xs.x + 32)*40503 + ys.y*69427) >> 3) % 256 + 8, 255)
                     ELSE ((i.base*2654435761 + (xs.x + 32)*40503 + ys.y*69427) >> 3) % 256 END)
            + 114 * (CASE WHEN i.pert = 1 AND xs.x // 4 = 2 AND ys.y // 4 = 3
                     THEN least(((i.base*2654435761 + (xs.x + 64)*40503 + ys.y*69427) >> 3) % 256 + 8, 255)
                     ELSE ((i.base*2654435761 + (xs.x + 64)*40503 + ys.y*69427) >> 3) % 256 END)
             ) // 1000 AS gray
      FROM imgs i, generate_series(0, 31) xs(x), generate_series(0, 31) ys(y)
    ),
    blocks AS (
      SELECT mid, y // 4 AS by, x // 4 AS bx, sum(gray) // 16 AS bm
      FROM px GROUP BY mid, y // 4, x // 4
    ),
    bits AS (
      SELECT l.mid, l.by * 7 + l.bx AS bit,
             CASE WHEN l.bm > r.bm THEN 1 ELSE 0 END AS b
      FROM blocks l JOIN blocks r
        ON l.mid = r.mid AND l.by = r.by AND r.bx = l.bx + 1
      WHERE l.bx < 7
    ),
    sig AS (
      SELECT mid, CAST(sum(CASE WHEN b = 1 THEN (1::BIGINT << bit)
                                ELSE 0 END) AS BIGINT) AS dhash
      FROM bits GROUP BY mid
    )
"""


@query(
    "multimodal_image_dhash",
    oracle=f"""
    WITH imgs AS (
      SELECT doc_id AS mid, doc_id AS base, 0 AS pert
      FROM documents WHERE doc_id % 5 = 0
    ),
    {_DHASH_SIG_SQL}
    SELECT mid AS media_id, dhash FROM sig
    """,
    tags=("pipeline", "multimodal", "dedup", "custom-op"),
)
def multimodal_image_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image dHash (pipeline.multimodal.image_dhash — r11):
    deterministic 32x32 ppm fixtures decode through the real P6 codec,
    integer luma, 4x4 block means, row-adjacent gradient signs → a
    56-bit BIGINT signature, ALL INTEGER (the oracle replays pixel
    synthesis + the hash arithmetic in SQL — so a decode bug would
    hash-mismatch). Map-only Arrow pass."""
    from flink_1_16_0_src_spark.pipeline.multimodal import image_dhash

    media = _synth_images(spark, sf_dir, with_perturbed=False)
    return image_dhash(media, "payload", "media_id")


@query(
    "multimodal_image_neardup",
    oracle=f"""
    WITH imgs AS (
      SELECT doc_id AS mid, doc_id AS base, 0 AS pert
      FROM documents WHERE doc_id % 5 = 0
      UNION ALL
      SELECT doc_id + 500000, doc_id, 1
      FROM documents WHERE doc_id % 5 = 0
    ),
    {_DHASH_SIG_SQL}
    SELECT a.mid AS id_a, b.mid AS id_b,
           CAST(bit_count(xor(a.dhash, b.dhash)) AS BIGINT) AS hamming
    FROM sig a JOIN sig b ON a.mid < b.mid
    WHERE bit_count(xor(a.dhash, b.dhash)) <= 4
    """,
    tags=("pipeline", "multimodal", "dedup", "custom-op"),
)
def multimodal_image_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image NEAR-DUP pairs by dHash hamming distance (r11 —
    pipeline.dedup.hamming_near_dup_pairs over image_dhash
    signatures): every image gets a perturbed twin (+8 on one 4x4
    block, at most two gradient-sign flips); the pigeonhole band
    equi-join (5 bands over 56 bits, EXACT vs the full hamming join —
    uncapped here) recovers the twins at hamming <= 4. The oracle is
    the literal all-pairs hamming join, feasible only at oracle scale
    — which is exactly why the banded operator exists."""
    from flink_1_16_0_src_spark.pipeline.dedup import hamming_near_dup_pairs
    from flink_1_16_0_src_spark.pipeline.multimodal import image_dhash

    media = _synth_images(spark, sf_dir, with_perturbed=True)
    sigs = image_dhash(media, "payload", "media_id")
    return hamming_near_dup_pairs(
        sigs, "media_id", "dhash", bits=56, max_hamming=4, max_bucket=None
    )


@query(
    "multimodal_audio_neardup",
    oracle="""
    WITH m AS (
      SELECT doc_id AS base FROM documents WHERE doc_id % 5 = 0
    ),
    clips AS (
      SELECT base AS mid, base, 0 AS pert FROM m
      UNION ALL
      SELECT base + 500000, base, 1 FROM m
    ),
    samples AS (
      SELECT c.mid, s.i // 64 AS f,
             CASE WHEN c.pert = 1 AND s.i // 64 = 20
                  THEN least(((c.base*2654435761 + s.i*40503) >> 3) % 256 + 4, 255)
                  ELSE ((c.base*2654435761 + s.i*40503) >> 3) % 256 END AS v
      FROM clips c, generate_series(0, 3647) s(i)
    ),
    energies AS (
      SELECT mid, f, sum(v) AS e FROM samples GROUP BY mid, f
    ),
    sig AS (
      SELECT l.mid,
             CAST(sum(CASE WHEN l.e > r.e THEN (1::BIGINT << l.f)
                           ELSE 0 END) AS BIGINT) AS afp
      FROM energies l JOIN energies r ON l.mid = r.mid AND r.f = l.f + 1
      WHERE l.f < 56
      GROUP BY l.mid
    )
    SELECT a.mid AS id_a, b.mid AS id_b,
           CAST(bit_count(xor(a.afp, b.afp)) AS BIGINT) AS hamming
    FROM sig a JOIN sig b ON a.mid < b.mid
    WHERE bit_count(xor(a.afp, b.afp)) <= 4
    """,
    tags=("pipeline", "multimodal", "dedup", "custom-op"),
)
def multimodal_audio_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio NEAR-DUP pairs by energy-gradient fingerprint hamming
    distance (r11 — pipeline.multimodal.audio_fingerprint +
    pipeline.dedup.hamming_near_dup_pairs): deterministic 8-bit PCM
    clips (3648 samples from integer mixing) decode through the real
    RIFF/WAVE codec; each clip gets a twin with ONE frame boosted +4
    (at most two gradient-sign flips); the pigeonhole band join
    recovers the twins at hamming <= 4. The oracle replays sample
    synthesis, frame energies, the 56-bit signature, and the literal
    all-pairs hamming join in SQL — a codec bug would hash-mismatch."""
    import numpy as np

    from pyspark.sql.types import (
        BinaryType, LongType, StructField, StructType,
    )

    from flink_1_16_0_src_spark.pipeline.dedup import hamming_near_dup_pairs
    from flink_1_16_0_src_spark.pipeline.multimodal import (
        audio_fingerprint,
        encode_wav,
    )

    ids = (
        load(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 5 == 0)
        .select(F.col("doc_id").alias("base"))
    )
    clips = ids.select("base", F.lit(0).alias("pert")).unionByName(
        ids.select("base", F.lit(1).alias("pert"))
    )
    out_schema = StructType([
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
    ])

    def _gen(batches):
        import pandas as pd

        i = np.arange(3648, dtype=np.int64)
        for pdf in batches:
            rows = []
            for base, pert in zip(pdf["base"], pdf["pert"]):
                base = int(base)
                v = ((base * 2654435761 + i * 40503) >> 3) % 256
                if pert:
                    v = v.copy()
                    v[20 * 64 : 21 * 64] = np.minimum(
                        v[20 * 64 : 21 * 64] + 4, 255
                    )
                rows.append(
                    (base + (500000 if pert else 0),
                     encode_wav(v.astype(np.uint8).tobytes()))
                )
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    media = clips.mapInPandas(_gen, out_schema)
    sigs = audio_fingerprint(media, "payload", "media_id")
    return hamming_near_dup_pairs(
        sigs, "media_id", "afp", bits=56, max_hamming=4, max_bucket=None
    )


@query(
    "multimodal_video_neardup",
    oracle="""
    WITH m AS (
      SELECT doc_id AS base FROM documents WHERE doc_id % 5 = 0
    ),
    clips AS (
      SELECT base AS mid, base, 0 AS pert FROM m
      UNION ALL
      SELECT base + 500000, base, 1 FROM m
    ),
    px AS (
      SELECT c.mid, s.i // 64 AS f, s.i % 64 AS p,
             CASE WHEN c.pert = 1 AND s.i // 64 = 20
                  THEN least(((c.base*2654435761 + s.i*40503
                               + (s.i // 64)*69427) >> 3) % 256 + 4,
                             255)
                  ELSE ((c.base*2654435761 + s.i*40503
                         + (s.i // 64)*69427) >> 3) % 256 END AS y
      FROM clips c, generate_series(0, 3711) s(i)
    ),
    motion AS (
      SELECT cur.mid, cur.f, sum(abs(cur.y - prv.y)) AS sad
      FROM px cur JOIN px prv
        ON prv.mid = cur.mid AND prv.p = cur.p AND prv.f = cur.f - 1
      GROUP BY cur.mid, cur.f
    ),
    sig AS (
      SELECT l.mid,
             CAST(sum(CASE WHEN r.sad > l.sad
                           THEN (1::BIGINT << (l.f - 1))
                           ELSE 0 END) AS BIGINT) AS vfp
      FROM motion l JOIN motion r ON l.mid = r.mid AND r.f = l.f + 1
      GROUP BY l.mid
    )
    SELECT a.mid AS id_a, b.mid AS id_b,
           CAST(bit_count(xor(a.vfp, b.vfp)) AS BIGINT) AS hamming
    FROM sig a JOIN sig b ON a.mid < b.mid
    WHERE bit_count(xor(a.vfp, b.vfp)) <= 4
    """,
    tags=("pipeline", "multimodal", "dedup", "custom-op"),
)
def multimodal_video_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video NEAR-DUP pairs by motion-profile fingerprint hamming
    distance (r11 — pipeline.multimodal.video_motion_fingerprint +
    pipeline.dedup.hamming_near_dup_pairs, completing the
    image/audio/video near-dup triple): deterministic 58-frame 8x8
    videos (integer-mixing Y planes) round-trip the real YUV4MPEG2
    codec; each video gets a twin with ONE frame brightened +4
    (clipped), which perturbs two consecutive frame-SADs and flips at
    most three motion-gradient bits; the pigeonhole band join recovers
    the twins at hamming <= 4. The oracle replays pixel synthesis,
    frame SADs, the 56-bit motion signature, and the literal all-pairs
    hamming join in SQL — a codec bug would hash-mismatch."""
    import numpy as np

    from pyspark.sql.types import (
        BinaryType, LongType, StructField, StructType,
    )

    from flink_1_16_0_src_spark.pipeline.dedup import hamming_near_dup_pairs
    from flink_1_16_0_src_spark.pipeline.multimodal import (
        encode_y4m,
        video_motion_fingerprint,
    )

    ids = (
        load(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 5 == 0)
        .select(F.col("doc_id").alias("base"))
    )
    clips = ids.select("base", F.lit(0).alias("pert")).unionByName(
        ids.select("base", F.lit(1).alias("pert"))
    )
    out_schema = StructType([
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
    ])

    def _gen(batches):
        import pandas as pd

        i = np.arange(58 * 64, dtype=np.int64)
        for pdf in batches:
            rows = []
            for base, pert in zip(pdf["base"], pdf["pert"]):
                base = int(base)
                v = ((base * 2654435761 + i * 40503
                      + (i // 64) * 69427) >> 3) % 256
                if pert:
                    v = v.copy()
                    v[20 * 64 : 21 * 64] = np.minimum(
                        v[20 * 64 : 21 * 64] + 4, 255
                    )
                frames = [
                    v[f * 64 : (f + 1) * 64]
                    .astype(np.uint8).reshape(8, 8)
                    for f in range(58)
                ]
                rows.append(
                    (base + (500000 if pert else 0),
                     encode_y4m(frames, 8, 8))
                )
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    media = clips.mapInPandas(_gen, out_schema)
    sigs = video_motion_fingerprint(media, "payload", "media_id")
    return hamming_near_dup_pairs(
        sigs, "media_id", "vfp", bits=56, max_hamming=4, max_bucket=None
    )
