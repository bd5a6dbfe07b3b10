"""Multimodal tier queries (SURVEY §2.12 [EXT]): binary payload columns +
typed metadata, decode/extract/resize/frame-sample kernels — all running
REAL pure-stdlib codecs (BMP/PPM, RIFF/WAV, Y4M; operators/codecs.py).

Two media tables: `synthesize_media` (payload = utf-8 doc bytes) backs the
metadata/digest queries that never decode; `synthesize_real_media` (actual
BMP/WAV/Y4M containers with closed-form contents) backs every decoding
kernel, so each query's DuckDB oracle can reproduce byte counts AND exact
decoded-value checksums without seeing a single payload byte. No query
path uses the deterministic stand-in decoder."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from drug_target_discovery_spark.functions.rounding import rnd, rnd_sql
from drug_target_discovery_spark.operators.multimodal import (
    extract_features,
    media_stats,
    resize_images,
    sample_frames,
    synthesize_media,
)
from drug_target_discovery_spark.queries.registry import register
from drug_target_discovery_spark.sources.tables import load_table


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    return synthesize_media(load_table(spark, sf_dir, "documents"))


@register(
    "media_metadata_stats",
    tags=("multimodal", "agg"),
    oracle=f"""
    WITH media AS (
      SELECT doc_id AS media_id,
             encode(text) AS payload,
             CASE WHEN doc_id % 3 = 0 THEN 'image'
                  WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
             CASE WHEN doc_id % 3 = 0 THEN 'png'
                  WHEN doc_id % 3 = 1 THEN 'wav' ELSE 'mp4' END AS format
      FROM documents
    )
    SELECT media_type, format,
           count(*) AS n,
           CAST(sum(octet_length(payload)) AS BIGINT) AS total_bytes,
           {rnd_sql("avg(octet_length(payload))", 4)} AS avg_bytes
    FROM media GROUP BY media_type, format
    """,
)
def media_metadata_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata + payload-size stats per media type. Column pruning keeps
    the binary payload out of everything except length() — verify with
    .explain: the scan reads only the needed columns."""
    out = media_stats(_media(spark, sf_dir))
    return out.select(
        "media_type", "format", "n", "total_bytes", rnd("avg_bytes", 4).alias("avg_bytes")
    )


@register(
    "media_payload_digest",
    tags=("multimodal",),
    oracle="""
    -- DuckDB sha256 takes VARCHAR and hashes its UTF-8 bytes — exactly the
    -- payload bytes (payload = encode(text, 'utf-8'))
    SELECT doc_id AS media_id,
           sha256(text) AS digest,
           octet_length(encode(text)) AS n_bytes
    FROM documents
    """,
)
def media_payload_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column content addressing: sha256 over the payload bytes —
    the exact-dedup primitive for media corpora."""
    m = _media(spark, sf_dir)
    return m.select(
        "media_id",
        F.sha2("payload", 256).alias("digest"),
        F.length("payload").alias("n_bytes"),
    )


# Real-payload synth closed forms (operators/multimodal.py
# _real_media_params): value k of media m is (31m + 17k) mod 256 for
# image/video planes, mod 65536 - 32768 for audio PCM. The oracles below
# reproduce decoded-value checksums from these forms alone — DuckDB never
# sees a payload byte, so a codec that mis-parses any byte diverges.
_REAL_PARAMS_SQL = """
      SELECT doc_id AS media_id,
             CASE doc_id % 3 WHEN 0 THEN 'image'
                             WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
             CASE doc_id % 3
               WHEN 0 THEN (doc_id % 13 + 1) * (doc_id % 7 + 1) * 3
               WHEN 1 THEN (doc_id % 400 + 50) * (doc_id % 2 + 1)
               ELSE (doc_id % 6 + 2) * 3 * (doc_id % 9 + 4) * (doc_id % 16 + 8)
             END AS n
      FROM documents
"""


@register(
    "media_feature_extraction",
    tags=("multimodal", "mapInPandas", "codec"),
    oracle=f"""
    WITH p AS ({_REAL_PARAMS_SQL}),
    s AS (SELECT media_id, media_type, n, unnest(range(0, n)) AS k FROM p)
    SELECT media_id, media_type,
           CAST(n AS INT) AS n_values,
           CAST(sum(CASE WHEN media_type = 'audio'
                         THEN (31 * media_id + 17 * k) % 65536 - 32768
                         ELSE (31 * media_id + 17 * k) % 256 END)
                AS BIGINT) AS value_sum
    FROM s GROUP BY media_id, media_type, n
    """,
)
def media_feature_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode -> pooled feature vector via the Arrow-batched kernel, against
    REAL payloads and REAL codecs for all three media types (BMP images,
    RIFF/WAV audio, Y4M video — operators/codecs.py). The oracle checks the
    decoded size AND the exact integer checksum of every decoded value per
    payload: proof that each real container was parsed and its full sample
    data recovered, not just that rows flowed through the kernel."""
    from drug_target_discovery_spark.operators.codecs import register_builtin_codecs
    from drug_target_discovery_spark.operators.multimodal import synthesize_real_media

    register_builtin_codecs()
    media = synthesize_real_media(load_table(spark, sf_dir, "documents"))
    feats = extract_features(media)
    return feats.select("media_id", "media_type", "n_values", "value_sum")


@register(
    "media_image_decode_dims",
    tags=("multimodal", "mapInPandas", "codec"),
    oracle="""
    -- BMP layout has a closed form: 54-byte header + rows of 3*w bytes
    -- padded to 4-byte multiples, h rows. The Spark side round-trips real
    -- bytes through the numpy BMP codec; matching n_bytes/width/height
    -- proves encode AND header-parse decode ran per row.
    SELECT doc_id AS media_id,
           CAST(doc_id % 13 + 1 AS INT) AS width,
           CAST(doc_id % 7 + 1 AS INT) AS height,
           CAST(54 + (3 * (doc_id % 13 + 1)
                      + (4 - (3 * (doc_id % 13 + 1)) % 4) % 4)
                    * (doc_id % 7 + 1) AS BIGINT) AS n_bytes
    FROM documents WHERE doc_id % 3 = 0
    """,
)
def media_image_decode_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image codec, end to end in executors: synthesize a deterministic
    (h, w, 3) image per doc, encode it to BMP bytes, decode those bytes back
    with the header-parsing decoder, and emit the decoded dimensions plus
    payload size. Map-only Arrow-batched stage — the oracle checks the BMP
    byte layout arithmetic, so a codec that mis-writes padding or parses the
    header wrong diverges."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 3 == 0)
        .select(
            F.col("doc_id").alias("media_id"),
            (F.col("doc_id") % 13 + 1).cast("int").alias("w"),
            (F.col("doc_id") % 7 + 1).cast("int").alias("h"),
        )
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from drug_target_discovery_spark.operators.codecs import (
            decode_bmp,
            encode_bmp,
        )

        for pdf in batches:
            rows = []
            for mid, w, h in zip(pdf["media_id"], pdf["w"], pdf["h"]):
                rng = (np.arange(int(h) * int(w) * 3, dtype=np.int64) * (int(mid) + 7)) % 256
                img = rng.reshape(int(h), int(w), 3).astype(np.uint8)
                payload = encode_bmp(img)
                decoded = decode_bmp(payload)
                rows.append(
                    (int(mid), decoded.shape[1], decoded.shape[0], len(payload))
                )
            yield pd.DataFrame(rows, columns=["media_id", "width", "height", "n_bytes"])

    return docs.mapInPandas(
        kernel, schema="media_id BIGINT, width INT, height INT, n_bytes BIGINT"
    )


@register(
    "media_audio_decode_stats",
    tags=("multimodal", "mapInPandas", "codec"),
    oracle="""
    -- PCM WAV layout has a closed form: 44-byte canonical header + 2 bytes
    -- per sample per channel. The Spark side round-trips real int16 PCM
    -- through the RIFF encoder and the chunk-walking decoder
    -- (operators/codecs.py); matching n_bytes/n_samples/first_sample_i16
    -- proves both the byte layout and the sample data survived the trip.
    SELECT doc_id AS media_id,
           CAST(doc_id % 400 + 50 AS BIGINT) AS n_samples,
           CAST(doc_id % 2 + 1 AS INT) AS n_channels,
           CAST(8000 + (doc_id % 4) * 2000 AS INT) AS sample_rate,
           CAST(44 + 2 * (doc_id % 400 + 50) * (doc_id % 2 + 1) AS BIGINT)
             AS n_bytes,
           CAST(floor((doc_id % 400 + 50) * 1000.0
                      / (8000 + (doc_id % 4) * 2000)) AS BIGINT) AS duration_ms,
           CAST((doc_id * 31) % 65536 - 32768 AS INT) AS first_sample_i16
    FROM documents WHERE doc_id % 3 = 1
    """,
)
def media_audio_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio codec, end to end in executors (the WAV analog of
    media_image_decode_dims): synthesize deterministic int16 PCM per audio
    doc, encode to RIFF/WAV bytes, decode them back with the chunk-walking
    parser, and emit the decoded stream stats. The first decoded sample is
    rescaled back to int16 — an exact integer in both engines, so the oracle
    proves the data path (not just the header arithmetic) with no
    float-rounding tie hazards. Map-only Arrow-batched stage."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 3 == 1)
        .select(
            F.col("doc_id").alias("media_id"),
            (F.col("doc_id") % 400 + 50).cast("int").alias("n"),
            (F.col("doc_id") % 2 + 1).cast("int").alias("c"),
            (F.lit(8000) + (F.col("doc_id") % 4) * 2000).cast("int").alias("sr"),
        )
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from drug_target_discovery_spark.operators.codecs import (
            decode_wav,
            encode_wav,
            wav_info,
        )

        for pdf in batches:
            rows = []
            for mid, n, c, sr in zip(pdf["media_id"], pdf["n"], pdf["c"], pdf["sr"]):
                mid, n, c, sr = int(mid), int(n), int(c), int(sr)
                flat = (mid * 31 + np.arange(n * c, dtype=np.int64) * 17) % 65536 - 32768
                samples = flat.reshape(n, c).astype(np.int16)
                payload = encode_wav(samples, sr)
                info = wav_info(payload)
                arr = decode_wav(payload)
                rows.append(
                    (
                        mid,
                        arr.shape[0],
                        arr.shape[1],
                        info["sample_rate"],
                        len(payload),
                        arr.shape[0] * 1000 // info["sample_rate"],
                        int(np.rint(float(arr[0, 0]) * 32768.0)),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "n_samples", "n_channels", "sample_rate",
                    "n_bytes", "duration_ms", "first_sample_i16",
                ],
            )

    return docs.mapInPandas(
        kernel,
        schema=(
            "media_id BIGINT, n_samples BIGINT, n_channels INT, sample_rate INT, "
            "n_bytes BIGINT, duration_ms BIGINT, first_sample_i16 INT"
        ),
    )


@register(
    "media_video_decode_stats",
    tags=("multimodal", "mapInPandas", "codec"),
    oracle="""
    -- Y4M layout has a closed form: stream header
    -- 'YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C444\\n' (33 chars + the digits of
    -- w and h), then per frame 'FRAME\\n' (6 bytes) + 3*h*w plane bytes.
    -- The Spark side round-trips real frames through the Y4M encoder and
    -- the chunk-walking parser (operators/codecs.py); matching
    -- n_bytes/n_frames/dims proves the container layout, and value_sum
    -- (exact integer checksum of every decoded sample) proves the plane
    -- data survived the trip.
    WITH v AS (
      SELECT doc_id AS media_id, doc_id % 16 + 8 AS w, doc_id % 9 + 4 AS h,
             doc_id % 6 + 2 AS t
      FROM documents WHERE doc_id % 3 = 2
    ),
    s AS (SELECT media_id, w, h, t, unnest(range(0, t * 3 * h * w)) AS k FROM v)
    SELECT media_id,
           CAST(t AS INT) AS n_frames,
           CAST(w AS INT) AS width,
           CAST(h AS INT) AS height,
           CAST(25 AS INT) AS fps_num,
           CAST(33 + length(CAST(w AS VARCHAR)) + length(CAST(h AS VARCHAR))
                   + t * (6 + 3 * h * w) AS BIGINT) AS n_bytes,
           CAST(t * 40 AS BIGINT) AS duration_ms,
           CAST((31 * media_id) % 256 AS INT) AS first_px,
           CAST(sum((31 * media_id + 17 * k) % 256) AS BIGINT) AS value_sum
    FROM s GROUP BY media_id, w, h, t
    """,
)
def media_video_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video codec, end to end in executors (the Y4M analog of
    media_audio_decode_stats, closing the last fake decoder): synthesize a
    deterministic clip per video doc, encode it to a YUV4MPEG2 stream, parse
    the stream back with the FRAME-walking parser, and emit the decoded clip
    stats plus the exact integer checksum of every decoded sample. Map-only
    Arrow-batched stage over synthesize_real_media payloads."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from drug_target_discovery_spark.operators.multimodal import synthesize_real_media

    media = synthesize_real_media(load_table(spark, sf_dir, "documents")).filter(
        F.col("meta.media_type") == "video"
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from drug_target_discovery_spark.operators.codecs import (
            decode_y4m,
            pixel_ints,
            y4m_info,
        )

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                info = y4m_info(b)
                clip = decode_y4m(b)
                ints = pixel_ints(clip)
                rows.append(
                    (
                        int(mid),
                        clip.shape[0],
                        clip.shape[2],
                        clip.shape[1],
                        info["fps_num"],
                        len(b),
                        clip.shape[0] * 1000 * info["fps_den"] // info["fps_num"],
                        int(ints[0, 0, 0, 0]) if clip.size else None,
                        int(ints.sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "n_frames", "width", "height", "fps_num",
                    "n_bytes", "duration_ms", "first_px", "value_sum",
                ],
            )

    return media.select("media_id", "payload").mapInPandas(
        kernel,
        schema=(
            "media_id BIGINT, n_frames INT, width INT, height INT, fps_num INT, "
            "n_bytes BIGINT, duration_ms BIGINT, first_px INT, value_sum BIGINT"
        ),
    )


def _bmp_checksum_kernel(carry_cols: list[str], payload_col: str):
    """mapInPandas kernel factory shared by media_resize_shapes and
    media_frame_sample: decode each BMP payload and emit the carry columns
    plus (n_bytes, value_sum) under the canonical pixel_checksum
    convention (operators/codecs.py) — one definition, so a checksum-
    convention change cannot diverge between the queries' oracles."""
    from collections.abc import Iterator

    import pandas as pd

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from drug_target_discovery_spark.operators.codecs import (
            decode_bmp,
            pixel_checksum,
        )

        for pdf in batches:
            rows = []
            for tup in zip(*(pdf[c] for c in carry_cols), pdf[payload_col]):
                *carry, payload = tup
                b = bytes(payload)
                rows.append(
                    (*[int(x) for x in carry], len(b), pixel_checksum(decode_bmp(b)))
                )
            yield pd.DataFrame(
                rows, columns=[*carry_cols, "n_bytes", "value_sum"]
            )

    return kernel


@register(
    "media_resize_shapes",
    tags=("multimodal", "mapInPandas", "codec"),
    oracle="""
    -- REAL resize closed form: decode the (h, w, 3) BMP, nearest-neighbor
    -- resample to 48x64 (source indices ri = floor((2r+1)h/96),
    -- ci = floor((2c+1)w/128) — never on an integer boundary since
    -- 32 never divides h<=7 and 128 never divides w<=13, so the float and
    -- integer forms agree), re-encode as BMP (64*3 row bytes, no padding:
    -- 54 + 192*48 = 9270 bytes). value_sum checksums every resampled pixel.
    WITH im AS (
      SELECT doc_id AS media_id, doc_id % 13 + 1 AS w, doc_id % 7 + 1 AS h
      FROM documents WHERE doc_id % 3 = 0
    ),
    s AS (SELECT media_id, w, h, unnest(range(0, 9216)) AS k FROM im),
    px AS (
      SELECT media_id, w,
             ((2 * (k // 192) + 1) * h) // 96 AS ri,
             ((2 * ((k % 192) // 3) + 1) * w) // 128 AS ci,
             k % 3 AS ch
      FROM s
    )
    SELECT media_id,
           CAST(64 AS INT) AS width,
           CAST(48 AS INT) AS height,
           CAST(9270 AS BIGINT) AS n_bytes,
           CAST(sum((31 * media_id + 17 * ((ri * w + ci) * 3 + ch)) % 256)
                AS BIGINT) AS value_sum
    FROM px GROUP BY media_id
    """,
)
def media_resize_shapes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image resize, end to end: decode each real BMP payload, resample
    to 64x48 with the deterministic nearest-neighbor kernel, re-encode to
    BMP — then a second Arrow stage decodes the resized payload and
    checksums every pixel. The oracle reproduces the resample's index
    arithmetic in SQL, so a kernel that picks different source pixels (or a
    codec that corrupts any byte on the second round trip) diverges."""
    from drug_target_discovery_spark.operators.codecs import register_builtin_codecs
    from drug_target_discovery_spark.operators.multimodal import synthesize_real_media

    register_builtin_codecs()
    media = synthesize_real_media(load_table(spark, sf_dir, "documents")).filter(
        F.col("meta.media_type") == "image"
    )
    resized = resize_images(media, width=64, height=48)

    return resized.mapInPandas(
        _bmp_checksum_kernel(["media_id", "width", "height"], "payload"),
        schema="media_id BIGINT, width INT, height INT, n_bytes BIGINT, value_sum BIGINT",
    )


@register(
    "media_frame_sample",
    tags=("multimodal", "mapInPandas", "codec"),
    oracle="""
    -- REAL frame sampling closed form: 4 evenly spaced source frames
    -- (src = i*t//4, repeats when t < 4), each re-encoded as a standalone
    -- BMP of the frame's h x w pixels (54 + (3w + pad)h bytes). value_sum
    -- checksums the selected frame's full plane data — slice
    -- [src*3hw, (src+1)*3hw) of the synth series.
    WITH v AS (
      SELECT doc_id AS media_id, doc_id % 16 + 8 AS w, doc_id % 9 + 4 AS h,
             doc_id % 6 + 2 AS t
      FROM documents WHERE doc_id % 3 = 2
    ),
    fr AS (
      SELECT media_id, w, h, t, i AS frame_idx, (i * t) // 4 AS src
      FROM v, unnest([0, 1, 2, 3]) AS u(i)
    ),
    s AS (SELECT media_id, w, h, frame_idx, src,
                 unnest(range(0, 3 * h * w)) AS j
          FROM fr)
    SELECT media_id,
           CAST(frame_idx AS INT) AS frame_idx,
           CAST(src AS INT) AS src_frame,
           CAST(54 + (3 * w + (4 - (3 * w) % 4) % 4) * h AS BIGINT) AS n_bytes,
           CAST(sum((31 * media_id + 17 * (src * 3 * h * w + j)) % 256)
                AS BIGINT) AS value_sum
    FROM s GROUP BY media_id, frame_idx, src, w, h
    """,
)
def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL frame sampling (UDTF-shaped: 4 rows out per video in): decode
    each Y4M clip, select 4 evenly spaced frames, re-encode each as a
    standalone BMP image payload — then checksum the sampled frames through
    a second decode. Proves the rows-out>rows-in mapInPandas shape AND that
    the sampled pixels are exactly the selected source frames' planes."""
    from drug_target_discovery_spark.operators.codecs import register_builtin_codecs
    from drug_target_discovery_spark.operators.multimodal import synthesize_real_media

    register_builtin_codecs()
    media = synthesize_real_media(load_table(spark, sf_dir, "documents")).filter(
        F.col("meta.media_type") == "video"
    )
    frames = sample_frames(media, n_frames=4)

    return frames.mapInPandas(
        _bmp_checksum_kernel(["media_id", "frame_idx", "src_frame"], "frame_payload"),
        schema=(
            "media_id BIGINT, frame_idx INT, src_frame INT, "
            "n_bytes BIGINT, value_sum BIGINT"
        ),
    )
