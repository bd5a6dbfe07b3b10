"""Multimodal tier queries (SURVEY §2.12 [EXT]): binary payload columns +
typed metadata, decode/extract/resize/frame-sample kernels. The media table
derives deterministically from `documents` (payload = utf-8 bytes), so the
metadata-level queries are DuckDB-oracle-checkable; the stub-codec kernel
queries are rows-only with unit-tested batch shapes, and
`media_image_decode_dims` oracle-checks the REAL numpy BMP codec
(operators/codecs.py) end to end."""

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


# The fake decoder expands the payload's sha256 digest (32 bytes) to 256
# values, so every 32-value pool chunk IS the digest: f0 = float32 of the
# float64 mean over float32(byte/255) — mirrored term by term, left-
# associative, so both engines execute the identical IEEE sequence.
_F0_SUM = " + ".join(
    f"CAST(CAST(CAST(('0x' || substr(d, {2 * k + 1}, 2)) AS INT) / 255.0 AS REAL) AS DOUBLE)"
    for k in range(32)
)


@register(
    "media_feature_extraction",
    tags=("multimodal", "mapInPandas"),
    oracle=f"""
    WITH dg AS (SELECT doc_id, sha256(text) AS d FROM documents)
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
           CAST(256 AS INT) AS n_values,
           {rnd_sql(f"CAST(CAST(({_F0_SUM}) / 32.0 AS REAL) AS DOUBLE)", 6)} AS f0
    FROM dg
    """,
)
def media_feature_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode -> pooled feature vector via the Arrow-batched kernel. The
    oracle proves the PLUMBING (mapInPandas batching, pooling arithmetic,
    Arrow float32 schema) end to end against the documented deterministic
    stand-in codec's closed form — a registered real codec (images: BMP/PPM,
    audio: WAV) changes the decode, not the plumbing, and is oracle-checked
    by media_image_decode_dims / media_audio_decode_stats."""
    feats = extract_features(_media(spark, sf_dir))
    return feats.select(
        "media_id",
        "media_type",
        "n_values",
        F.element_at("feature", 1).cast("double").alias("f0"),
    ).withColumn("f0", rnd("f0", 6))


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
    "media_resize_shapes",
    tags=("multimodal", "mapInPandas"),
    oracle="""
    -- stub byte-downsample closed form: linspace over payload bytes emits
    -- min(64*48, len) bytes; empty payloads pass through as 0 bytes
    SELECT doc_id AS media_id,
           CAST(64 AS INT) AS width,
           CAST(48 AS INT) AS height,
           CAST(least(3072, octet_length(encode(text))) AS INT) AS n_bytes
    FROM documents
    """,
)
def media_resize_shapes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize kernel output shapes (64x48 target): payload re-encoded
    batch-at-a-time; result sizes prove the kernel ran per-row. The oracle
    pins the documented stub's byte-count closed form (no codecs are
    registered in driver runs; the real-codec path is oracle-checked by
    media_image_decode_dims)."""
    resized = resize_images(_media(spark, sf_dir), width=64, height=48)
    return resized.select(
        "media_id", "width", "height", F.length("payload").alias("n_bytes")
    )


@register(
    "media_frame_sample",
    tags=("multimodal", "mapInPandas"),
    oracle="""
    -- equal-slice stub frames: step = max(len // 4, 1); frame i covers
    -- bytes [i*step, min(len, (i+1)*step)) — frames past the payload end
    -- are empty rows, and empty payloads emit no rows at all
    WITH media AS (
      SELECT doc_id AS media_id, octet_length(encode(text)) AS len
      FROM documents WHERE doc_id % 3 = 2
    )
    SELECT media_id,
           CAST(i AS INT) AS frame_idx,
           CAST(greatest(0, least(len, (i + 1) * greatest(len // 4, 1))
                            - i * greatest(len // 4, 1)) AS INT) AS n_bytes
    FROM media, unnest([0, 1, 2, 3]) AS t(i)
    WHERE len > 0
    """,
)
def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling (UDTF-shaped: 4 rows out per video in). The oracle
    pins the stub's slice arithmetic per emitted row — proving the
    rows-out>rows-in mapInPandas shape end to end."""
    m = _media(spark, sf_dir).filter(F.col("meta.media_type") == "video")
    frames = sample_frames(m, n_frames=4)
    return frames.select(
        "media_id", "frame_idx", F.length("frame_payload").alias("n_bytes")
    )
