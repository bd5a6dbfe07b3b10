"""Multimodal column operators (SURVEY §2.12 [EXT], north star): treat
image/audio/video payloads as opaque ``binary`` columns with a typed
metadata struct, and run decode / feature-extract / resize / frame-sample
as Arrow-batched ``mapInPandas`` kernels.

The Spark-side plumbing — schemas, partitioning, UDF signatures, batch
shapes — is real and tested. The codec step sits behind a registry seam:
``register_decoder``/``register_encoder`` plug real callables in. For
IMAGES a real pure-numpy BMP/PPM codec ships in ``operators.codecs``
(``register_builtin_image_codecs``) — decode/resize/feature-extract run
against actual pixel data, oracle-checked end to end by
``media_image_decode_dims``. For AUDIO a real RIFF/WAV PCM codec ships
alongside it (``register_builtin_audio_codecs``), oracle-checked by
``media_audio_decode_stats``. Video remains on the deterministic fake
(no container format is simple enough to hand-roll honestly); the default
fake derives features from the payload digest so tests are reproducible
either way.
This is the standard seam: the cluster plumbing never changes when the
codec does.

Scale notes: payloads stay in executor memory only batch-at-a-time (Arrow
record batches); metadata-only queries never touch the binary column
(column pruning keeps it out of the scan); feature extraction is a
map-only stage — no shuffle until the (small) feature table aggregates.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_METADATA_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("format", T.StringType(), True),       # png|wav|mp4|...
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Decoder seam
# ---------------------------------------------------------------------------

Decoder = Callable[[bytes, dict], np.ndarray]
Encoder = Callable[[np.ndarray], bytes]
_DECODERS: dict[str, Decoder] = {}
_ENCODERS: dict[str, Encoder] = {}


def register_decoder(media_type: str, fn: Decoder) -> None:
    """Plug a real codec (numpy BMP/PPM via ``operators.codecs``, Pillow,
    ffmpeg, ...) into the pipeline. Kernels snapshot this registry into
    their closures at DataFrame-construction time, so a registration made
    on the driver reaches every executor's Python worker."""
    _DECODERS[media_type] = fn


def register_encoder(media_type: str, fn: Encoder) -> None:
    """Inverse seam: re-encode a decoded array back to payload bytes
    (used by transform kernels such as resize)."""
    _ENCODERS[media_type] = fn


def unregister_codecs(media_type: str) -> None:
    """Remove any registered codec pair (test-scoping helper)."""
    _DECODERS.pop(media_type, None)
    _ENCODERS.pop(media_type, None)


def _fake_decode(payload: bytes, meta: dict) -> np.ndarray:
    """Deterministic stand-in decoder: derives a fixed-shape float array
    from the payload digest. Replace via register_decoder for real media."""
    h = hashlib.sha256(payload).digest()
    arr = np.frombuffer((h * 8)[:256], dtype=np.uint8).astype(np.float32)
    return arr / 255.0


def get_decoder(media_type: str) -> Decoder:
    return _DECODERS.get(media_type, _fake_decode)


def strict_decoder(media_type: str) -> Decoder:
    """The production accessor: raises until a real codec is registered."""
    if media_type not in _DECODERS:
        raise NotImplementedError(
            f"no decoder registered for {media_type!r}; "
            "call register_decoder() with a codec-backed implementation"
        )
    return _DECODERS[media_type]


# ---------------------------------------------------------------------------
# Metadata-only operators (never touch the payload column)
# ---------------------------------------------------------------------------


def media_stats(media: DataFrame) -> DataFrame:
    """Per media_type/format stats from metadata + payload size. The binary
    column contributes only length(payload) — Spark evaluates it without
    shipping payloads to the driver."""
    return (
        media.groupBy(F.col("meta.media_type").alias("media_type"), F.col("meta.format").alias("format"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.length("payload")).alias("total_bytes"),
            F.avg(F.length("payload")).alias("avg_bytes"),
        )
    )


# ---------------------------------------------------------------------------
# mapInPandas kernels (real plumbing, stubbed codec)
# ---------------------------------------------------------------------------

FEATURE_DIM = 8
_FEATURE_SCHEMA = (
    "media_id BIGINT, media_type STRING, feature ARRAY<FLOAT>, n_values INT"
)


def extract_features(media: DataFrame, pool: int = FEATURE_DIM) -> DataFrame:
    """Decode each payload (codec seam) and pool the decoded array into a
    fixed-dim feature vector. Arrow-batched; one payload in memory per row
    of the batch, never the whole partition."""
    # snapshot the registry into the closure: executor workers are separate
    # Python processes and never see driver-side mutation of module globals
    decoders = dict(_DECODERS)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, mtype, payload in zip(pdf["media_id"], pdf["media_type"], pdf["payload"]):
                arr = decoders.get(mtype, _fake_decode)(bytes(payload), {}).ravel()
                chunks = np.array_split(arr, pool)
                # pool in float64: deterministic and SQL-mirrorable to 6dp.
                # NOTE numpy's mean is NOT left-associative here — for
                # 9-128-element chunks it runs an 8-accumulator unrolled
                # pairwise order — so the float64 partials differ from a
                # sequential SQL sum by ~ulps; the downstream float32 cast
                # + rounding absorbs that, and oracles must not assume
                # identical IEEE sequences
                feat = np.array(
                    [float(c.astype(np.float64).mean()) for c in chunks],
                    dtype=np.float32,
                )
                out.append((int(mid), str(mtype), feat.tolist(), int(arr.size)))
            yield pd.DataFrame(
                out, columns=["media_id", "media_type", "feature", "n_values"]
            )

    cols = media.select(
        "media_id", F.col("meta.media_type").alias("media_type"), "payload"
    )
    return cols.mapInPandas(kernel, schema=_FEATURE_SCHEMA)


_RESIZE_SCHEMA = "media_id BIGINT, width INT, height INT, payload BINARY"


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize kernel: decode -> resample -> re-encode.

    When a decoder AND encoder are registered for the row's media type
    (e.g. the numpy BMP/PPM pair in ``operators.codecs``), this is a REAL
    image resize: decode to (H, W, 3), nearest-neighbor resample, re-encode.
    Without a codec pair it falls back to the documented byte-level
    downsample stub. Either way the plan is identical — a map-only
    Arrow-batched stage."""
    decoders, encoders = dict(_DECODERS), dict(_ENCODERS)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from drug_target_discovery_spark.operators.codecs import resize_nearest

        target = width * height
        for pdf in batches:
            rows = []
            for mid, mtype, payload in zip(pdf["media_id"], pdf["media_type"], pdf["payload"]):
                b = bytes(payload)
                if len(b) == 0:
                    rows.append((int(mid), width, height, b""))
                    continue
                if mtype in decoders and mtype in encoders:
                    img = decoders[mtype](b, {})
                    small = resize_nearest(img, width, height)
                    out = encoders[mtype]((small * 255.0).round().astype(np.uint8))
                    rows.append((int(mid), width, height, out))
                    continue
                idx = np.linspace(0, len(b) - 1, num=min(target, len(b))).astype(int)
                rows.append((int(mid), width, height, bytes(np.frombuffer(b, dtype=np.uint8)[idx])))
            yield pd.DataFrame(rows, columns=["media_id", "width", "height", "payload"])

    cols = media.select(
        "media_id", F.col("meta.media_type").alias("media_type"), "payload"
    )
    return cols.mapInPandas(kernel, schema=_RESIZE_SCHEMA)


_FRAME_SCHEMA = "media_id BIGINT, frame_idx INT, frame_payload BINARY"


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame-sampling kernel for video-typed payloads: emits n_frames rows
    per input (UDTF-shaped mapInPandas — rows out > rows in). Frame bytes
    are equal slices of the payload under the stub codec."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                if not b:
                    continue
                step = max(len(b) // n_frames, 1)
                for i in range(n_frames):
                    rows.append((int(mid), i, b[i * step : (i + 1) * step]))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_payload"])

    return media.select("media_id", "payload").mapInPandas(kernel, schema=_FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# Synthetic media table (documents -> opaque payloads), deterministic
# ---------------------------------------------------------------------------


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Derive a deterministic media table from `documents`: payload =
    UTF-8 bytes of the text (opaque to the engine), typed metadata from the
    doc attributes. Stands in for `spark.read.format('binaryFile')` /
    parquet-with-binary until real media shows up — the schema is the
    contract."""
    mt = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    fmt = (
        F.when(mt == "image", "png").when(mt == "audio", "wav").otherwise("mp4")
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            mt.alias("media_type"),
            fmt.alias("format"),
            F.when(mt == "image", (F.col("n_chars") % 640 + 1).cast("int")).alias("width"),
            F.when(mt == "image", (F.col("n_chars") % 480 + 1).cast("int")).alias("height"),
            F.when(mt != "image", (F.col("n_chars") * 40).cast("long")).alias("duration_ms"),
            F.when(mt == "audio", F.lit(16000)).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )
