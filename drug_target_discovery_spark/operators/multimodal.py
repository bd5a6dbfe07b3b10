"""Multimodal column operators (SURVEY §2.12 [EXT], north star): treat
image/audio/video payloads as opaque ``binary`` columns with a typed
metadata struct, and run decode / feature-extract / resize / frame-sample
as Arrow-batched ``mapInPandas`` kernels.

The Spark-side plumbing — schemas, partitioning, UDF signatures, batch
shapes — is real and tested. The codec step sits behind a registry seam:
``register_decoder``/``register_encoder`` plug real callables in, and
``operators.codecs`` ships a REAL pure-stdlib codec for every media type:
BMP/PPM images (``register_builtin_image_codecs``, oracle-checked by
``media_image_decode_dims``), RIFF/WAV PCM audio
(``register_builtin_audio_codecs``, oracle-checked by
``media_audio_decode_stats``), and YUV4MPEG2 (Y4M) video
(``register_builtin_video_codecs``, oracle-checked by
``media_video_decode_stats``). A media type with NO registered codec is a
typed per-payload error (``UnregisteredMediaTypeError``) — decode never
substitutes fake data. This is the standard seam: the cluster plumbing
never changes when the codec does.

Scale notes: payloads stay in executor memory only batch-at-a-time (Arrow
record batches); metadata-only queries never touch the binary column
(column pruning keeps it out of the scan); feature extraction is a
map-only stage — no shuffle until the (small) feature table aggregates.
"""

from __future__ import annotations

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


class UnregisteredMediaTypeError(NotImplementedError):
    """Typed decode error for a media type with no registered codec —
    the same contract as the codecs' truncation/geometry ValueErrors:
    fail loudly per payload class, never substitute fake data. (The old
    digest-based ``_fake_decode`` stand-in is retired: all three builtin
    media types ship real codecs, so a fallback could only ever mask a
    missing registration for an unknown type.)"""


def strict_decoder(media_type: str) -> Decoder:
    """The production accessor: raises until a real codec is registered."""
    if media_type not in _DECODERS:
        raise UnregisteredMediaTypeError(
            f"no decoder registered for {media_type!r}; "
            "call register_decoder() with a codec-backed implementation"
        )
    return _DECODERS[media_type]


# the lenient accessor is gone with the stub: every lookup is strict
get_decoder = strict_decoder


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
    "media_id BIGINT, media_type STRING, feature ARRAY<FLOAT>, n_values INT, "
    "value_sum BIGINT"
)


def _quantized_sum(arr: np.ndarray, media_type: str) -> int:
    """Exact integer checksum of a decoded array: undo the seam's float
    scaling (audio is int16/32768, image/video are byte/255 — both exactly
    recoverable with rint) and sum in int64. Order-independent and
    engine-mirrorable, unlike any float reduction."""
    scale = 32768.0 if media_type == "audio" else 255.0
    return int(np.rint(arr.astype(np.float64) * scale).astype(np.int64).sum())


def extract_features(media: DataFrame, pool: int = FEATURE_DIM) -> DataFrame:
    """Decode each payload (codec seam) and pool the decoded array into a
    fixed-dim feature vector, plus an exact integer checksum of the decoded
    values (the oracle hook: proves WHICH bytes were decoded, not just how
    many). Arrow-batched; one payload in memory per row of the batch, never
    the whole partition."""
    # snapshot the registry into the closure: executor workers are separate
    # Python processes and never see driver-side mutation of module globals
    decoders = dict(_DECODERS)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, mtype, payload in zip(pdf["media_id"], pdf["media_type"], pdf["payload"]):
                if mtype not in decoders:
                    raise UnregisteredMediaTypeError(
                        f"no decoder registered for {mtype!r} (media_id={mid})"
                    )
                arr = decoders[mtype](bytes(payload), {}).ravel()
                chunks = np.array_split(arr, pool)
                # pool in float64: deterministic and SQL-mirrorable to 6dp.
                # NOTE numpy's mean is NOT left-associative here — for
                # 9-128-element chunks it runs an 8-accumulator unrolled
                # pairwise order — so the float64 partials differ from a
                # sequential SQL sum by ~ulps; the downstream float32 cast
                # + rounding absorbs that, and oracles must not assume
                # identical IEEE sequences
                feat = np.array(
                    [float(c.astype(np.float64).mean()) if c.size else 0.0 for c in chunks],
                    dtype=np.float32,
                )
                out.append(
                    (
                        int(mid),
                        str(mtype),
                        feat.tolist(),
                        int(arr.size),
                        _quantized_sum(arr, str(mtype)),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=["media_id", "media_type", "feature", "n_values", "value_sum"],
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


_FRAME_SCHEMA = "media_id BIGINT, frame_idx INT, src_frame INT, frame_payload BINARY"


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame-sampling kernel for video-typed payloads: emits n_frames rows
    per input (UDTF-shaped mapInPandas — rows out > rows in).

    With a registered video decoder AND image encoder (the builtin Y4M +
    BMP pair), this is a REAL frame sample: decode the clip to (T, H, W, 3),
    pick n_frames evenly spaced source frames (``src_frame = i * T //
    n_frames`` — repeats when T < n_frames), and re-encode each selected
    frame as a standalone image payload. Without codecs it falls back to
    the documented equal-byte-slice stub (src_frame = frame_idx). Either
    way: one map-only Arrow-batched stage, payloads batch-at-a-time."""
    decoders, encoders = dict(_DECODERS), dict(_ENCODERS)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        real = "video" in decoders and "image" in encoders
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                if not b:
                    continue
                if real:
                    clip = decoders["video"](b, {})
                    t = clip.shape[0]
                    if t == 0:
                        continue
                    for i in range(n_frames):
                        src = i * t // n_frames
                        frame = np.clip(np.rint(clip[src] * 255.0), 0, 255).astype(np.uint8)
                        rows.append((int(mid), i, src, encoders["image"](frame)))
                    continue
                step = max(len(b) // n_frames, 1)
                for i in range(n_frames):
                    rows.append((int(mid), i, i, b[i * step : (i + 1) * step]))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "src_frame", "frame_payload"]
            )

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


# Deterministic synth parameters shared by synthesize_real_media and the
# query oracles (queries/multimodal.py): every dimension and every sample
# value is a closed form of doc_id, so DuckDB can reproduce byte counts and
# decoded-value checksums without ever seeing the payloads.
REAL_MEDIA_FPS = (25, 1)


def _real_media_params(mid: int) -> dict:
    if mid % 3 == 0:  # image: (h, w, 3) interleaved RGB
        return {"kind": "image", "w": mid % 13 + 1, "h": mid % 7 + 1}
    if mid % 3 == 1:  # audio: (n, c) int16 PCM
        return {
            "kind": "audio",
            "n": mid % 400 + 50,
            "c": mid % 2 + 1,
            "sr": 8000 + (mid % 4) * 2000,
        }
    return {"kind": "video", "w": mid % 16 + 8, "h": mid % 9 + 4, "t": mid % 6 + 2}


def synthesize_real_media(docs: DataFrame) -> DataFrame:
    """REAL-payload media table: per doc_id, an actual BMP image, RIFF/WAV
    PCM stream, or Y4M clip, built deterministically in an Arrow-batched
    kernel (value k of media m is ``(31*m + 17*k) mod range``). This is the
    codec-exercising twin of ``synthesize_media`` — every payload parses
    with the real builtin codecs, and every byte is closed-form predictable
    for the DuckDB oracles. Map-only; payloads exist batch-at-a-time."""
    from collections.abc import Iterator as _It

    from drug_target_discovery_spark.operators.codecs import (
        encode_bmp,
        encode_wav,
        encode_y4m,
    )

    def kernel(batches: _It[pd.DataFrame]) -> _It[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                p = _real_media_params(mid)
                if p["kind"] == "image":
                    w, h = p["w"], p["h"]
                    flat = (mid * 31 + np.arange(h * w * 3, dtype=np.int64) * 17) % 256
                    payload = encode_bmp(flat.reshape(h, w, 3).astype(np.uint8))
                    rows.append((mid, "image", "bmp", w, h, None, None, payload))
                elif p["kind"] == "audio":
                    n, c, sr = p["n"], p["c"], p["sr"]
                    flat = (mid * 31 + np.arange(n * c, dtype=np.int64) * 17) % 65536 - 32768
                    payload = encode_wav(flat.reshape(n, c).astype(np.int16), sr)
                    rows.append(
                        (mid, "audio", "wav", None, None, n * 1000 // sr, sr, payload)
                    )
                else:
                    w, h, t = p["w"], p["h"], p["t"]
                    flat = (mid * 31 + np.arange(t * 3 * h * w, dtype=np.int64) * 17) % 256
                    # planar layout (T, 3, H, W) -> (T, H, W, 3): encode_y4m
                    # writes planes back channel-major, so the stream's plane
                    # bytes are exactly this flat series
                    frames = flat.reshape(t, 3, h, w).transpose(0, 2, 3, 1).astype(np.uint8)
                    num, den = REAL_MEDIA_FPS
                    payload = encode_y4m(frames, REAL_MEDIA_FPS)
                    rows.append(
                        (mid, "video", "y4m", w, h, t * 1000 * den // num, None, payload)
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "media_type", "format", "width", "height",
                    "duration_ms", "sample_rate", "payload",
                ],
            )

    flat = docs.select("doc_id").select(F.col("doc_id").alias("media_id")).mapInPandas(
        kernel,
        schema=(
            "media_id BIGINT, media_type STRING, format STRING, width INT, "
            "height INT, duration_ms BIGINT, sample_rate INT, payload BINARY"
        ),
    )
    return flat.select(
        "media_id",
        "payload",
        F.struct(
            "media_type", "format", "width", "height", "duration_ms", "sample_rate"
        ).alias("meta"),
    )
