"""Real image-codec tests: BMP/PPM round-trips, and the multimodal kernels
driven by a REAL decode -> transform -> re-encode (not the stub) for image
payloads. Codec registration is scoped per-test so the rest of the suite
keeps the documented stub behavior."""

import numpy as np
import pytest
from pyspark.sql import types as T

from drug_target_discovery_spark.operators.codecs import (
    decode_bmp,
    decode_image,
    decode_ppm,
    encode_bmp,
    encode_ppm,
    register_builtin_image_codecs,
    resize_nearest,
)
from drug_target_discovery_spark.operators.multimodal import (
    extract_features,
    resize_images,
    strict_decoder,
    unregister_codecs,
)


def _gradient(h: int, w: int) -> np.ndarray:
    """Deterministic (H, W, 3) uint8 test image."""
    r = np.tile(np.linspace(0, 255, w, dtype=np.uint8), (h, 1))
    g = np.tile(np.linspace(255, 0, h, dtype=np.uint8)[:, None], (1, w))
    b = ((r.astype(int) + g.astype(int)) // 2).astype(np.uint8)
    return np.stack([r, g, b], axis=2)


@pytest.fixture
def image_codecs():
    register_builtin_image_codecs()
    yield
    unregister_codecs("image")


class TestCodecs:
    @pytest.mark.parametrize("h,w", [(1, 1), (3, 4), (5, 7), (16, 16)])
    def test_bmp_round_trip(self, h, w):
        img = _gradient(h, w)
        payload = encode_bmp(img)
        assert payload[:2] == b"BM"
        decoded = decode_bmp(payload)
        assert decoded.shape == (h, w, 3)
        np.testing.assert_array_equal((decoded * 255).round().astype(np.uint8), img)

    @pytest.mark.parametrize("h,w", [(1, 1), (3, 4), (5, 7)])
    def test_ppm_round_trip(self, h, w):
        img = _gradient(h, w)
        payload = encode_ppm(img)
        decoded = decode_ppm(payload)
        assert decoded.shape == (h, w, 3)
        np.testing.assert_array_equal((decoded * 255).round().astype(np.uint8), img)

    def test_ppm_header_comments(self):
        img = _gradient(2, 2)
        payload = encode_ppm(img)
        # splice a comment into the header, per-spec
        commented = payload.replace(b"P6\n", b"P6\n# made by a test\n", 1)
        np.testing.assert_array_equal(decode_ppm(commented), decode_ppm(payload))

    def test_bmp_row_padding(self):
        # width 3 -> 9-byte rows padded to 12: padding must not leak into pixels
        img = _gradient(4, 3)
        np.testing.assert_array_equal(
            (decode_bmp(encode_bmp(img)) * 255).round().astype(np.uint8), img
        )

    def test_sniffing_dispatcher(self):
        img = _gradient(2, 3)
        np.testing.assert_array_equal(decode_image(encode_bmp(img)), decode_bmp(encode_bmp(img)))
        np.testing.assert_array_equal(decode_image(encode_ppm(img)), decode_ppm(encode_ppm(img)))
        with pytest.raises(ValueError):
            decode_image(b"GIF89a...")

    def test_resize_nearest_identity_and_downsample(self):
        img = _gradient(8, 8).astype(np.float32) / 255.0
        np.testing.assert_array_equal(resize_nearest(img, 8, 8), img)
        small = resize_nearest(img, 2, 2)
        assert small.shape == (2, 2, 3)
        # nearest-neighbor picks source pixels (2,2) (2,6) (6,2) (6,6)
        np.testing.assert_array_equal(small[0, 0], img[2, 2])
        np.testing.assert_array_equal(small[1, 1], img[6, 6])


MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("media_type", T.StringType(), False),
                    T.StructField("format", T.StringType(), True),
                ]
            ),
            False,
        ),
    ]
)


@pytest.fixture
def bmp_media(spark):
    """Tiny deterministic BMP payloads in the standard media-table shape."""
    rows = [
        (i, bytearray(encode_bmp(_gradient(4 + i, 6 + i))), ("image", "bmp"))
        for i in range(4)
    ]
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


class TestKernelsWithRealCodec:
    def test_extract_features_real_decode(self, spark, bmp_media, image_codecs):
        feats = {r["media_id"]: r for r in extract_features(bmp_media).collect()}
        for i in range(4):
            img = _gradient(4 + i, 6 + i)
            arr = decode_bmp(encode_bmp(img)).ravel()
            # n_values proves the REAL decoder ran: H*W*3 floats, not the
            # stub's fixed 256
            assert feats[i]["n_values"] == arr.size == (4 + i) * (6 + i) * 3
            expected = [float(c.mean()) for c in np.array_split(arr, 8)]
            assert feats[i]["feature"] == pytest.approx(expected, rel=1e-6)

    def test_resize_real_roundtrip(self, spark, bmp_media, image_codecs):
        out = {r["media_id"]: r for r in resize_images(bmp_media, 3, 2).collect()}
        for i in range(4):
            payload = bytes(out[i]["payload"])
            assert payload[:2] == b"BM"
            decoded = decode_bmp(payload)
            assert decoded.shape == (2, 3, 3)
            src = decode_bmp(encode_bmp(_gradient(4 + i, 6 + i)))
            expected = resize_nearest(src, 3, 2)
            np.testing.assert_allclose(decoded, expected, atol=1 / 255.0)

    def test_strict_decoder_satisfied_for_image(self, image_codecs):
        # with the builtin codec registered, the production accessor resolves
        img = _gradient(2, 2)
        np.testing.assert_array_equal(
            strict_decoder("image")(encode_bmp(img), {}), decode_bmp(encode_bmp(img))
        )
        # a type nothing registers stays strict (registry state for the
        # builtin types is process-global, so don't assert on those here)
        with pytest.raises(NotImplementedError):
            strict_decoder("never-registered-type")


class TestWavCodec:
    @pytest.mark.parametrize("n,c,sr", [(1, 1, 8000), (50, 2, 16000), (441, 1, 44100)])
    def test_wav_round_trip(self, n, c, sr):
        from drug_target_discovery_spark.operators.codecs import (
            decode_wav,
            encode_wav,
            wav_info,
        )

        rng = np.random.default_rng(7)
        samples = rng.integers(-32768, 32768, size=(n, c), dtype=np.int64).astype(
            np.int16
        )
        payload = encode_wav(samples, sr)
        assert len(payload) == 44 + 2 * n * c
        info = wav_info(payload)
        assert (info["n_samples"], info["n_channels"], info["sample_rate"]) == (n, c, sr)
        decoded = decode_wav(payload)
        assert decoded.shape == (n, c)
        back = np.rint(decoded * 32768.0).astype(np.int16)
        assert np.array_equal(back, samples)

    def test_wav_extra_chunk_walk(self):
        # a LIST chunk before data must not break the parser (chunk walking,
        # not fixed-offset parsing)
        import struct

        from drug_target_discovery_spark.operators.codecs import decode_wav, encode_wav

        canonical = encode_wav(np.array([[100], [-200]], dtype=np.int16), 8000)
        fmt_chunk = canonical[12:36]
        data_chunk = canonical[36:]
        extra = struct.pack("<4sI", b"LIST", 4) + b"INFO"
        body = fmt_chunk + extra + data_chunk
        payload = struct.pack("<4sI4s", b"RIFF", 4 + len(body), b"WAVE") + body
        decoded = decode_wav(payload)
        assert np.array_equal(
            np.rint(decoded * 32768.0).astype(np.int16), [[100], [-200]]
        )

    def test_wav_rejects_non_pcm(self):
        import struct

        from drug_target_discovery_spark.operators.codecs import encode_wav, wav_info

        payload = bytearray(encode_wav(np.zeros((4, 1), dtype=np.int16), 8000))
        struct.pack_into("<H", payload, 20, 3)  # audio_fmt = IEEE float
        with pytest.raises(ValueError):
            wav_info(bytes(payload))

    def test_strict_decoder_satisfied_for_audio(self):
        from drug_target_discovery_spark.operators.codecs import (
            register_builtin_audio_codecs,
        )

        register_builtin_audio_codecs()
        try:
            assert strict_decoder("audio") is not None
        finally:
            unregister_codecs("audio")


class TestY4MCodec:
    @pytest.mark.parametrize("t,h,w", [(1, 1, 1), (3, 4, 6), (6, 9, 23)])
    def test_y4m_round_trip(self, t, h, w):
        from drug_target_discovery_spark.operators.codecs import (
            decode_y4m,
            encode_y4m,
            y4m_info,
        )

        rng = np.random.default_rng(t * 100 + h * 10 + w)
        frames = rng.integers(0, 256, size=(t, h, w, 3)).astype(np.uint8)
        payload = encode_y4m(frames, (30, 1))
        info = y4m_info(payload)
        assert (info["width"], info["height"], info["n_frames"]) == (w, h, t)
        assert (info["fps_num"], info["fps_den"]) == (30, 1)
        decoded = decode_y4m(payload)
        assert decoded.shape == (t, h, w, 3)
        np.testing.assert_array_equal(
            np.rint(decoded * 255).astype(np.uint8), frames
        )

    def test_y4m_byte_layout_closed_form(self):
        from drug_target_discovery_spark.operators.codecs import encode_y4m

        frames = np.zeros((4, 7, 12, 3), dtype=np.uint8)
        payload = encode_y4m(frames, (25, 1))
        header_len = 33 + len("12") + len("7")
        assert payload[:9] == b"YUV4MPEG2"
        assert payload[header_len - 1 : header_len] == b"\n"
        assert len(payload) == header_len + 4 * (6 + 3 * 7 * 12)

    def test_y4m_frame_params_and_defaults(self):
        from drug_target_discovery_spark.operators.codecs import (
            decode_y4m,
            encode_y4m,
            y4m_info,
        )

        frames = np.full((2, 2, 3, 3), 9, dtype=np.uint8)
        payload = encode_y4m(frames)
        # per spec, FRAME may carry space-separated parameters
        patched = payload.replace(b"FRAME\n", b"FRAME Xtimecode\n", 1)
        info = y4m_info(patched)
        assert info["n_frames"] == 2
        np.testing.assert_array_equal(decode_y4m(patched), decode_y4m(payload))
        # F tag absent -> spec default 30:1
        no_f = payload.replace(b" F25:1", b"")
        assert (y4m_info(no_f)["fps_num"], y4m_info(no_f)["fps_den"]) == (30, 1)

    def test_y4m_rejects_malformed(self):
        from drug_target_discovery_spark.operators.codecs import (
            encode_y4m,
            y4m_info,
        )

        frames = np.zeros((2, 3, 4, 3), dtype=np.uint8)
        payload = encode_y4m(frames)
        with pytest.raises(ValueError):
            y4m_info(payload[:-1])  # truncated final frame
        with pytest.raises(ValueError):
            y4m_info(payload.replace(b"C444", b"C420"))  # subsampled
        with pytest.raises(ValueError):
            y4m_info(b"JUNK" + payload[4:])  # bad magic
        with pytest.raises(ValueError):
            y4m_info(payload.replace(b"FRAME", b"FLAME", 1))  # bad marker

    def test_strict_decoder_satisfied_for_video(self):
        from drug_target_discovery_spark.operators.codecs import (
            register_builtin_video_codecs,
        )

        register_builtin_video_codecs()
        try:
            assert strict_decoder("video") is not None
        finally:
            unregister_codecs("video")
