"""Multimodal kernel plumbing tests: batch shapes, determinism, the codec
seam, payload-column pruning, and the real-payload synthesis path.

Codec registration is PROCESS-GLOBAL (query constructors call
register_builtin_codecs), so every test that depends on the stub fallback
explicitly unregisters the builtin codecs first via the ``stub_codecs``
fixture — no test may assume the registry's ambient state."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from drug_target_discovery_spark.operators.multimodal import (
    extract_features,
    get_decoder,
    register_decoder,
    resize_images,
    sample_frames,
    strict_decoder,
    synthesize_media,
    synthesize_real_media,
    unregister_codecs,
)
from drug_target_discovery_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    return synthesize_media(load_table(spark, SF, "documents")).cache()


@pytest.fixture
def stub_codecs():
    """Force the documented stub fallback: no registered codecs for the
    three builtin media types. Queries re-register on construction, so no
    restore is needed."""
    for mt in ("image", "audio", "video"):
        unregister_codecs(mt)
    yield


class TestMultimodal:
    def test_schema_contract(self, media):
        d = dict(media.dtypes)
        assert d["payload"] == "binary"
        assert d["meta"].startswith("struct<media_type:string,format:string")

    def test_feature_extraction_unregistered_type_raises(self, media, stub_codecs):
        # the _fake_decode stand-in is retired: decoding a media type with
        # no registered codec is a typed per-payload error, never fake data
        with pytest.raises(Exception, match="no decoder registered"):
            extract_features(media).collect()

    def test_resize_shapes(self, media, stub_codecs):
        out = resize_images(media, width=64, height=48)
        rows = out.collect()
        assert len(rows) == media.count()
        for r in rows:
            assert len(r["payload"]) <= 64 * 48

    def test_frame_sample_multiplicity(self, media, stub_codecs):
        vids = media.filter(F.col("meta.media_type") == "video")
        frames = sample_frames(vids, n_frames=4)
        assert frames.count() == vids.count() * 4
        per = frames.groupBy("media_id").count().collect()
        assert all(r["count"] == 4 for r in per)

    def test_decoder_seam(self, stub_codecs):
        from drug_target_discovery_spark.operators.multimodal import (
            UnregisteredMediaTypeError,
        )

        with pytest.raises(UnregisteredMediaTypeError):
            strict_decoder("holograph")
        register_decoder("holograph", lambda b, m: np.ones(4, dtype=np.float32))
        assert strict_decoder("holograph")(b"x", {}).tolist() == [1, 1, 1, 1]
        # no lenient fallback remains: unknown lookups raise everywhere
        with pytest.raises(UnregisteredMediaTypeError):
            get_decoder("image")
        unregister_codecs("holograph")

    def test_metadata_query_prunes_payload(self, spark, media):
        """Metadata-only aggregation must not read the payload column from
        the scan (column pruning) — check the analyzed plan's ReadSchema."""
        # the filter keeps this plan from unifying with the module fixture's
        # cached (all-columns) InMemoryRelation, so the real scan is visible
        docs = load_table(spark, SF, "documents").filter("doc_id >= 0")
        m = synthesize_media(docs)
        q = m.groupBy(F.col("meta.media_type")).count()
        plan = q._jdf.queryExecution().executedPlan().toString()
        read_schema = plan.lower().split("readschema:")[-1].splitlines()[0]
        assert "text" not in read_schema, read_schema


class TestRealMedia:
    """synthesize_real_media payloads parse with the real builtin codecs,
    and the real kernel paths (decode checksum, frame sampling) match
    driver-side recomputation."""

    @pytest.fixture(scope="class")
    def real_media(self, spark):
        docs = load_table(spark, SF, "documents").limit(30)
        return synthesize_real_media(docs).cache()

    def test_payloads_parse_with_real_codecs(self, real_media):
        from drug_target_discovery_spark.operators.codecs import (
            decode_bmp,
            wav_info,
            y4m_info,
        )

        rows = real_media.collect()
        assert rows
        for r in rows:
            b = bytes(r["payload"])
            mt = r["meta"]["media_type"]
            if mt == "image":
                h, w = decode_bmp(b).shape[:2]
                assert (w, h) == (r["media_id"] % 13 + 1, r["media_id"] % 7 + 1)
            elif mt == "audio":
                info = wav_info(b)
                assert info["n_samples"] == r["media_id"] % 400 + 50
                assert info["sample_rate"] == r["meta"]["sample_rate"]
            else:
                info = y4m_info(b)
                assert info["n_frames"] == r["media_id"] % 6 + 2
                assert (info["width"], info["height"]) == (
                    r["media_id"] % 16 + 8,
                    r["media_id"] % 9 + 4,
                )

    def test_feature_checksum_matches_synth_series(self, real_media):
        from drug_target_discovery_spark.operators.codecs import (
            register_builtin_codecs,
        )

        register_builtin_codecs()
        feats = {r["media_id"]: r for r in extract_features(real_media).collect()}
        for mid, r in feats.items():
            if r["media_type"] == "audio":
                n = (mid % 400 + 50) * (mid % 2 + 1)
                vals = (mid * 31 + np.arange(n, dtype=np.int64) * 17) % 65536 - 32768
            elif r["media_type"] == "image":
                n = (mid % 13 + 1) * (mid % 7 + 1) * 3
                vals = (mid * 31 + np.arange(n, dtype=np.int64) * 17) % 256
            else:
                n = (mid % 6 + 2) * 3 * (mid % 9 + 4) * (mid % 16 + 8)
                vals = (mid * 31 + np.arange(n, dtype=np.int64) * 17) % 256
            assert r["n_values"] == n, (mid, r["media_type"])
            assert r["value_sum"] == int(vals.sum()), (mid, r["media_type"])

    def test_real_frame_sample(self, real_media):
        from drug_target_discovery_spark.operators.codecs import (
            decode_bmp,
            decode_y4m,
            register_builtin_codecs,
        )

        register_builtin_codecs()
        vids = real_media.filter(F.col("meta.media_type") == "video")
        frames = sample_frames(vids, n_frames=4).collect()
        by_key = {(r["media_id"], r["frame_idx"]): r for r in frames}
        clips = {
            r["media_id"]: decode_y4m(bytes(r["payload"])) for r in vids.collect()
        }
        assert len(frames) == 4 * len(clips)
        for (mid, fi), r in by_key.items():
            clip = clips[mid]
            t = clip.shape[0]
            src = fi * t // 4
            assert r["src_frame"] == src
            got = decode_bmp(bytes(r["frame_payload"]))
            expect = np.rint(clip[src] * 255.0) / 255.0
            np.testing.assert_allclose(got, expect, atol=1e-6)
