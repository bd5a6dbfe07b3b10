"""Multimodal kernel plumbing tests: batch shapes, determinism, the codec
seam, and payload-column pruning."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from drug_target_discovery_spark.operators.multimodal import (
    _fake_decode,
    extract_features,
    get_decoder,
    register_decoder,
    resize_images,
    sample_frames,
    strict_decoder,
    synthesize_media,
)
from drug_target_discovery_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    return synthesize_media(load_table(spark, SF, "documents")).cache()


class TestMultimodal:
    def test_schema_contract(self, media):
        d = dict(media.dtypes)
        assert d["payload"] == "binary"
        assert d["meta"].startswith("struct<media_type:string,format:string")

    def test_feature_extraction_deterministic(self, spark, media):
        a = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
        b = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
        assert a == b
        assert all(len(v) == 8 for v in a.values())
        # feature equals a driver-side recomputation through the same stub
        row = media.select("media_id", "payload").first()
        arr = _fake_decode(bytes(row["payload"]), {})
        expected = [float(c.mean()) for c in np.array_split(arr, 8)]
        got = a[row["media_id"]]
        assert got == pytest.approx(expected, rel=1e-6)

    def test_resize_shapes(self, media):
        out = resize_images(media, width=64, height=48)
        rows = out.collect()
        assert len(rows) == media.count()
        for r in rows:
            assert len(r["payload"]) <= 64 * 48

    def test_frame_sample_multiplicity(self, media):
        vids = media.filter(F.col("meta.media_type") == "video")
        frames = sample_frames(vids, n_frames=4)
        assert frames.count() == vids.count() * 4
        per = frames.groupBy("media_id").count().collect()
        assert all(r["count"] == 4 for r in per)

    def test_decoder_seam(self):
        with pytest.raises(NotImplementedError):
            strict_decoder("holograph")
        register_decoder("holograph", lambda b, m: np.ones(4, dtype=np.float32))
        assert strict_decoder("holograph")(b"x", {}).tolist() == [1, 1, 1, 1]
        assert get_decoder("image") is _fake_decode  # default stub

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
