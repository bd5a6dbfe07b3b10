"""Figure sinks (S9): PNG encoder round-trip and the reference's
three-figure bundle written from the golden pipeline fixture."""

import numpy as np
import pytest

from drug_target_discovery_spark.plans.pipeline import (
    DrugTargetPipeline,
    PipelineParams,
    deterministic_fake_client,
)
from drug_target_discovery_spark.sources.figures import (
    plot_network,
    plot_top_targets,
    plot_volcano,
    read_png_size,
    write_figures,
    write_png,
)
from drug_target_discovery_spark.sources.geo import (
    parse_geo_series_matrix,
    read_probe_mapping_csv,
)
from drug_target_discovery_spark.sources.geo_fixture import write_fixture


class TestPngEncoder:
    def test_round_trip_size_and_magic(self, tmp_path):
        p = str(tmp_path / "t.png")
        rgb = np.zeros((7, 11, 3), dtype=np.uint8)
        rgb[..., 0] = 200
        write_png(p, rgb)
        with open(p, "rb") as f:
            assert f.read(8) == b"\x89PNG\r\n\x1a\n"
        assert read_png_size(p) == (11, 7)

    def test_rejects_bad_shape(self, tmp_path):
        with pytest.raises(ValueError):
            write_png(str(tmp_path / "x.png"), np.zeros((4, 4), dtype=np.uint8))


@pytest.fixture(scope="module")
def pipeline_out(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("figfix"))
    matrix_path, map_path = write_fixture(d, gz=False)
    expr, meta = parse_geo_series_matrix(spark, matrix_path)
    mapping = read_probe_mapping_csv(spark, map_path)
    pipe = DrugTargetPipeline(PipelineParams())
    return pipe.run(expr, meta, mapping, client=deterministic_fake_client)


class TestFigureSinks:
    def test_bundle_writes_three_nonempty_pngs(self, pipeline_out, tmp_path):
        figdir = str(tmp_path / "figures")
        written = write_figures(pipeline_out, figdir)
        assert len(written) == 3
        names = {p.rsplit("/", 1)[-1] for p in written}
        assert names == {
            "volcano_plot.png",
            "top_targets.png",
            "network_visualization.png",
        }
        for p in written:
            w, h = read_png_size(p)  # parses header -> valid PNG
            assert w > 100 and h > 100

    def test_volcano_draws_points(self, pipeline_out, tmp_path):
        p = str(tmp_path / "v.png")
        plot_volcano(pipeline_out["differential"], p)
        # some pixels must be non-white (points + frame + threshold lines)
        with open(p, "rb") as f:
            data = f.read()
        assert len(data) > 500  # an all-white canvas compresses far smaller

    def test_top_targets_orders_desc(self, pipeline_out, tmp_path):
        p = str(tmp_path / "b.png")
        plot_top_targets(pipeline_out["target_scores"], p)
        assert read_png_size(p) == (800, 640)

    def test_network_subgraph(self, pipeline_out, tmp_path):
        p = str(tmp_path / "n.png")
        plot_network(
            pipeline_out["network_nodes"],
            pipeline_out["network_edges"],
            p,
            scores_df=pipeline_out["target_scores"],
            label_col="gene",
        )
        assert read_png_size(p) == (800, 800)
