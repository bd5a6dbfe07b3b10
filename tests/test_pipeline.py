"""Golden end-to-end pipeline test (SURVEY §5 strategy #3): a synthetic
GEO Series Matrix fixture is pushed through the full Spark pipeline and
compared stage-by-stage against an independent pandas/numpy/networkx
recomputation of the reference's semantics (dropna-thresh, row-median
impute, conditional log2, ddof=0 z-score, median probe collapse, Welch t,
BH, |r| threshold graph, centralities, min-max composite)."""

import math

import networkx as nx
import numpy as np
import pandas as pd
import pytest

from drug_target_discovery_spark.functions.stats import t_sf_numpy
from drug_target_discovery_spark.plans.pipeline import (
    DrugTargetPipeline,
    PipelineParams,
    deterministic_fake_client,
)
from drug_target_discovery_spark.sources.geo import (
    parse_geo_series_matrix,
    read_probe_mapping_csv,
)
from drug_target_discovery_spark.sources.geo_fixture import (
    N_PROBES,
    N_SAMPLES,
    make_expression_frame,
    probe_gene_mapping,
    sample_conditions,
    write_fixture,
)


def _make_fixture(tmpdir: str, gz: bool = False) -> tuple[str, str, pd.DataFrame, dict]:
    matrix_path, map_path = write_fixture(tmpdir, gz=gz)
    return (
        matrix_path,
        map_path,
        make_expression_frame(),
        {"mapping": probe_gene_mapping(), "condition": sample_conditions()},
    )


def _reference_compute(vals: pd.DataFrame, mapping: dict, cond: dict, params: PipelineParams):
    """Independent pandas recomputation of the reference semantics."""
    df = vals.copy()
    n = df.shape[1]
    df = df.dropna(thresh=int(params.na_threshold * n))  # pipeline2.py:484-486
    df = df.apply(lambda row: row.fillna(row.median()), axis=1)  # :487
    if df.max().max() > params.log2_trigger:
        df = np.log2(df + 1)  # :488-491
    mu, sd = df.mean(axis=1), df.std(axis=1, ddof=0)
    df = df.sub(mu, axis=0).div(sd.replace(0, np.nan), axis=0).fillna(0.0)  # :492-494

    df = df[df.index.isin(mapping)]
    df2 = df.copy()
    df2["gene"] = [mapping[p] for p in df2.index]
    gene_df = df2.groupby("gene").median()  # :523-528

    case_cols = [s for s in gene_df.columns if cond[s] == "case"]
    ctrl_cols = [s for s in gene_df.columns if cond[s] == "control"]
    rows = []
    for g, r in gene_df.iterrows():
        c, k = r[case_cols].to_numpy(), r[ctrl_cols].to_numpy()
        lfc = c.mean() - k.mean()
        v1, v2 = c.var(ddof=1), k.var(ddof=1)
        n1, n2 = len(c), len(k)
        se2 = v1 / n1 + v2 / n2
        if se2 <= 0 or n1 < 2 or n2 < 2:
            t = p = np.nan
        else:
            t = (c.mean() - k.mean()) / math.sqrt(se2)
            dfree = se2**2 / ((v1 / n1) ** 2 / (n1 - 1) + (v2 / n2) ** 2 / (n2 - 1))
            p = float(t_sf_numpy(np.array([t]), np.array([dfree]))[0])
        rows.append((g, lfc, p))
    diff = pd.DataFrame(rows, columns=["gene", "log2FC", "pvalue"]).set_index("gene")

    pv = diff["pvalue"].to_numpy()
    mask = ~np.isnan(pv)
    m = mask.sum()
    adj = np.full_like(pv, np.nan)
    order = np.argsort(pv[mask], kind="mergesort")
    ranked = pv[mask][order] * m / np.arange(1, m + 1)
    acc = np.minimum.accumulate(ranked[::-1])[::-1]
    adj_vals = np.minimum(acc, 1.0)
    idx = np.where(mask)[0][order]
    adj[idx] = adj_vals
    diff["adjusted_pvalue"] = adj

    sig = diff[
        (diff["adjusted_pvalue"] < params.p_threshold)
        & (diff["log2FC"].abs() > params.fc_threshold)
        & diff["log2FC"].notna()
    ]
    top = sorted(sig.index)[: params.n_top_genes]
    corr = gene_df.loc[top].T.corr()
    g = nx.Graph()
    g.add_nodes_from(top)
    for i, a in enumerate(top):
        for b in top[i + 1 :]:
            r = corr.loc[a, b]
            if pd.notna(r) and abs(r) > params.corr_threshold:
                g.add_edge(a, b)
    dc = nx.degree_centrality(g)
    bc = nx.betweenness_centrality(g, normalized=True)
    ec = nx.eigenvector_centrality(g, max_iter=1000, tol=1e-6) if g.number_of_edges() else {
        n: 0.0 for n in g.nodes()
    }

    def scale(d):
        v = np.array([d[k] for k in top])
        lo, hi = v.min(), v.max()
        return {k: (0.0 if hi == lo else (d[k] - lo) / (hi - lo)) for k in top}

    dcs, bcs, ecs = scale(dc), scale(bc), scale(ec)
    composite = {k: (dcs[k] + bcs[k] + ecs[k]) / 3 for k in top}
    return {"normalized": df, "gene_df": gene_df, "diff": diff, "sig": sig, "composite": composite}


@pytest.fixture(scope="module", params=[False, True], ids=["plain", "gzip"])
def fixture_paths(request, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("geo"))
    return _make_fixture(d, gz=request.param)


class TestGeoPipeline:
    def test_parse(self, spark, fixture_paths):
        matrix_path, map_path, vals, info = fixture_paths
        expr, meta = parse_geo_series_matrix(spark, matrix_path)
        n_cells = expr.count()
        # every (probe, sample) cell lands exactly once
        assert n_cells == N_PROBES * N_SAMPLES
        m = {r["sample_id"]: r["condition"] for r in meta.collect()}
        assert m == info["condition"]
        # NULL cells arrive as NULLs
        n_null = expr.filter("value IS NULL").count()
        assert n_null == 3 + (N_SAMPLES - 2)

    def test_full_pipeline_matches_reference(self, spark, fixture_paths):
        matrix_path, map_path, vals, info = fixture_paths
        params = PipelineParams(n_top_genes=50, corr_threshold=0.7)
        expr, meta = parse_geo_series_matrix(spark, matrix_path)
        mapping = read_probe_mapping_csv(spark, map_path)
        pipe = DrugTargetPipeline(params)
        out = pipe.run(expr, meta, mapping, client=deterministic_fake_client)

        ref = _reference_compute(vals, info["mapping"], info["condition"], params)

        # stage 4: differential table
        got_diff = {
            r["gene"]: (r["log2FC"], r["pvalue"], r["adjusted_pvalue"])
            for r in out["differential"].collect()
        }
        assert set(got_diff) == set(ref["diff"].index)
        for gene, row in ref["diff"].iterrows():
            glfc, gp, gadj = got_diff[gene]
            assert glfc == pytest.approx(row["log2FC"], rel=1e-9), gene
            if np.isnan(row["pvalue"]):
                assert gp is None or np.isnan(gp)
            else:
                assert gp == pytest.approx(row["pvalue"], rel=1e-9)
                assert gadj == pytest.approx(row["adjusted_pvalue"], rel=1e-9)

        # stage 4b: significant set
        got_sig = {r["gene"] for r in out["significant"].collect()}
        assert got_sig == set(ref["sig"].index)

        # stages 5-6: composite target scores
        got_scores = {
            r["gene"]: r["composite_score"] for r in out["target_scores"].collect()
        }
        assert set(got_scores) == set(ref["composite"])
        for gene, v in ref["composite"].items():
            assert got_scores[gene] == pytest.approx(v, abs=1e-6), gene

        # stage 7: enrichment (fake client) — drugability formula
        val = out["validated_targets"].collect()
        assert 0 < len(val) <= params.n_top_targets
        for r in val:
            nd, aa = deterministic_fake_client(r["gene"])
            assert r["num_known_drugs"] == nd
            assert r["drugability_score"] == pytest.approx(0.6 * nd + 0.4 * aa, rel=1e-12)

    def test_preprocess_drops_sparse_probe(self, spark, fixture_paths):
        matrix_path, _, _, _ = fixture_paths
        expr, _ = parse_geo_series_matrix(spark, matrix_path)
        pipe = DrugTargetPipeline()
        probes = {
            r["probe_id"] for r in pipe.preprocess(expr).select("probe_id").distinct().collect()
        }
        assert "1040_at" not in probes  # >80% missing
        assert "1025_at" in probes  # scattered NAs, imputed
