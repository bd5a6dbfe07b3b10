"""CLI batch entry point (SURVEY §3.1 — the reference's main() at
pipeline2.py:1232-1253): parse a GEO Series Matrix, run the nine-stage
pipeline, write every intermediate CSV + the GEXF graph + the text summary
into a timestamped output directory.

    python -m drug_target_discovery_spark \
        --matrix-file series_matrix.txt[.gz] \
        --mapping-csv probe_gene_map.csv \
        --output-dir results \
        [--p-threshold 0.05] [--fc-threshold 1.0] [--n-top-genes 500] \
        [--corr-threshold 0.7] [--n-top-targets 20] [--enrich {none,fake,http}]

Unlike the reference (each stage try/excepted, returns True regardless —
pipeline2.py:1152-1230), stage failures here abort with a nonzero exit:
silent partial success is the wrong contract for a batch engine.
"""

from __future__ import annotations

import argparse
import os
import sys
from datetime import datetime


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="drug_target_discovery_spark")
    ap.add_argument("--matrix-file", required=True)
    ap.add_argument("--mapping-csv", required=True)
    ap.add_argument("--output-dir", default="results")
    ap.add_argument("--p-threshold", type=float, default=0.05)
    ap.add_argument("--fc-threshold", type=float, default=1.0)
    ap.add_argument("--n-top-genes", type=int, default=500)
    ap.add_argument("--corr-threshold", type=float, default=0.7)
    ap.add_argument("--n-top-targets", type=int, default=20)
    ap.add_argument(
        "--enrich",
        choices=["none", "fake", "http"],
        default="none",
        help="validation enrichment client: none (skip stage 7), "
        "fake (deterministic offline), http (Ensembl+OpenTargets, needs network)",
    )
    ap.add_argument(
        "--figures",
        action="store_true",
        help="write the reference's three PNGs (volcano, top targets, "
        "network) into <out>/figures/ — matplotlib when available, "
        "built-in rasterizer otherwise",
    )
    args = ap.parse_args(argv)

    from drug_target_discovery_spark.plans.pipeline import (
        DrugTargetPipeline,
        PipelineParams,
        deterministic_fake_client,
        opentargets_http_client,
    )
    from drug_target_discovery_spark.session import get_spark
    from drug_target_discovery_spark.sources.geo import (
        parse_geo_series_matrix,
        read_probe_mapping_csv,
    )
    from drug_target_discovery_spark.sources.sinks import (
        write_csv,
        write_gexf,
        write_summary_report,
    )

    out_dir = os.path.join(
        args.output_dir, datetime.now().strftime("run_%Y%m%d_%H%M%S")
    )
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("drug-target-pipeline")
    params = PipelineParams(
        p_threshold=args.p_threshold,
        fc_threshold=args.fc_threshold,
        n_top_genes=args.n_top_genes,
        corr_threshold=args.corr_threshold,
        n_top_targets=args.n_top_targets,
    )
    client = {
        "none": None,
        "fake": deterministic_fake_client,
        "http": opentargets_http_client() if args.enrich == "http" else None,
    }[args.enrich]

    expr, meta = parse_geo_series_matrix(spark, args.matrix_file)
    mapping = read_probe_mapping_csv(spark, args.mapping_csv)
    pipe = DrugTargetPipeline(params)
    out = pipe.run(expr, meta, mapping, client=client)

    for name in ["differential", "significant", "target_scores"]:
        write_csv(out[name], os.path.join(out_dir, f"{name}.csv"), single_file=True)
    write_csv(
        out["network_edges"], os.path.join(out_dir, "network_edges.csv"), single_file=True
    )
    if "validated_targets" in out:
        write_csv(
            out["validated_targets"],
            os.path.join(out_dir, "validated_targets.csv"),
            single_file=True,
        )
    write_gexf(
        out["network_nodes"], out["network_edges"], os.path.join(out_dir, "network.gexf")
    )
    if args.figures:
        from drug_target_discovery_spark.sources.figures import write_figures

        write_figures(
            out,
            os.path.join(out_dir, "figures"),
            p_threshold=args.p_threshold,
            fc_threshold=args.fc_threshold,
        )

    n_sig = out["significant"].count()
    from pyspark.sql import functions as F

    up_down = out["significant"].agg(
        F.sum(F.when(F.col("log2FC") > 0, 1).otherwise(0)).alias("up"),
        F.sum(F.when(F.col("log2FC") < 0, 1).otherwise(0)).alias("down"),
    ).collect()[0]
    write_summary_report(
        {
            "Run": {
                "matrix_file": args.matrix_file,
                "date": datetime.now().isoformat(),
            },
            "Differential expression": {
                "significant_genes": n_sig,
                "up_regulated": up_down["up"],
                "down_regulated": up_down["down"],
            },
            "Network": {
                "nodes": out["network_nodes"].count(),
                "edges": out["network_edges"].count(),
            },
            "Top 10 targets": out["target_scores"].limit(10),
        },
        os.path.join(out_dir, "summary.txt"),
    )
    print(out_dir)
    return 0


if __name__ == "__main__":
    sys.exit(main())
