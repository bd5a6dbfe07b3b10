"""Generate fixture VALUES oracles for the GEO pipeline queries.

`geo_pipeline_differential` / `geo_pipeline_targets` run the reference's
entire nine-stage chain on the deterministic synthetic fixture — the chain
crosses the t-CDF and iterative-graph boundaries SQL cannot express, so the
driver checked them rows-only. But the fixture is deterministic, so the
expected OUTPUT VALUES are computable offline with the independent
pandas/numpy/networkx reference implementation (tools/_geo_reference.py —
the same one the golden test compares against), then embedded as DuckDB
`VALUES` oracles.

The script checks every rounded value sits comfortably off its rounding
boundary, cross-checks the Spark query outputs exactly, and emits
`drug_target_discovery_spark/queries/_geo_oracles.py`. The fixture is
SF-independent (the queries ignore sf_dir), so the oracles hold at every
scale factor. Regenerate after changing the fixture or pipeline defaults:

    python tools/gen_geo_oracles.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tools._geo_reference import (
    reference_compute,
    reference_validated_targets,
)

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "drug_target_discovery_spark", "queries", "_geo_oracles.py",
)


def _lit(x, digits: int | None = None) -> str:
    if x is None or (isinstance(x, float) and np.isnan(x)):
        return "CAST(NULL AS DOUBLE)"
    if isinstance(x, str):
        return f"'{x}'"
    if isinstance(x, (int, np.integer)):
        return str(int(x))
    return f"CAST({x:.{digits}f} AS DOUBLE)"


def values_sql(cols: list[str], rows: list[tuple], digits: list) -> str:
    body = ",\n      ".join(
        "(" + ", ".join(_lit(x, d) for x, d in zip(row, digits)) + ")" for row in rows
    )
    return (
        "\n    SELECT * FROM (VALUES\n      "
        + body
        + f"\n    ) AS t({', '.join(cols)})\n    "
    )


def boundary_margin(values, digits: int) -> float:
    """Distance of round(v, digits) from the nearest flip, in fraction-of-
    last-digit units (0.5 = dead center of the bucket, 0 = on a boundary)."""
    worst = 0.5
    for v in values:
        if v is None or (isinstance(v, float) and np.isnan(v)):
            continue
        frac = abs(v) * (10**digits) % 1.0
        worst = min(worst, abs(frac - 0.5))
    return worst


def main() -> int:
    from drug_target_discovery_spark.plans.pipeline import PipelineParams
    from drug_target_discovery_spark.sources.geo_fixture import (
        make_expression_frame,
        probe_gene_mapping,
        sample_conditions,
    )

    params = PipelineParams()
    vals = make_expression_frame()
    ref = reference_compute(vals, probe_gene_mapping(), sample_conditions(), params)
    diff = ref["diff"].sort_index()
    targets = reference_validated_targets(ref["composite"], params)
    print(f"fixture: {len(diff)} genes differential, {len(targets)} validated targets")

    # decision-threshold margins: the oracle embeds post-filter rows, so the
    # underlying comparisons must be decisively far from their cutoffs
    adj = diff["adjusted_pvalue"].dropna()
    m_p = (adj - params.p_threshold).abs().min()
    m_fc = (diff["log2FC"].abs() - params.fc_threshold).abs().min()
    print(f"threshold margins: |adj-p - {params.p_threshold}| >= {m_p:.3e}, "
          f"||log2FC| - {params.fc_threshold}| >= {m_fc:.3e}")
    if m_p < 1e-9 or m_fc < 1e-9:
        print("FATAL: a gene sits on a significance threshold")
        return 1

    checks = [
        ("diff.log2FC", diff["log2FC"], 6),
        ("diff.pvalue", diff["pvalue"], 8),
        ("diff.adj", diff["adjusted_pvalue"], 8),
        ("targets.composite", targets["composite_score"], 6),
        ("targets.assoc", targets["avg_association_score"], 6),
        ("targets.drugability", targets["drugability_score"], 6),
    ]
    ok = True
    for label, series, d in checks:
        m = boundary_margin(series.tolist(), d)
        print(f"rounding margin {label} @ {d}dp: {m:.2e}")
        if m < 1e-4:
            print(f"FATAL: {label} too close to a {d}dp rounding boundary")
            ok = False
    if not ok:
        return 1

    r = lambda v, d: None if (v is None or np.isnan(v)) else round(v, d)
    oracles = {
        "geo_pipeline_differential": values_sql(
            ["gene", "log2FC", "pvalue", "adjusted_pvalue"],
            [
                (g, r(row["log2FC"], 6), r(row["pvalue"], 8), r(row["adjusted_pvalue"], 8))
                for g, row in diff.iterrows()
            ],
            [None, 6, 8, 8],
        ),
        "geo_pipeline_targets": values_sql(
            [
                "gene", "composite_score", "num_known_drugs",
                "avg_association_score", "drugability_score",
            ],
            [
                (
                    row["gene"], r(row["composite_score"], 6),
                    int(row["num_known_drugs"]),
                    r(row["avg_association_score"], 6), r(row["drugability_score"], 6),
                )
                for _, row in targets.iterrows()
            ],
            [None, 6, None, 6, 6],
        ),
    }

    # cross-check the Spark queries exactly before emitting
    import duckdb

    from drug_target_discovery_spark.queries.registry import all_queries
    from drug_target_discovery_spark.session import get_spark

    reg = all_queries()
    spark = get_spark("gen-geo-oracles")
    ok = True
    for name, sql in oracles.items():
        spdf = reg[name].fn(spark, "/root/testdata/sf0.01").toPandas()
        opdf = duckdb.sql(sql).df()
        s = spdf.sort_values("gene").reset_index(drop=True)[sorted(spdf.columns)]
        o = opdf.sort_values("gene").reset_index(drop=True)[sorted(opdf.columns)]
        if list(s.columns) != list(o.columns) or len(s) != len(o):
            print(f"MISMATCH {name}: shape {s.shape} vs {o.shape}")
            ok = False
            continue
        bad = []
        for c in s.columns:
            eq = (s[c] == o[c]) | (s[c].isna() & o[c].isna())
            if not eq.all():
                bad.append((c, int((~eq).sum())))
        if bad:
            print(f"MISMATCH {name}: {bad}")
            ok = False
        else:
            print(f"OK {name}: spark output == reference VALUES exactly ({len(s)} rows)")
    spark.stop()
    if not ok:
        return 1

    with open(OUT, "w") as f:
        f.write(
            '"""AUTO-GENERATED by tools/gen_geo_oracles.py — do not edit.\n\n'
            "Fixture VALUES oracles for the GEO pipeline queries, computed with\n"
            "the independent pandas/numpy/networkx reference implementation\n"
            "(tools/_geo_reference.py) on the deterministic synthetic fixture.\n"
            "SF-independent: the pipeline queries ignore sf_dir. Regenerate\n"
            "after changing the fixture or the pipeline defaults.\n"
            '"""\n\n'
            "GEO_ORACLES: dict[str, str] = {\n"
        )
        for name, sql in oracles.items():
            f.write(f"    {name!r}: '''{sql}''',\n")
        f.write("}\n")
    print(f"wrote {OUT}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
