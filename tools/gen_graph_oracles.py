"""Generate fixture VALUES oracles for the iterative graph queries.

The eigenvector / betweenness / PageRank / composite-score queries are not
expressible in one DuckDB SQL statement, so the driver's gate checked them
rows-only. This script derives the sf0.01 correlation graph with DUCKDB
(the same CTEs the degree oracle uses — guaranteeing the oracle-side graph
matches what SQL would derive), computes reference centralities with
NETWORKX (independent of the Spark implementations), cross-checks the Spark
query outputs to 6dp, verifies no value sits near a rounding boundary, and
emits `drug_target_discovery_spark/queries/_graph_oracles.py` containing
DuckDB `VALUES` oracles.

The emitted oracles are valid for the sf0.01 tables the driver's gate runs
on (the graph is data-dependent; other SFs have other graphs). Regenerate:

    python tools/gen_graph_oracles.py
"""

from __future__ import annotations

import os
import sys

import duckdb
import networkx as nx

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "drug_target_discovery_spark", "queries", "_graph_oracles.py",
)


def build_graph() -> tuple[list[int], list[tuple[int, int]]]:
    from drug_target_discovery_spark.queries.graphq import _CELL_SQL
    from drug_target_discovery_spark.sources.tables import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    nodes = [r[0] for r in con.sql(f"WITH {_CELL_SQL} SELECT g FROM topg ORDER BY g").fetchall()]
    edges = [
        (r[0], r[1])
        for r in con.sql(f"WITH {_CELL_SQL} SELECT g1, g2 FROM edges ORDER BY g1, g2").fetchall()
    ]
    return nodes, edges


def textbook_pagerank(g: nx.Graph, alpha: float, max_iter: int, tol: float) -> dict:
    """Undirected PageRank with dangling redistribution — the textbook
    formulation (nx.pagerank needs scipy, absent here). Same convergence
    criterion as the engine: sum|dx| < n * tol."""
    n = g.number_of_nodes()
    pr = {v: 1.0 / n for v in g}
    for _ in range(max_iter):
        prev = pr
        mass = {v: 0.0 for v in g}
        dangling = 0.0
        for v in g:
            d = g.degree(v)
            if d == 0:
                dangling += prev[v]
                continue
            share = prev[v] / d
            for u in g[v]:
                mass[u] += share
        pr = {v: (1.0 - alpha) / n + alpha * (mass[v] + dangling / n) for v in g}
        if sum(abs(pr[v] - prev[v]) for v in g) < n * tol:
            break
    return pr


def main() -> int:
    nodes, edges = build_graph()
    g = nx.Graph()
    g.add_nodes_from(nodes)
    g.add_edges_from(edges)
    print(f"sf0.01 corr graph: {len(nodes)} nodes, {len(edges)} edges")

    # mirror the registered queries' parameters exactly
    ec = nx.eigenvector_centrality(g, max_iter=1000, tol=1e-6)
    bc = nx.betweenness_centrality(g, normalized=True)
    dc = nx.degree_centrality(g)
    pr = textbook_pagerank(g, alpha=0.85, max_iter=30, tol=1e-6)
    cores = nx.core_number(g)  # integers — no rounding-boundary hazard
    cc = nx.closeness_centrality(g)  # wf_improved default
    hc = nx.harmonic_centrality(g)  # raw reciprocal-distance sums

    def minmax(d: dict) -> dict:
        lo, hi = min(d.values()), max(d.values())
        span = hi - lo
        return {k: (0.0 if span == 0.0 else (v - lo) / span) for k, v in d.items()}
    dcs, bcs, ecs = minmax(dc), minmax(bc), minmax(ec)
    composite = {v: (dcs[v] + bcs[v] + ecs[v]) / 3.0 for v in nodes}

    # boundary check: every rounded-to-6dp value must be comfortably far
    # from a .5 ulp boundary, or float noise could flip the rounding
    worst = 1.0
    for d in (ec, bc, pr, composite, cc, hc):
        for v in d.values():
            frac = abs(v) * 1e6 % 1.0
            worst = min(worst, abs(frac - 0.5))
    print(f"closest rounding-boundary margin: {worst:.2e} (want > 1e-6)")
    if worst < 1e-6:
        print("FATAL: a value sits on a 6dp rounding boundary; pick other digits")
        return 1

    def values_sql(cols: list[str], rows: list[tuple]) -> str:
        body = ",\n      ".join(
            "(" + ", ".join(_lit(x) for x in row) + ")" for row in rows
        )
        return (
            "\n    SELECT * FROM (VALUES\n      "
            + body
            + f"\n    ) AS t({', '.join(cols)})\n    "
        )

    def _lit(x) -> str:
        if isinstance(x, int):
            return str(x)
        return f"CAST({x:.6f} AS DOUBLE)"

    r6 = lambda v: round(v, 6)
    oracles = {
        "eigenvector_centrality_corr_graph": values_sql(
            ["node", "eigenvector_centrality"], [(v, r6(ec[v])) for v in nodes]
        ),
        "betweenness_centrality_corr_graph": values_sql(
            ["node", "betweenness_centrality"], [(v, r6(bc[v])) for v in nodes]
        ),
        "pagerank_corr_graph": values_sql(
            ["node", "pagerank"], [(v, r6(pr[v])) for v in nodes]
        ),
        "core_numbers_corr_graph": values_sql(
            ["node", "core"], [(v, int(cores[v])) for v in nodes]
        ),
        "closeness_centrality_corr_graph": values_sql(
            ["node", "closeness_centrality"], [(v, r6(cc[v])) for v in nodes]
        ),
        "harmonic_centrality_corr_graph": values_sql(
            ["node", "harmonic_centrality"], [(v, r6(hc[v])) for v in nodes]
        ),
        "network_target_scores": values_sql(
            [
                "node", "degree_centrality", "betweenness_centrality",
                "eigenvector_centrality", "composite_score",
            ],
            [(v, r6(dc[v]), r6(bc[v]), r6(ec[v]), r6(composite[v])) for v in nodes],
        ),
    }

    # cross-check the Spark queries before emitting anything
    from drug_target_discovery_spark.queries.registry import all_queries
    from drug_target_discovery_spark.session import get_spark

    reg = all_queries()
    spark = get_spark("gen-graph-oracles")
    ok = True
    for name, sql in oracles.items():
        spdf = reg[name].fn(spark, SF_DIR).toPandas()
        opdf = duckdb.sql(sql).df()
        s = spdf.sort_values("node").reset_index(drop=True)[sorted(spdf.columns)]
        o = opdf.sort_values("node").reset_index(drop=True)[sorted(opdf.columns)]
        if list(s.columns) != list(o.columns) or len(s) != len(o):
            print(f"MISMATCH {name}: shape {s.shape} vs {o.shape}")
            ok = False
            continue
        diffs = [
            (c, (s[c] != o[c]).sum()) for c in s.columns if (s[c] != o[c]).any()
        ]
        if diffs:
            print(f"MISMATCH {name}: {diffs}")
            for c, _ in diffs:
                bad = s[c] != o[c]
                print(s[bad][["node", c]].head(3), "\n", o[bad][["node", c]].head(3))
            ok = False
        else:
            print(f"OK {name}: spark output == networkx VALUES exactly ({len(s)} rows)")
    if not ok:
        return 1

    with open(OUT, "w") as f:
        f.write(
            '"""AUTO-GENERATED by tools/gen_graph_oracles.py — do not edit.\n\n'
            "Fixture VALUES oracles for the iterative graph queries, computed\n"
            "with networkx on the sf0.01 correlation graph (the SF the driver's\n"
            "correctness gate runs at). The graph is data-dependent, so these\n"
            "oracles are only meaningful against the sf0.01 tables; regenerate\n"
            "after changing the graph construction or the testdata.\n"
            '"""\n\n'
            f"GRAPH_ORACLE_SF_DIR = {SF_DIR!r}\n\n"
            "GRAPH_ORACLES: dict[str, str] = {\n"
        )
        for name, sql in oracles.items():
            f.write(f"    {name!r}: '''{sql}''',\n")
        f.write("}\n")
    print(f"wrote {OUT}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
