"""Local stand-in for the driver's t2 correctness gate.

Runs every registered query on Spark and its oracle SQL on DuckDB at the
given scale factor, sorts columns by name and rows by value (mirroring the
driver's order-insensitive value-hash), and reports exact-match status.

Usage:  python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from drug_target_discovery_spark.caching import release_caches
from drug_target_discovery_spark.queries.registry import all_queries
from drug_target_discovery_spark.session import get_spark
from drug_target_discovery_spark.sources.tables import TABLES, register_views

# Oracles that are ground-truth CONSTANTS generated at sf0.01 — fixture
# VALUES from independent reference implementations (networkx, numpy, the
# GEO reference run; tools/gen_*_oracles.py). Comparing them at any other
# scale factor mismatches BY DESIGN (FIXTURES.md §8): the fixture encodes
# the sf0.01 answer, not a scale-generic formula. At a non-fixture sf_dir
# the gate reports them SKIP(fixture-sf) instead of a false FAIL; they are
# re-proven exact whenever the gate runs at sf0.01 (the driver's scale).
FIXTURE_SF_BASENAME = "sf0.01"
FIXTURE_ORACLES = {
    "betweenness_centrality_corr_graph",
    "closeness_centrality_corr_graph",
    "core_numbers_corr_graph",
    "differential_expression",
    "eigenvector_centrality_corr_graph",
    "embedding_pca_variance_explained",
    "harmonic_centrality_corr_graph",
    "kmeans_lloyd_clusters",
    "kmeans_silhouette_by_cluster",
    "network_target_scores",
    "pagerank_corr_graph",
}


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, rows by all values; normalize dtypes."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].astype("float64")
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def kind(dtype) -> str:
    """Coarse dtype kind — the granularity the driver's value-hash sees.

    An int64 Spark column vs a float64 oracle column (e.g. DuckDB sum(INT)
    -> HUGEINT -> float64) compares equal pairwise but renders differently
    (5 vs 5.0), so the driver's order-insensitive value-hash diverges.
    """
    if np.issubdtype(dtype, np.floating):
        return "float"
    if np.issubdtype(dtype, np.integer):
        return "int"
    if np.issubdtype(dtype, np.datetime64):
        return "datetime"
    if dtype == bool:
        return "bool"
    return "object"


def compare(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> tuple[bool, str]:
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        return False, f"columns differ: {sorted(spark_pdf.columns)} vs {sorted(oracle_pdf.columns)}"
    if len(spark_pdf) != len(oracle_pdf):
        return False, f"row counts differ: {len(spark_pdf)} vs {len(oracle_pdf)}"
    for c in sorted(spark_pdf.columns):
        ks, ko = kind(spark_pdf[c].dtype), kind(oracle_pdf[c].dtype)
        if ks != ko:
            return False, (
                f"col {c}: dtype-kind mismatch spark={spark_pdf[c].dtype}({ks}) "
                f"vs oracle={oracle_pdf[c].dtype}({ko}) — driver hash would diverge"
            )
        if ks == "datetime":
            return False, (
                f"col {c}: raw datetime output — emit epoch seconds (BIGINT) instead; "
                f"ns-vs-us pandas units make the driver hash engine-dependent"
            )
        if ks == "float":
            neg0_s = bool(((spark_pdf[c] == 0) & np.signbit(spark_pdf[c].fillna(0.0))).any())
            neg0_o = bool(((oracle_pdf[c] == 0) & np.signbit(oracle_pdf[c].fillna(0.0))).any())
            if neg0_s != neg0_o:
                return False, f"col {c}: -0.0 on one side only (spark={neg0_s}, oracle={neg0_o})"
    a, b = canon(spark_pdf), canon(oracle_pdf)
    for c in a.columns:
        av, bv = a[c], b[c]
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
            av = av.astype("float64")
            bv = bv.astype("float64")
            both_nan = av.isna() & bv.isna()
            eq = (av == bv) | both_nan
            if not eq.all():
                close = np.isclose(av.fillna(np.nan), bv.fillna(np.nan), rtol=1e-9, atol=1e-9, equal_nan=True)
                n_bad = int((~eq).sum())
                if close.all():
                    return False, f"col {c}: {n_bad} values differ but within 1e-9 (rounding mismatch)"
                i = int(np.argmax(~eq))
                return False, f"col {c}: {n_bad} values differ, e.g. row {i}: {av.iloc[i]!r} vs {bv.iloc[i]!r}"
        else:
            if not (a[c] == b[c]).all():
                i = int(np.argmax(~(a[c] == b[c]).values))
                return False, f"col {c}: differs, e.g. row {i}: {a[c].iloc[i]!r} vs {b[c].iloc[i]!r}"
    return True, "exact"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and os.path.isdir(sys.argv[1]) else "/root/testdata/sf0.01"
    # every non-dir argument is a query name (argv[1] included — it is only
    # consumed as sf_dir when it actually names a directory)
    only = set(a for a in sys.argv[1:] if a != sf_dir and not os.path.isdir(a)) or None
    reg = all_queries()

    spark = get_spark("correctness-check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    register_views(spark, sf_dir)

    at_fixture_sf = os.path.basename(os.path.normpath(sf_dir)) == FIXTURE_SF_BASENAME
    n_pass = n_fail = n_rows_only = n_skip = 0
    for name, q in sorted(reg.items()):
        if only and name not in only:
            continue
        if name in FIXTURE_ORACLES and not at_fixture_sf:
            print(f"SKIP {name}: fixture-sf oracle (constants generated at "
                  f"{FIXTURE_SF_BASENAME}; see FIXTURES.md §8)")
            n_skip += 1
            continue
        release_caches()  # previous query's scoped caches; fixtures survive
        t0 = time.time()
        try:
            sdf = q.fn(spark, sf_dir)
            spdf = sdf.toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if q.oracle is None:
            print(f"ROWS-ONLY {name}: {len(spdf)} rows  ({time.time()-t0:.1f}s)")
            n_rows_only += 1
            continue
        try:
            opdf = con.sql(q.oracle).df()
        except Exception as e:
            print(f"FAIL {name}: oracle raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        ok, msg = compare(spdf, opdf)
        status = "PASS" if ok else "FAIL"
        print(f"{status} {name}: {msg} ({len(spdf)} rows, {time.time()-t0:.1f}s)")
        n_pass += ok
        n_fail += not ok
    leaked = release_caches(fixtures=True)
    skip_note = f", {n_skip} fixture-sf skipped" if n_skip else ""
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only"
          f"{skip_note} ({leaked} sweep caches released)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
