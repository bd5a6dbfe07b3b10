"""Controlled bench canary (VERDICT r6 #1).

The full-registry sweep is a single run per query on a possibly-contended
host, so its round-over-round mean moves with host scatter and registry
growth — two rounds of drift were explained by narrative, not measurement.
This tool is the control: a PINNED 20-query subset (top memo carriers +
one representative per tier, frozen here — do NOT rotate it, the value is
longitudinal comparability) run N times (default 3), reporting per-query
MEDIANS. Sweep-scoped fixture caches are released between reps so every
rep pays the same memo builds; per-query medians are then robust to
one-off scheduler jitter, and a real code-side regression shows up as a
shifted median on specific rows rather than a noisy mean.

Usage:  python tools/bench_canary.py [--reps 3] [--sf-dir /root/testdata/sf0.1]
Writes BENCH_CANARY.json (committed per round); prints a comparison
against the previous committed file when one exists.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from drug_target_discovery_spark.caching import release_caches
from drug_target_discovery_spark.queries.registry import all_queries
from drug_target_discovery_spark.session import get_spark
from drug_target_discovery_spark.sources.tables import load_table

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Frozen canary subset: the expensive sweep-scoped memo carriers (graph,
# GEO, exact-pairs, LSH, k-means), one representative per operator tier,
# and the two queries with a history of driver-row anomalies
# (join_key_skew_profile, mllib_minhash_neardups). 20 names, frozen at
# round 7 — additions get a NEW list version, never an in-place edit.
CANARY_V1: tuple[str, ...] = (
    "adamic_adar_link_prediction",   # graph memo carrier (first alphabetical)
    "kmeans_lloyd_clusters",         # Lloyd training loop
    "geo_pipeline_differential",     # GEO chain carrier
    "ngram_jaccard_near_dups",       # exact-pairs memo carrier
    "lsh_candidate_pairs",           # LSH banding memo
    "shingle_containment_pairs",     # prefix-filter containment (r7 plan)
    "curation_end_to_end",           # widest composed pipeline
    "hybrid_retrieval_rerank",       # BM25 + cosine rerank
    "ndcg_retrieval_eval",           # retrieval eval tier
    "differential_expression",       # GEO stats chain
    "jackknife_ratio_readout",       # experimentation tier
    "important_part_value_share",    # TPC-H Q11 shape
    "pricing_summary",               # TPC-H Q1 shape
    "top_orders_by_revenue",         # TakeOrdered shape
    "pagerank_corr_graph",           # iterative graph
    "bm25_keyword_search",           # text scoring
    "rolling_revenue_anomaly",       # calendar window tier
    "cusum_changepoint_daily_revenue",  # r7 daily-series tier
    "join_key_skew_profile",         # historically jitter-prone driver rows
    "mllib_minhash_neardups",        # r5 driver-anomaly row (bounded r6)
)

# V2 (round 11, VERDICT r10 #3): V1 frozen and extended by the two largest
# same-code sweep swings of r10 (minhash_jaccard_estimate_error 7.62s driver
# vs 2.54s idle; mllib_corr_matrix_top 6.93 vs 3.64) so future swings on
# those rows close from committed band data instead of the idle sweep.
# V1 rows stay longitudinally comparable (canary_compare intersects names).
CANARY_V2: tuple[str, ...] = CANARY_V1 + (
    "minhash_jaccard_estimate_error",  # r10 swing row (shuffle-heavy memo rider)
    "mllib_corr_matrix_top",           # r10 swing row (MLlib vector-column demo)
)

CANARY = CANARY_V2
CANARY_VERSION = 2


def _load1() -> float:
    """1-minute load average; -1.0 where /proc is unavailable."""
    try:
        with open("/proc/loadavg") as f:
            return float(f.read().split()[0])
    except Exception:
        return -1.0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_CANARY.json"))
    args = ap.parse_args()

    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
        if (m := re.search(r"_r(\d+)\.json$", p))
    ]
    cur_round = (max(rounds) + 1) if rounds else 0

    prev = None
    if os.path.exists(args.out):
        with open(args.out) as fh:
            prev = json.load(fh)

    reg = all_queries()
    missing = [n for n in CANARY if n not in reg]
    if missing:
        raise SystemExit(f"canary names missing from registry: {missing}")

    spark = get_spark("bench-canary")
    load_table(spark, args.sf_dir, "lineitem").count()  # session warm-up

    runs: dict[str, list[float]] = {n: [] for n in CANARY}
    loads: dict[str, list[float]] = {n: [] for n in CANARY}
    for rep in range(args.reps):
        for name in CANARY:
            loads[name].append(_load1())
            t0 = time.perf_counter()
            reg[name].fn(spark, args.sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs[name].append(round(time.perf_counter() - t0, 3))
            release_caches()
            try:
                spark.sparkContext._jvm.System.gc()
            except Exception:
                pass
        # every rep pays the same sweep-scoped memo builds
        release_caches(fixtures=True)
        print(f"rep {rep + 1}/{args.reps} done", file=sys.stderr)
    spark.stop()

    medians = {n: round(statistics.median(v), 3) for n, v in runs.items()}
    payload = {
        "canary_version": CANARY_VERSION,
        "round": cur_round,
        "sf_dir": args.sf_dir,
        "reps": args.reps,
        "total_median_sec": round(sum(medians.values()), 3),
        # loadavg1[i] = /proc/loadavg 1-min average when runs[i] started
        # (VERDICT r8 #4: load attribution must be checkable per row)
        "queries": {
            n: {"median": medians[n], "runs": runs[n], "loadavg1": loads[n]}
            for n in CANARY
        },
    }
    with open(args.out, "w") as fh:
        json.dump(payload, fh, indent=1)

    print(json.dumps({"total_median_sec": payload["total_median_sec"]}))
    if prev and prev.get("canary_version") in (1, CANARY_VERSION):
        print(
            f"\ndelta vs round {prev.get('round')} "
            f"(total {prev.get('total_median_sec')}s -> "
            f"{payload['total_median_sec']}s):",
            file=sys.stderr,
        )
        for n in CANARY:
            was = prev.get("queries", {}).get(n, {}).get("median")
            now = medians[n]
            if was is None:
                print(f"  {n:34s}      -> {now:7.3f}s (new)", file=sys.stderr)
            else:
                pct = (now - was) / was * 100 if was else 0.0
                print(
                    f"  {n:34s} {was:7.3f} -> {now:7.3f}s ({pct:+.0f}%)",
                    file=sys.stderr,
                )


if __name__ == "__main__":
    main()
