"""Lloyd-loop model-size stress probe (VERDICT r5 #6).

The k-means x10 probe covered wall time at K=8; this probe exercises the
per-iteration K x D collect at model scale — K=256, D=64 (~128 KB of
BIGINT partials per iteration) over 15+ iterations — and confirms the two
properties the 100 TB design claims:

1. the per-iteration collect stays FLAT (no growth with iteration index:
   the loop maps the SAME input DataFrame every round; centroids travel
   through the Python closure, so the logical plan does not deepen — the
   r4 exponential-lineage bug class cannot occur by construction, and this
   probe measures that it doesn't);
2. iteration wall time is O(batches x K x D) map work + one (cluster, dim)
   shuffle whose reduce side is model-sized, independent of N beyond the
   map scan.

Usage: python tools/lloyd_probe.py [N] [K] [D] [iters]
Writes one table row per iteration; summarize in SCALING.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from drug_target_discovery_spark.operators.kmeans import (
    _STATS_SCHEMA,
    _partial_stats_kernel,
)
from drug_target_discovery_spark.session import get_spark


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    d = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 16

    spark = get_spark("lloyd-probe")
    # deterministic synthetic int vectors: dim-d entries from an LCG of
    # (vid, dim) — no RNG, reproducible
    vq = spark.range(n).select(
        F.col("id").alias("vid"),
        F.expr(
            f"transform(sequence(0, {d - 1}), "
            f"j -> (id * 1103515245 + j * 12345) % 1000000)"
        ).alias("v_int"),
    )
    vq = vq.repartition(32).cache()
    vq.count()

    init = vq.orderBy("vid").limit(k).orderBy("vid").collect()
    centroids = [[float(x) for x in r["v_int"]] for r in init]
    print(f"N={n} K={k} D={d} iters={iters}  model rows/iter <= {k * (d + 1)}")
    print("iter\twall_s\tcollect_rows\tplan_nodes")
    times = []
    for it in range(iters):
        t0 = time.time()
        stats_df = (
            vq.mapInPandas(_partial_stats_kernel(centroids), schema=_STATS_SCHEMA)
            .groupBy("cluster", "dim")
            .agg(F.sum("s").alias("s"))
        )
        stats = stats_df.collect()
        wall = time.time() - t0
        plan_nodes = stats_df._jdf.queryExecution().executedPlan().toString().count("\n")
        times.append(wall)
        sums: dict[int, dict[int, int]] = {}
        for r in stats:
            sums.setdefault(r["cluster"], {})[r["dim"]] = r["s"]
        new = []
        for j in range(k):
            cj = sums.get(j)
            if not cj or cj.get(-1, 0) == 0:
                new.append(centroids[j])
                continue
            nn = cj[-1]
            new.append([cj[dd] / nn for dd in range(d)])
        centroids = new
        print(f"{it}\t{wall:.2f}\t{len(stats)}\t{plan_nodes}")
    first3 = sum(times[:3]) / 3
    last3 = sum(times[-3:]) / 3
    print(
        f"mean first-3 {first3:.2f}s, last-3 {last3:.2f}s, "
        f"ratio {last3 / first3:.2f}x (flat <= ~1.2x)"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
