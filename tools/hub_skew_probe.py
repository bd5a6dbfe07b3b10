"""Hub-skew probe for the Adamic-Adar wedge join (SCALING.md table).

The wedge join fans out deg(z)^2 rows per middle z, so one hub node
dominates the whole job. This probe builds a background graph (ring +
random, deg ~6) plus ONE hub of configurable degree, then times
``adamic_adar_pairs`` exact vs with the ``max_middle_degree`` valve —
the measured form of the docstring's skew argument.

Usage:  python tools/hub_skew_probe.py [n_nodes] [hub_degree] [cap]
Prints one JSON line; paste the numbers into SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from drug_target_discovery_spark.caching import release_caches
from drug_target_discovery_spark.queries.graphq import adamic_adar_pairs
from drug_target_discovery_spark.session import get_spark


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    hub_deg = int(sys.argv[2]) if len(sys.argv) > 2 else 4_000
    cap = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    spark = get_spark("hub-skew-probe")
    rng = np.random.default_rng(77)
    ids = np.arange(1, n, dtype=np.int64)  # node 0 is the hub
    ring = np.stack([ids[:-1], ids[1:]], axis=1)
    extra_src = rng.integers(1, n, size=2 * n)
    extra_dst = rng.integers(1, n, size=2 * n)
    hub_nbrs = rng.choice(ids, size=hub_deg, replace=False)
    hub = np.stack([np.zeros(hub_deg, dtype=np.int64), hub_nbrs], axis=1)
    edges = np.concatenate(
        [ring, np.stack([extra_src, extra_dst], axis=1), hub]
    )
    a = np.minimum(edges[:, 0], edges[:, 1])
    b = np.maximum(edges[:, 0], edges[:, 1])
    keep = a != b
    import pandas as pd

    e = (
        spark.createDataFrame(pd.DataFrame({"a": a[keep], "b": b[keep]}))
        .dropDuplicates(["a", "b"])
        .cache()
    )
    n_edges = e.count()

    def run(kw):
        t0 = time.perf_counter()
        # driver_threshold=0: this probe measures the DISTRIBUTED wedge
        # join's hub-skew behaviour; never let the gate take the fast path
        cnt = adamic_adar_pairs(e, driver_threshold=0, **kw).count()
        return cnt, round(time.perf_counter() - t0, 2)

    pairs_exact, t_exact = run({})
    release_caches()
    pairs_cap, t_cap = run({"max_middle_degree": cap})
    release_caches(fixtures=True)
    print(
        json.dumps(
            {
                "n_nodes": n,
                "n_edges": n_edges,
                "hub_degree": hub_deg,
                "cap": cap,
                "exact": {"pairs": pairs_exact, "sec": t_exact},
                "capped": {"pairs": pairs_cap, "sec": t_cap},
            }
        )
    )


if __name__ == "__main__":
    main()
