"""Memory-pressure probe (VERDICT r7 #6): run the biggest-shuffle
operators at a scale factor with CONSTRAINED driver/executor memory and
record Spark's own spill metrics — the repo measures wall time
extensively but a 100 TB plan that silently spills is a different grade
from one that doesn't.

Mechanics: a fresh JVM is created with ``spark.driver.memory`` set to
the requested heap (local mode: the driver heap IS executor memory) and
the UI enabled; after each query the REST status API
(/api/v1/applications/{id}/stages) is summed for memoryBytesSpilled /
diskBytesSpilled / shuffle bytes, attributing per-query deltas.

Requires /tmp/sfprobe to be prebuilt by tools/scale_probe.py at the
desired factor (this script must NOT build it — building under a tiny
heap would measure the builder, not the operators).

Usage: python tools/spill_probe.py <heap> [query ...]
e.g.   python tools/spill_probe.py 4g basket_brand_lift ngram_jaccard_near_dups
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROBE_DIR = "/tmp/sfprobe"
DEFAULT_QUERIES = ["basket_brand_lift", "ngram_jaccard_near_dups"]


def _stage_totals(ui_base: str, app_id: str) -> dict[str, int]:
    url = f"{ui_base}/api/v1/applications/{app_id}/stages"
    with urllib.request.urlopen(url, timeout=10) as fh:
        stages = json.load(fh)
    tot = {
        "memoryBytesSpilled": 0,
        "diskBytesSpilled": 0,
        "shuffleWriteBytes": 0,
        "shuffleReadBytes": 0,
    }
    for s in stages:
        for k in tot:
            tot[k] += int(s.get(k, 0) or 0)
    return tot


def main() -> None:
    heap = sys.argv[1] if len(sys.argv) > 1 else "4g"
    names = sys.argv[2:] or DEFAULT_QUERIES
    if not os.path.isdir(PROBE_DIR):
        raise SystemExit(
            f"{PROBE_DIR} missing — build it first: python tools/scale_probe.py <factor>"
        )

    os.environ["SPARK_DRIVER_MEMORY"] = heap
    from drug_target_discovery_spark.caching import release_caches
    from drug_target_discovery_spark.queries.registry import all_queries
    from drug_target_discovery_spark.session import get_spark

    spark = get_spark(
        "spill-probe", extra_conf={"spark.ui.enabled": "true"}
    )
    # uiWebUrl carries the port Spark ACTUALLY bound (it auto-increments
    # past 4040 when taken — spark.ui.port stays unset in that case, so
    # reading the conf would query a different app's REST API)
    ui_base = spark.sparkContext.uiWebUrl
    if not ui_base:
        raise SystemExit("Spark UI did not start; spill metrics unavailable")
    app_id = spark.sparkContext.applicationId
    reg = all_queries()

    out = {"heap": heap, "sf_dir": PROBE_DIR, "probes": {}}
    prev = _stage_totals(ui_base, app_id)
    for name in names:
        t0 = time.perf_counter()
        status = "ok"
        try:
            reg[name].fn(spark, PROBE_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as e:  # OOM/abort is itself a probe result
            status = f"FAILED: {type(e).__name__}"
        wall = round(time.perf_counter() - t0, 2)
        release_caches(fixtures=True)
        cur = _stage_totals(ui_base, app_id)
        delta = {k: cur[k] - prev[k] for k in cur}
        prev = cur
        row = {
            "wall_s": wall,
            "status": status,
            "spill_mem_mb": round(delta["memoryBytesSpilled"] / 2**20, 1),
            "spill_disk_mb": round(delta["diskBytesSpilled"] / 2**20, 1),
            "shuffle_write_mb": round(delta["shuffleWriteBytes"] / 2**20, 1),
            "shuffle_read_mb": round(delta["shuffleReadBytes"] / 2**20, 1),
        }
        out["probes"][name] = row
        print(name, row, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
