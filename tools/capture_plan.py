"""Capture `.explain("formatted")` + a timed noop run for named queries.

Usage:
    python tools/capture_plan.py --root DIR --suffix before|after [--time] name...

Writes plans/r13/<name>_<suffix>.txt under /root/repo (regardless of which
source tree --root points at, so before/after pairs land side by side) and
prints per-query wall seconds when --time is given. --root selects the
source tree to import the engine from (e.g. a git worktree of the previous
commit for the "before" side).
"""

from __future__ import annotations

import os
import sys
import time

args = sys.argv[1:]
root = "/root/repo"
suffix = "after"
do_time = False
names: list[str] = []
i = 0
while i < len(args):
    if args[i] == "--root":
        root = args[i + 1]
        i += 2
    elif args[i] == "--suffix":
        suffix = args[i + 1]
        i += 2
    elif args[i] == "--time":
        do_time = True
        i += 1
    else:
        names.append(args[i])
        i += 1

sys.path.insert(0, root)

from drug_target_discovery_spark.caching import release_caches  # noqa: E402
from drug_target_discovery_spark.queries.registry import all_queries  # noqa: E402
from drug_target_discovery_spark.session import get_spark  # noqa: E402
from drug_target_discovery_spark.sources.tables import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.environ.get("SPARK_GRAFT_PLANS_DIR", "/root/repo/plans/r14")

spark = get_spark("capture-plan")
load_table(spark, SF_DIR, "lineitem").count()
reg = all_queries()
os.makedirs(OUT_DIR, exist_ok=True)

for name in names:
    df = reg[name].fn(spark, SF_DIR)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    with open(os.path.join(OUT_DIR, f"{name}_{suffix}.txt"), "w") as f:
        f.write(plan)
    if do_time:
        for rep in (1, 2):
            release_caches()
            df = reg[name].fn(spark, SF_DIR)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            print(
                f"{name} [{suffix}] rep{rep}: {time.perf_counter() - t0:.2f}s",
                file=sys.stderr,
                flush=True,
            )
    release_caches()

release_caches(fixtures=True)
spark.stop()
