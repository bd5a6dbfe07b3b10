"""Per-query profiler for the optimization rounds (guide §1: measure first).

For each named query (or the N slowest from a BENCH_DETAIL file), runs the
query into the noop sink and records:

- wall seconds for rep 1 (cold: includes any sweep-memo build it carries)
  and rep 2 (warm: marginal cost with memos in place),
- how many Spark JOBS the rep launched (read off the DAGScheduler's
  nextJobId counter — eager actions at plan-build time and iterative
  drivers show up here; a healthy single-action query costs 1-3 jobs),
- the physical plan's Exchange count and join strategies (rep-2 plan).

Usage:
    python tools/profile_queries.py [--sf-dir DIR] [--top N] [name ...]

Writes JSON to stdout (one object per query) and a summary table to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from drug_target_discovery_spark.caching import release_caches
from drug_target_discovery_spark.queries.registry import all_queries
from drug_target_discovery_spark.session import get_spark


def _job_counter(spark) -> int:
    """Current value of the DAGScheduler job-id counter (not incremented
    by reading it): the number of jobs submitted so far this session."""
    v = spark.sparkContext._jsc.sc().dagScheduler().nextJobId()
    return int(v) if isinstance(v, int) else int(v.get())


def _plan_shape(df) -> dict:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        "exchanges": plan.count("Exchange"),
        "bhj": plan.count("BroadcastHashJoin"),
        "smj": plan.count("SortMergeJoin"),
        "shj": plan.count("ShuffledHashJoin"),
        "python": plan.count("EvalPython") + plan.count("MapInPandas") + plan.count("ArrowEval"),
    }


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    top_n = 0
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--sf-dir":
            sf_dir = args[i + 1]
            i += 2
        elif args[i] == "--top":
            top_n = int(args[i + 1])
            i += 2
        else:
            names.append(args[i])
            i += 1

    reg = all_queries()
    if top_n:
        detail = json.load(open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH_DETAIL.json")))
        ranked = sorted(detail["queries"].items(), key=lambda kv: -kv[1])
        names.extend(n for n, _ in ranked[:top_n] if n in reg and n not in names)

    spark = get_spark("profile")
    from drug_target_discovery_spark.sources.tables import load_table

    load_table(spark, sf_dir, "lineitem").count()  # warm-up

    results = []
    for name in names:
        q = reg[name]
        row: dict = {"name": name}
        for rep in (1, 2):
            j0 = _job_counter(spark)
            t0 = time.perf_counter()
            df = q.fn(spark, sf_dir)
            t_build = time.perf_counter() - t0
            j_build = _job_counter(spark)
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            df.write.format("noop").mode("overwrite").save()
            spark.sparkContext.setJobDescription(None)
            t1 = time.perf_counter()
            row[f"rep{rep}_s"] = round(t1 - t0, 3)
            row[f"rep{rep}_build_s"] = round(t_build, 3)
            row[f"rep{rep}_jobs"] = _job_counter(spark) - j0
            row[f"rep{rep}_build_jobs"] = j_build - j0
            if rep == 2:
                row["plan"] = _plan_shape(df)
            release_caches()  # query-scoped only; sweep memos survive
            try:
                spark.sparkContext._jvm.System.gc()
            except Exception:
                pass
        results.append(row)
        print(
            f"{name:42s} rep1 {row['rep1_s']:7.2f}s/{row['rep1_jobs']:3d}j "
            f"(build {row['rep1_build_s']:5.2f}s/{row['rep1_build_jobs']}j)  "
            f"rep2 {row['rep2_s']:7.2f}s/{row['rep2_jobs']:3d}j  "
            f"plan {row['plan']}",
            file=sys.stderr,
            flush=True,
        )

    release_caches(fixtures=True)
    spark.stop()
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
