"""Whole-registry physical-plan audit (optimization guide §2-§6).

Builds every registered query's DataFrame at the given SF dir and inspects
the *physical plan text* (no execution beyond each query's own eager
plan-build actions) for the red flags the optimization guide tells you to
hunt for:

- ``BatchEvalPython``  — row-at-a-time Python UDF on a data path (§4.1);
- ``CartesianProduct`` / ``BroadcastNestedLoopJoin`` — non-equi or
  accidental cross joins (§3; bounded deliberate ones are listed so they
  can be adjudicated, not hidden);
- ``Exchange`` count — shuffle boundaries (§2.4);
- join strategies chosen (``BroadcastHashJoin`` / ``SortMergeJoin`` /
  ``ShuffledHashJoin``) (§3.1);
- per-scan ``ReadSchema`` width and ``PushedFilters`` — column pruning and
  predicate pushdown reaching the parquet scan (§6).

Usage:
    python tools/plan_audit.py [--sf-dir DIR] [--json OUT.json]

Writes one JSON object (per-query details + summary) and prints a summary
table. Queries sharing sweep-scoped memos are built in registry order, so
memoized subtrees appear as ``InMemoryTableScan`` exactly as they do in a
bench sweep.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from drug_target_discovery_spark.caching import release_caches
from drug_target_discovery_spark.queries.registry import all_queries
from drug_target_discovery_spark.session import get_spark

_SCAN_RE = re.compile(
    r"Scan parquet .*?\[([^\]]*)\].*?"  # output columns of the scan node
)


def _scan_details(formatted: str) -> list[dict]:
    """Parse per-scan ReadSchema / PushedFilters blocks from explain('formatted')."""
    scans: list[dict] = []
    cur: dict | None = None
    for line in formatted.splitlines():
        s = line.strip()
        if s.startswith("(") and "Scan parquet" in s:
            if cur:
                scans.append(cur)
            cur = {"node": s, "pushed": None, "read_cols": None}
        elif cur is not None and s.startswith("PushedFilters:"):
            cur["pushed"] = s[len("PushedFilters:"):].strip()
        elif cur is not None and s.startswith("ReadSchema:"):
            schema = s[len("ReadSchema:"):].strip()
            cur["read_cols"] = schema.count(":")  # field count in struct<...>
            scans.append(cur)
            cur = None
    if cur:
        scans.append(cur)
    return scans


def main() -> None:
    args = sys.argv[1:]
    sf_dir, out_json = "/root/testdata/sf0.1", None
    i = 0
    while i < len(args):
        if args[i] == "--sf-dir":
            sf_dir = args[i + 1]
            i += 2
        elif args[i] == "--json":
            out_json = args[i + 1]
            i += 2
        else:
            raise SystemExit(f"unknown arg {args[i]}")

    spark = get_spark("plan-audit")
    reg = all_queries()
    report: dict[str, dict] = {}
    for name, q in sorted(reg.items()):
        try:
            df = q.fn(spark, sf_dir)
            qe = df._jdf.queryExecution()
            plan = qe.executedPlan().toString()
            formatted = qe.explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # a failing build must not hide the rest
            report[name] = {"error": f"{type(e).__name__}: {e}"}
            continue
        report[name] = {
            "exchanges": plan.count("Exchange"),
            "bhj": plan.count("BroadcastHashJoin"),
            "smj": plan.count("SortMergeJoin"),
            "shj": plan.count("ShuffledHashJoin"),
            "cartesian": plan.count("CartesianProduct"),
            "bnlj": plan.count("BroadcastNestedLoopJoin"),
            "batch_eval_python": plan.count("BatchEvalPython"),
            "arrow_eval_python": plan.count("ArrowEvalPython")
            + plan.count("MapInPandas")
            + plan.count("FlatMapGroupsInPandas")
            + plan.count("MapInArrow"),
            "scans": _scan_details(formatted),
        }
    release_caches(fixtures=True)

    flags = {
        "batch_eval_python": [
            n for n, r in report.items() if r.get("batch_eval_python", 0) > 0
        ],
        "cartesian": [n for n, r in report.items() if r.get("cartesian", 0) > 0],
        "bnlj": [n for n, r in report.items() if r.get("bnlj", 0) > 0],
        "errors": [n for n, r in report.items() if "error" in r],
    }
    summary = {
        "sf_dir": sf_dir,
        "n_queries": len(report),
        "flags": flags,
        "total_exchanges": sum(r.get("exchanges", 0) for r in report.values()),
    }
    payload = {"summary": summary, "queries": report}
    if out_json:
        with open(out_json, "w") as f:
            json.dump(payload, f, indent=1, sort_keys=True)
    print(json.dumps(summary, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
