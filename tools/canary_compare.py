"""Recompute canary round-over-round comparisons from COMMITTED artifacts
(VERDICT r8 wrong-#1 / next-#3).

The r8 BENCH_NOTES canary table mixed committed runs with two uncommitted
payloads, so its published deltas could not be reproduced from the repo.
This tool is the fix and the standing process: every published canary
comparison is the output of

    python tools/canary_compare.py BENCH_CANARY_r07.json BENCH_CANARY.json

over files that are IN the repo. Estimator: per-row MINIMUM across each
side's `runs` arrays (the noise-robust statistic under one-sided host
contamination — co-tenant load only ever adds time), deltas sorted
largest-regression-first, rows past the +/-30% named-investigation
threshold flagged. Markdown table on stdout, machine row (JSON) last.

Multiple payloads per side are separated by `--` (min taken across ALL
of a side's committed runs — the estimator the r8 notes applied to
uncommitted data, now over committed files only):

    python tools/canary_compare.py BENCH_CANARY_r08.json -- \\
        BENCH_CANARY_r09_runA.json BENCH_CANARY.json
"""

from __future__ import annotations

import json
import sys

THRESHOLD_PCT = 30.0


def _mins(payloads: list[dict]) -> dict[str, float]:
    out: dict[str, float] = {}
    for payload in payloads:
        for name, q in payload.get("queries", {}).items():
            if q.get("runs"):
                m = min(q["runs"])
                out[name] = min(out.get(name, m), m)
    return out


def compare(
    old: dict | list[dict], new: dict | list[dict]
) -> tuple[list[dict], float, float]:
    if isinstance(old, dict):
        old = [old]
    if isinstance(new, dict):
        new = [new]
    a, b = _mins(old), _mins(new)
    rows = []
    for name in sorted(set(a) & set(b)):
        pct = (b[name] - a[name]) / a[name] * 100 if a[name] else 0.0
        rows.append(
            {
                "query": name,
                "old_min": a[name],
                "new_min": b[name],
                "pct": round(pct, 1),
                "flagged": abs(pct) > THRESHOLD_PCT,
            }
        )
    rows.sort(key=lambda r: -r["pct"])
    return rows, sum(a[r["query"]] for r in rows), sum(b[r["query"]] for r in rows)


def main() -> None:
    args = sys.argv[1:]
    if "--" in args:
        i = args.index("--")
        old_paths, new_paths = args[:i], args[i + 1 :]
    elif len(args) == 2:
        old_paths, new_paths = args[:1], args[1:]
    else:
        raise SystemExit(
            "usage: canary_compare.py OLD.json NEW.json | "
            "canary_compare.py OLD.json [OLD2...] -- NEW.json [NEW2...]"
        )

    def _load(paths: list[str]) -> list[dict]:
        out = []
        for p in paths:
            with open(p) as fh:
                out.append(json.load(fh))
        return out

    old, new = _load(old_paths), _load(new_paths)
    rows, tot_old, tot_new = compare(old, new)

    print(
        f"min-of-runs, committed artifacts only: {'+'.join(old_paths)} "
        f"(round {old[0].get('round')}) -> {'+'.join(new_paths)} "
        f"(round {new[0].get('round')})\n"
    )
    print("| query | old min | new min | delta |")
    print("| --- | --- | --- | --- |")
    for r in rows:
        flag = " **(> +/-30%: investigate)**" if r["flagged"] else ""
        print(
            f"| {r['query']} | {r['old_min']:.3f} | {r['new_min']:.3f} "
            f"| {r['pct']:+.0f}%{flag} |"
        )
    pct_total = (tot_new - tot_old) / tot_old * 100 if tot_old else 0.0
    print(
        f"\ntotal min-of-runs {tot_old:.2f}s -> {tot_new:.2f}s "
        f"({pct_total:+.1f}%)"
    )
    print(
        json.dumps(
            {
                "total_old": round(tot_old, 3),
                "total_new": round(tot_new, 3),
                "pct": round(pct_total, 1),
                "flagged": [r["query"] for r in rows if r["flagged"]],
            }
        )
    )


if __name__ == "__main__":
    main()
