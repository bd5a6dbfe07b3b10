"""Same-host A/B sweep comparison (optimization round close).

Compares two sides of N committed BENCH_DETAIL files each (pre-opt code
vs post-opt code, all taken on the SAME host in the SAME session), using
the per-query MINIMUM across each side's takes — the noise-robust
estimator under one-sided co-tenant contamination (load only ever adds
time; see tools/canary_compare.py for the same argument on the canary).

Usage:
    python tools/ab_sweep_compare.py A1.json A2.json -- B1.json B2.json

Prints a markdown table of the largest movers and a JSON machine row.
"""

from __future__ import annotations

import json
import sys


def _load_side(paths: list[str]) -> dict[str, float]:
    mins: dict[str, float] = {}
    for p in paths:
        with open(p) as fh:
            qs = json.load(fh)["queries"]
        for k, v in qs.items():
            if v < 0:  # bench error sentinel; never a valid timing
                continue
            mins[k] = min(mins.get(k, float("inf")), v)
    return mins


def main() -> None:
    argv = sys.argv[1:]
    if "--" not in argv:
        raise SystemExit(__doc__)
    split = argv.index("--")
    a_paths, b_paths = argv[:split], argv[split + 1 :]
    if len(a_paths) != len(b_paths):
        # min over more samples is stochastically lower, so unequal take
        # counts bias the comparison toward the side with more payloads
        # (ADVICE r13 #1) — warn loudly and record the counts below.
        print(
            f"WARNING: unequal take counts ({len(a_paths)} pre vs "
            f"{len(b_paths)} post) — min-of-N bias favors the larger side",
            file=sys.stderr,
        )
    a, b = _load_side(a_paths), _load_side(b_paths)
    shared = sorted(set(a) & set(b))
    only_a, only_b = sorted(set(a) - set(b)), sorted(set(b) - set(a))

    rows = [(k, a[k], b[k], b[k] - a[k]) for k in shared]
    rows.sort(key=lambda r: r[3])
    tot_a = sum(a[k] for k in shared)
    tot_b = sum(b[k] for k in shared)

    print(f"| query | A (pre) | B (post) | delta |")
    print(f"|---|---|---|---|")
    for k, va, vb, d in rows[:15]:
        print(f"| {k} | {va:.2f} | {vb:.2f} | {d:+.2f} |")
    print("| ... | | | |")
    # start the tail after the head slice so short lists don't print
    # duplicate rows (ADVICE r13 #2)
    for k, va, vb, d in rows[max(15, len(rows) - 5) :]:
        print(f"| {k} | {va:.2f} | {vb:.2f} | {d:+.2f} |")
    print()
    machine = {
        "shared_queries": len(shared),
        "takes_pre": len(a_paths),
        "takes_post": len(b_paths),
        "total_min_pre_sec": round(tot_a, 2),
        "total_min_post_sec": round(tot_b, 2),
        "delta_pct": round(100.0 * (tot_b - tot_a) / tot_a, 2) if tot_a else None,
        "only_pre": only_a,
        "only_post": only_b,
        "n_improved": sum(1 for r in rows if r[3] < 0),
        "n_regressed_over_0p3s": sum(1 for r in rows if r[3] > 0.3),
    }
    print(json.dumps(machine))


if __name__ == "__main__":
    main()
