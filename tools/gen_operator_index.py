"""Generate OPERATORS.md: the user-facing catalog of every registered
query — name, tags, implementation site (module:line), oracle status, and
the first docstring sentence. Auto-generated so it cannot drift from the
registry; regenerate after adding queries:

    python tools/gen_operator_index.py
"""

from __future__ import annotations

import inspect
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from drug_target_discovery_spark.queries.registry import all_queries

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "OPERATORS.md"
)


def first_sentence(doc: str) -> str:
    doc = " ".join((doc or "").split())
    for stop in (". ", ".\n"):
        i = doc.find(stop)
        if i > 0:
            return doc[: i + 1]
    return doc[:160] + ("…" if len(doc) > 160 else "")


def main() -> None:
    reg = all_queries()
    by_tag: dict[str, list[str]] = defaultdict(list)
    rows = {}
    for name, q in reg.items():
        fn = inspect.unwrap(q.fn)
        src = os.path.relpath(inspect.getsourcefile(fn), os.path.dirname(OUT))
        line = inspect.getsourcelines(fn)[1]
        rows[name] = (
            src,
            line,
            "exact SQL oracle" if q.oracle else "rows-only (fixture/unit oracles)",
            ", ".join(q.tags),
            first_sentence(q.doc),
        )
        for t in q.tags or ("untagged",):
            by_tag[t].append(name)

    with open(OUT, "w") as f:
        f.write(
            "# Operator catalog (auto-generated)\n\n"
            "One row per registered query — the complete user-facing "
            "surface of the engine. Regenerate with "
            "`python tools/gen_operator_index.py`.\n\n"
            f"**{len(rows)} queries** — "
            f"{sum(1 for r in rows.values() if r[2].startswith('exact'))} with "
            "exact DuckDB value-hash oracles, the rest rows-only by design "
            "(fixture or library oracles in tests/).\n\n"
            "| Query | Where | Oracle | Tags | What it does |\n"
            "|---|---|---|---|---|\n"
        )
        for name in sorted(rows):
            src, line, oracle, tags, doc = rows[name]
            doc = doc.replace("|", "\\|")
            f.write(f"| `{name}` | `{src}:{line}` | {oracle} | {tags} | {doc} |\n")
        f.write("\n## By tag\n\n")
        for t in sorted(by_tag):
            names = ", ".join(f"`{n}`" for n in sorted(by_tag[t]))
            f.write(f"- **{t}** ({len(by_tag[t])}): {names}\n")
    print(f"wrote {OUT}: {len(rows)} queries")


if __name__ == "__main__":
    main()
