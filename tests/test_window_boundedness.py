"""Every unpartitioned window must carry its boundedness argument
(VERDICT r5 #4).

The repo convention: an empty-partitionBy (single-partition) window is
allowed ONLY over a table that is bounded BY CONSTRUCTION (a top-K
truncation, a domain-sized count/contingency table, a fixed calendar) —
never over the fact. The driver bench surfaces these as
``WindowExec: No Partition Defined`` warnings; this test makes each site
auditable by requiring an inline ``bounded`` rationale within the six
lines above the window definition, and pins the full site inventory so a
new unpartitioned window cannot appear without updating (and therefore
justifying) it here.
"""

import os
import re

PKG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "drug_target_discovery_spark",
)

# matches module-level window-builder calls that create a single-partition
# window: Window.orderBy(...) / W.orderBy(...) / PWindow.orderBy(...) and
# explicit empty partitionBy()
_UNPARTITIONED = re.compile(
    r"\b(?:P?Window|W)\.(?:orderBy\(|partitionBy\(\))"
)

# current audited inventory: (relative path, approximate count of sites)
_KNOWN_FILES = {
    "functions/stats.py",     # BH-FDR rank (feature-dimension table)
    "queries/corpusstats.py", # RRF/hybrid rank (top-K truncations)
    "queries/curation.py",    # shard offsets (per-source table)
    "queries/drift.py",       # chi2 total (contingency table)
    "queries/evalmetrics.py", # PR curve (per-score count table)
    "queries/relational.py",  # zip ordinal (dimension tables)
    "queries/round6a.py",     # MI total / skyline levels / daily series
    "queries/round6b.py",     # Zipf rank (top-K truncation)
    "queries/round7.py",      # KM day-grain gaps / CUSUM daily series
    "queries/round9.py",      # IVF refresh audit shares/PSI (2^3 cell frame)
    "queries/round10.py",     # apportionment rank (source-domain table)
    "queries/round11.py",     # autotune choice rank (<=16-row config table)
    "queries/tpchx.py",       # decile offsets (bucket table)
    "queries/windows.py",     # daily rolling (calendar) + ntile demo (dim)
}


def _sites():
    found = []
    for root, _, files in os.walk(PKG):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(root, fn)
            rel = os.path.relpath(path, PKG)
            with open(path) as fh:
                lines = fh.readlines()
            for i, line in enumerate(lines):
                if _UNPARTITIONED.search(line) and not line.lstrip().startswith("#"):
                    ctx = "".join(lines[max(0, i - 6) : i + 1]).lower()
                    found.append((rel, i + 1, "bounded" in ctx))
    return found


class TestUnpartitionedWindows:
    def test_every_site_documents_its_bound(self):
        undocumented = [(f, ln) for f, ln, ok in _sites() if not ok]
        assert not undocumented, (
            "unpartitioned window without a 'bounded' rationale within 6 "
            f"lines above: {undocumented} — single-partition windows are "
            "allowed only over tables bounded by construction; say why"
        )

    def test_inventory_is_pinned(self):
        files = {f for f, _, _ in _sites()}
        new = files - _KNOWN_FILES
        assert not new, (
            f"new files with unpartitioned windows: {new} — verify each "
            "input is bounded by construction, then add the file here"
        )
