"""Catalog/CLI guards: OPERATORS.md must list exactly the registered
queries in its registered section and exactly the tests-only-lane
manifest in its lane section (a stale catalog misleads the user the
engine exists for), and the run_query CLI's no-Spark paths must work."""

import os
import re
import sys

from drug_target_discovery_spark.queries.registry import all_queries

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

LANE_HEADER = "## Tests-only lane"


class TestOperatorCatalog:
    def test_catalog_matches_registry(self):
        reg = set(all_queries())
        text = open(os.path.join(REPO, "OPERATORS.md")).read()
        registered_part, sep, _ = text.partition(LANE_HEADER)
        assert sep, "OPERATORS.md lost its tests-only-lane section"
        listed = set(re.findall(r"^\| `([a-z0-9_]+)` \|", registered_part, re.M))
        missing = reg - listed
        stale = listed - reg
        assert not missing and not stale, (
            f"OPERATORS.md out of date — regenerate with "
            f"tools/gen_operator_index.py (missing={sorted(missing)}, "
            f"stale={sorted(stale)})"
        )

    def test_catalog_lane_matches_manifest(self):
        """The lane section must list exactly the generator's
        TESTS_ONLY_LANE manifest, and the manifest must stay disjoint
        from the registry (registering a lane operator is a decorator
        move that must also update the manifest)."""
        from gen_operator_index import TESTS_ONLY_LANE

        reg = set(all_queries())
        text = open(os.path.join(REPO, "OPERATORS.md")).read()
        _, sep, lane_part = text.partition(LANE_HEADER)
        assert sep
        lane_listed = set(re.findall(r"^\| `([a-z0-9_]+)` \|", lane_part, re.M))
        lane_expected = {fn for _, fn, _, _ in TESTS_ONLY_LANE}
        assert lane_listed == lane_expected, (
            f"lane section out of date — regenerate with "
            f"tools/gen_operator_index.py (missing="
            f"{sorted(lane_expected - lane_listed)}, "
            f"stale={sorted(lane_listed - lane_expected)})"
        )
        assert not (lane_expected & reg), (
            f"lane manifest overlaps the registry: {sorted(lane_expected & reg)}"
        )


class TestRunQueryCLI:
    def test_list_needs_no_spark(self, capsys):
        from drug_target_discovery_spark.run_query import main

        assert main(["--list"]) == 0
        out = capsys.readouterr().out
        assert "pricing_summary" in out and "[oracle]" in out

    def test_unknown_query_suggests(self, capsys):
        from drug_target_discovery_spark.run_query import main

        assert main(["pricing_sumary"]) == 2
        assert "close" in capsys.readouterr().err
