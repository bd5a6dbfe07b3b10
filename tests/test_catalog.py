"""Catalog/CLI guards: OPERATORS.md must list exactly the registered
queries (a stale catalog misleads the user the engine exists for), and the
run_query CLI's no-Spark paths must work."""

import os
import re

from drug_target_discovery_spark.queries.registry import all_queries

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestOperatorCatalog:
    def test_catalog_matches_registry(self):
        reg = set(all_queries())
        text = open(os.path.join(REPO, "OPERATORS.md")).read()
        listed = set(re.findall(r"^\| `([a-z0-9_]+)` \|", text, re.M))
        missing = reg - listed
        stale = listed - reg
        assert not missing and not stale, (
            f"OPERATORS.md out of date — regenerate with "
            f"tools/gen_operator_index.py (missing={sorted(missing)}, "
            f"stale={sorted(stale)})"
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
