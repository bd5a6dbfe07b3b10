"""Generate OPERATORS.md: the user-facing catalog of every registered
query — name, tags, implementation site (module:line), oracle status, and
the first docstring sentence — PLUS the tests-only lane (VERDICT r9 #3):
operators implemented and oracle-cross-checked in pytest but unregistered
under the 199-query capacity freeze. Auto-generated so it cannot drift
from the registry; regenerate after adding queries or lane operators:

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

# The tests-only lane manifest (registry.py CAPACITY POLICY rule 3): each
# entry is (import path, callable, oracle-evidence class, test site). The
# pytest evidence runs the SAME comparison the driver gate runs (DuckDB
# SQL / independent recompute, sorted-column exact match, sf0.01) — the
# lane loses only the driver-artifact row. Registering one of these is a
# decorator move governed by the one-in-one-out rule; this script asserts
# the manifest and the registry stay disjoint.
TESTS_ONLY_LANE: tuple[tuple[str, str, str, str], ...] = (
    (
        "drug_target_discovery_spark.queries.round9",
        "exact_substring_dup_stats",
        "prepared DuckDB oracle (exact, sf0.001/0.01) + hypothesis brute force",
        "tests/test_round9_ops.py",
    ),
    (
        "drug_target_discovery_spark.queries.round9",
        "ivf_index_refresh_audit",
        "prepared DuckDB oracle (exact) + drift-trigger fixtures",
        "tests/test_round9_ops.py",
    ),
    (
        "drug_target_discovery_spark.queries.round9",
        "lpa_community_modularity",
        "networkx library oracle + known-Q fixture",
        "tests/test_round9_ops.py",
    ),
    (
        "drug_target_discovery_spark.queries.round9",
        "bpe_top_merges",
        "exact python recompute + hypothesis brute force (incl. quote/backslash symbols)",
        "tests/test_round9_ops.py",
    ),
    (
        "drug_target_discovery_spark.queries.round9",
        "bpe_encode_stats",
        "exact python recompute of train + encode (incl. quote/backslash fuzzing)",
        "tests/test_round9_ops.py",
    ),
    (
        "drug_target_discovery_spark.queries.round9",
        "ivf_drift_retrain",
        "prepared DuckDB census oracle (no-retrain branch) + independent numpy Lloyd recompute (retrain branch)",
        "tests/test_round9_ops.py",
    ),
    (
        "drug_target_discovery_spark.queries.round9",
        "deterministic_epoch_shuffle",
        "prepared DuckDB row_number oracle (sf0.001/0.01) + independent hashlib recompute",
        "tests/test_round9_ops.py",
    ),
    (
        "drug_target_discovery_spark.queries.round8",
        "order_value_gini_by_nation_scalable",
        "pinned exactly equal to the registered window form (sf0.001/0.01)",
        "tests/test_round9_ops.py",
    ),
    (
        "drug_target_discovery_spark.operators.prefixsum",
        "range_partitioned_prefix_sum",
        "window-form equality + hypothesis brute force; plan pinned single-partition-window-free",
        "tests/test_round9_ops.py",
    ),
    (
        "drug_target_discovery_spark.operators.prefixsum",
        "weighted_median_by_key",
        "python brute force + DuckDB lineitem cross-check",
        "tests/test_round9_ops.py",
    ),
    (
        "drug_target_discovery_spark.queries.round10",
        "cross_source_shingle_overlap",
        "prepared DuckDB oracle (exact, sf0.001/0.01) + hand-built exact fixtures",
        "tests/test_round10_ops.py",
    ),
    (
        "drug_target_discovery_spark.queries.round10",
        "bigram_lm_quality_by_source",
        "prepared DuckDB oracle (exact, sf0.001/0.01) + hypothesis python recompute",
        "tests/test_round10_ops.py",
    ),
    (
        "drug_target_discovery_spark.queries.round10",
        "pq_adc_recall",
        "independent numpy recompute (exact, sf0.001/0.01) + partitioning-invariance and perfect-codebook pins",
        "tests/test_round10_ops.py",
    ),
    (
        "drug_target_discovery_spark.queries.round10",
        "ivfpq_adc_recall",
        "independent numpy recompute (exact, sf0.001/0.01) + nprobe=all degeneracy pin (scan_frac == 1)",
        "tests/test_round10_ops.py",
    ),
    (
        "drug_target_discovery_spark.queries.round10",
        "hilbert_vs_zorder_skip_stats",
        "independent python recompute (exact, sf0.001/0.01) + exhaustive xy2d grid pin + aligned-split degeneracy cross-check",
        "tests/test_round10_ops.py",
    ),
    (
        "drug_target_discovery_spark.queries.round10",
        "temperature_mixture_sample",
        "prepared DuckDB oracle (exact, sf0.001/0.01) + apportionment-sums-to-T and upweighting fixtures + partitioning invariance",
        "tests/test_round10_ops.py",
    ),
    (
        "drug_target_discovery_spark.queries.round10",
        "split_conformal_price_intervals",
        "prepared DuckDB oracle (exact, sf0.001/0.01) + rank-formula and coverage-tracks-target pins",
        "tests/test_round10_ops.py",
    ),
    (
        "drug_target_discovery_spark.queries.round10",
        "cross_corpus_contamination",
        "prepared DuckDB oracle (exact, sf0.001/0.01) + known-span hand fixture + empty-benchmark edge",
        "tests/test_round10_ops.py",
    ),
    (
        "drug_target_discovery_spark.queries.round10",
        "embedding_mmd_drift",
        "independent numpy recompute (exact, sf0.001/0.01) + shifted-batch detection + partitioning invariance",
        "tests/test_round10_ops.py",
    ),
    (
        "drug_target_discovery_spark.queries.round10",
        "lsh_candidate_recall_audit",
        "prepared DuckDB oracle (exact, sf0.001/0.01) + S-curve column pin + recall-beats-curve pin",
        "tests/test_round10_ops.py",
    ),
    (
        "drug_target_discovery_spark.queries.round11",
        "training_epoch_manifest",
        "hybrid python-BPE + prepared DuckDB oracle (exact, sf0.001/0.01) + composition-invariant, seed-membership, scan-discipline, and hashlib-rank pins",
        "tests/test_round11_ops.py",
    ),
    (
        "drug_target_discovery_spark.queries.round11",
        "curated_epoch_manifest",
        "curation-oracle kept_ids + python-BPE + prepared DuckDB replay (exact, sf0.001/0.01) + no-leakage and mixture-reapportionment pins",
        "tests/test_round11_ops.py",
    ),
    (
        "drug_target_discovery_spark.queries.round11",
        "semantic_decontamination",
        "prepared DuckDB oracle (exact, sf0.001/0.01) + planted-paraphrase fixture + train/bench membership pins",
        "tests/test_round11_ops.py",
    ),
    (
        "drug_target_discovery_spark.queries.round11",
        "lsh_parameter_autotune",
        "prepared DuckDB oracle (exact, sf0.001/0.01) + choice-rule, b=1 monotonicity, committed-banding-dominates-curve, and t_star arithmetic pins",
        "tests/test_round11_ops.py",
    ),
    (
        "drug_target_discovery_spark.queries.round12",
        "bpe_top_merges_batched",
        "value-equal to sequential trainer + python oracle (k to 60; adversarial tie/overlap/collision fixtures + seeded fuzz)",
        "tests/test_round12_ops.py",
    ),
    (
        "drug_target_discovery_spark.queries.round12",
        "bpe_top_merges_local",
        "exact python recompute at k=200 (exhaustion-truncated) + ceiling-valve pin",
        "tests/test_round12_ops.py",
    ),
    (
        "drug_target_discovery_spark.queries.round12",
        "bpe_encode_stats_scaled",
        "value-equal to the fold-chain form (k=8/30) + python train+encode recompute past the 100-fold analyzer cap (k=300 fixture)",
        "tests/test_round12_ops.py",
    ),
    (
        "drug_target_discovery_spark.queries.round12",
        "url_canonical_dedup",
        "prepared DuckDB oracle (exact, sf0.001/0.01) + canonicalization case table pinned char-for-char in BOTH engines + argmax/fuse pins",
        "tests/test_round12_ops.py",
    ),
    (
        "drug_target_discovery_spark.queries.round12",
        "domain_quality_rollup",
        "prepared DuckDB oracle (exact, sf0.001/0.01) + integer strict-majority flag-rule edge pins",
        "tests/test_round12_ops.py",
    ),
    (
        "drug_target_discovery_spark.queries.round13",
        "incremental_url_dedup_by_domain",
        "prepared DuckDB oracle (exact, sf0.001/0.01) + count-partition property + hand-fixture status pins",
        "tests/test_round13_ops.py",
    ),
    (
        "drug_target_discovery_spark.queries.round13",
        "per_domain_downsample",
        "prepared DuckDB oracle (exact, sf0.001/0.01) + keep-rule properties (unflagged domains intact, rerun-determinism, permille 0/1000 edges)",
        "tests/test_round13_ops.py",
    ),
    (
        "drug_target_discovery_spark.queries.round13",
        "bpe_top_merges_capped",
        "exact python recompute over the deterministically-capped word table + equals-local-when-cap-covers pin + cap-tie-break pin; cap sensitivity measured (bpecap probe)",
        "tests/test_round13_ops.py",
    ),
    (
        "drug_target_discovery_spark.queries.round13",
        "pii_redaction_census",
        "prepared DuckDB oracle (exact, sf0.001/0.01, cross-dialect Java/RE2 regex pin) + hand-fixture char-mass + boundary-negative + coprime-moduli discrimination tests",
        "tests/test_round13_ops.py",
    ),
    (
        "drug_target_discovery_spark.queries.round13",
        "ccnet_perplexity_buckets",
        "prepared DuckDB oracle (exact, sf0.001/0.01) + tercile/orientation/cutoff-disjointness properties + whole-score-class tie fixture",
        "tests/test_round13_ops.py",
    ),
    (
        "drug_target_discovery_spark.queries.round13",
        "quality_gate_kappa",
        "prepared DuckDB oracle (exact, sf0.001/0.01) + Python formula-wiring recompute from integer cells + intersection-domain and NULL-kappa (pe=1) edge fixtures",
        "tests/test_round13_ops.py",
    ),
    (
        "drug_target_discovery_spark.streaming.scrub",
        "scrub_ingest_census",
        "batch-twin DuckDB oracle at the (window, source) grain (lane) + streaming/batch parity, append-mode watermark finalization, and map-stage redaction pins",
        "tests/test_streaming.py",
    ),
    (
        "drug_target_discovery_spark.streaming.crawl",
        "crawl_ingest_url_dedup",
        "batch-twin DuckDB oracle on the deterministic columns (lane) + streaming/batch parity + cross-micro-batch watermark-state dedup pins (representative doc is arrival-order by design)",
        "tests/test_streaming.py",
    ),
)


def first_sentence(doc: str) -> str:
    doc = " ".join((doc or "").split())
    for stop in (". ", ".\n"):
        i = doc.find(stop)
        if i > 0:
            return doc[: i + 1]
    return doc[:160] + ("…" if len(doc) > 160 else "")


def lane_rows() -> list[tuple[str, str, str, str, str]]:
    import importlib

    out = []
    for mod_path, fn_name, evidence, tests in TESTS_ONLY_LANE:
        mod = importlib.import_module(mod_path)
        fn = inspect.unwrap(getattr(mod, fn_name))
        src = os.path.relpath(inspect.getsourcefile(fn), os.path.dirname(OUT))
        line = inspect.getsourcelines(fn)[1]
        out.append(
            (fn_name, f"{src}:{line}", evidence, tests, first_sentence(fn.__doc__ or ""))
        )
    return out


def main() -> None:
    reg = all_queries()
    lane = lane_rows()
    overlap = {n for n, *_ in lane} & set(reg)
    assert not overlap, (
        f"lane operators are registered — remove from TESTS_ONLY_LANE: {overlap}"
    )
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
            "The complete user-facing surface of the engine: every "
            "REGISTERED query (driver-gated), then the TESTS-ONLY LANE "
            "(implemented + oracle-cross-checked in pytest, unregistered "
            "under the registry's 199-query capacity freeze — see the "
            "CAPACITY POLICY in queries/registry.py). Regenerate with "
            "`python tools/gen_operator_index.py`.\n\n"
            f"**{len(rows)} registered queries** — "
            f"{sum(1 for r in rows.values() if r[2].startswith('exact'))} with "
            "exact DuckDB value-hash oracles, the rest rows-only by design "
            "(fixture or library oracles in tests/) — plus "
            f"**{len(lane)} tests-only-lane operators** below.\n\n"
            "| Query | Where | Oracle | Tags | What it does |\n"
            "|---|---|---|---|---|\n"
        )
        for name in sorted(rows):
            src, line, oracle, tags, doc = rows[name]
            doc = doc.replace("|", "\\|")
            f.write(f"| `{name}` | `{src}:{line}` | {oracle} | {tags} | {doc} |\n")
        f.write(
            "\n## Tests-only lane (unregistered operators)\n\n"
            "Callable as library functions (not in `queries()`/"
            "`oracle_sql()`); their pytest evidence runs the same "
            "comparison the driver gate runs, at the same scale factor, "
            "and `python tools/lane_check.py [sf_dir]` reproduces the "
            "whole lane gate at any scale in one command. Registration "
            "is a decorator move governed by the registry's "
            "one-in-one-out rule.\n\n"
            "| Operator | Where | Oracle evidence | Tests | What it does |\n"
            "|---|---|---|---|---|\n"
        )
        for name, where, evidence, tests, doc in lane:
            doc = doc.replace("|", "\\|")
            f.write(
                f"| `{name}` | `{where}` | {evidence} | `{tests}` | {doc} |\n"
            )
        f.write("\n## By tag (registered)\n\n")
        for t in sorted(by_tag):
            names = ", ".join(f"`{n}`" for n in sorted(by_tag[t]))
            f.write(f"- **{t}** ({len(by_tag[t])}): {names}\n")
    print(f"wrote {OUT}: {len(rows)} queries + {len(lane)} lane operators")


if __name__ == "__main__":
    main()
