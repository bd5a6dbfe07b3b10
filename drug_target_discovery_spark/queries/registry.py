"""Driver-facing query registry.

Every operator from SURVEY.md §2 lands here as a named ``Query``:
a PySpark implementation ``fn(spark, sf_dir) -> DataFrame`` plus (when
SQL-expressible) the equivalent ANSI SQL DuckDB runs as the correctness
oracle. The driver hash-matches the two at sf=0.01, sorting columns by name —
so every computed column is aliased identically on both sides, and floating
aggregates are rounded identically on both sides to absorb summation-order
differences between engines.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None = None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: add a query to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "", tags=tags)
        return fn

    return deco


# Driver-visit priority. The driver's correctness gate walks the queries()
# dict in insertion order and stops at 50 entries per round, so coverage is a
# rotation problem (VERDICT r3 #1). Round 5's 50: (1) the 26-query backlog
# whose latest green row is round 2 (VERDICT r4 #1 — the oldest evidence in
# the repo, promised first this round), (2) queries new or changed this
# round (never-checked or rewritten plans need current evidence), (3)
# round-3-stale refreshes filling the remaining slots. The r3 remainder
# sits first in _PRIORITY_REST (they keep their r3 green rows; first next
# round). _PRIORITY_GATE must hold exactly _GATE_WINDOW names; a unit test
# pins the length so the gate never silently drops the tail of group (3).
_GATE_WINDOW = 50

_PRIORITY_GATE: tuple[str, ...] = (
    # -- (1) the r2-evidence backlog: every green row here is 3 rounds old
    "embedding_label_stats",
    "lang_id_stopwords",
    "media_metadata_stats",
    "cube_order_stats",
    "grouping_sets_ship_stats",
    "large_quantity_orders",
    "conditional_log2",
    "missing_census",
    "ntile_price_bands",
    "pagerank_corr_graph",
    "part_name_analysis",
    "promo_revenue_share",
    "repeated_ngram_fraction",
    "rolling_hash_fingerprint",
    "sequence_packing",
    "session_windows_builtin",
    "session_windows_gap",
    "simhash_fingerprints",
    "supplier_composite_score",
    "text_quality_scores",
    "tfidf_top_terms",
    "token_count_stats",
    "top_variance_parts",
    "winnowing_fingerprints",
    "zscore_by_part",
    "na_threshold_filter",
    # -- (2) new or changed this round
    "quantile_normalize_exact",   # NEW: exact per-rank QN (limma twin)
    "curation_end_to_end",        # NEW: composed dedup->prune->quality->split
    "boilerplate_ngram_stats",    # NEW: cross-doc template fragments
    "training_shard_assignment",  # NEW: budgeted bin packing, global ids
    "hybrid_retrieval_rerank",    # NEW: BM25 -> cosine rerank composition
    "ks_test_price_drift",        # NEW: two-sample KS drift detector
    "psi_price_stability",        # NEW: PSI drift score
    "chi2_status_priority",       # NEW: chi-squared independence
    "core_numbers_corr_graph",    # NEW: k-core decomposition
    "count_min_frequency_probe",  # NEW: CMS sketch with exact-replica oracle
    "simhash_near_dups",          # NEW: block-banded Hamming join
    "auc_by_cohort",              # NEW: tie-corrected rank AUC
    "pr_curve_sampled",           # NEW: threshold-sweep PR points
    "part_pair_affinity",         # forced item-count broadcasts removed
    "split_contamination_audit",  # shingle width now explicit (n=_N)
    "semantic_dedup_prune",       # oracle gained zero-norm convention guard
    # -- (3) changed this round, late: the LSH verification memo rewrite
    "near_dup_groups",
    # -- (4) new in the second half of the round (never-checked > stale)
    "zorder_file_layout",         # NEW: Morton-curve clustering assignment
    "bigram_pmi_collocations",    # NEW: BPE-merge/collocation statistic
    "winsorized_price_stats",     # NEW: p05/p95 outlier clipping
    "event_transition_matrix",    # NEW: Markov lead-window sequence stats
    # -- (5) new in the final third of the round. The decorrelation /
    #    retention / eval / skew additions outnumber the remaining slots;
    #    these three carry the most novel plan contracts (exact iterative
    #    k-means, global-rank-without-global-sort, double EXISTS
    #    decorrelation) — the rest head _PRIORITY_REST with full local
    #    oracle-gate + independent-recompute evidence until round 6.
    "kmeans_lloyd_clusters",      # NEW: exact distributed Lloyd iterations
    "revenue_pareto_deciles",     # NEW: bucket+offset global ranks
    "late_sole_supplier_orders",  # NEW: Q21 one-aggregate decorrelation
)

# Slots 51+: first the round-5 additions/changes that did not fit the
# 50-slot window (never-checked or changed-plan — all green in the local
# oracle gate this round, queued for driver evidence in round 6), then the
# unchanged-since-r3 remainder, ahead of the r4-fresh majority.
_PRIORITY_REST: tuple[str, ...] = (
    # round-5 new, local-gate green, driver evidence pending
    "min_cost_part_supplier",
    "customer_order_distribution",
    "wealthy_inactive_customers",
    "ann_recall_eval",
    "degree_assortativity_corr_graph",
    "cohort_retention_matrix",
    "salted_returnflag_stats",
    "cdc_merge_apply",
    "important_part_value_share",
    "returnflag_priority_mix",
    "top_revenue_suppliers",
    "disjunctive_branch_revenue",
    "dsir_importance_selection",
    "adamic_adar_link_prediction",
    "calibration_curve_bins",
    "hard_negative_mining",
    "reciprocal_rank_fusion",
    "benford_first_digit_check",
    "cuped_experiment_readout",
    "late_order_priority_counts",
    "discount_band_revenue",
    "volume_shipping_pair",
    "market_share_by_year",
    "product_profit_by_nation_year",
    "returned_item_report",
    "near_dup_best_representative",
    "referential_integrity_audit",
    "closeness_centrality_corr_graph",
    "temporal_embargo_split",
    "order_lineitem_reconciliation",
    "jackknife_ratio_readout",
    "snapshot_diff_changeset",
    "srm_guardrail",
    "join_key_skew_profile",
    "harmonic_centrality_corr_graph",
    "kmeans_silhouette_by_cluster",
    # round-5 plan changes (forced-broadcast removal — values re-proven
    # locally; AQE picks the same physical join at gate scale;
    # large_quantity_orders also changed but already sits in the gate's
    # backlog group)
    "revenue_by_nation",
    "parts_shipped_to_top_nation",
    # r3-green refreshes displaced from the round-5 gate (stale < new)
    "geo_pipeline_differential",
    "geo_pipeline_targets",
    "differential_expression",
    "ngram_jaccard_near_dups",
    "pricing_summary",
    "lsh_candidate_pairs",
    "benchmark_decontamination",
    "corr_edges_top_parts",
    "ann_ivf_bucketed_topk",
    "degree_centrality_corr_graph",
    "minhash_signatures",
    "exact_dedup_sha256",
    "top_orders_by_revenue",
    "order_priority_rollup",
    "supplier_part_distincts",
    "sliding_window_stats",
    "tumbling_event_counts",
    "blocklist_redaction_stats",
    "corpus_mixture_rebalance",
    "customers_without_orders",
    "doc_chunk_packing",
    "doc_length_histogram",
    "embedding_quantize_int8",
    "event_interarrival_stats",
    "event_type_pivot",
    "events_in_purchase_hour",
    "hash_stratified_sample",
    "latest_event_per_user",
    "media_audio_decode_stats",
    "media_image_decode_dims",
    "media_payload_digest",
    "part_type_classifier",
    "per_source_doc_cap",
    "positional_zip_join",
    "small_lot_revenue",
    "source_lang_entropy",
)

_PRIORITY: tuple[str, ...] = _PRIORITY_GATE + _PRIORITY_REST


def all_queries() -> dict[str, Query]:
    """Import every query module (side-effect registration) and return all,
    ordered so the driver's gate reaches the highest-value queries first."""
    # Local import to avoid circulars; each module registers on import.
    from drug_target_discovery_spark.queries import (  # noqa: F401
        corpusstats,
        curation,
        dedup,
        drift,
        evalmetrics,
        events,
        experiments,
        graphq,
        graphx,
        layout,
        mllibq,
        multimodal,
        percentiles,
        pipelineq,
        quality,
        relational,
        selection,
        setops,
        similarity,
        stats,
        text,
        tpchx,
        tpchx2,
        tpchx3,
        windows,
    )

    ordered: dict[str, Query] = {}
    for name in _PRIORITY:
        if name in REGISTRY:
            ordered[name] = REGISTRY[name]
    rest = [n for n in REGISTRY if n not in ordered]
    # oracled queries (stronger evidence, usually cheaper) before rows-only
    for name in sorted(rest, key=lambda n: (REGISTRY[n].oracle is None, n)):
        ordered[name] = REGISTRY[name]
    return ordered
