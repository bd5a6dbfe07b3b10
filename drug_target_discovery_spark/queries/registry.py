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
# rotation problem (VERDICT r3 #1). Round 4's 50: (1) never-checked queries
# new this round, (2) queries whose oracle/implementation changed this
# round, (3) queries whose latest green row is round 2 (the r3 gate's 50
# slots went to never-checked/changed/r1-stale entries). New and changed
# queries outrank unchanged stale ones — rewritten plans need current
# driver evidence more than unchanged ones need a refresh — so the
# unchanged-since-r2 remainder sits in _PRIORITY_REST (they keep their r2
# green rows and go first next round). _PRIORITY_GATE must hold exactly
# _GATE_WINDOW names; a unit test pins the length so the gate never
# silently drops the tail of group (3).
_GATE_WINDOW = 50

_PRIORITY_GATE: tuple[str, ...] = (
    # -- new this round (never-checked queries outrank everything)
    "leakage_safe_splits",        # group-aware train/val/test holdout
    "split_contamination_audit",  # near-dup pairs straddling splits
    "duplicate_span_detection",   # position-aware substring dedup (Lee et al.)
    "semantic_dedup_prune",       # SemDeDup cluster-then-prune
    "bloom_filter_dedup_probe",   # bounded-size distributed Bloom filter
    "heavy_hitter_tokens",        # two-pass exact Misra-Gries
    "unigram_logprob_quality",    # CCNet-shape unigram LM scorer
    "dedup_against_reference",    # incremental batch-vs-corpus dedup
    "view_purchase_attribution",  # stream-capable time-interval join
    "approx_quantile_sketch_bounded",  # GK sketch with rank-error oracle
    "bm25_keyword_search",        # lexical retrieval scorer
    "scd2_user_value_history",    # CDC validity intervals
    "fuzzy_part_name_matches",    # blocked entity resolution
    "conversion_funnel",          # ordered 3-stage funnel
    "lineitem_measures_unpivot",  # native unpivot/melt
    "weighted_systematic_sample", # integer-exact weighted sampling
    "clustering_coefficient_corr_graph",  # triangles via ordered 2-join
    "data_quality_checks",        # constraint-validation suite
    "mann_whitney_u_by_part",     # rank-sum test, tie-corrected
    "spearman_edges_top_parts",   # rank-correlation graph edges
    "part_pair_affinity",         # market-basket support/confidence/lift
    "quantile_normalize_by_supplier",  # binned QN, microarray staple
    "media_video_decode_stats",   # real Y4M video codec
    # -- implementation or oracle changed this round
    "bh_fdr_scalable_adjust",     # single-sort desc-window rewrite
    "embedding_covariance",       # BLAS-tile mapInPandas rewrite
    "robust_zscore_by_part",      # stacked-window-medians rewrite
    "price_percentiles_by_brand", # array-probability percentile rewrite
    "media_feature_extraction",   # real payloads + value_sum oracle
    "media_resize_shapes",        # real resample + checksum oracle
    "media_frame_sample",         # real frame decode + checksum oracle
    "approx_distinct_parts",      # gained bounded-error oracle (also r2-stale)
    "welch_t_by_part",            # NULL-aware oracle denominator (also r2-stale)
    "connected_components_near_dups",  # nodes=None gate now edge-bounded
    "embedding_pca_variance_explained",  # empty/low-dim guards
    "normalized_dedup_groups",    # digest now NULL-safe (shared norm_sha_col)
    # -- last verified in round 2 (unchanged; refresh before two rounds deep)
    "asof_view_before_purchase",
    "betweenness_centrality_corr_graph",
    "bh_fdr_adjust",
    "centroid_assignment",
    "cosine_topk_bruteforce",
    "curation_pipeline_summary",
    "customer_cohort_set_ops",
    "eigenvector_centrality_corr_graph",
    "embedding_cosine_near_dups",
    "gopher_quality_flags",
    "json_props_extract",
    "median_impute",
    "median_quantity_by_part",
    "moving_avg_daily_revenue",
    "network_target_scores",
)

# Slots 51+: unchanged-since-r2 trivia demoted for this round's new and
# rewritten queries (they keep their r2 green rows; first next round).
_PRIORITY_REST: tuple[str, ...] = (
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
        events,
        graphq,
        graphx,
        mllibq,
        multimodal,
        percentiles,
        pipelineq,
        quality,
        relational,
        setops,
        similarity,
        stats,
        text,
        tpchx,
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
