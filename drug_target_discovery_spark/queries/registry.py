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
# dict in insertion order and (empirically, round 1) may not reach the tail
# — CORRECTNESS_r01 covered exactly the first 50 entries. Front-load the
# queries that most need a driver-verified row this round: (1) the 29 the
# round-1 gate never reached, (2) the 5 whose value-hash canonicalization
# was fixed, (3) queries whose oracle or implementation changed this round.
# Everything else (all green in r01) follows, slow rows-only pipelines last.
_PRIORITY: tuple[str, ...] = (
    # -- new this round: corpus-quality tier + decision-support extras
    "benchmark_decontamination",
    "repeated_ngram_fraction",
    "gopher_quality_flags",
    "winnowing_fingerprints",
    "promo_revenue_share",
    "small_lot_revenue",
    "large_quantity_orders",
    # -- never driver-checked in r01: setops / similarity / stats / text / windows
    "customer_cohort_set_ops",
    "part_name_analysis",
    "cosine_topk_bruteforce",
    "ann_ivf_bucketed_topk",
    "embedding_cosine_near_dups",
    "embedding_label_stats",
    "centroid_assignment",
    "median_quantity_by_part",
    "median_impute",
    "missing_census",
    "conditional_log2",
    "zscore_by_part",
    "robust_zscore_by_part",
    "welch_t_by_part",
    "bh_fdr_adjust",
    "na_threshold_filter",
    "top_variance_parts",
    "supplier_composite_score",
    "differential_expression",
    "token_count_stats",
    "text_quality_scores",
    "lang_id_stopwords",
    "rolling_hash_fingerprint",
    "tfidf_top_terms",
    "moving_avg_daily_revenue",
    "ntile_price_bands",
    "cube_order_stats",
    "grouping_sets_ship_stats",
    "approx_distinct_parts",
    # -- value-hash canonicalization fixed this round
    "curation_pipeline_summary",
    "simhash_fingerprints",
    "session_windows_gap",
    "json_props_extract",
    "media_metadata_stats",
    # -- implementation/oracle changed this round
    "session_windows_builtin",
    "sequence_packing",
    "eigenvector_centrality_corr_graph",
    "betweenness_centrality_corr_graph",
    "network_target_scores",
    "pagerank_corr_graph",
)


def all_queries() -> dict[str, Query]:
    """Import every query module (side-effect registration) and return all,
    ordered so the driver's gate reaches the highest-value queries first."""
    # Local import to avoid circulars; each module registers on import.
    from drug_target_discovery_spark.queries import (  # noqa: F401
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
