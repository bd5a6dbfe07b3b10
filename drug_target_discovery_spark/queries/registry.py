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
# rotation problem: order round 3's list as (1) queries never driver-checked
# in any round, (2) queries whose oracle or implementation changed this round,
# (3) the 37 queries last verified in round 1 (implementations unchanged, but
# stale evidence), then everything r2-green.
_PRIORITY: tuple[str, ...] = (
    # -- never driver-checked in any round
    "media_image_decode_dims",
    # -- new this round
    "media_audio_decode_stats",
    "embedding_quantize_int8",
    "normalized_dedup_groups",
    "embedding_covariance",
    "embedding_pca_variance_explained",
    "blocklist_redaction_stats",
    # -- oracle gained / implementation changed this round
    "differential_expression",
    "geo_pipeline_differential",
    "geo_pipeline_targets",
    "connected_components_near_dups",
    "benchmark_decontamination",
    "bh_fdr_scalable_adjust",
    "mllib_corr_matrix_top",
    "small_lot_revenue",
    # -- last verified in round 1 only (unchanged; re-verify before evidence
    #    goes stale two rounds deep)
    "corpus_mixture_rebalance",
    "corr_edges_top_parts",
    "customers_without_orders",
    "degree_centrality_corr_graph",
    "doc_chunk_packing",
    "doc_length_histogram",
    "event_interarrival_stats",
    "event_type_pivot",
    "events_in_purchase_hour",
    "exact_dedup_sha256",
    "hash_stratified_sample",
    "latest_event_per_user",
    "lsh_candidate_pairs",
    "media_feature_extraction",
    "media_frame_sample",
    "media_payload_digest",
    "media_resize_shapes",
    "minhash_signatures",
    "mllib_minhash_neardups",
    "near_dup_groups",
    "ngram_jaccard_near_dups",
    "order_priority_rollup",
    "part_type_classifier",
    "parts_shipped_to_top_nation",
    "per_source_doc_cap",
    "positional_zip_join",
    "price_percentiles_by_brand",
    "pricing_summary",
    "revenue_by_nation",
    "sliding_window_stats",
    "source_lang_entropy",
    "supplier_part_distincts",
    "top_orders_by_revenue",
    "tumbling_event_counts",
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
