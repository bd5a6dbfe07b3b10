"""Scale-up probe: synthesize a ~10x (sf~1) dataset from sf0.1 by key-shifted
replication, run headline operators at both scales, and report the wall-time
scaling factor. Linear-ish scaling (factor ~= data factor, not factor^2) is
the evidence that the partition/shuffle strategy survives growth.

Writes /tmp/sfprobe/{lineitem,orders,customer,part,supplier,documents,
embeddings}.parquet (key-shifted copies so join relationships and group
cardinalities scale together — facts AND the dimensions they reference, so
fact-to-dim join probes keep referential integrity at every factor), then
times each probe query cold at sf0.1 and sf~1.

Usage: python tools/scale_probe.py [replication_factor] [query ...]
(default factor 10, all PROBES; name queries to probe a subset)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from drug_target_discovery_spark.caching import release_caches
from drug_target_discovery_spark.queries.registry import all_queries
from drug_target_discovery_spark.session import get_spark
from drug_target_discovery_spark.sources.tables import load_table

BASE = "/root/testdata/sf0.1"
OUT = "/tmp/sfprobe"

# key columns to shift per table so replicas keep referential integrity
# and GROUP CARDINALITY grows with the data (same keys would instead grow
# group SIZE only — a different, easier scaling mode than production growth)
SHIFTS = {
    "lineitem": {"l_orderkey": 1_000_000, "l_partkey": 1_000_000, "l_suppkey": 1_000_000},
    "orders": {"o_orderkey": 1_000_000, "o_custkey": 1_000_000},
    "customer": {"c_custkey": 1_000_000},
    # part/supplier replicate IN LOCKSTEP with lineitem's l_partkey /
    # l_suppkey shifts — otherwise replica fact rows would reference
    # nonexistent dimension keys and any fact-to-dim join probe would
    # silently drop ~(1-1/factor) of rows and report a flat scale factor.
    # (s_nationkey / p_* attributes stay valid unshifted.)
    "part": {"p_partkey": 1_000_000},
    "supplier": {"s_suppkey": 1_000_000},
    "documents": {"doc_id": 1_000_000},
    "embeddings": {"vec_id": 1_000_000},
    # more users over the same time range (production growth mode for the
    # event tier: per-user sequence lengths stay fixed, user cardinality
    # scales) — without this, event-tier probes ran on UNSCALED data and
    # reported misleadingly flat factors (the ADVICE-r4 dim-join class).
    "events": {"user_id": 1_000_000, "event_id": 100_000_000},
}

PROBES = [
    "robust_zscore_by_part",
    "bh_fdr_scalable_adjust",
    "heavy_hitter_tokens",
    "unigram_logprob_quality",
    "exact_dedup_sha256",
    "revenue_by_nation",
    "mann_whitney_u_by_part",
    "bm25_keyword_search",
    # round-4 additions. Caveat: replicas repeat the TEXT verbatim (only
    # keys shift), so span detection sees a 100%-duplicated corpus (every
    # gram in >= factor docs) and the Bloom filter saturates — worst-case
    # load shapes; what the probe checks is that wall time stays LINEAR.
    "duplicate_span_detection",
    "bloom_filter_dedup_probe",
    "semantic_dedup_prune",
    # holdout-hygiene tier. Same verbatim-clone caveat, and for the audit
    # it is the LSH worst case: every replica family is a clique of exact
    # dups, so the verified-pair set grows ~factor^2 per original doc —
    # the probe checks the pair joins stay bucket-local (wall closer to
    # the pair count than to any corpus-wide product).
    "leakage_safe_splits",
    "split_contamination_audit",
    # round-5 additions. curation_end_to_end composes the dedup/quality/
    # split tiers (same verbatim-clone worst case as the audit);
    # boilerplate sees a 100%-templated corpus under replication (every
    # 6-gram shared across replicas) — worst-case shared-gram join load.
    "curation_end_to_end",
    "boilerplate_ngram_stats",
    "training_shard_assignment",
    "hybrid_retrieval_rerank",
    "ks_test_price_drift",
    "quantile_normalize_exact",
    # round-5 second/third batches + event tier (events now replicate).
    # simhash_near_dups doubles as the regression guard for the 60-bit
    # fingerprint width (the 32-bit/8-bit-block first cut measured 6.97x).
    "auc_by_cohort",
    "pr_curve_sampled",
    "count_min_frequency_probe",
    "psi_price_stability",
    "simhash_near_dups",
    "zorder_file_layout",
    "bigram_pmi_collocations",
    "winsorized_price_stats",
    "event_transition_matrix",
    "view_purchase_attribution",
    # round-5 final-third batch: decorrelation tier (replicated dims keep
    # referential integrity, so the Q2/Q13/Q21/Q22 joins scale honestly),
    # global-rank Pareto (bucket count is price-range-bound, so only rows
    # per bucket grow), retention (user cardinality scales, ages fixed),
    # salted two-phase agg (output stays 3 keys while input grows), and
    # Lloyd k-means (clone replicas densify clusters; per-iteration work
    # is map-side, the collected table stays KxD at every factor).
    "customer_order_distribution",
    "min_cost_part_supplier",
    "late_sole_supplier_orders",
    "wealthy_inactive_customers",
    "revenue_pareto_deciles",
    "cohort_retention_matrix",
    "salted_returnflag_stats",
    "kmeans_lloyd_clusters",
    "cdc_merge_apply",
    # round-5 closing batch: chronological holdout, header-vs-detail
    # reconciliation, hash-bucket jackknife, snapshot data-diff — all
    # bounded-output plans whose only wide exchange is keyed on the fact
    "temporal_embargo_split",
    "order_lineitem_reconciliation",
    "jackknife_ratio_readout",
    "snapshot_diff_changeset",
    "srm_guardrail",
    "join_key_skew_profile",
    # round-6 batch: grouped OLS / Zipf OLS (sufficient-statistic shuffles
    # to a constant grain), count-table information metrics, A-ES weighted
    # reservoir (TakeOrdered, no fact shuffle), RFM map-only scoring,
    # skyline over a bounded aggregate, date-spine gap fill, rolling
    # control chart (calendar-bounded series), k-fold balance audit,
    # zone-map stats (both layouts, one scan), OOV coverage (vocab
    # broadcast over the token stream), containment pairs (stop-shingle-
    # capped bucketed join riding the exact-pairs memo; verbatim-clone
    # replicas are its worst case like the Jaccard family), NDCG@10.
    "ols_trend_by_brand",
    "zipf_slope_tokens",
    "mutual_information_flags",
    "gini_segment_mix",
    "weighted_reservoir_sample",
    "rfm_customer_segments",
    "pareto_frontier_parts",
    "calendar_gap_fill_revenue",
    "rolling_revenue_anomaly",
    "stratified_kfold_assignment",
    "zone_map_stats",
    "vocab_oov_coverage",
    "shingle_containment_pairs",
    "ndcg_retrieval_eval",
    # round-7 batch: KM gaps (keyed lag then day-grain collapse; the
    # cumulative windows run over the fixed calendar), CUSUM (same daily
    # boundedness), basket lift (self-join on the deduplicated basket
    # grain, output bounded by the 25-brand domain), MinHash error audit
    # (rides the LSH candidate memo; clone replicas inflate candidates
    # like the LSH family), novelty (two keyed shuffles over the shingle
    # memo), weekday profile (7-row grain), adaptive salted agg (profile
    # + two-phase, output stays 3 keys).
    "kaplan_meier_customer_gaps",
    "cusum_changepoint_daily_revenue",
    "basket_brand_lift",
    "minhash_jaccard_estimate_error",
    "shingle_novelty_ratio",
    "weekday_seasonality_revenue",
    "skew_adaptive_agg_stats",
    # round-8 batch: price-band lookup (keyless binned range join — fact
    # maps to one bin, bands explode to ~60 broadcast-sized rows, output
    # bounded by the 5-band domain), Gini by nation (one fact shuffle to
    # the tie-collapsed (nation, cents) grain; the ranking window runs on
    # that value-domain-bounded grain), hapax/TTR (one keyed shuffle to
    # the (source, token) vocabulary grain with map-side partials;
    # verbatim-clone replicas multiply token COUNTS but the vocabulary
    # only grows with the source domain — the shuffle is the vocab).
    "price_band_lookup_binned",
    "order_value_gini_by_nation",
    "hapax_ttr_by_source",
]


def build(spark, factor: int, perturb_docs: bool = False) -> None:
    """perturb_docs=True switches the documents table from verbatim-clone
    replication (every replica family an exact-dup clique — the WORST CASE
    for pairwise dedup ops, where true pair output grows ~factor^2) to the
    PRODUCTION growth mode: each replica's tokens carry a replica suffix,
    so replica corpora are content-disjoint, near-dup density per original
    corpus is preserved, and true pair output grows linearly (factor x).
    Both modes matter: clone mode checks the join stays output-bound under
    adversarial duplication; perturb mode checks the normal-growth wall."""
    os.makedirs(OUT, exist_ok=True)
    for table, shifts in SHIFTS.items():
        src = load_table(spark, BASE, table)
        parts = []
        for i in range(factor):
            df = src
            for col, step in shifts.items():
                df = df.withColumn(col, F.col(col) + F.lit(i * step))
            if perturb_docs and table == "documents" and i > 0:
                df = df.withColumn(
                    "text",
                    F.array_join(
                        F.transform(
                            F.split(F.col("text"), " "),
                            lambda x: F.concat(x, F.lit(f"_r{i}")),
                        ),
                        " ",
                    ),
                )
            parts.append(df)
        out = parts[0]
        for df in parts[1:]:
            out = out.unionByName(df)
        out.write.mode("overwrite").parquet(f"{OUT}/{table}.parquet")
    # small dims unchanged: copy so load_table finds them (nation/region are
    # fixed 25/5-row TPC-H tables)
    for small in ("nation", "region"):
        src_path = f"{BASE}/{small}.parquet"
        dst = f"{OUT}/{small}.parquet"
        if os.path.isfile(src_path):
            shutil.copy(src_path, dst)
        elif os.path.isdir(src_path):  # pragma: no cover
            shutil.copytree(src_path, dst, dirs_exist_ok=True)


def time_probe(spark, name, sf_dir) -> float:
    q = all_queries()[name]
    t0 = time.perf_counter()
    q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    release_caches(fixtures=True)
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:
        pass
    return dt


def main() -> None:
    argv = [a for a in sys.argv[1:] if a != "--perturb-docs"]
    perturb = "--perturb-docs" in sys.argv[1:]
    factor = int(argv[0]) if argv else 10
    probes = argv[1:] or PROBES
    unknown = [n for n in probes if n not in all_queries()]
    if unknown:
        raise SystemExit(f"unknown probe queries: {unknown}")
    spark = get_spark("scale_probe")
    build(spark, factor, perturb_docs=perturb)
    load_table(spark, BASE, "lineitem").count()  # warm session
    report = {}
    for name in probes:
        t_small = time_probe(spark, name, BASE)
        t_big = time_probe(spark, name, OUT)
        report[name] = {
            "sf0.1_s": round(t_small, 2),
            f"x{factor}_s": round(t_big, 2),
            "scale_factor": round(t_big / t_small, 2) if t_small > 0 else None,
        }
        print(name, report[name], flush=True)
    print(json.dumps({"data_factor": factor, "perturb_docs": perturb, "probes": report}))
    spark.stop()


if __name__ == "__main__":
    main()
