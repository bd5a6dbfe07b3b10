"""Round-9 scale probes (VERDICT r8 #6/#7):

1. event_burstiness_fano at x10/x30 production growth (more users over
   the same time span — the events SHIFTS mode of scale_probe.py) — the
   one r8 operator without its own SCALING.md row.
2. The Gini escape hatch at the DEFEATED-TIE-GRAIN worst case: x30
   orders with per-replica cent jitter (re-creating the r8 probe where
   distinct cents grew 28.7x), window form vs range-partitioned
   prefix-sum twin on the SAME data — the probe row the twin's
   SCALING.md entry cites.

Usage: python tools/round9_probe.py [fano|gini ...]   (default: both)
Writes /tmp/r9probe/*; prints one JSON line per probe.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from drug_target_discovery_spark.caching import release_caches
from drug_target_discovery_spark.session import get_spark
from drug_target_discovery_spark.sources.tables import load_table

BASE = "/root/testdata/sf0.1"
OUT = "/tmp/r9probe"


def _noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    release_caches(fixtures=True)
    return round(dt, 2)


def _timed(fn) -> float:
    """Full-call wall: construction + final write. Required for any
    operator that does EAGER work at call time (the prefix-sum's
    quantile/guard actions, the BPE merge loop, Lloyd iterations) —
    timing only the returned plan's write under-reports those."""
    t0 = time.perf_counter()
    df = fn()
    df.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    release_caches(fixtures=True)
    return round(dt, 2)


def _load1() -> float:
    try:
        with open("/proc/loadavg") as f:
            return float(f.read().split()[0])
    except Exception:
        return -1.0


def build_events(spark, factor: int) -> str:
    """Key-shifted events clones: user cardinality scales, per-user
    sequence lengths stay fixed (scale_probe.py's production growth)."""
    dst = f"{OUT}/x{factor}"
    os.makedirs(dst, exist_ok=True)
    src = load_table(spark, BASE, "events")
    parts = [
        src.withColumn("user_id", F.col("user_id") + F.lit(i * 1_000_000))
        .withColumn("event_id", F.col("event_id") + F.lit(i * 100_000_000))
        for i in range(factor)
    ]
    out = parts[0]
    for df in parts[1:]:
        out = out.unionByName(df)
    out.write.mode("overwrite").parquet(f"{dst}/events.parquet")
    return dst


def probe_fano(spark) -> None:
    from drug_target_discovery_spark.queries.round8 import event_burstiness_fano

    report = {"probe": "event_burstiness_fano", "loadavg1_start": _load1()}
    report["sf0.1_s"] = _noop(event_burstiness_fano(spark, BASE))
    for factor in (10, 30):
        d = build_events(spark, factor)
        t = _noop(event_burstiness_fano(spark, d))
        report[f"x{factor}_s"] = t
        report[f"x{factor}_factor"] = round(t / report["sf0.1_s"], 2)
    report["loadavg1_end"] = _load1()
    print(json.dumps(report), flush=True)


def build_jittered_orders(spark, factor: int) -> str:
    """x-factor orders + customer with per-replica CENT JITTER on
    o_totalprice, deliberately defeating the (nation, cents) tie
    collapse: replica i shifts prices by i cents, so distinct cents
    grows ~factor x (the r8 probe measured 28.7x at factor 30)."""
    dst = f"{OUT}/gini_x{factor}"
    os.makedirs(dst, exist_ok=True)
    orders = load_table(spark, BASE, "orders")
    customer = load_table(spark, BASE, "customer")
    o_parts = [
        orders.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(i * 10_000_000))
        .withColumn("o_custkey", F.col("o_custkey") + F.lit(i * 1_000_000))
        .withColumn("o_totalprice", F.col("o_totalprice") + F.lit(i * 0.01))
        for i in range(factor)
    ]
    c_parts = [
        customer.withColumn("c_custkey", F.col("c_custkey") + F.lit(i * 1_000_000))
        for i in range(factor)
    ]
    o = o_parts[0]
    for df in o_parts[1:]:
        o = o.unionByName(df)
    c = c_parts[0]
    for df in c_parts[1:]:
        c = c.unionByName(df)
    o.write.mode("overwrite").parquet(f"{dst}/orders.parquet")
    c.write.mode("overwrite").parquet(f"{dst}/customer.parquet")
    import shutil

    for small in ("nation", "region"):
        src_path = f"{BASE}/{small}.parquet"
        if os.path.isfile(src_path):
            shutil.copy(src_path, f"{dst}/{small}.parquet")
    return dst


def probe_gini_twin(spark, reps: int = 3) -> None:
    """Min-of-reps per leg (the canary estimator — single cold runs on
    this host swing >2x with co-tenant load; the 16:43 first attempt
    read window_x30 at 110s under a loadavg-22 burst vs 4.4s an hour
    earlier)."""
    from drug_target_discovery_spark.queries.round8 import (
        _gini_grain,
        order_value_gini_by_nation,
        order_value_gini_by_nation_scalable,
    )

    report = {"probe": "gini_window_vs_prefix_sum", "loadavg1_start": _load1()}
    d = f"{OUT}/gini_x30"
    if not os.path.exists(f"{d}/orders.parquet"):
        d = build_jittered_orders(spark, 30)
    base_grain = _gini_grain(spark, BASE).count()
    big_grain = _gini_grain(spark, d).count()
    release_caches(fixtures=True)
    report["distinct_grain_sf0.1"] = base_grain
    report["distinct_grain_x30"] = big_grain
    report["grain_factor"] = round(big_grain / base_grain, 1)
    legs = {
        "window_sf0.1_s": lambda: order_value_gini_by_nation(spark, BASE),
        "window_x30_s": lambda: order_value_gini_by_nation(spark, d),
        "prefix_sf0.1_s": lambda: order_value_gini_by_nation_scalable(
            spark, BASE, buckets=200
        ),
        "prefix_x30_s": lambda: order_value_gini_by_nation_scalable(
            spark, d, buckets=200
        ),
    }
    for name, leg in legs.items():
        # _timed, not _noop(leg()): the twin runs approxQuantile + the
        # null guard EAGERLY at call time — r10 fix; the r9 numbers
        # under-timed the twin (conservative toward the committed
        # window-stays-default conclusion, but still mis-measured)
        runs = [_timed(leg) for _ in range(reps)]
        stem = name.rsplit("_s", 1)[0]
        report[name] = min(runs)
        report[f"{stem}_runs"] = runs
        report[f"{stem}_load1"] = _load1()
    # value equality on the defeated grain, not just speed
    a = [tuple(r) for r in order_value_gini_by_nation(spark, d).collect()]
    b = [
        tuple(r)
        for r in order_value_gini_by_nation_scalable(spark, d, buckets=200).collect()
    ]
    report["x30_values_equal"] = a == b
    report["loadavg1_end"] = _load1()
    print(json.dumps(report), flush=True)


def build_documents(spark, factor: int, perturb: bool) -> str:
    """Documents clones: verbatim (every replica family an exact-dup
    clique — the substring operator's worst case, 100% of positions
    survive the hash prepass) or perturbed (replica tokens suffixed —
    content-disjoint replicas, the production growth mode)."""
    mode = "perturb" if perturb else "clone"
    dst = f"{OUT}/docs_{mode}_x{factor}"
    os.makedirs(dst, exist_ok=True)
    src = load_table(spark, BASE, "documents")
    parts = []
    for i in range(factor):
        df = src.withColumn("doc_id", F.col("doc_id") + F.lit(i * 1_000_000))
        if perturb and i > 0:
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
    out.write.mode("overwrite").parquet(f"{dst}/documents.parquet")
    return dst


def probe_substr(spark, reps: int = 3) -> None:
    from drug_target_discovery_spark.queries.round9 import (
        exact_substring_dup_stats,
    )

    report = {"probe": "exact_substring_dup_stats", "loadavg1_start": _load1()}
    legs = {"sf0.1": BASE}
    for perturb in (False, True):
        legs[("perturb" if perturb else "clone") + "_x10"] = build_documents(
            spark, 10, perturb
        )
    for name, d in legs.items():
        runs = [_noop(exact_substring_dup_stats(spark, d)) for _ in range(reps)]
        report[f"{name}_s"] = min(runs)
        report[f"{name}_runs"] = runs
        report[f"{name}_load1"] = _load1()
    base = report["sf0.1_s"]
    report["clone_x10_factor"] = round(report["clone_x10_s"] / base, 2)
    report["perturb_x10_factor"] = round(report["perturb_x10_s"] / base, 2)
    report["loadavg1_end"] = _load1()
    print(json.dumps(report), flush=True)


def probe_substr_x30_valve(spark, reps: int = 2) -> None:
    """VERDICT r9 #7: the valve-on number at the x30 verbatim-clone
    worst case, as a committed reproducible probe (the r9 measurement
    was ad-hoc and did not record the df-cap). Legs: exact (no valve)
    and valved with trivial_dup_df=30 — on a x30 clone corpus every
    position's gram df is >= 30, so the cap flags exactly the
    clone-degenerate hash groups while natural low-df dups still take
    the exact verify path."""
    from drug_target_discovery_spark.queries.round9 import (
        exact_substring_dup_stats,
    )

    report = {
        "probe": "exact_substring_dup_stats_x30_valve",
        "trivial_dup_df": 30,
        "loadavg1_start": _load1(),
    }
    d = build_documents(spark, 30, perturb=False)
    for name, kw in (("exact", {}), ("valved", {"trivial_dup_df": 30})):
        runs = [
            _noop(exact_substring_dup_stats(spark, d, **kw))
            for _ in range(reps)
        ]
        report[f"{name}_s"] = min(runs)
        report[f"{name}_runs"] = runs
        report[f"{name}_load1"] = _load1()
    report["valve_speedup"] = round(report["exact_s"] / report["valved_s"], 2)
    report["loadavg1_end"] = _load1()
    print(json.dumps(report), flush=True)


def probe_ivf(spark, reps: int = 3) -> None:
    """IVF refresh audit at x10 embeddings (vec_id-shifted clones keep
    the %10 batch stripe and the cell layout — the audit's input grows,
    its 8-cell aggregate domain doesn't)."""
    from drug_target_discovery_spark.queries.round9 import (
        ivf_index_refresh_audit,
    )

    report = {"probe": "ivf_index_refresh_audit", "loadavg1_start": _load1()}
    dst = f"{OUT}/emb_x10"
    os.makedirs(dst, exist_ok=True)
    src = load_table(spark, BASE, "embeddings")
    parts = [
        src.withColumn("vec_id", F.col("vec_id") + F.lit(i * 10_000_000))
        for i in range(10)
    ]
    out = parts[0]
    for df in parts[1:]:
        out = out.unionByName(df)
    out.write.mode("overwrite").parquet(f"{dst}/embeddings.parquet")
    for name, d in (("sf0.1", BASE), ("x10", dst)):
        runs = [_noop(ivf_index_refresh_audit(spark, d)) for _ in range(reps)]
        report[f"{name}_s"] = min(runs)
        report[f"{name}_runs"] = runs
        report[f"{name}_load1"] = _load1()
    report["x10_factor"] = round(report["x10_s"] / report["sf0.1_s"], 2)
    report["loadavg1_end"] = _load1()
    print(json.dumps(report), flush=True)


def probe_round10(spark, reps: int = 2) -> None:
    """Round-10 lane operators at scale (probe-before-claiming):

    - deterministic_epoch_shuffle at x10/x30 doc clones (doc_id-shifted;
      content irrelevant — the shuffle keys on ids only). Expected
      ~linear: one scan, value-range bucketing, bounded offsets window.
    - bpe_encode_stats at x10 PERTURBED docs (vocabulary AND token
      stream x10). Expected ~flat-to-linear: training is the measured
      bpe_top_merges loop; application adds one (source, word)-grain
      scan + vocab-sized folds.
    - ivf_drift_retrain RETRAIN branch at x1/x10 skewed embeddings
      (batch rammed into cell 7 so retrain_needed flips). Expected
      ~linear: Lloyd's per-iteration work is map-side; only K x (D+1)
      partials shuffle."""
    import json as _json

    from drug_target_discovery_spark.queries.round9 import (
        bpe_encode_stats,
        deterministic_epoch_shuffle,
        ivf_drift_retrain,
    )

    report = {"probe": "round10_ops", "loadavg1_start": _load1()}

    legs = {"shuffle_sf0.1": lambda: deterministic_epoch_shuffle(spark, BASE)}
    for factor in (10, 30):
        d = build_documents(spark, factor, perturb=False)
        legs[f"shuffle_clone_x{factor}"] = (
            lambda d=d: deterministic_epoch_shuffle(spark, d)
        )
    for name, leg in legs.items():
        runs = [_timed(leg) for _ in range(reps)]
        report[f"{name}_s"] = min(runs)
        report[f"{name}_runs"] = runs
        report[f"{name}_load1"] = _load1()
    report["shuffle_x10_factor"] = round(
        report["shuffle_clone_x10_s"] / report["shuffle_sf0.1_s"], 2
    )
    report["shuffle_x30_factor"] = round(
        report["shuffle_clone_x30_s"] / report["shuffle_sf0.1_s"], 2
    )

    dp = build_documents(spark, 10, perturb=True)
    for name, d in (("bpe_encode_sf0.1", BASE), ("bpe_encode_perturb_x10", dp)):
        runs = [_timed(lambda d=d: bpe_encode_stats(spark, d)) for _ in range(reps)]
        report[f"{name}_s"] = min(runs)
        report[f"{name}_runs"] = runs
        report[f"{name}_load1"] = _load1()
    report["bpe_encode_x10_factor"] = round(
        report["bpe_encode_perturb_x10_s"] / report["bpe_encode_sf0.1_s"], 2
    )

    # skewed embeddings (retrain branch triggers) at x1 and x10
    src = load_table(spark, BASE, "embeddings")
    for factor in (1, 10):
        dst = f"{OUT}/emb_skew_x{factor}"
        os.makedirs(dst, exist_ok=True)
        parts = []
        for i in range(factor):
            df = src.withColumn(
                "vec_id", F.col("vec_id") + F.lit(i * 10_000_000)
            )
            parts.append(df)
        out = parts[0]
        for df in parts[1:]:
            out = out.unionByName(df)
        # ram the batch stripe into cell 7 (all-positive lead dims)
        out = out.withColumn(
            "embedding",
            F.when(
                F.col("vec_id") % 10 == 9,
                F.expr(
                    "transform(embedding, (x, i) -> CASE WHEN i < 3"
                    " THEN CAST(abs(x) + 0.001 AS FLOAT) ELSE x END)"
                ),
            ).otherwise(F.col("embedding")),
        )
        out.write.mode("overwrite").parquet(f"{dst}/embeddings.parquet")
        runs = [
            _timed(lambda dst=dst: ivf_drift_retrain(spark, dst))
            for _ in range(reps)
        ]
        report[f"retrain_x{factor}_s"] = min(runs)
        report[f"retrain_x{factor}_runs"] = runs
        report[f"retrain_x{factor}_load1"] = _load1()
    report["retrain_x10_factor"] = round(
        report["retrain_x10_s"] / report["retrain_x1_s"], 2
    )
    report["loadavg1_end"] = _load1()
    print(_json.dumps(report), flush=True)


def probe_round10b(spark, reps: int = 2) -> None:
    """Round-10 second-batch lane operators at scale:

    - cross_source_shingle_overlap and bigram_lm_quality_by_source at
      x10 PERTURBED docs (replica tokens suffixed: vocabulary, shingle
      sets, and the token/bigram streams all grow ~x10 — the honest
      growth mode; verbatim clones would vanish in the DISTINCT).
      Expected ~linear: both plans are scan + vocab/set-grain
      map-side-combined aggregates; the overlap self-join's fan-out is
      source-domain-bounded regardless of corpus size.
    - PQ: training and eval legs separated, PROBE COUNT HELD FIXED
      (the operator's stride would grow probes ~x10 with the corpus and
      conflate probe-set growth with corpus growth). Train: fused Lloyd
      at x1/x10 (expected ~linear, map-side). Eval: ADC+exact recall
      for the same 10 probes at x1/x10 (expected ~linear: one scan,
      batch-local top-k, bounded global window)."""
    import json as _json
    import time as _time

    from drug_target_discovery_spark.operators.kmeans import quantize_embeddings
    from drug_target_discovery_spark.operators.pq import pq_recall_eval, pq_train
    from drug_target_discovery_spark.queries.round10 import (
        _PQ_ITERS,
        _PQ_K,
        _PQ_M,
        _PQ_PROBE_STRIDE,
        _PQ_TOPK,
        bigram_lm_quality_by_source,
        cross_source_shingle_overlap,
    )

    report = {"probe": "round10b_ops", "loadavg1_start": _load1()}

    dp = build_documents(spark, 10, perturb=True)
    for op_name, op in (
        ("xsrc", cross_source_shingle_overlap),
        ("jm", bigram_lm_quality_by_source),
    ):
        for leg_name, d in ((f"{op_name}_sf0.1", BASE), (f"{op_name}_perturb_x10", dp)):
            runs = [_timed(lambda op=op, d=d: op(spark, d)) for _ in range(reps)]
            report[f"{leg_name}_s"] = min(runs)
            report[f"{leg_name}_runs"] = runs
            report[f"{leg_name}_load1"] = _load1()
        report[f"{op_name}_x10_factor"] = round(
            report[f"{op_name}_perturb_x10_s"] / report[f"{op_name}_sf0.1_s"], 2
        )

    # PQ: x10 embeddings (vec_id-shifted clones), fixed probe set
    dst = f"{OUT}/emb_x10"
    if not os.path.exists(f"{dst}/embeddings.parquet"):
        os.makedirs(dst, exist_ok=True)
        src = load_table(spark, BASE, "embeddings")
        parts = [
            src.withColumn("vec_id", F.col("vec_id") + F.lit(i * 10_000_000))
            for i in range(10)
        ]
        out = parts[0]
        for df in parts[1:]:
            out = out.unionByName(df)
        out.write.mode("overwrite").parquet(f"{dst}/embeddings.parquet")
    base_vq = quantize_embeddings(
        load_table(spark, BASE, "embeddings").select("vec_id", "embedding")
    )
    probes = [
        (int(r["vid"]), [int(x) for x in r["v_int"]])
        for r in base_vq.filter(F.col("vid") % _PQ_PROBE_STRIDE == 0)
        .orderBy("vid")
        .collect()
    ]
    report["pq_n_probes_fixed"] = len(probes)
    for factor, d in ((1, BASE), (10, dst)):
        vq = quantize_embeddings(
            load_table(spark, d, "embeddings").select("vec_id", "embedding")
        )
        tr_runs, ev_runs = [], []
        for _ in range(reps):
            t0 = _time.perf_counter()
            cbs = pq_train(vq, _PQ_M, _PQ_K, _PQ_ITERS)
            tr_runs.append(round(_time.perf_counter() - t0, 2))
            ev_runs.append(
                _noop(pq_recall_eval(vq, cbs, probes, _PQ_TOPK))
            )
        report[f"pq_train_x{factor}_s"] = min(tr_runs)
        report[f"pq_train_x{factor}_runs"] = tr_runs
        report[f"pq_eval_x{factor}_s"] = min(ev_runs)
        report[f"pq_eval_x{factor}_runs"] = ev_runs
        report[f"pq_x{factor}_load1"] = _load1()
        release_caches(fixtures=True)
    report["pq_train_x10_factor"] = round(
        report["pq_train_x10_s"] / report["pq_train_x1_s"], 2
    )
    report["pq_eval_x10_factor"] = round(
        report["pq_eval_x10_s"] / report["pq_eval_x1_s"], 2
    )
    report["loadavg1_end"] = _load1()
    print(_json.dumps(report), flush=True)


def probe_ivfpq(spark, reps: int = 2) -> None:
    """IVF-PQ composed search at x1/x10 embeddings, probe set FIXED (the
    r10b PQ-probe protocol). Expected ~linear like the PQ legs, plus the
    bounded extras the composition adds (8 x D centroid aggregate, 8-row
    census, broadcast residual zip)."""
    import json as _json
    import time as _time

    from drug_target_discovery_spark.operators.kmeans import quantize_embeddings
    from drug_target_discovery_spark.operators.pq import ivfpq_recall_eval
    from drug_target_discovery_spark.queries.round10 import (
        _IVFPQ_NPROBE,
        _PQ_ITERS,
        _PQ_K,
        _PQ_M,
        _PQ_PROBE_STRIDE,
        _PQ_TOPK,
    )

    report = {"probe": "ivfpq_adc_recall", "loadavg1_start": _load1()}
    dst = f"{OUT}/emb_x10"
    if not os.path.exists(f"{dst}/embeddings.parquet"):
        os.makedirs(dst, exist_ok=True)
        src = load_table(spark, BASE, "embeddings")
        parts = [
            src.withColumn("vec_id", F.col("vec_id") + F.lit(i * 10_000_000))
            for i in range(10)
        ]
        out = parts[0]
        for df in parts[1:]:
            out = out.unionByName(df)
        out.write.mode("overwrite").parquet(f"{dst}/embeddings.parquet")
    base_vq = quantize_embeddings(
        load_table(spark, BASE, "embeddings").select("vec_id", "embedding")
    )
    probes = [
        (int(r["vid"]), [int(x) for x in r["v_int"]])
        for r in base_vq.filter(F.col("vid") % _PQ_PROBE_STRIDE == 0)
        .orderBy("vid")
        .collect()
    ]
    report["n_probes_fixed"] = len(probes)
    for factor, d in ((1, BASE), (10, dst)):
        vq = quantize_embeddings(
            load_table(spark, d, "embeddings").select("vec_id", "embedding")
        )
        runs = []
        for _ in range(reps):
            t0 = _time.perf_counter()
            ivfpq_recall_eval(
                vq, _PQ_M, _PQ_K, _PQ_ITERS, probes, _PQ_TOPK, _IVFPQ_NPROBE
            ).write.format("noop").mode("overwrite").save()
            runs.append(round(_time.perf_counter() - t0, 2))
            release_caches(fixtures=True)
        report[f"x{factor}_s"] = min(runs)
        report[f"x{factor}_runs"] = runs
        report[f"x{factor}_load1"] = _load1()
    report["x10_factor"] = round(report["x10_s"] / report["x1_s"], 2)
    report["loadavg1_end"] = _load1()
    print(_json.dumps(report), flush=True)


def probe_hilbert(spark, reps: int = 2) -> None:
    """hilbert_vs_zorder_skip_stats at x1/x10 lineitem (replicas shift
    both keys past the base extent so the grid population and the
    distinct (curve, part, supp) triple grain genuinely grow ~x10).
    Expected ~linear: the corpus-sized work is the triple-grain distinct
    + the keyless prefix-sum rank (bucketed, no global window)."""
    import json as _json

    report = {"probe": "hilbert_vs_zorder", "loadavg1_start": _load1()}
    from drug_target_discovery_spark.queries.round10 import (
        hilbert_vs_zorder_skip_stats,
    )

    dst = f"{OUT}/li_x10"
    if not os.path.exists(f"{dst}/lineitem.parquet"):
        os.makedirs(dst, exist_ok=True)
        src = load_table(spark, BASE, "lineitem").select("l_partkey", "l_suppkey")
        ext = src.agg(
            F.max("l_partkey").alias("pm"), F.max("l_suppkey").alias("sm")
        ).collect()[0]
        parts = [
            src.withColumn("l_partkey", F.col("l_partkey") + F.lit(i * (int(ext[0]) + 1)))
            .withColumn("l_suppkey", F.col("l_suppkey") + F.lit(i * (int(ext[1]) + 1)))
            for i in range(10)
        ]
        out = parts[0]
        for df in parts[1:]:
            out = out.unionByName(df)
        out.write.mode("overwrite").parquet(f"{dst}/lineitem.parquet")
    for name, d in (("x1", BASE), ("x10", dst)):
        runs = [
            _timed(lambda d=d: hilbert_vs_zorder_skip_stats(spark, d))
            for _ in range(reps)
        ]
        report[f"{name}_s"] = min(runs)
        report[f"{name}_runs"] = runs
        report[f"{name}_load1"] = _load1()
    report["x10_factor"] = round(report["x10_s"] / report["x1_s"], 2)
    report["loadavg1_end"] = _load1()
    print(_json.dumps(report), flush=True)


def probe_mixture(spark, reps: int = 2) -> None:
    """temperature_mixture_sample at x1/x10 doc clones (doc_id-shifted;
    source domain fixed, per-source populations x10). Expected ~linear:
    the corpus-sized work is the source-count aggregate + the keyed
    prefix-sum rank; apportionment runs on the 20-row source table."""
    import json as _json

    from drug_target_discovery_spark.queries.round10 import (
        temperature_mixture_sample,
    )

    report = {"probe": "temperature_mixture_sample", "loadavg1_start": _load1()}
    d10 = build_documents(spark, 10, perturb=False)
    for name, d in (("x1", BASE), ("x10", d10)):
        runs = [
            _timed(lambda d=d: temperature_mixture_sample(spark, d))
            for _ in range(reps)
        ]
        report[f"{name}_s"] = min(runs)
        report[f"{name}_runs"] = runs
        report[f"{name}_load1"] = _load1()
    report["x10_factor"] = round(report["x10_s"] / report["x1_s"], 2)
    report["loadavg1_end"] = _load1()
    print(_json.dumps(report), flush=True)


def probe_bigram_ceiling(spark, reps: int = 2) -> None:
    """The bigram-LM broadcast-ceiling fallback (VERDICT r10 #5) measured
    at the scale that trips it: x10 PERTURBED docs (bigram vocabulary
    ~x10), broadcast path vs FORCED shuffle path (ceiling=0 — the plan the
    gate selects once the model outgrows executor memory), plus a value
    equality check between the two paths on the x10 corpus."""
    import json as _json

    from drug_target_discovery_spark.queries.round10 import (
        bigram_lm_quality_by_source,
    )

    report = {"probe": "bigram_ceiling_fallback", "loadavg1_start": _load1()}
    dp = build_documents(spark, 10, perturb=True)
    for name, d, ceil in (
        ("x1_broadcast", BASE, None),
        ("x10_broadcast", dp, None),
        ("x10_shuffle", dp, 0),
    ):
        kw = {} if ceil is None else {"broadcast_ceiling": ceil}
        runs = [
            _timed(lambda d=d, kw=kw: bigram_lm_quality_by_source(spark, d, **kw))
            for _ in range(reps)
        ]
        report[f"{name}_s"] = min(runs)
        report[f"{name}_runs"] = runs
        report[f"{name}_load1"] = _load1()
    a = [tuple(r) for r in bigram_lm_quality_by_source(spark, dp).collect()]
    release_caches(fixtures=True)
    b = [
        tuple(r)
        for r in bigram_lm_quality_by_source(
            spark, dp, broadcast_ceiling=0
        ).collect()
    ]
    release_caches(fixtures=True)
    report["x10_values_equal"] = a == b
    report["shuffle_over_broadcast"] = round(
        report["x10_shuffle_s"] / report["x10_broadcast_s"], 2
    )
    report["loadavg1_end"] = _load1()
    print(_json.dumps(report), flush=True)


def probe_epoch(spark, reps: int = 2) -> None:
    """training_epoch_manifest (the composed loader pipeline) at x1/x10
    PERTURBED docs (vocabulary and token stream both grow ~x10 — the
    BPE stage's honest growth mode). Expected ~linear: the corpus-sized
    work is the exploded word-grain aggregate + the three prefix-sum
    passes; the BPE trainer's per-iteration shuffle is vocab-sized."""
    import json as _json

    from drug_target_discovery_spark.queries.round11 import (
        training_epoch_manifest,
    )

    report = {"probe": "training_epoch_manifest", "loadavg1_start": _load1()}
    dp = build_documents(spark, 10, perturb=True)
    for name, d in (("x1", BASE), ("x10", dp)):
        runs = [
            _timed(lambda d=d: training_epoch_manifest(spark, d))
            for _ in range(reps)
        ]
        report[f"{name}_s"] = min(runs)
        report[f"{name}_runs"] = runs
        report[f"{name}_load1"] = _load1()
    report["x10_factor"] = round(report["x10_s"] / report["x1_s"], 2)
    report["loadavg1_end"] = _load1()
    print(_json.dumps(report), flush=True)


def probe_epoch30(spark, reps: int = 2) -> None:
    """training_epoch_manifest at x1/x30 PERTURBED docs — the substr30
    precedent: a third scaling point for the composed loader pipeline
    (x1/x10 measured in the `epoch` probe). Vocabulary, token stream,
    and selection all grow ~x30; the BPE trainer's per-iteration work is
    vocab-bounded, the prefix sums are bucketed, so expected clearly
    sub-linear wall at probe scale."""
    import json as _json

    from drug_target_discovery_spark.queries.round11 import (
        training_epoch_manifest,
    )

    report = {"probe": "training_epoch_manifest_x30", "loadavg1_start": _load1()}
    d30 = build_documents(spark, 30, perturb=True)
    for name, d in (("x1", BASE), ("x30", d30)):
        runs = [
            _timed(lambda d=d: training_epoch_manifest(spark, d))
            for _ in range(reps)
        ]
        report[f"{name}_s"] = min(runs)
        report[f"{name}_runs"] = runs
        report[f"{name}_load1"] = _load1()
    report["x30_factor"] = round(report["x30_s"] / report["x1_s"], 2)
    report["loadavg1_end"] = _load1()
    print(_json.dumps(report), flush=True)


def probe_conformal(spark, reps: int = 2) -> None:
    """split_conformal_price_intervals at x1/x10 lineitem clones
    (orderkey-shifted, per-replica cent jitter so the nonconformity
    score DOMAIN grows too — the prefix-sum grain's honest growth mode;
    part table unchanged: the brand model stays 25 rows). Expected
    ~linear: broadcast dim join + two map-side-combined aggregates +
    the keyless prefix sum over the score grain."""
    import json as _json

    from drug_target_discovery_spark.queries.round10 import (
        split_conformal_price_intervals,
    )

    report = {"probe": "split_conformal", "loadavg1_start": _load1()}
    dst = f"{OUT}/conf_x10"
    if not os.path.exists(f"{dst}/lineitem.parquet"):
        os.makedirs(dst, exist_ok=True)
        src = load_table(spark, BASE, "lineitem").select(
            "l_orderkey", "l_linenumber", "l_partkey", "l_extendedprice"
        )
        parts = [
            src.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * 10_000_000))
            .withColumn("l_extendedprice", F.col("l_extendedprice") + F.lit(i * 0.01))
            for i in range(10)
        ]
        out = parts[0]
        for df in parts[1:]:
            out = out.unionByName(df)
        out.write.mode("overwrite").parquet(f"{dst}/lineitem.parquet")
        import shutil

        if os.path.isfile(f"{BASE}/part.parquet"):
            shutil.copy(f"{BASE}/part.parquet", f"{dst}/part.parquet")
        else:
            load_table(spark, BASE, "part").write.mode("overwrite").parquet(
                f"{dst}/part.parquet"
            )
    for name, d in (("x1", BASE), ("x10", dst)):
        runs = [
            _timed(lambda d=d: split_conformal_price_intervals(spark, d))
            for _ in range(reps)
        ]
        report[f"{name}_s"] = min(runs)
        report[f"{name}_runs"] = runs
        report[f"{name}_load1"] = _load1()
    report["x10_factor"] = round(report["x10_s"] / report["x1_s"], 2)
    report["loadavg1_end"] = _load1()
    print(_json.dumps(report), flush=True)


def probe_xcontam(spark, reps: int = 2) -> None:
    """cross_corpus_contamination at x1/x10 PERTURBED docs (replicas
    content-disjoint, benchmark membership preserved under the doc_id
    shift — verbatim clones would make every replica share everything
    with the benchmark replicas, the substring operator's clone-
    degenerate mode, measured separately there). Expected ~linear: both
    position streams shuffle 8-byte hashes, candidates are
    benchmark-bounded."""
    import json as _json

    from drug_target_discovery_spark.queries.round10 import (
        cross_corpus_contamination,
    )

    report = {"probe": "cross_corpus_contamination", "loadavg1_start": _load1()}
    dp = build_documents(spark, 10, perturb=True)
    for name, d in (("x1", BASE), ("perturb_x10", dp)):
        runs = [
            _timed(lambda d=d: cross_corpus_contamination(spark, d))
            for _ in range(reps)
        ]
        report[f"{name}_s"] = min(runs)
        report[f"{name}_runs"] = runs
        report[f"{name}_load1"] = _load1()
    report["x10_factor"] = round(report["perturb_x10_s"] / report["x1_s"], 2)
    report["loadavg1_end"] = _load1()
    print(_json.dumps(report), flush=True)


def probe_mmd(spark, reps: int = 2) -> None:
    """embedding_mmd_drift at x1/x10 embeddings (vec_id-shifted clones:
    10M % 20 == 0 so every replica's stripe/block structure is
    preserved and the quadruple count grows x10). Expected ~linear/flat:
    one scan, block-grain map-side groupBy, fixed-size reduce."""
    import json as _json

    from drug_target_discovery_spark.queries.round10 import embedding_mmd_drift

    report = {"probe": "embedding_mmd_drift", "loadavg1_start": _load1()}
    dst = f"{OUT}/emb_x10"
    if not os.path.exists(f"{dst}/embeddings.parquet"):
        os.makedirs(dst, exist_ok=True)
        src = load_table(spark, BASE, "embeddings")
        parts = [
            src.withColumn("vec_id", F.col("vec_id") + F.lit(i * 10_000_000))
            for i in range(10)
        ]
        out = parts[0]
        for df in parts[1:]:
            out = out.unionByName(df)
        out.write.mode("overwrite").parquet(f"{dst}/embeddings.parquet")
    for name, d in (("x1", BASE), ("x10", dst)):
        runs = [
            _timed(lambda d=d: embedding_mmd_drift(spark, d)) for _ in range(reps)
        ]
        report[f"{name}_s"] = min(runs)
        report[f"{name}_runs"] = runs
        report[f"{name}_load1"] = _load1()
    report["x10_factor"] = round(report["x10_s"] / report["x1_s"], 2)
    report["loadavg1_end"] = _load1()
    print(_json.dumps(report), flush=True)


def probe_bpe_k(spark) -> None:
    """BPE trainer growth in k (VERDICT r11 #5): the three forms at
    k=10/50/100 on the x10 perturbed corpus (~310 distinct words) and
    at k=1000 on the x30 perturbed corpus (~930 words; the synthetic
    generator's base vocabulary is only 31 words — doc count scales,
    vocabulary does not, so perturbed replicas are the only way to grow
    the merge space). One rep per leg: this is a k-GROWTH reading
    (driver-round counts and per-merge constants), not a load-sensitive
    wall comparison. Context pinned in the round-12 code comments: the
    pre-fix cache-per-generation sequential trainer never finished k=15
    at ANY scale (Catalyst re-analysis super-linear in stacked fold
    generations); these legs all run on the lineage-cut form."""
    import json as _json

    from drug_target_discovery_spark.queries.round9 import bpe_top_merges
    from drug_target_discovery_spark.queries.round12 import (
        bpe_top_merges_batched,
        bpe_top_merges_local,
    )

    report = {"probe": "bpe_k_growth", "loadavg1_start": _load1()}
    d10 = build_documents(spark, 10, perturb=True)
    d30 = build_documents(spark, 30, perturb=True)
    for k in (10, 50, 100):
        report[f"seq_x10_k{k}_s"] = _timed(
            lambda k=k: bpe_top_merges(spark, d10, k=k)
        )
    for k in (100,):
        stats = {}
        report[f"bat_x10_k{k}_s"] = _timed(
            lambda k=k, s=stats: bpe_top_merges_batched(spark, d10, k=k, stats=s)
        )
        report[f"bat_x10_k{k}_rounds"] = stats.get("rounds")
        report[f"loc_x10_k{k}_s"] = _timed(
            lambda k=k: bpe_top_merges_local(spark, d10, k=k)
        )
    for k in (1000,):
        stats = {}
        report[f"bat_x30_k{k}_s"] = _timed(
            lambda k=k, s=stats: bpe_top_merges_batched(spark, d30, k=k, stats=s)
        )
        report[f"bat_x30_k{k}_rounds"] = stats.get("rounds")
        report[f"loc_x30_k{k}_s"] = _timed(
            lambda k=k: bpe_top_merges_local(spark, d30, k=k)
        )
    report["seq_per_merge_s"] = round(
        (report["seq_x10_k100_s"] - report["seq_x10_k10_s"]) / 90.0, 3
    )
    report["loadavg1_end"] = _load1()
    print(_json.dumps(report), flush=True)


# Shared Zipf-vocabulary corpus for the BPE regime probes: V distinct
# words, count = C // rank (Zipf exponent 1), word = base-|alphabet|
# letter encoding of rank+offset so lengths grow down the tail and pair
# structure is dense.
_ZIPF_V, _ZIPF_C = 5000, 200_000


def _zipf_word(rank: int, alphabet: str) -> str:
    base = len(alphabet)
    # offset keeps lengths >= 2 digits and growing down the tail
    off = base * base * (5 if base == 5 else 1)
    n, s = rank + off, []
    while n:
        s.append(alphabet[n % base])
        n //= base
    return "".join(s)


def _zipf_docs(spark, alphabet: str):
    rows = [
        (i, " ".join([_zipf_word(i, alphabet)] * (_ZIPF_C // i)))
        for i in range(1, _ZIPF_V + 1)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def probe_bpe_zipf(spark) -> None:
    """VERDICT r12 #4: the batched trainer's only unmeasured regime.
    The committed x30 k=1000 row is TIE-SATURATED (suffix-replicated
    clones; 1.06 merges/round — the honest worst case), but natural
    text above the local trainer's 2M-distinct-word ceiling — the only
    regime where bpe_top_merges_batched is the production path — has a
    Zipf-shaped word spectrum with a strictly dominant head. This leg
    synthesizes that spectrum: V distinct words over a 5-letter
    alphabet (word = base-5 letter encoding of rank+125, so lengths
    grow 4->6 down the tail and pair structure is dense), count =
    C // rank (Zipf exponent 1). Reads the merges-per-round curve at
    k=200 and k=1000 plus value-equality against the driver-local
    trainer on the same corpus (a new corpus-shape correctness pin,
    free at this size)."""
    import json as _json

    from drug_target_discovery_spark.queries.round12 import (
        bpe_top_merges_batched,
        bpe_top_merges_local,
    )

    report = {"probe": "bpe_zipf_batched", "loadavg1_start": _load1()}
    V, C = _ZIPF_V, _ZIPF_C
    report["distinct_words"] = V
    report["total_tokens"] = sum(C // i for i in range(1, V + 1))
    docs = _zipf_docs(spark, "abcde")
    for k in (200, 1000):
        stats: dict = {}
        t0 = time.perf_counter()
        got = bpe_top_merges_batched(spark, "", k=k, docs=docs, stats=stats).collect()
        report[f"bat_zipf_k{k}_s"] = round(time.perf_counter() - t0, 2)
        release_caches(fixtures=True)
        report[f"bat_zipf_k{k}_rounds"] = stats["rounds"]
        report[f"bat_zipf_k{k}_merges"] = len(got)
        report[f"bat_zipf_k{k}_mean_batch"] = round(
            len(got) / max(1, stats["rounds"]), 2
        )
        report[f"bat_zipf_k{k}_batch_head"] = stats["batch_sizes"][:15]
        if k == 1000:
            t0 = time.perf_counter()
            loc = bpe_top_merges_local(spark, "", k=k, docs=docs).collect()
            report["loc_zipf_k1000_s"] = round(time.perf_counter() - t0, 2)
            report["values_equal_batched_vs_local"] = [tuple(r) for r in got] == [
                tuple(r) for r in loc
            ]
    # Control leg: same Zipf spectrum over a 20-letter alphabet — does
    # the greedy disjoint rule batch better when head words stop
    # sharing a dense 5-symbol base (i.e. is the degeneracy an
    # alphabet-density artifact or fundamental)?
    docs20 = _zipf_docs(spark, "abcdefghijklmnopqrst")
    stats = {}
    t0 = time.perf_counter()
    got = bpe_top_merges_batched(spark, "", k=200, docs=docs20, stats=stats).collect()
    report["bat_zipf20_k200_s"] = round(time.perf_counter() - t0, 2)
    release_caches(fixtures=True)
    report["bat_zipf20_k200_rounds"] = stats["rounds"]
    report["bat_zipf20_k200_merges"] = len(got)
    report["bat_zipf20_k200_mean_batch"] = round(
        len(got) / max(1, stats["rounds"]), 2
    )
    report["bat_zipf20_k200_batch_head"] = stats["batch_sizes"][:15]
    report["loadavg1_end"] = _load1()
    print(_json.dumps(report), flush=True)


def probe_bpe_cap(spark) -> None:
    """Cap-sensitivity of round-13's ``bpe_top_merges_capped`` (the
    above-ceiling production path): first-k merge-SEQUENCE agreement vs
    the uncapped trainer at caps V/2, V/4, V/8 on the Zipf vocabulary.
    On a Zipf(1) spectrum the dropped tail carries a vanishing share of
    token mass (sum of C/r for r > V/2 is ~C*ln2 of ~C*ln V), so
    agreement should be high — this committed row is the measured
    honesty behind the operator's 'approximate w.r.t. the full corpus'
    contract. Agreement metrics: common-prefix length of the (left,
    right) merge sequences (order-sensitive), the Jaccard of the merge
    SETS (order-insensitive; late-rank swaps show up here), and — the
    production-relevant one — corpus FERTILITY (tokens per word
    occurrence) when the full corpus is encoded with each merge list:
    merge-order identity is a harsh metric (near-tied counts reorder
    freely once the tail is dropped; the cutoff DEFINES a different,
    equally-valid tokenizer, which is why HF/SentencePiece treat it as
    a tokenizer parameter), but compression quality is what the
    tokenizer is FOR."""
    import json as _json

    from drug_target_discovery_spark.queries.round13 import bpe_top_merges_capped

    report = {"probe": "bpe_cap_sensitivity", "loadavg1_start": _load1()}
    k = 200
    docs = _zipf_docs(spark, "abcde")
    report["distinct_words"] = _ZIPF_V
    word_counts = [
        (w, _ZIPF_C // i)
        for i in range(1, _ZIPF_V + 1)
        for w in [_zipf_word(i, "abcde")]
    ]
    n_occ = sum(c for _, c in word_counts)

    from tools.lane_check import _encode  # THE family apply convention

    def _fertility(rules) -> float:
        toks = sum(len(_encode(w, rules)) * c for w, c in word_counts)
        return round(toks / n_occ, 4)

    t0 = time.perf_counter()
    exact = [
        (r["left"], r["right"])
        for r in bpe_top_merges_capped(
            spark, "", k=k, docs=docs, top_words=_ZIPF_V
        ).collect()
    ]
    report["uncapped_s"] = round(time.perf_counter() - t0, 2)
    release_caches(fixtures=True)
    report["uncapped_fertility"] = _fertility(exact)
    for cap in (_ZIPF_V // 2, _ZIPF_V // 4, _ZIPF_V // 8):
        t0 = time.perf_counter()
        capped = [
            (r["left"], r["right"])
            for r in bpe_top_merges_capped(
                spark, "", k=k, docs=docs, top_words=cap
            ).collect()
        ]
        release_caches(fixtures=True)
        prefix = 0
        for a, b in zip(exact, capped):
            if a != b:
                break
            prefix += 1
        inter = len(set(exact) & set(capped))
        union = len(set(exact) | set(capped))
        report[f"cap{cap}_s"] = round(time.perf_counter() - t0, 2)
        report[f"cap{cap}_prefix_agreement"] = prefix
        report[f"cap{cap}_set_jaccard"] = round(inter / union, 4)
        report[f"cap{cap}_fertility"] = _fertility(capped)
    report["k"] = k
    report["loadavg1_end"] = _load1()
    print(_json.dumps(report), flush=True)


def probe_bpe_apply(spark, reps: int = 2) -> None:
    """bpe_encode_stats_scaled (the pandas-UDF production apply path) at
    x1/x10 perturbed docs, k=100: corpus AND vocabulary grow 10x.
    Expected ~linear-to-flat: the UDF runs on the (source, word) count
    grain (vocabulary-sized, 10x here), the corpus-sized work is one
    tokenize scan, and per-batch work is independent of k."""
    import json as _json

    from drug_target_discovery_spark.queries.round12 import (
        bpe_encode_stats_scaled,
    )

    report = {"probe": "bpe_apply_scaled", "loadavg1_start": _load1()}
    d10 = build_documents(spark, 10, perturb=True)
    for name, d in (("x1", BASE), ("x10", d10)):
        runs = [
            _timed(lambda d=d: bpe_encode_stats_scaled(spark, d, k=100))
            for _ in range(reps)
        ]
        report[f"{name}_s"] = min(runs)
        report[f"{name}_runs"] = runs
        report[f"{name}_load1"] = _load1()
    report["x10_factor"] = round(report["x10_s"] / report["x1_s"], 2)
    report["loadavg1_end"] = _load1()
    print(_json.dumps(report), flush=True)


def probe_url_family(spark, reps: int = 2) -> None:
    """url_canonical_dedup + domain_quality_rollup (+ round-13's
    incremental_url_dedup_by_domain) at x1/x10 doc clones
    (doc_id-shifted, so the derived messy URLs spread over the same
    canonical-URL classes / 40 domains with 10x group depth). Expected
    ~flat: all are map-side canonicalize + map-side-combinable
    aggregates to bounded grains (the incremental form adds ONE
    canonical-URL-grain equi-join) — the cheapest shapes in the repo."""
    import json as _json

    from drug_target_discovery_spark.queries.round12 import (
        domain_quality_rollup,
        url_canonical_dedup,
    )
    from drug_target_discovery_spark.queries.round13 import (
        incremental_url_dedup_by_domain,
        per_domain_downsample,
    )

    report = {"probe": "url_family", "loadavg1_start": _load1()}
    d10 = build_documents(spark, 10, perturb=False)
    for name, d in (("x1", BASE), ("x10", d10)):
        for op, fn in (
            ("url", url_canonical_dedup),
            ("domain", domain_quality_rollup),
            ("incr", incremental_url_dedup_by_domain),
            ("downsample", per_domain_downsample),
        ):
            runs = [_timed(lambda d=d, fn=fn: fn(spark, d)) for _ in range(reps)]
            report[f"{op}_{name}_s"] = min(runs)
            report[f"{op}_{name}_runs"] = runs
    for op in ("url", "domain", "incr", "downsample"):
        report[f"{op}_x10_factor"] = round(
            report[f"{op}_x10_s"] / report[f"{op}_x1_s"], 2
        )
    report["loadavg1_end"] = _load1()
    print(_json.dumps(report), flush=True)


def probe_pii(spark, reps: int = 2) -> None:
    """pii_redaction_census at x1/x10 doc clones (doc_id-shifted, so
    the arithmetic injection classes keep their density — the moduli
    are invariant under the +1M replica shift). Expected ~flat: three
    codegen regex passes + length arithmetic map-side, then ONE
    map-side-combinable aggregate to the 20-source grain. The scan
    must read every byte of text, which is the floor for any scrub
    pass — so the x10 factor measures pure scheduling overhead at
    fixture scale."""
    import json as _json

    from drug_target_discovery_spark.queries.round13 import (
        pii_redaction_census,
    )

    report = {"probe": "pii_census", "loadavg1_start": _load1()}
    d10 = build_documents(spark, 10, perturb=False)
    for name, d in (("x1", BASE), ("x10", d10)):
        runs = [
            _timed(lambda d=d: pii_redaction_census(spark, d))
            for _ in range(reps)
        ]
        report[f"{name}_s"] = min(runs)
        report[f"{name}_runs"] = runs
        report[f"{name}_load1"] = _load1()
    report["x10_factor"] = round(report["x10_s"] / report["x1_s"], 2)
    report["loadavg1_end"] = _load1()
    print(_json.dumps(report), flush=True)


def probe_ccnet(spark, reps: int = 2) -> None:
    """ccnet_perplexity_buckets vs the bigram_lm_quality_by_source it
    shares its scorer with, at x1/x10 PERTURBED doc clones (replica
    tokens suffixed -> the bigram vocabulary grows ~10x, the honest
    growth mode for an LM-over-corpus probe). Expected: ccnet tracks
    the bigram op ~1:1 at both scales — everything past the shared
    scorer runs at the (lang, micro-score) histogram grain, which the
    quantization bounds regardless of corpus size, so the bucketing
    adds only bounded-grain work to the LM cost."""
    import json as _json

    from drug_target_discovery_spark.queries.round10 import (
        bigram_lm_quality_by_source,
    )
    from drug_target_discovery_spark.queries.round13 import (
        ccnet_perplexity_buckets,
    )

    report = {"probe": "ccnet_buckets", "loadavg1_start": _load1()}
    d10 = build_documents(spark, 10, perturb=True)
    for name, d in (("x1", BASE), ("x10", d10)):
        for op, fn in (
            ("ccnet", ccnet_perplexity_buckets),
            ("bigram", bigram_lm_quality_by_source),
        ):
            runs = [_timed(lambda d=d, fn=fn: fn(spark, d)) for _ in range(reps)]
            report[f"{op}_{name}_s"] = min(runs)
            report[f"{op}_{name}_runs"] = runs
        report[f"{name}_load1"] = _load1()
    for op in ("ccnet", "bigram"):
        report[f"{op}_x10_factor"] = round(
            report[f"{op}_x10_s"] / report[f"{op}_x1_s"], 2
        )
    report["ccnet_over_bigram_x10"] = round(
        report["ccnet_x10_s"] / report["bigram_x10_s"], 2
    )
    report["loadavg1_end"] = _load1()
    print(_json.dumps(report), flush=True)


def main() -> None:
    which = set(sys.argv[1:]) or {"fano", "gini"}
    spark = get_spark("round9_probe")
    load_table(spark, BASE, "lineitem").count()  # warm session
    if "fano" in which:
        probe_fano(spark)
    if "gini" in which:
        probe_gini_twin(spark)
    if "substr" in which:
        probe_substr(spark)
    if "substr30" in which:
        probe_substr_x30_valve(spark)
    if "ivf" in which:
        probe_ivf(spark)
    if "r10" in which:
        probe_round10(spark)
    if "r10b" in which:
        probe_round10b(spark)
    if "ivfpq" in which:
        probe_ivfpq(spark)
    if "hilbert" in which:
        probe_hilbert(spark)
    if "mixture" in which:
        probe_mixture(spark)
    if "conformal" in which:
        probe_conformal(spark)
    if "xcontam" in which:
        probe_xcontam(spark)
    if "mmd" in which:
        probe_mmd(spark)
    if "bigram_ceiling" in which:
        probe_bigram_ceiling(spark)
    if "epoch" in which:
        probe_epoch(spark)
    if "epoch30" in which:
        probe_epoch30(spark)
    if "bpek" in which:
        probe_bpe_k(spark)
    if "urlx10" in which:
        probe_url_family(spark)
    if "bpeapply" in which:
        probe_bpe_apply(spark)
    if "bpezipf" in which:
        probe_bpe_zipf(spark)
    if "bpecap" in which:
        probe_bpe_cap(spark)
    if "pii" in which:
        probe_pii(spark)
    if "ccnet" in which:
        probe_ccnet(spark)


if __name__ == "__main__":
    main()
