"""Hot-key straggler probe for the single-exchange window rewrites.

``robust_zscore_by_part`` and ``mann_whitney_u_by_part`` ride
single-partition-per-key window sorts: the whole plan is one exchange on
``l_partkey``, so the worst case is the HOTTEST part — that key's entire
group sorts inside one task while every other task finishes. The x10/x30
probes (tools/scale_probe.py, SCALING.md) measured wall growth under
uniform key-shifted replication; this probe measures the straggler bound
directly by synthesizing a degenerate hot stratum: a configurable fraction
(default 1%) of ALL lineitem rows reassigned to ONE part key.

Method: replicate sf0.1 lineitem by ``factor`` with shifted keys (the
scale_probe recipe, lineitem only — both probes read nothing else), then
write a skewed twin where row-hash-selected rows get ``l_partkey = 42``.
Each probe is timed cold on the uniform and the skewed dataset; the
straggler bound SCALING.md argues is ``wall_skew ≈ wall_uniform +
hot-group sort time`` — the reported ``skew_factor`` is that ratio.

Usage: python tools/skew_probe.py [factor] [hot_percent]
(defaults: factor 30, 1% hot)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from drug_target_discovery_spark.caching import release_caches
from drug_target_discovery_spark.queries.registry import all_queries
from drug_target_discovery_spark.session import get_spark
from drug_target_discovery_spark.sources.tables import load_table

BASE = "/root/testdata/sf0.1"
UNIFORM = "/tmp/skewprobe/uniform"
SKEWED = "/tmp/skewprobe/skewed"
HOT_KEY = 42

PROBES = ["robust_zscore_by_part", "mann_whitney_u_by_part"]


def build(spark, factor: int, hot_pct: int) -> int:
    src = load_table(spark, BASE, "lineitem")
    parts = []
    for i in range(factor):
        parts.append(
            src.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * 1_000_000))
            .withColumn("l_partkey", F.col("l_partkey") + F.lit(i * 1_000_000))
            .withColumn("l_suppkey", F.col("l_suppkey") + F.lit(i * 1_000_000))
        )
    out = parts[0]
    for df in parts[1:]:
        out = out.unionByName(df)
    os.makedirs(UNIFORM, exist_ok=True)
    os.makedirs(SKEWED, exist_ok=True)
    out.write.mode("overwrite").parquet(f"{UNIFORM}/lineitem.parquet")
    uni = spark.read.parquet(f"{UNIFORM}/lineitem.parquet")
    # deterministic row-hash selection: ~hot_pct% of ALL rows onto one part
    h = F.expr(
        "CAST(conv(substring(md5(concat_ws('_', l_orderkey, l_linenumber, "
        "l_partkey)), 1, 15), 16, 10) AS BIGINT)"
    )
    skew = uni.withColumn(
        "l_partkey",
        F.when(h % 100 < hot_pct, F.lit(HOT_KEY)).otherwise(F.col("l_partkey")),
    )
    skew.write.mode("overwrite").parquet(f"{SKEWED}/lineitem.parquet")
    hot_rows = (
        spark.read.parquet(f"{SKEWED}/lineitem.parquet")
        .filter(F.col("l_partkey") == HOT_KEY)
        .count()
    )
    return hot_rows


def partition_balance(spark, sf_dir: str, partitions: int = 32) -> dict:
    """DETERMINISTIC straggler bound: rows per shuffle partition under
    Spark's actual hash partitioning of l_partkey (murmur3 pmod), as the
    window exchange would distribute them. max/mean is the lower bound on
    the stage's wall inflation from skew — data-derived, immune to the
    host's wall-clock variance (measured 3-160s swings on identical runs)."""
    df = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .groupBy(F.pmod(F.hash("l_partkey"), F.lit(partitions)).alias("p"))
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.max("n").alias("mx"),
            F.avg("n").alias("mean"),
            F.count(F.lit(1)).alias("parts"),
        )
        .collect()[0]
    )
    return {
        "max_partition_rows": int(df["mx"]),
        "mean_partition_rows": int(df["mean"]),
        "balance_factor": round(df["mx"] / df["mean"], 3),
    }


def time_probe(spark, name: str, sf_dir: str) -> float:
    q = all_queries()[name]
    t0 = time.perf_counter()
    q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    release_caches(fixtures=True)
    return dt


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    hot_pct = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    spark = get_spark("skew_probe")
    hot_rows = build(spark, factor, hot_pct)
    load_table(spark, BASE, "lineitem").count()  # warm session
    report = {}
    for name in PROBES:
        # warmup at base SF: absorbs the session's one-time costs (codegen
        # cache, noop-writer init, first-exchange setup) so the uniform-vs-
        # skewed comparison below isolates the data shape, not run order.
        # best-of-3 per dataset: this host has documented 2-3x single-run
        # slot variance (BENCH_NOTES.md), and min-of-N is the standard
        # variance cut for relative comparisons.
        time_probe(spark, name, BASE)
        t_uni = min(time_probe(spark, name, UNIFORM) for _ in range(3))
        t_skew = min(time_probe(spark, name, SKEWED) for _ in range(3))
        report[name] = {
            "uniform_s": round(t_uni, 2),
            "skewed_s": round(t_skew, 2),
            "skew_factor": round(t_skew / t_uni, 2) if t_uni > 0 else None,
        }
        print(name, report[name], flush=True)
    print(
        json.dumps(
            {
                "data_factor": factor,
                "hot_pct": hot_pct,
                "hot_rows": hot_rows,
                "balance_uniform": partition_balance(spark, UNIFORM),
                "balance_skewed": partition_balance(spark, SKEWED),
                "probes": report,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
