"""Salting equivalence: salted forms must return exactly the unsalted
results (they only change physical distribution)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from drug_target_discovery_spark.operators.skew import (
    hot_keys,
    salted_join,
    two_phase_agg,
)


@pytest.fixture(scope="module")
def skewed(spark):
    rng = np.random.RandomState(9)
    # key 7 holds 60% of all rows — a classic hot key
    keys = np.where(rng.uniform(size=20000) < 0.6, 7, rng.randint(0, 100, 20000))
    big = spark.createDataFrame(
        pd.DataFrame({"k": keys, "v": rng.uniform(0, 10, 20000)})
    )
    small = spark.createDataFrame(
        pd.DataFrame({"k": np.arange(100), "name": [f"n{i}" for i in range(100)]})
    )
    return big.cache(), small.cache()


class TestSkew:
    def test_salted_join_equals_plain(self, spark, skewed):
        big, small = skewed
        plain = big.join(small, "k").groupBy("k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
        )
        salted = salted_join(big, small, "k", salt_buckets=8).groupBy("k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
        )
        a = {r["k"]: (r["n"], round(r["s"], 6)) for r in plain.collect()}
        b = {r["k"]: (r["n"], round(r["s"], 6)) for r in salted.collect()}
        assert a == b

    def test_two_phase_agg_equals_plain(self, spark, skewed):
        big, _ = skewed
        plain = {
            r["k"]: (r["n"], round(r["s"], 6), round(r["mx"], 6))
            for r in big.groupBy("k")
            .agg(F.count("v").alias("n"), F.sum("v").alias("s"), F.max("v").alias("mx"))
            .collect()
        }
        salted = {
            r["k"]: (r["n"], round(r["s"], 6), round(r["mx"], 6))
            for r in two_phase_agg(
                big, "k", {"n": ("v", "count"), "s": ("v", "sum"), "mx": ("v", "max")}
            ).collect()
        }
        assert plain == salted

    def test_hot_key_detection(self, spark, skewed):
        big, _ = skewed
        hot = hot_keys(big, "k", threshold_fraction=0.05)
        rows = hot.collect()
        assert [r["k"] for r in rows] == [7]
        assert rows[0]["fraction"] > 0.5
