"""Bin-bucketed non-equi range join: exact equality with the nested-loop
formulation, and the plan guarantee (hash join on the bin id, never
BroadcastNestedLoopJoin)."""

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from drug_target_discovery_spark.operators.rangejoin import (
    _guarded_bin_sequence,
    binned_range_join,
)
from drug_target_discovery_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


class TestBinnedRangeJoin:
    def _fixture(self, spark):
        fact = load_table(spark, SF, "part").select(
            "p_partkey", F.col("p_retailprice").alias("v")
        )
        ranges = spark.createDataFrame(
            [
                ("cheap", 0.0, 950.0),
                ("mid", 900.0, 1500.0),  # overlaps 'cheap' on purpose
                ("high", 1500.0, 2500.0),
                ("empty", 9000.0, 9500.0),
            ],
            "band string, lo double, hi double",
        )
        return fact, ranges

    @pytest.mark.parametrize("bin_width", [10.0, 250.0, 5000.0])
    def test_equals_nested_loop_at_any_bin_width(self, spark, bin_width):
        fact, ranges = self._fixture(spark)
        got = sorted(
            (r["p_partkey"], r["band"])
            for r in binned_range_join(
                fact, ranges, "v", "lo", "hi", bin_width
            ).collect()
        )
        exp = sorted(
            (r["p_partkey"], r["band"])
            for r in fact.join(
                ranges,
                (F.col("v") >= F.col("lo")) & (F.col("v") <= F.col("hi")),
            ).collect()
        )
        assert got == exp
        assert got, "fixture should produce matches"
        # the overlap region must yield BOTH bands for the same part
        both = {k for k, b in got if b == "cheap"} & {
            k for k, b in got if b == "mid"
        }
        assert both

    def test_plan_is_hash_join_not_nested_loop(self, spark):
        fact, ranges = self._fixture(spark)
        binned = _plan(binned_range_join(fact, ranges, "v", "lo", "hi", 250.0))
        assert "BroadcastNestedLoopJoin" not in binned
        assert "_bin" in binned
        # the naive formulation IS the nested loop — the thing we avoid
        naive = _plan(
            fact.join(
                ranges,
                (F.col("v") >= F.col("lo")) & (F.col("v") <= F.col("hi")),
            )
        )
        assert "BroadcastNestedLoopJoin" in naive

    def test_rejects_nonpositive_bin_width(self, spark):
        fact, ranges = self._fixture(spark)
        with pytest.raises(ValueError):
            binned_range_join(fact, ranges, "v", "lo", "hi", 0.0)

    def test_inverted_wide_range_neither_explodes_nor_raises(self, spark):
        """ADVICE r8: an INVERTED range (lo > hi) spanning 50,001 bins
        used to bypass the max_bins_per_range fuse (n_bins <= 0 never
        trips `> cap`) while sequence(start, stop) still exploded the
        full descending span at step -1. Now it must fan out to ZERO
        bins (NULL sequence, dropped by explode): join completes under
        a 1,000-bin cap, returns no matches from the inverted range,
        and the valid ranges are unaffected."""
        fact, ranges = self._fixture(spark)
        inverted = spark.createDataFrame(
            # 50,001 bins wide at bin_width=1.0 — but reversed
            [("backwards", 50_000.0, 0.0)],
            "band string, lo double, hi double",
        )
        # fan-out shape, pinned directly: NULL sequence for the inverted
        # range, never a 50,001-element descending array
        seq = inverted.select(
            F.size(_guarded_bin_sequence("lo", "hi", 1.0, 1_000)).alias("n")
        ).collect()[0]["n"]
        assert seq in (-1, None)  # size(NULL) = -1 under legacy conf
        # end-to-end: cap far below the inverted span (but above the
        # widest valid band's 1,001 bins), no raise, no rows from
        # 'backwards', valid bands intact
        got = binned_range_join(
            fact,
            ranges.unionByName(inverted),
            "v",
            "lo",
            "hi",
            1.0,
            max_bins_per_range=2_000,
        )
        bands = {r["band"] for r in got.collect()}
        assert "backwards" not in bands
        # sf0.001 part prices land only in the cheap/mid bands
        assert {"cheap", "mid"} <= bands

    def test_null_bounds_never_match_and_never_trip_fuse(self, spark):
        """Regression pin for the NULL-bounds contract around the new
        n_bins < 1 branch: NULL lo/hi falls through BOTH when branches
        to sequence(NULL, ...) -> NULL -> dropped."""
        fact, _ = self._fixture(spark)
        ranges = spark.createDataFrame(
            [("nullhi", 0.0, None), ("nulllo", None, 2500.0)],
            "band string, lo double, hi double",
        )
        got = binned_range_join(
            fact, ranges, "v", "lo", "hi", 1.0, max_bins_per_range=10
        ).collect()
        assert got == []


@given(
    points=st.lists(
        st.integers(min_value=-50, max_value=50), min_size=1, max_size=30
    ),
    ranges=st.lists(
        st.tuples(
            st.integers(min_value=-50, max_value=50),
            st.integers(min_value=0, max_value=40),
        ),
        min_size=1,
        max_size=10,
    ),
    bin_width=st.sampled_from([1.0, 3.0, 7.5, 100.0]),
)
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_binned_range_join_matches_bruteforce(spark, points, ranges, bin_width):
    """Random points x random (possibly degenerate / overlapping /
    negative-domain) intervals at several bin widths — exact agreement
    with the python brute force, including lo == hi point-intervals and
    bins straddling zero (floor, not truncate-toward-zero)."""
    f = spark.createDataFrame(
        [(i, float(p)) for i, p in enumerate(points)], "id long, v double"
    )
    r = spark.createDataFrame(
        [(j, float(lo), float(lo + w)) for j, (lo, w) in enumerate(ranges)],
        "rid long, lo double, hi double",
    )
    got = sorted(
        (row["id"], row["rid"])
        for row in binned_range_join(f, r, "v", "lo", "hi", bin_width).collect()
    )
    exp = sorted(
        (i, j)
        for i, p in enumerate(points)
        for j, (lo, w) in enumerate(ranges)
        if lo <= p <= lo + w
    )
    assert got == exp
