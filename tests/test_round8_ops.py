"""Independent recomputation + plan-shape pins for the round-8 operators
(price-band lookup through the keyless binned range join, per-nation
order-value Gini, hapax/TTR corpus health), plus the ADVICE-r7 guards:
the range-join bins-per-range fuse and the containment prefilter's
division-form consistency."""

from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F

from drug_target_discovery_spark.operators.rangejoin import binned_range_join
from drug_target_discovery_spark.queries.registry import all_queries
from drug_target_discovery_spark.queries.round8 import (
    _BAND_BIN_WIDTH,
    _PRICE_BANDS,
)
from drug_target_discovery_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


class TestPriceBandLookup:
    def test_plan_has_no_nested_loop(self, spark):
        df = all_queries()["price_band_lookup_binned"].fn(spark, SF)
        plan = _plan(df)
        assert "BroadcastNestedLoopJoin" not in plan
        assert "_bin" in plan  # the equi hash join key

    def test_matches_python_recompute(self, spark):
        rows = {
            r["band"]: r
            for r in all_queries()["price_band_lookup_binned"]
            .fn(spark, SF)
            .collect()
        }
        li = (
            load_table(spark, SF, "lineitem")
            .select("l_extendedprice", "l_quantity")
            .collect()
        )
        expect = defaultdict(lambda: [0, 0, 0])  # n, qty, cents
        for r in li:
            for band, lo, hi in _PRICE_BANDS:
                if lo <= r["l_extendedprice"] <= hi:
                    e = expect[band]
                    e[0] += 1
                    e[1] += int(r["l_quantity"] + 0.5)
                    e[2] += int(r["l_extendedprice"] * 100 + 0.5)
        assert set(rows) == set(expect)
        for band, (n, qty, cents) in expect.items():
            got = rows[band]
            assert got["n_items"] == n
            assert got["sum_qty"] == qty
            assert got["revenue"] == pytest.approx(cents / 100.0, abs=0.011)

    def test_overlap_region_lands_in_both_bands(self, spark):
        # a price inside two overlapping bands must be counted by both —
        # sum(n_items) therefore exceeds the matched-row count
        rows = (
            all_queries()["price_band_lookup_binned"].fn(spark, SF).collect()
        )
        n_total = sum(r["n_items"] for r in rows)
        li = load_table(spark, SF, "lineitem")
        n_rows = li.filter(
            (F.col("l_extendedprice") >= _PRICE_BANDS[0][1])
            & (F.col("l_extendedprice") <= _PRICE_BANDS[-1][2])
        ).count()
        assert n_total > n_rows


class TestRangeJoinBinsFuse:
    """ADVICE r7: a wide range with a small bin_width must fail fast with
    a clear message, not OOM inside sequence()."""

    def test_oversized_range_raises_in_plan(self, spark):
        fact = spark.createDataFrame([(1, 5.0)], "id long, v double")
        ranges = spark.createDataFrame(
            [("wide", 0.0, 1e9)], "band string, lo double, hi double"
        )
        df = binned_range_join(
            fact, ranges, "v", "lo", "hi", 1.0, max_bins_per_range=1000
        )
        with pytest.raises(Exception, match="max_bins_per_range"):
            df.collect()

    def test_cap_exactly_at_boundary_passes(self, spark):
        fact = spark.createDataFrame([(1, 5.0)], "id long, v double")
        ranges = spark.createDataFrame(
            [("ok", 0.0, 999.0)], "band string, lo double, hi double"
        )
        got = binned_range_join(
            fact, ranges, "v", "lo", "hi", 1.0, max_bins_per_range=1000
        ).collect()
        assert [(r["id"], r["band"]) for r in got] == [(1, "ok")]

    def test_null_bounds_drop_and_do_not_trip_fuse(self, spark):
        # the documented contract: NULL lo/hi never match — and must not
        # fall into the fuse's raise_error branch (when-cond NULL routes
        # to otherwise -> sequence(NULL,..) -> NULL -> explode drops).
        # Pinned with constraint propagation DISABLED so the guarantee
        # is the operator's own, not a Catalyst isnotnull inference.
        fact = spark.createDataFrame([(1, 5.0)], "id long, v double")
        ranges = spark.createDataFrame(
            [("open", 0.0, None), ("anon", None, 10.0), ("ok", 4.0, 6.0)],
            "band string, lo double, hi double",
        )
        key = "spark.sql.constraintPropagation.enabled"
        old = spark.conf.get(key, None)
        try:
            spark.conf.set(key, "false")
            got = binned_range_join(
                fact, ranges, "v", "lo", "hi", 1.0, max_bins_per_range=100
            ).collect()
        finally:
            if old is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, old)
        assert [(r["id"], r["band"]) for r in got] == [(1, "ok")]

    def test_rejects_nonpositive_cap(self, spark):
        fact = spark.createDataFrame([(1, 5.0)], "id long, v double")
        ranges = spark.createDataFrame(
            [("x", 0.0, 1.0)], "band string, lo double, hi double"
        )
        with pytest.raises(ValueError):
            binned_range_join(
                fact, ranges, "v", "lo", "hi", 1.0, max_bins_per_range=0
            )


class TestGiniByNation:
    def test_matches_python_recompute(self, spark):
        rows = {
            r["n_name"]: r
            for r in all_queries()["order_value_gini_by_nation"]
            .fn(spark, SF)
            .collect()
        }
        o = load_table(spark, SF, "orders").select(
            "o_custkey", "o_totalprice"
        )
        c = load_table(spark, SF, "customer").select(
            "c_custkey", "c_nationkey"
        )
        n = load_table(spark, SF, "nation").select("n_nationkey", "n_name")
        joined = (
            o.join(c, o.o_custkey == c.c_custkey)
            .join(n, c.c_nationkey == n.n_nationkey)
            .select("n_name", "o_totalprice")
            .collect()
        )
        vals = defaultdict(list)
        for r in joined:
            vals[r["n_name"]].append(int(r["o_totalprice"] * 100 + 0.5))
        assert set(rows) == set(vals)
        for name, xs in vals.items():
            xs.sort()
            nn = len(xs)
            t = sum(xs)
            s = sum((i + 1) * x for i, x in enumerate(xs))
            gini = 2.0 * s / (nn * t) - (nn + 1.0) / nn
            got = rows[name]
            assert got["n_orders"] == nn
            assert got["total_value"] == pytest.approx(t / 100.0, abs=0.011)
            assert got["gini"] == pytest.approx(gini, abs=1e-6)
            assert 0.0 <= got["gini"] < 1.0

    def test_tie_heavy_input_exact(self, spark):
        # many duplicated values: the tie-collapsed rank-sum identity
        # must equal the row-by-row row_number() identity exactly
        import tempfile

        data = [(i, 1 + (i % 10), 100.0 * (1 + i % 3)) for i in range(200)]
        with tempfile.TemporaryDirectory() as d:
            spark.createDataFrame(
                data, "o_orderkey long, o_custkey long, o_totalprice double"
            ).write.parquet(f"{d}/orders.parquet")
            spark.createDataFrame(
                [(k, k % 2) for k in range(1, 11)],
                "c_custkey long, c_nationkey long",
            ).write.parquet(f"{d}/customer.parquet")
            spark.createDataFrame(
                [(0, "EVEN"), (1, "ODD")], "n_nationkey long, n_name string"
            ).write.parquet(f"{d}/nation.parquet")
            rows = {
                r["n_name"]: r
                for r in all_queries()["order_value_gini_by_nation"]
                .fn(spark, d)
                .collect()
            }
        for name in ("EVEN", "ODD"):
            xs = sorted(
                int(v * 100 + 0.5)
                for _, ck, v in data
                if ck % 2 == (0 if name == "EVEN" else 1)
            )
            nn, t = len(xs), sum(xs)
            s = sum((i + 1) * x for i, x in enumerate(xs))
            gini = 2.0 * s / (nn * t) - (nn + 1.0) / nn
            assert rows[name]["gini"] == pytest.approx(gini, abs=1e-6)


class TestHapaxTTR:
    def test_matches_python_recompute(self, spark):
        rows = {
            r["source"]: r
            for r in all_queries()["hapax_ttr_by_source"].fn(spark, SF).collect()
        }
        docs = load_table(spark, SF, "documents").select("source", "text").collect()
        counts: dict[str, Counter] = defaultdict(Counter)
        for r in docs:
            counts[r["source"]].update(t for t in r["text"].split(" ") if t)
        assert set(rows) == set(counts)
        for src, c in counts.items():
            n_tokens = sum(c.values())
            n_types = len(c)
            n_hapax = sum(1 for v in c.values() if v == 1)
            got = rows[src]
            assert got["n_tokens"] == n_tokens
            assert got["n_types"] == n_types
            assert got["n_hapax"] == n_hapax
            assert got["ttr"] == pytest.approx(n_types / n_tokens, abs=1e-6)
            assert got["hapax_frac"] == pytest.approx(
                n_hapax / n_types, abs=1e-6
            )

    def test_no_window_in_plan(self, spark):
        # the scale contract: aggregations only, never a window or join
        plan = _plan(all_queries()["hapax_ttr_by_source"].fn(spark, SF))
        assert "WindowExec" not in plan
        assert "Join" not in plan


class TestEventBurstinessFano:
    """Designed-r8 operator, registration deferred to the r10 gate — the
    oracle cross-check runs HERE (DuckDB on _FANO_ORACLE) so the evidence
    standard matches a driver row in the meantime."""

    def test_matches_duckdb_oracle_and_python_recompute(self, spark):
        import duckdb

        from drug_target_discovery_spark.queries.round8 import (
            _FANO_ORACLE,
            event_burstiness_fano,
        )

        got = {
            r["event_type"]: r
            for r in event_burstiness_fano(spark, SF).collect()
        }
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{SF}/events.parquet')"
        )
        exp = con.execute(_FANO_ORACLE).fetchall()
        assert len(got) == len(exp)
        for event_type, n_users, mean_f, min_f, max_f, n_over in exp:
            g = got[event_type]
            assert g["n_users"] == n_users
            assert g["mean_fano"] == pytest.approx(mean_f, abs=1e-9)
            assert g["min_fano"] == pytest.approx(min_f, abs=1e-9)
            assert g["max_fano"] == pytest.approx(max_f, abs=1e-9)
            assert g["n_overdispersed"] == n_over

        # independent python recompute of one type's mean Fano,
        # zero-days included via the global span
        ev = (
            load_table(spark, SF, "events")
            .select("user_id", "event_type", F.to_date("ts").alias("day"))
            .collect()
        )
        days = [r["day"] for r in ev]
        span = (max(days) - min(days)).days + 1
        per = defaultdict(Counter)  # (user, type) -> day counts
        for r in ev:
            per[(r["user_id"], r["event_type"])][r["day"]] += 1
        by_type = defaultdict(list)
        for (_, et), dc in per.items():
            s = sum(dc.values())
            q = sum(v * v for v in dc.values())
            fano = (span * q - s * s) / (span * s)
            by_type[et].append(int(fano * 1e9 + 0.5) / 1e9)
        for et, fs in by_type.items():
            assert got[et]["n_users"] == len(fs)
            assert got[et]["mean_fano"] == pytest.approx(
                sum(fs) / len(fs), abs=1e-6
            )

    def test_overdispersion_detects_bursty_synthetic_user(self, spark):
        # same total events, opposite burstiness -> Fano must separate them
        import tempfile

        from drug_target_discovery_spark.queries.round8 import (
            event_burstiness_fano,
        )

        rows = []
        eid = 0
        # user 1: 30 events on one day (burst); user 2: 1/day for 30 days
        for i in range(30):
            rows.append((eid, "2024-01-01 10:00:00", 1, "click", 0.0, "{}"))
            eid += 1
            rows.append(
                (eid, f"2024-01-{i + 1:02d} 10:00:00", 2, "click", 0.0, "{}")
            )
            eid += 1
        with tempfile.TemporaryDirectory() as d:
            spark.createDataFrame(
                rows,
                "event_id long, ts string, user_id long, event_type string,"
                " value double, props string",
            ).withColumn("ts", F.to_timestamp("ts")).write.parquet(
                f"{d}/events.parquet"
            )
            got = event_burstiness_fano(spark, d).collect()
        assert len(got) == 1
        r = got[0]
        assert r["n_users"] == 2
        # burst user: s=30, q=900, n=30 -> fano = (27000-900)/900 = 29
        assert r["max_fano"] == pytest.approx(29.0, abs=1e-6)
        # metronome user: s=30, q=30, n=30 -> fano = (900-900)/900 = 0
        assert r["min_fano"] == pytest.approx(0.0, abs=1e-6)
        assert r["n_overdispersed"] == 1


class TestLabelPropagationCommunities:
    """r10-deferred driver query: DuckDB oracle cross-check runs here
    (like fano) so the evidence standard matches a driver row."""

    @pytest.mark.parametrize("sf", [SF, "/root/testdata/sf0.01"])
    def test_matches_duckdb_oracle(self, spark, sf):
        import duckdb

        from drug_target_discovery_spark.queries.round8 import (
            _LPA_ORACLE,
            label_propagation_communities,
        )

        got = [
            (r["doc_id"], r["community"])
            for r in label_propagation_communities(spark, sf).collect()
        ]
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf}/documents.parquet')"
        )
        exp = con.execute(_LPA_ORACLE).fetchall()
        assert got == [(a, b) for a, b in exp]
        assert got, "fixture should contain candidate pairs"
        # LPA refines (or equals) the connected components partition
        from drug_target_discovery_spark.queries.registry import all_queries

        cc = {
            r["doc_id"]: r["component"]
            for r in all_queries()["connected_components_near_dups"]
            .fn(spark, sf)
            .collect()
        }
        comm_to_comp = {}
        for doc, comm in got:
            comp = cc[doc]
            assert comm_to_comp.setdefault(comm, comp) == comp, (
                "a community crossed a component boundary"
            )


class TestContainmentPrefilterConsistency:
    """ADVICE r7: the prefix-strategy size prefilter now uses the same
    float-division form as the verify filter, so a boundary pair can
    never be pruned by the prefilter yet pass verification."""

    def test_division_form_is_monotone_superset(self):
        # for every (k, s1, s2) with k <= s2: verify-accept implies
        # prefilter-accept under the division form — exhaustive over a
        # grid that includes exact float boundary cases
        for s1 in range(1, 40):
            for s2 in range(1, 40):
                for num, den in ((1, 2), (1, 3), (2, 3), (3, 10), (7, 10)):
                    t = num / den
                    for k in range(0, min(s1, s2) + 1):
                        if k * 1.0 / s1 >= t:  # verify accepts
                            assert s2 * 1.0 / s1 >= t, (k, s1, s2, t)
