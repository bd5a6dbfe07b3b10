"""Independent pandas/numpy recomputation for the temporal-embargo split
and the orders-vs-lineitem reconciliation audit (same rationale as
tests/test_drift.py: the DuckDB oracles mirror the SQL formulas, so an
independent derivation guards the formulas themselves), plus the
plan-shape contracts that decide their 100 TB behavior."""

import math

import numpy as np

from drug_target_discovery_spark.queries.registry import all_queries
from drug_target_discovery_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _plan(spark, name):
    q = all_queries()[name]
    return q.fn(spark, SF)._jdf.queryExecution().executedPlan().toString()


class TestTemporalEmbargo:
    def test_matches_pandas_recompute(self, spark):
        from drug_target_discovery_spark.queries.curation import (
            _EMB_GAP_DEN,
            _EMB_TRAIN_NUM,
        )

        out = {
            (r["split"], r["event_type"]): r
            for r in all_queries()["temporal_embargo_split"].fn(spark, SF).collect()
        }
        pdf = (
            load_table(spark, SF, "events")
            .select("ts", "event_type", "user_id", "value")
            .toPandas()
        )
        # floor epoch seconds (pandas int64 is nanos; // floors positives)
        s = pdf["ts"].astype("int64") // 10**9
        mn, mx = int(s.min()), int(s.max())
        train_end = mn + (_EMB_TRAIN_NUM * (mx - mn)) // 10
        emb_end = train_end + (mx - mn) // _EMB_GAP_DEN
        pdf["split"] = np.where(
            s <= train_end, "train", np.where(s <= emb_end, "embargo", "test")
        )
        grp = pdf.groupby(["split", "event_type"])
        exp = grp.agg(
            n_events=("user_id", "size"),
            n_users=("user_id", "nunique"),
            avg_value=("value", "mean"),
        )
        assert len(out) == len(exp)
        for (split, et), row in exp.iterrows():
            r = out[(split, et)]
            assert r["n_events"] == row["n_events"], (split, et)
            assert r["n_users"] == row["n_users"], (split, et)
            # rnd(., 6) is floor(x*1e6+0.5)/1e6
            assert r["avg_value"] == math.floor(row["avg_value"] * 1e6 + 0.5) / 1e6

    def test_all_three_splits_populated_and_ordered(self, spark):
        rows = all_queries()["temporal_embargo_split"].fn(spark, SF).collect()
        splits = {r["split"] for r in rows}
        # the sf events table spans ~30 days, so a 5% embargo holds events
        assert splits == {"train", "embargo", "test"}
        by = {}
        for r in rows:
            by.setdefault(r["split"], 0)
            by[r["split"]] += r["n_events"]
        # chronological 80/5/15 by SPAN, not by count — but train must
        # dominate and embargo must be the smallest slice
        assert by["train"] > by["test"] > 0
        assert 0 < by["embargo"] < by["test"]

    def test_plan_broadcasts_extent_and_scans_twice(self, spark):
        plan = _plan(spark, "temporal_embargo_split")
        # the 1-row min/max extent comes back as a broadcast, never a
        # shuffled join; the fact is scanned twice (extent + label pass),
        # the two-scan no-cached-fact contract
        assert "BroadcastExchange" in plan, plan
        assert plan.count("Scan parquet") == 2, plan
        # labeling is map-side: only the final (and distinct-rewrite)
        # aggregate exchanges remain
        assert plan.count("Exchange hashpartitioning") <= 2, plan


class TestReconciliation:
    def test_matches_pandas_recompute(self, spark):
        out = {
            r["status"]: r
            for r in all_queries()["order_lineitem_reconciliation"]
            .fn(spark, SF)
            .collect()
        }
        li = (
            load_table(spark, SF, "lineitem")
            .select("l_orderkey", "l_extendedprice", "l_discount", "l_tax")
            .toPandas()
        )
        orders = (
            load_table(spark, SF, "orders")
            .select("o_orderkey", "o_totalprice")
            .toPandas()
        )
        li["cents"] = np.floor(
            li["l_extendedprice"] * (1 - li["l_discount"]) * (1 + li["l_tax"]) * 100
            + 0.5
        ).astype("int64")
        line = li.groupby("l_orderkey")["cents"].sum().rename("line_cents")
        o = orders.set_index("o_orderkey")["o_totalprice"]
        o_cents = np.floor(o * 100 + 0.5).astype("int64").rename("o_cents")
        m = o_cents.to_frame().join(line, how="outer")
        diff = m["o_cents"].fillna(0) - m["line_cents"].fillna(0)
        status = np.where(
            m["line_cents"].isna(),
            "order_without_lines",
            np.where(
                m["o_cents"].isna(),
                "lines_without_order",
                np.where(diff == 0, "match", np.where(diff > 0, "overstated", "understated")),
            ),
        )
        exp = (
            m.assign(status=status, absd=diff.abs().astype("int64"))
            .groupby("status")
            .agg(n_orders=("absd", "size"), absd=("absd", "sum"), mx=("absd", "max"))
        )
        assert len(out) == len(exp)
        for st, row in exp.iterrows():
            r = out[st]
            assert r["n_orders"] == row["n_orders"], st
            assert r["abs_diff_cents"] == row["absd"], st
            assert r["max_abs_diff_cents"] == row["mx"], st

    def test_every_order_classified_exactly_once(self, spark):
        rows = all_queries()["order_lineitem_reconciliation"].fn(spark, SF).collect()
        n_orders = load_table(spark, SF, "orders").count()
        n_line_keys = (
            load_table(spark, SF, "lineitem").select("l_orderkey").distinct().count()
        )
        classified = sum(r["n_orders"] for r in rows)
        # full outer: every order key from either side appears exactly once
        both = n_orders + n_line_keys
        only_lines = sum(
            r["n_orders"] for r in rows if r["status"] == "lines_without_order"
        )
        only_orders = sum(
            r["n_orders"] for r in rows if r["status"] == "order_without_lines"
        )
        assert classified == both - (classified - only_lines - only_orders)

    def test_plan_full_outer_sort_merge_no_broadcast(self, spark):
        plan = _plan(spark, "order_lineitem_reconciliation")
        # both sides are corpus-proportional: the reconciliation join must
        # be a co-partitioned sort-merge full outer, never a broadcast
        assert "FullOuter" in plan, plan
        assert "BroadcastExchange" not in plan, plan
        # detail pre-aggregate is two-phase (map-side partial before the
        # keyed shuffle)
        assert "partial" in plan.lower(), plan


class TestSnapshotDiff:
    def test_matches_pandas_recompute(self, spark):
        from drug_target_discovery_spark.queries.relational import (
            _DIFF_BUMP,
            _DIFF_BUMP_CENTS,
            _DIFF_CLONE,
            _DIFF_DROP,
            _DIFF_KEY_SHIFT,
        )

        out = {
            r["change_type"]: r
            for r in all_queries()["snapshot_diff_changeset"].fn(spark, SF).collect()
        }
        cust = (
            load_table(spark, SF, "customer")
            .select("c_custkey", "c_acctbal")
            .toPandas()
        )
        keys = cust["c_custkey"]
        cents = np.floor(cust["c_acctbal"] * 100 + 0.5).astype("int64")
        old = dict(zip(keys, cents))
        new = {}
        for k, c in old.items():
            if k % _DIFF_DROP != 0:
                new[k] = c + _DIFF_BUMP_CENTS if k % _DIFF_BUMP == 0 else c
            if k % _DIFF_CLONE == 0:
                new[k + _DIFF_KEY_SHIFT] = c
        added = set(new) - set(old)
        removed = set(old) - set(new)
        common = set(old) & set(new)
        changed = {k for k in common if old[k] != new[k]}
        unchanged = common - changed
        assert out["added"]["n_rows"] == len(added)
        assert out["removed"]["n_rows"] == len(removed)
        assert out["changed"]["n_rows"] == len(changed)
        assert out["unchanged"]["n_rows"] == len(unchanged)
        assert out["changed"]["cents_delta"] == sum(
            abs(new[k] - old[k]) for k in changed
        )
        # the synthetic refresh only bumps balances, never names, so every
        # changed row's delta is exactly the bump
        assert out["changed"]["cents_delta"] == len(changed) * _DIFF_BUMP_CENTS
        for ct in ("added", "removed", "unchanged"):
            assert out[ct]["cents_delta"] == 0

    def test_plan_digest_only_shuffle_full_outer(self, spark):
        plan = _plan(spark, "snapshot_diff_changeset")
        # one co-partitioned full-outer comparison join, never a broadcast
        # (both snapshots are corpus-proportional)
        assert "FullOuter" in plan, plan
        assert "BroadcastExchange" not in plan, plan
        # the wide row never shuffles: the md5 fingerprint is computed
        # map-side BELOW each keyed exchange (in tree text, children print
        # after parents, so every md5 Project must appear after the join
        # line), and the join matches on the bare key
        assert plan.count("md5(") >= 2, plan
        assert plan.index("SortMergeJoin") < plan.index("md5("), plan
        # exactly the three keyed exchanges: two snapshot sides + the
        # bounded 4-row rollup
        assert plan.count("Exchange hashpartitioning") == 3, plan


class TestSkewProfile:
    def test_matches_pandas_recompute(self, spark):
        rows = all_queries()["join_key_skew_profile"].fn(spark, SF).collect()
        li = load_table(spark, SF, "lineitem").select("l_partkey").toPandas()
        counts = li["l_partkey"].value_counts()
        n_keys, n_rows, mx = len(counts), int(counts.sum()), int(counts.max())
        # expected top-5: count desc, key asc tie-break
        exp = sorted(
            counts.items(), key=lambda kv: (-kv[1], kv[0])
        )[:5]
        assert len(rows) == 5
        for r, (k, n) in zip(rows, exp):
            assert r["key"] == k and r["n_rows_key"] == n
            assert r["n_keys"] == n_keys and r["n_rows"] == n_rows
            assert abs(r["key_skew"] - n * n_keys / n_rows) < 1e-6
            assert abs(r["max_skew"] - mx * n_keys / n_rows) < 1e-6
        # the heaviest key's skew IS the max skew
        assert rows[0]["key_skew"] == rows[0]["max_skew"]

    def test_plan_take_ordered_single_fact_exchange(self, spark):
        plan = _plan(spark, "join_key_skew_profile")
        # top-5 is a true top-k, never a global sort of the key table
        assert "TakeOrderedAndProject" in plan, plan
        # the 1-row summary broadcasts; the fact shuffles once on the key
        assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan, plan
        assert "partial" in plan.lower(), plan
