"""Corpus-quality tier (queries/quality.py): n-gram builder semantics,
the winnowing guarantee, decontamination hit detection, and the plan
shapes that decide 100 TB behavior."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from drug_target_discovery_spark.queries.quality import word_grams
from drug_target_discovery_spark.queries.registry import all_queries

SF = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    q = all_queries()[name]
    return q.fn(spark, SF)._jdf.queryExecution().executedPlan().toString()


class TestWordGrams:
    def grams(self, spark, text: str, k: int) -> list:
        df = spark.createDataFrame([Row(text=text)]).select(
            word_grams(F.split("text", " "), k).alias("g")
        )
        return df.collect()[0]["g"]

    def test_basic_trigram(self, spark):
        assert self.grams(spark, "a b c d", 3) == ["a b c", "b c d"]

    def test_exact_length_doc(self, spark):
        assert self.grams(spark, "a b c", 3) == ["a b c"]

    def test_short_doc_is_empty_not_reversed(self, spark):
        # sequence(0, negative) descends — the guard must yield [] instead
        assert self.grams(spark, "a b", 3) == []

    def test_single_word(self, spark):
        assert self.grams(spark, "x", 2) == []


class TestDecontamination:
    def test_contaminated_doc_flagged(self, spark):
        rows = {
            r["doc_id"]: r
            for r in all_queries()["benchmark_decontamination"].fn(spark, SF).collect()
        }
        # benchmark docs (doc_id % 20 == 0) must not appear as train rows
        assert all(d % 20 != 0 for d in rows)
        # every row's invariants hold
        for r in rows.values():
            assert 0 <= r["n_hit"] <= r["n_grams"]
            assert r["is_contaminated"] == (1 if r["n_hit"] > 0 else 0)


class TestWinnowing:
    def test_shared_run_shares_fingerprint(self, spark):
        # Two docs sharing a ≥6-word run must share ≥1 selected fingerprint
        # (the winnowing guarantee for k=3 grams, window w=4: t = w+k-1 = 6).
        shared = "alpha beta gamma delta epsilon zeta"
        docs = spark.createDataFrame(
            [
                Row(doc_id=1, text=f"one two {shared} three four five six"),
                Row(doc_id=2, text=f"seven eight nine ten {shared} eleven"),
            ]
        )
        w = F.split("text", " ")
        grams = docs.select(
            "doc_id", F.posexplode(word_grams(w, 3)).alias("pos", "g")
        ).select(
            "doc_id",
            "pos",
            F.expr(
                "CAST(conv(substring(md5(g), 1, 15), 16, 10) AS BIGINT)"
            ).alias("h"),
        )
        keyed = grams.select(
            "doc_id",
            "pos",
            F.concat(
                F.lpad(F.col("h").cast("string"), 20, "0"),
                F.lit(":"),
                F.lpad(F.col("pos").cast("string"), 8, "0"),
            ).alias("k"),
        )
        from pyspark.sql import Window as W

        win = W.partitionBy("doc_id").orderBy("pos").rowsBetween(-3, 0)
        sel = (
            keyed.select("doc_id", "pos", F.min("k").over(win).alias("fp"))
            .filter(F.col("pos") >= 3)
            .select("doc_id", F.substring("fp", 1, 20).alias("hash"))
            .distinct()
        )
        by_doc = {
            r["doc_id"]: set()
            for r in sel.select("doc_id").distinct().collect()
        }
        for r in sel.collect():
            by_doc[r["doc_id"]].add(r["hash"])
        assert by_doc[1] & by_doc[2], "shared 6-word run must share a fingerprint"

    def test_density_bounds(self, spark):
        out = all_queries()["winnowing_fingerprints"].fn(spark, SF).collect()
        assert out
        for r in out:
            # winnowing selects ≥ 1 per window and ≤ all windows
            assert 0 < r["n_fingerprints"] <= r["n_windows"]


class TestQualityPlans:
    def test_decontamination_join_shape(self, spark):
        # The bench gram set is corpus-derived (grows with the corpus), so
        # the join must NOT force a broadcast — AQE picks broadcast at
        # runtime only when the bench side is genuinely small. The static
        # plan must be adaptive and must join on the md5 hash (only 8-byte
        # keys shuffle, never gram strings).
        plan = plan_of(spark, "benchmark_decontamination")
        assert "AdaptiveSparkPlan" in plan, plan
        assert "hg" in plan, plan
        q = all_queries()["benchmark_decontamination"]
        import inspect

        assert "F.broadcast" not in inspect.getsource(q.fn)

    def test_repetition_is_shuffle_minimal(self, spark):
        # map-side gram algebra + ONE aggregation exchange
        plan = plan_of(spark, "repeated_ngram_fraction")
        assert plan.count("Exchange") <= 2, plan  # partial/final agg pair

    def test_large_orders_never_shuffles_facts(self, spark):
        plan = plan_of(spark, "large_quantity_orders")
        assert "TakeOrderedAndProject" in plan, plan
        assert plan.count("BroadcastHashJoin") >= 2, plan
        assert "SortMergeJoin" not in plan, plan

    def test_small_lot_reuses_partkey_partitioning(self, spark):
        plan = plan_of(spark, "small_lot_revenue")
        assert "BroadcastHashJoin" in plan, plan  # part dim broadcast


class TestGopherFlags:
    def test_keep_rate_consistency(self, spark):
        out = all_queries()["gopher_quality_flags"].fn(spark, SF).collect()
        assert out
        for r in out:
            assert 0 <= r["n_keep"] <= r["n_docs"]
            assert abs(r["keep_rate"] - round(r["n_keep"] / r["n_docs"], 4)) < 1e-9
