"""Round-9 operator tests: the range-partitioned prefix sum and the Gini
escape-hatch twin it powers (VERDICT r8 #6 — the done-both-ways
discipline bh_fdr/bh_fdr_scalable established)."""

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from drug_target_discovery_spark.operators.prefixsum import (
    range_partitioned_prefix_sum,
)

SF = "/root/testdata/sf0.001"


class TestRangePartitionedPrefixSum:
    def _window_form(self, df, exclusive=True):
        upper = -1 if exclusive else 0
        w = (
            W.partitionBy("k")
            .orderBy("v")
            .rowsBetween(W.unboundedPreceding, upper)
        )
        return {
            (r["k"], r["v"]): int(r["ps"])
            for r in df.select(
                "k",
                "v",
                F.coalesce(F.sum("cnt").over(w), F.lit(0)).alias("ps"),
            ).collect()
        }

    @pytest.mark.parametrize("buckets", [1, 3, 16])
    @pytest.mark.parametrize("exclusive", [True, False])
    def test_equals_window_form(self, spark, buckets, exclusive):
        rows = [
            (k, float(v), (k + v) % 7 + 1)
            for k in range(3)
            for v in range(40)
        ]
        df = spark.createDataFrame(rows, "k int, v double, cnt long")
        got = {
            (r["k"], r["v"]): int(r["prefix_sum"])
            for r in range_partitioned_prefix_sum(
                df, ["k"], "v", "cnt", buckets=buckets, exclusive=exclusive
            ).collect()
        }
        assert got == self._window_form(df, exclusive)

    def test_preserves_rows_and_columns(self, spark):
        df = spark.createDataFrame(
            [(0, 1.0, 2, "x"), (0, 2.0, 3, "y")], "k int, v double, cnt long, extra string"
        )
        out = range_partitioned_prefix_sum(df, ["k"], "v", "cnt", buckets=4)
        assert out.count() == 2
        assert set(out.columns) == {"k", "v", "cnt", "extra", "prefix_sum"}

    def test_keyless_mode_equals_global_window(self, spark):
        """partition_cols=[] — the exact-global-rank mode the epoch
        shuffle uses — must equal the (scale-hostile) unpartitioned
        window form."""
        rows = [(float(v), v % 7 + 1) for v in range(300)]
        df = spark.createDataFrame(rows, "v double, cnt long")
        got = {
            r["v"]: int(r["prefix_sum"])
            for r in range_partitioned_prefix_sum(
                df, [], "v", "cnt", buckets=8
            ).collect()
        }
        w = W.orderBy("v").rowsBetween(W.unboundedPreceding, -1)
        exp = {
            r["v"]: int(r["ps"])
            for r in df.select(
                "v", F.coalesce(F.sum("cnt").over(w), F.lit(0)).alias("ps")
            ).collect()
        }
        assert got == exp

    @pytest.mark.parametrize("null_col", ["v", "cnt"])
    def test_null_order_or_value_raises(self, spark, null_col):
        """ADVICE r9: NULL order values used to misbucket silently into
        bucket 0 and NULL value groups crashed offset stitching with a
        driver TypeError; the precondition is now checked noisily."""
        rows = [(0, 1.0, 2), (0, None, 3)] if null_col == "v" else [
            (0, 1.0, 2), (0, 2.0, None)
        ]
        df = spark.createDataFrame(rows, "k int, v double, cnt long")
        with pytest.raises(ValueError, match="non-NULL"):
            range_partitioned_prefix_sum(df, ["k"], "v", "cnt", buckets=4)


@given(
    data=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),  # key
            st.integers(min_value=-100, max_value=100),  # value (deduped)
            st.integers(min_value=1, max_value=50),  # weight
        ),
        min_size=1,
        max_size=60,
    ),
    buckets=st.sampled_from([1, 2, 5, 13]),
)
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_prefix_sum_matches_bruteforce(spark, data, buckets):
    """Random (key, value, weight) grains — unique (key, value) per the
    operator precondition — exact agreement with the python brute force
    at several bucket counts including the degenerate single bucket."""
    grain = {}
    for k, v, c in data:
        grain[(k, v)] = c  # last write wins -> unique (k, v)
    rows = [(k, float(v), c) for (k, v), c in grain.items()]
    df = spark.createDataFrame(rows, "k int, v double, cnt long")
    got = {
        (r["k"], r["v"]): int(r["prefix_sum"])
        for r in range_partitioned_prefix_sum(
            df, ["k"], "v", "cnt", buckets=buckets
        ).collect()
    }
    exp = {}
    for k, v, c in rows:
        exp[(k, v)] = sum(
            c2 for (k2, v2), c2 in grain.items() if k2 == k and v2 < v
        )
    assert got == exp


class TestGiniScalableTwin:
    def test_exactly_equals_window_form_on_orders(self, spark):
        """The escape hatch must be value-identical to the registered
        window form on the real table — the equality that lets it take
        over at scale without re-oracling."""
        from drug_target_discovery_spark.queries.round8 import (
            order_value_gini_by_nation,
            order_value_gini_by_nation_scalable,
        )

        base = [tuple(r) for r in order_value_gini_by_nation(spark, SF).collect()]
        twin = [
            tuple(r)
            for r in order_value_gini_by_nation_scalable(spark, SF, buckets=8).collect()
        ]
        assert base == twin
        assert len(base) > 0

    def test_defeated_tie_grain_equality(self, spark):
        """Worst case for the window form: every value UNIQUE (cnt=1),
        so the tie-collapse buys nothing and the grain equals the row
        count. The prefix-sum form must still be exactly equal."""
        from drug_target_discovery_spark.queries.round8 import _gini_finish

        rows = [
            ("N%d" % (i % 5), 1000 + 7 * i + (i % 5), 1)
            for i in range(4000)
        ]
        g = spark.createDataFrame(rows, "n_name string, cents long, cnt long")
        w = (
            W.partitionBy("n_name")
            .orderBy("cents")
            .rowsBetween(W.unboundedPreceding, -1)
        )
        window_form = g.select(
            "n_name",
            "cents",
            "cnt",
            F.coalesce(F.sum("cnt").over(w), F.lit(0)).alias("below"),
        )
        prefix_form = range_partitioned_prefix_sum(
            g, ["n_name"], "cents", "cnt", out="below", buckets=16
        )
        assert sorted(map(tuple, _gini_finish(window_form).collect())) == sorted(
            map(tuple, _gini_finish(prefix_form).collect())
        )


def _python_dup_stats(docs, L):
    """Brute-force recompute: docs = [(doc_id, source, text)]."""
    from collections import Counter, defaultdict

    grams = Counter()
    for _, _, t in docs:
        for i in range(len(t) - L + 1):
            grams[t[i : i + L]] += 1
    per_doc = {}
    for did, _, t in docs:
        flagged = [
            i + 1  # 1-based like the SQL/Spark forms
            for i in range(len(t) - L + 1)
            if grams[t[i : i + L]] > 1
        ]
        covered = set()
        for i in flagged:
            covered.update(range(i, i + L))
        if covered:
            per_doc[did] = len(covered)
    out = {}
    by_src = defaultdict(list)
    for did, src, t in docs:
        by_src[src].append((did, len(t)))
    for src, members in by_src.items():
        dup = sum(per_doc.get(d, 0) for d, _ in members)
        tot = sum(ln for _, ln in members)
        out[src] = (
            len(members),
            sum(1 for d, _ in members if d in per_doc),
            dup,
            tot,
            round(dup / tot + 1e-12, 6) if tot else None,
        )
    return out


class TestExactSubstringDupStats:
    def test_hand_crafted_spans(self, spark, tmp_path):
        """Two docs sharing a 40-char passage + one doc with an internal
        repeat + one clean doc: known span arithmetic."""
        from drug_target_discovery_spark.queries.round9 import (
            exact_substring_dup_stats,
        )

        shared = "the quick brown fox jumps over the lazy dog wow"  # 48 chars
        rep = "abcdefghijklmnopqrstuvwxyz0123"  # 30 chars
        docs = [
            (0, "a", "PREFIX-ONE " + shared + " SUFFIX-ALPHA-000111222"),
            (1, "a", "PREFIX-TWO " + shared + " SUFFIX-BETA-33344455566"),
            (2, "b", rep + "-=-=-=-=-=-=" + rep + " unique tail here 42"),
            (3, "b", "completely unique text with no repeats at all 9876"),
        ]
        spark.createDataFrame(
            docs, "doc_id long, source string, text string"
        ).withColumn("lang", F.lit("en")).withColumn(
            "n_chars", F.length("text")
        ).write.parquet(f"{tmp_path}/documents.parquet")
        L = 25
        got = {
            r["source"]: (
                r["n_docs"],
                r["docs_with_dup"],
                r["dup_chars"],
                r["total_chars"],
                float(r["dup_share"]),
            )
            for r in exact_substring_dup_stats(
                spark, str(tmp_path), min_len=L
            ).collect()
        }
        exp = _python_dup_stats([(d, s, t) for d, s, t in docs], L)
        assert {k: v[:4] for k, v in got.items()} == {
            k: v[:4] for k, v in exp.items()
        }
        for k in exp:
            assert got[k][4] == pytest.approx(exp[k][4], abs=1e-6)
        # the shared passage must be flagged in both source-a docs
        assert got["a"][1] == 2
        # doc 2's internal repeat flags it; doc 3 stays clean
        assert got["b"][1] == 1

    @pytest.mark.parametrize(
        "sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    )
    def test_matches_duckdb_oracle(self, spark, sf):
        import duckdb

        from drug_target_discovery_spark.queries.round9 import (
            _EXACT_SUBSTR_ORACLE,
            exact_substring_dup_stats,
        )

        got = [tuple(r) for r in exact_substring_dup_stats(spark, sf).collect()]
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf}/documents.parquet')"
        )
        exp = [tuple(r) for r in con.execute(_EXACT_SUBSTR_ORACLE).fetchall()]
        assert [g[:4] for g in got] == [e[:4] for e in exp]
        assert [float(g[4]) for g in got] == pytest.approx(
            [float(e[4]) for e in exp], abs=1e-9
        )
        assert got, "corpus should have sources"

    @given(
        texts=st.lists(
            st.text(alphabet="ab", min_size=0, max_size=40),
            min_size=1,
            max_size=8,
        ),
        L=st.sampled_from([3, 5]),
    )
    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=[
            HealthCheck.too_slow,
            HealthCheck.function_scoped_fixture,
        ],
    )
    def test_matches_bruteforce_random(self, spark, tmp_path_factory, texts, L):
        """Tiny alphabet forces dense repeats — the interval-union edge
        cases (overlapping, nested, adjacent spans) all occur."""
        from drug_target_discovery_spark.queries.round9 import (
            exact_substring_dup_stats,
        )

        d = tmp_path_factory.mktemp("substr")
        docs = [(i, f"s{i % 2}", t) for i, t in enumerate(texts)]
        spark.createDataFrame(
            docs, "doc_id long, source string, text string"
        ).withColumn("lang", F.lit("x")).withColumn(
            "n_chars", F.length("text")
        ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
        got = {
            r["source"]: (
                r["n_docs"],
                r["docs_with_dup"],
                r["dup_chars"],
                r["total_chars"],
            )
            for r in exact_substring_dup_stats(spark, str(d), min_len=L).collect()
        }
        exp = {
            k: v[:4] for k, v in _python_dup_stats(docs, L).items()
        }
        assert got == exp


class TestIvfIndexRefreshAudit:
    @pytest.mark.parametrize(
        "sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    )
    def test_matches_duckdb_oracle(self, spark, sf):
        import duckdb

        from drug_target_discovery_spark.queries.round9 import (
            _IVF_REFRESH_ORACLE,
            ivf_index_refresh_audit,
        )

        got = [tuple(r) for r in ivf_index_refresh_audit(spark, sf).collect()]
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{sf}/embeddings.parquet')"
        )
        exp = [tuple(r) for r in con.execute(_IVF_REFRESH_ORACLE).fetchall()]
        assert got == exp
        assert len(got) > 1, "corpus should occupy multiple cells"
        # shares are distributions
        assert sum(r[3] for r in got) == pytest.approx(1.0, abs=1e-4)
        assert sum(r[4] for r in got) == pytest.approx(1.0, abs=1e-4)

    def test_skewed_batch_triggers_retrain(self, spark, tmp_path):
        """Base spread over cells, batch rammed into ONE cell: the PSI
        must cross 0.25 and flip retrain_needed on every row."""
        import random

        from drug_target_discovery_spark.queries.round9 import (
            ivf_index_refresh_audit,
        )

        rng = random.Random(7)
        rows = []
        for vid in range(200):
            if vid % 10 == 9:  # batch: all-positive first dims -> cell 7
                emb = [1.0, 1.0, 1.0, 0.0]
            else:  # base: random sign pattern
                emb = [rng.choice([-1.0, 1.0]) for _ in range(3)] + [0.0]
            rows.append((vid, emb, 0))
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ).write.parquet(f"{tmp_path}/embeddings.parquet")
        got = ivf_index_refresh_audit(spark, str(tmp_path)).collect()
        assert all(r["retrain_needed"] for r in got)
        cell7 = next(r for r in got if r["cell"] == 7)
        assert cell7["n_batch"] == 20
        assert cell7["occupancy_ratio"] > 4.0
        assert cell7["total_psi"] > 0.25

    def test_identical_distribution_no_retrain(self, spark, tmp_path):
        """Batch drawn from the same cell layout as the base: PSI ~ 0,
        no retrain."""
        from drug_target_discovery_spark.queries.round9 import (
            ivf_index_refresh_audit,
        )

        rows = []
        # one cell per DECADE of vec_ids: each decade holds 9 base + 1
        # batch vector in the same cell, so base and batch shares are
        # exactly proportional in every cell (PSI identically ~0).
        # (vid % 8 would interact with the %10 batch stripe via
        # lcm(8,10) and pile the batch into the odd cells.)
        signs = [
            [1.0 if c & b else -1.0 for b in (4, 2, 1)] + [0.5]
            for c in range(8)
        ]
        for vid in range(200):
            rows.append((vid, signs[(vid // 10) % 8], 0))
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ).write.parquet(f"{tmp_path}/embeddings.parquet")
        got = ivf_index_refresh_audit(spark, str(tmp_path)).collect()
        assert not any(r["retrain_needed"] for r in got)
        assert all(abs(float(r["total_psi"])) < 0.05 for r in got)


class TestContainmentPrefixBoundary:
    def test_exact_threshold_pair_survives_prefix_strategy(self, spark, tmp_path):
        """Round-9 regression (hypothesis-caught): C(A,B) EXACTLY 0.9 at
        |S(A)| = 10 — the old IEEE prefix length floor((1.0-t)*sz)+1
        computed 1 instead of 2, A probed with only its df=1 unique
        shingle, and the (A,B) directed pair silently missed the
        candidate set. The exact-integer DIV formula must catch it, and
        memo/prefix strategies must agree."""
        from drug_target_discovery_spark.queries.round6b import containment_pairs

        words = [f"w{k}" for k in range(12)]
        docs = [
            (0, " ".join(words)),          # A: 10 3-gram shingles
            (1, " ".join(words[:11])),     # B: A's first 9 shingles
        ]
        # filler so shared shingles stay under the 50%-df stop cap
        for i in range(2, 10):
            docs.append((i, " ".join(f"u{i}_{k}" for k in range(12))))
        spark.createDataFrame(docs, "doc_id long, text string").selectExpr(
            "doc_id",
            "text",
            "'en' AS lang",
            "'s' AS source",
            "length(text) AS n_chars",
        ).write.parquet(f"{tmp_path}/documents.parquet")

        got_prefix = {
            (r["d1"], r["d2"]): float(r["containment"])
            for r in containment_pairs(
                spark, str(tmp_path), t=0.9, strategy="prefix"
            ).collect()
        }
        got_memo = {
            (r["d1"], r["d2"]): float(r["containment"])
            for r in containment_pairs(
                spark, str(tmp_path), t=0.9, strategy="memo"
            ).collect()
        }
        assert (0, 1) in got_prefix, "exact-boundary pair dropped by prefix"
        assert got_prefix[(0, 1)] == pytest.approx(0.9)
        assert got_prefix[(1, 0)] == pytest.approx(1.0)
        assert got_prefix == got_memo


class TestLpaCommunityModularity:
    def test_matches_networkx_on_real_graph(self, spark):
        """networkx.community.modularity on the SAME edges + the SAME
        partition (Spark's LPA labels) — the graph family's library-
        oracle pattern. Independent Q arithmetic, exact to rounding."""
        import networkx as nx

        from drug_target_discovery_spark.graph.algorithms import (
            label_propagation,
        )
        from drug_target_discovery_spark.queries.dedup import candidate_pairs
        from drug_target_discovery_spark.queries.round8 import _LPA_ITERS
        from drug_target_discovery_spark.queries.round9 import (
            lpa_community_modularity,
        )

        sf = "/root/testdata/sf0.01"
        got = lpa_community_modularity(spark, sf).collect()[0]

        pairs = candidate_pairs(spark, sf)
        edge_list = sorted(
            {
                tuple(sorted((r["d1"], r["d2"])))
                for r in pairs.collect()
                if r["d1"] != r["d2"]
            }
        )
        edges = spark.createDataFrame(edge_list, "src long, dst long")
        labels = {
            r["node"]: r["community"]
            for r in label_propagation(edges, n_iter=_LPA_ITERS).collect()
        }
        g = nx.Graph(edge_list)
        comms = {}
        for n, c in labels.items():
            comms.setdefault(c, set()).add(n)
        q = nx.community.modularity(g, comms.values())
        assert got["n_edges"] == len(edge_list)
        assert got["n_nodes"] == g.number_of_nodes()
        assert got["n_communities"] == len(comms)
        assert float(got["modularity"]) == pytest.approx(q, abs=1e-6)
        assert got["n_edges"] > 0

    def test_two_cliques_known_q(self, spark, tmp_path):
        """Synthetic check of the Q arithmetic itself through the graph
        layer: two disjoint triangles -> LPA gives 2 communities, all
        edges intra, Q = 1 - 2*(1/2)^2 = 0.5."""
        import networkx as nx

        from drug_target_discovery_spark.graph.algorithms import (
            label_propagation,
        )

        edge_list = [(0, 1), (1, 2), (2, 0), (5, 6), (6, 7), (7, 5)]
        edges = spark.createDataFrame(edge_list, "src long, dst long")
        labels = {
            r["node"]: r["community"]
            for r in label_propagation(edges, n_iter=5).collect()
        }
        g = nx.Graph(edge_list)
        comms = {}
        for n, c in labels.items():
            comms.setdefault(c, set()).add(n)
        assert len(comms) == 2
        assert nx.community.modularity(g, comms.values()) == pytest.approx(0.5)


def test_prefix_sum_plan_has_no_single_partition_window(spark):
    """The operator's reason to exist: every window in its plan must be
    partitioned (by key + _pid bucket). A regression to an unpartitioned
    window would silently reintroduce the all-data-to-one-partition
    WindowExec the operator replaces."""
    df = spark.createDataFrame(
        [(k, float(v), 1) for k in range(2) for v in range(50)],
        "k int, v double, cnt long",
    )
    out = range_partitioned_prefix_sum(df, ["k"], "v", "cnt", buckets=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "_pid" in plan
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            # spec args before the first ASC/DESC marker are the
            # partition columns — there must be at least one
            assert "windowspecdefinition(v#" not in line.replace(" ", ""), (
                "window partitioned only by nothing/order col: " + line
            )
            assert "_pid" in line, "window lost its bucket partitioning: " + line


def _python_bpe(texts, k):
    """Exact recompute of the deterministic BPE merge rule."""
    from collections import Counter

    words = Counter()
    for t in texts:
        for w in t.split():
            if w:
                words[w] += 1
    vocab = {w: list(w) for w in words}
    merges = []
    for rank in range(1, k + 1):
        pc = Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += words[w]
        if not pc:
            break
        (l, r), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, l, r, l + r, n))
        for w, syms in vocab.items():
            out, pend = [], None
            for x in syms:
                if pend is None:
                    pend = x
                elif pend == l and x == r:
                    out.append(l + r)
                    pend = None
                else:
                    out.append(pend)
                    pend = x
            if pend is not None:
                out.append(pend)
            vocab[w] = out
    return merges


class TestBpeTopMerges:
    def test_hand_crafted_overlap_rule(self, spark, tmp_path):
        """'aaaa' x3 + 'ab': (a,a) wins; LEFT-TO-RIGHT non-overlap gives
        each 'aaaa' TWO (a,a) pairs merged to ['aa','aa'], so merge 2 is
        (aa,aa) — the case a string-replace or overlap-counting
        implementation gets wrong."""
        from drug_target_discovery_spark.queries.round9 import bpe_top_merges

        docs = [(0, "s", "aaaa aaaa aaaa ab")]
        spark.createDataFrame(
            docs, "doc_id long, source string, text string"
        ).selectExpr(
            "doc_id", "text", "'en' AS lang", "source", "length(text) AS n_chars"
        ).write.parquet(f"{tmp_path}/documents.parquet")
        got = [tuple(r) for r in bpe_top_merges(spark, str(tmp_path), k=3).collect()]
        exp = _python_bpe(["aaaa aaaa aaaa ab"], 3)
        assert got == exp
        assert got[0][1:3] == ("a", "a")  # 9 weighted (a,a) pairs... 3 words x 3
        assert got[1][1:3] == ("aa", "aa")

    @pytest.mark.parametrize(
        "sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    )
    def test_matches_python_recompute_on_corpus(self, spark, sf):
        import duckdb

        from drug_target_discovery_spark.queries.round9 import bpe_top_merges

        got = [tuple(r) for r in bpe_top_merges(spark, sf, k=8).collect()]
        texts = [
            r[0]
            for r in duckdb.connect()
            .execute(f"SELECT text FROM read_parquet('{sf}/documents.parquet')")
            .fetchall()
        ]
        exp = _python_bpe(texts, 8)
        assert got == exp
        assert len(got) == 8

    def test_backslash_and_quote_symbols(self, spark, tmp_path):
        """ADVICE r9 regression: a corpus whose winning merge pairs
        contain backslashes/quotes must work — the r9 expr-string fold
        spliced symbols into SQL text (escaping only single quotes) and
        died with ParseException on '\\a' words; the Column-API fold
        binds symbols as literals, so any byte is safe."""
        from drug_target_discovery_spark.queries.round9 import bpe_top_merges

        texts = ["\\a \\a \\a '' 'b 'b \"q\\' \\a"]
        spark.createDataFrame(
            [(0, "s", texts[0])], "doc_id long, source string, text string"
        ).selectExpr(
            "doc_id", "text", "'x' AS lang", "source", "length(text) AS n_chars"
        ).write.parquet(f"{tmp_path}/documents.parquet")
        got = [tuple(r) for r in bpe_top_merges(spark, str(tmp_path), k=4).collect()]
        exp = _python_bpe(texts, 4)
        assert got == exp
        assert got[0][1:3] == ("\\", "a")  # the backslash pair wins merge 1

    @given(
        texts=st.lists(
            st.text(alphabet="ab\\' ", min_size=0, max_size=30),
            min_size=1,
            max_size=6,
        ),
        k=st.sampled_from([1, 4]),
    )
    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=[
            HealthCheck.too_slow,
            HealthCheck.function_scoped_fixture,
        ],
    )
    def test_matches_bruteforce_random(self, spark, tmp_path_factory, texts, k):
        """Alphabet deliberately includes backslash and single-quote
        (ADVICE r9) so the symbol-binding path is fuzzed, not just the
        happy alphabet."""
        from drug_target_discovery_spark.queries.round9 import bpe_top_merges

        d = tmp_path_factory.mktemp("bpe")
        docs = [(i, "s", t) for i, t in enumerate(texts)]
        spark.createDataFrame(
            docs, "doc_id long, source string, text string"
        ).selectExpr(
            "doc_id", "text", "'x' AS lang", "source", "length(text) AS n_chars"
        ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
        got = [tuple(r) for r in bpe_top_merges(spark, str(d), k=k).collect()]
        assert got == _python_bpe(texts, k)


class TestSubstringTrivialDupValve:
    @pytest.mark.parametrize("cap", [2, 3, 100])
    def test_valve_equals_exact_form(self, spark, tmp_path, cap):
        """The heavily-duplicated valve must not change results on real
        high-df corpora (no hash collisions at test scale): cap=2 sends
        EVERY duplicated hash down the trivial path, cap=3 mixes both
        paths, cap=100 is effectively off."""
        from drug_target_discovery_spark.queries.round9 import (
            exact_substring_dup_stats,
        )

        shared = "the quick brown fox jumps over the lazy dog wow"
        docs = [(i, "a", f"DOC-{i:03d} " + shared + f" TAIL-{i:03d}") for i in range(6)]
        docs += [(9, "b", "a completely unique document with no repeats x")]
        spark.createDataFrame(
            docs, "doc_id long, source string, text string"
        ).selectExpr(
            "doc_id", "text", "'en' AS lang", "source", "length(text) AS n_chars"
        ).write.parquet(f"{tmp_path}/documents.parquet")
        exact = sorted(
            map(tuple, exact_substring_dup_stats(spark, str(tmp_path)).collect())
        )
        valved = sorted(
            map(
                tuple,
                exact_substring_dup_stats(
                    spark, str(tmp_path), trivial_dup_df=cap
                ).collect(),
            )
        )
        assert exact == valved

    def test_valve_equals_exact_on_corpus(self, spark):
        from drug_target_discovery_spark.queries.round9 import (
            exact_substring_dup_stats,
        )

        sf = "/root/testdata/sf0.01"
        exact = sorted(map(tuple, exact_substring_dup_stats(spark, sf).collect()))
        valved = sorted(
            map(
                tuple,
                exact_substring_dup_stats(spark, sf, trivial_dup_df=4).collect(),
            )
        )
        assert exact == valved


class TestWeightedMedianByKey:
    def test_matches_bruteforce_and_unweighted_median(self, spark):
        """Lower weighted median vs python brute force, including the
        unit-weight case where it must equal the classic lower median."""
        from drug_target_discovery_spark.operators.prefixsum import (
            weighted_median_by_key,
        )

        rows = [
            (k, float(v), (k * 7 + v * 3) % 5 + 1)
            for k in range(4)
            for v in range(1, 30)
        ]
        df = spark.createDataFrame(rows, "k int, v double, w long")
        got = {
            r["k"]: r["weighted_median"]
            for r in weighted_median_by_key(df, "k", "v", "w", buckets=6).collect()
        }

        def brute(items):
            total = sum(w for _, w in items)
            cum = 0
            for v, w in sorted(items):
                cum += w
                if 2 * cum >= total:
                    return v

        exp = {}
        for k in range(4):
            exp[k] = brute([(v, w) for kk, v, w in rows if kk == k])
        assert got == exp
        # unit weights -> classic lower median
        dfu = df.withColumn("w", F.lit(1))
        gotu = {
            r["k"]: r["weighted_median"]
            for r in weighted_median_by_key(dfu, "k", "v", "w", buckets=6).collect()
        }
        for k in range(4):
            vals = sorted(v for kk, v, _ in rows if kk == k)
            assert gotu[k] == vals[(len(vals) - 1) // 2]

    def test_fractional_weight_dtype_raises(self, spark):
        """ADVICE r9: fractional weights were silently rounded by the
        DECIMAL(38,0) accumulator — the dtype is now validated."""
        from drug_target_discovery_spark.operators.prefixsum import (
            weighted_median_by_key,
        )

        df = spark.createDataFrame(
            [(0, 1.0, 0.5), (0, 2.0, 1.5)], "k int, v double, w double"
        )
        with pytest.raises(ValueError, match="integral weight"):
            weighted_median_by_key(df, "k", "v", "w")
        # zero-scale decimal weights are integral and pass the guard
        dfd = df.withColumn("w", F.ceil("w").cast("decimal(10,0)"))
        assert weighted_median_by_key(dfd, "k", "v", "w").count() == 1

    def test_matches_duckdb_on_lineitem(self, spark):
        """Quantity-weighted median price per returnflag on the real
        table, vs DuckDB's brute-force cumulative formulation."""
        import duckdb

        from drug_target_discovery_spark.operators.prefixsum import (
            weighted_median_by_key,
        )
        from drug_target_discovery_spark.sources.tables import load_table

        sf = "/root/testdata/sf0.01"
        li = load_table(spark, sf, "lineitem").select(
            "l_returnflag",
            F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long").alias("cents"),
            F.floor(F.col("l_quantity") + 0.5).cast("long").alias("qty"),
        )
        got = {
            r["l_returnflag"]: int(r["weighted_median"])
            for r in weighted_median_by_key(
                li, "l_returnflag", "cents", "qty", buckets=32
            ).collect()
        }
        exp = dict(
            duckdb.connect()
            .execute(
                f"""
                WITH g AS (
                  SELECT l_returnflag AS k,
                         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v,
                         CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS HUGEINT) AS w
                  FROM read_parquet('{sf}/lineitem.parquet')
                  GROUP BY 1, 2
                ),
                c AS (
                  SELECT k, v, sum(w) OVER (PARTITION BY k ORDER BY v) AS cum,
                         sum(w) OVER (PARTITION BY k) AS tot
                  FROM g
                )
                SELECT k, CAST(min(v) AS BIGINT)
                FROM c WHERE 2 * cum >= tot GROUP BY k
                """
            )
            .fetchall()
        )
        assert got == exp
        assert len(got) == 3


def _python_bpe_encode_stats(docs, k):
    """Exact recompute: train k merges on the texts, encode every word,
    aggregate per-source stats with the engine's rnd() rounding."""
    import math

    merges = _python_bpe([t for _, t in docs], k)
    rules = [(l, r) for _, l, r, _, _ in merges]
    stats = {}
    for source, t in docs:
        for w in t.split():
            if not w:
                continue
            syms = list(w)
            for l, r in rules:
                out, pend = [], None
                for x in syms:
                    if pend is None:
                        pend = x
                    elif pend == l and x == r:
                        out.append(l + r)
                        pend = None
                    else:
                        out.append(pend)
                        pend = x
                if pend is not None:
                    out.append(pend)
                syms = out
            s = stats.setdefault(source, [0, 0, 0, set()])
            s[0] += 1
            s[1] += len(syms)
            s[2] += len(w)
            s[3].update(syms)

    def _rnd6(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    return [
        (
            source,
            nw,
            nt,
            nc,
            len(dt),
            _rnd6(nt / nw),
            _rnd6(nc / nt),
        )
        for source, (nw, nt, nc, dt) in sorted(stats.items())
    ]


class TestBpeEncodeStats:
    def test_hand_crafted(self, spark, tmp_path):
        """'aaaa' x3 + 'ab': after 3 merges 'aaaa'->['aaaa'] (via aa,
        then aa+aa) and 'ab'->['ab'] — fertility collapses to 1.0."""
        from drug_target_discovery_spark.queries.round9 import bpe_encode_stats

        docs = [(0, "s1", "aaaa aaaa aaaa ab"), (1, "s2", "aaaa ba")]
        spark.createDataFrame(
            docs, "doc_id long, source string, text string"
        ).selectExpr(
            "doc_id", "text", "'x' AS lang", "source", "length(text) AS n_chars"
        ).write.parquet(f"{tmp_path}/documents.parquet")
        got = [tuple(r) for r in bpe_encode_stats(spark, str(tmp_path), k=3).collect()]
        exp = _python_bpe_encode_stats(
            [("s1", "aaaa aaaa aaaa ab"), ("s2", "aaaa ba")], 3
        )
        assert got == exp

    @pytest.mark.parametrize(
        "sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    )
    def test_matches_python_recompute_on_corpus(self, spark, sf):
        import duckdb

        from drug_target_discovery_spark.queries.round9 import bpe_encode_stats

        got = [tuple(r) for r in bpe_encode_stats(spark, sf, k=8).collect()]
        docs = (
            duckdb.connect()
            .execute(
                f"SELECT source, text FROM read_parquet('{sf}/documents.parquet')"
            )
            .fetchall()
        )
        exp = _python_bpe_encode_stats(docs, 8)
        assert got == exp
        assert len(got) > 0

    @given(
        docs=st.lists(
            st.tuples(
                st.sampled_from(["s1", "s2"]),
                st.text(alphabet="ab\\' ", min_size=0, max_size=25),
            ),
            min_size=1,
            max_size=5,
        ),
        k=st.sampled_from([1, 3]),
    )
    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=[
            HealthCheck.too_slow,
            HealthCheck.function_scoped_fixture,
        ],
    )
    def test_matches_bruteforce_random(self, spark, tmp_path_factory, docs, k):
        from drug_target_discovery_spark.queries.round9 import bpe_encode_stats

        if not any(w for _, t in docs for w in t.split()):
            return  # empty corpus: no rows on either side, vacuous
        d = tmp_path_factory.mktemp("bpe_enc")
        rows = [(i, s, t) for i, (s, t) in enumerate(docs)]
        spark.createDataFrame(
            rows, "doc_id long, source string, text string"
        ).selectExpr(
            "doc_id", "text", "'x' AS lang", "source", "length(text) AS n_chars"
        ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
        got = [tuple(r) for r in bpe_encode_stats(spark, str(d), k=k).collect()]
        assert got == _python_bpe_encode_stats(docs, k)


class TestIvfDriftRetrain:
    @pytest.mark.parametrize(
        "sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    )
    def test_no_retrain_branch_matches_duckdb(self, spark, sf):
        """The committed corpus does not drift (batch stripe mirrors the
        base), so the executor must keep the sign-bit quantizer and
        return its occupied-cell census — pinned against the prepared
        DuckDB census oracle."""
        import duckdb

        from drug_target_discovery_spark.queries.round9 import (
            _IVF_RETRAIN_NORETRAIN_ORACLE,
            ivf_drift_retrain,
        )

        got = [tuple(r) for r in ivf_drift_retrain(spark, sf).collect()]
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{sf}/embeddings.parquet')"
        )
        exp = [
            tuple(r)
            for r in con.execute(_IVF_RETRAIN_NORETRAIN_ORACLE).fetchall()
        ]
        assert got == exp
        assert all(r[3] is False for r in got)
        assert all(r[2] is None for r in got)

    def test_retrain_branch_matches_numpy_lloyd(self, spark, tmp_path):
        """The skewed-batch fixture (audit's retrain trigger) must flip
        the executor into a fresh Lloyd model — pinned against the
        INDEPENDENT plain-numpy recompute (tools/gen_kmeans_oracle.py),
        the kmeans fixture evidence class."""
        import os
        import random
        import sys

        import numpy as np

        sys.path.insert(
            0,
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "tools",
            ),
        )
        from gen_kmeans_oracle import numpy_lloyd

        from drug_target_discovery_spark.queries.round9 import (
            _IVF_RETRAIN_ITERS,
            _IVF_RETRAIN_K,
            ivf_drift_retrain,
            ivf_index_refresh_audit,
        )

        rng = random.Random(7)
        rows = []
        for vid in range(200):
            if vid % 10 == 9:  # batch rammed into cell 7 -> PSI > 0.25
                emb = [1.0, 1.0, 1.0, 0.0]
            else:
                emb = [rng.choice([-1.0, 1.0]) for _ in range(3)] + [0.0]
            rows.append((vid, emb, 0))
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ).write.parquet(f"{tmp_path}/embeddings.parquet")

        audit = ivf_index_refresh_audit(spark, str(tmp_path)).collect()
        assert audit[0]["retrain_needed"]
        got = [tuple(r) for r in ivf_drift_retrain(spark, str(tmp_path)).collect()]
        assert all(r[3] is True for r in got)
        assert all(float(r[4]) == float(audit[0]["total_psi"]) for r in got)

        ids = np.array([r[0] for r in rows], dtype=np.int64)
        V = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
        V_int = np.floor(V * 1_000_000 + 0.5).astype(np.int64)
        exp_model, _ = numpy_lloyd(V_int, ids, _IVF_RETRAIN_K, _IVF_RETRAIN_ITERS)
        assert [(r[0], r[1], r[2]) for r in got] == [
            (j, n, norm) for j, n, norm in exp_model
        ]


class TestDeterministicEpochShuffle:
    @pytest.mark.parametrize(
        "sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    )
    def test_matches_duckdb_oracle(self, spark, sf):
        import duckdb

        from drug_target_discovery_spark.queries.round9 import (
            _EPOCH_SHUFFLE_ORACLE,
            deterministic_epoch_shuffle,
        )

        got = [tuple(r) for r in deterministic_epoch_shuffle(spark, sf).collect()]
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf}/documents.parquet')"
        )
        exp = [tuple(r) for r in con.execute(_EPOCH_SHUFFLE_ORACLE).fetchall()]
        assert got == exp
        # ranks are a dense permutation; round-robin shards balanced to <= 1
        n = len(got)
        assert sorted(r[1] for r in got) == list(range(n))
        from collections import Counter

        sizes = Counter(r[2] for r in got).values()
        assert max(sizes) - min(sizes) <= 1

    def test_seed_changes_permutation_deterministically(self, spark):
        from drug_target_discovery_spark.queries.round9 import (
            deterministic_epoch_shuffle,
        )

        sf = "/root/testdata/sf0.001"
        a1 = {r[0]: r[1] for r in deterministic_epoch_shuffle(spark, sf, seed="e1").collect()}
        a2 = {r[0]: r[1] for r in deterministic_epoch_shuffle(spark, sf, seed="e1").collect()}
        b = {r[0]: r[1] for r in deterministic_epoch_shuffle(spark, sf, seed="e2").collect()}
        assert a1 == a2  # same seed -> byte-identical manifest
        assert a1 != b  # new epoch seed -> a different permutation

    def test_matches_hashlib_bruteforce(self, spark, tmp_path):
        """Independent python recompute (hashlib md5, first 15 hex chars
        as the 60-bit key, ties by doc_id) — validates the conv/md5
        cross-engine idiom without DuckDB in the loop."""
        import hashlib

        from drug_target_discovery_spark.queries.round9 import (
            deterministic_epoch_shuffle,
        )

        ids = [3, 7, 11, 42, 100, 101, 102, 500_000_001]
        rows = [(i, f"t{i}", "x", "s", 1) for i in ids]
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars int"
        ).write.parquet(f"{tmp_path}/documents.parquet")
        got = [
            (r["doc_id"], r["shuffle_rank"])
            for r in deterministic_epoch_shuffle(
                spark, str(tmp_path), seed="zz", n_shards=3, buckets=4
            ).collect()
        ]
        keyed = sorted(
            (int(hashlib.md5(f"zz:{i}".encode()).hexdigest()[:15], 16), i)
            for i in ids
        )
        exp = [(i, rank) for rank, (_, i) in enumerate(keyed)]
        assert sorted(got) == sorted(exp)

    def test_negative_doc_id_fails_loudly(self, spark):
        """ADVICE r11: the (hash, doc_id) decimal pack reserves the low
        2^63 band for the doc_id tie-break; a negative doc_id would
        silently corrupt _hkey ordering. Must raise in-plan (the
        mixture_targets_and_ranked fuse, mirrored)."""
        import pytest

        from drug_target_discovery_spark.queries.round9 import epoch_shuffle_ranks

        docs = spark.createDataFrame([(5,), (-1,), (9,)], "doc_id long")
        with pytest.raises(Exception, match="doc_id -1 is negative"):
            epoch_shuffle_ranks(docs, seed="zz", buckets=2).collect()


def test_epoch_shuffle_plan_window_shape(spark):
    """The keyless rank's scale contract, pinned on the executed plan:
    the CORPUS-sized window must be partitioned by the _pid bucket
    (spec: windowspecdefinition(_pid, _hkey ASC ...)), and the only
    UNPARTITIONED window (spec starting with '_pid ASC' — _pid is its
    ORDER col, no partition cols) is the offsets stitch over the
    buckets-bounded totals table."""
    import re

    from drug_target_discovery_spark.queries.round9 import (
        deterministic_epoch_shuffle,
    )

    out = deterministic_epoch_shuffle(spark, SF, buckets=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    norm = plan.replace(" ", "")
    assert re.search(r"windowspecdefinition\(_pid#\d+L?,_hkey#\d+", norm), (
        "corpus-side rank window lost its _pid bucket partitioning"
    )
    unpartitioned = re.findall(r"windowspecdefinition\(_pid#\d+L?ASC", norm)
    assert len(unpartitioned) == 1, (
        f"expected exactly the bounded offsets window unpartitioned, "
        f"saw {len(unpartitioned)} in:\n{plan}"
    )
