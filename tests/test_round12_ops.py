"""Round-12 tests-only-lane operators: the BPE trainer's production
scale forms (exact batched distributed training; threshold-gated
driver-local training) — VERDICT r11 #5. Every test pins VALUE EQUALITY
against the sequential trainer and/or the independent python oracle
(tools/lane_check._python_bpe), the bpe_top_merges evidence class."""

import random

import pytest

SFS = ["/root/testdata/sf0.001"]


def _oracle(texts, k):
    from tools.lane_check import _python_bpe

    return [tuple(m) for m in _python_bpe(texts, k)]


def _docs_df(spark, texts):
    rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


class TestBpeScaleForms:
    @pytest.mark.parametrize("sf", SFS)
    def test_three_forms_equal(self, spark, sf):
        """sequential == batched == local at k=30 on the real corpus
        (k chosen past the k=15 analysis cliff the lineage cut removed,
        and large enough that the batched form uses many rounds)."""
        from drug_target_discovery_spark.queries.round9 import bpe_top_merges
        from drug_target_discovery_spark.queries.round12 import (
            bpe_top_merges_batched,
            bpe_top_merges_local,
        )

        seq = [tuple(r) for r in bpe_top_merges(spark, sf, k=30).collect()]
        stats = {}
        bat = [
            tuple(r)
            for r in bpe_top_merges_batched(spark, sf, k=30, stats=stats).collect()
        ]
        loc = [tuple(r) for r in bpe_top_merges_local(spark, sf, k=30).collect()]
        assert seq == bat == loc
        assert len(seq) == 30
        # batching must actually batch (strictly fewer driver rounds
        # than merges) while staying exact
        assert 1 <= stats["rounds"] < 30
        assert sum(stats["batch_sizes"]) == 30

    @pytest.mark.parametrize("sf", SFS)
    def test_local_matches_python_oracle_at_k200(self, spark, sf):
        """The local trainer at production-ish k: 200 merges must equal
        the naive python recompute exactly (the incremental heap and the
        full recount implement the same deterministic rule)."""
        import duckdb

        from drug_target_discovery_spark.queries.round12 import (
            bpe_top_merges_local,
        )

        con = duckdb.connect()
        texts = [
            t[0]
            for t in con.execute(
                f"SELECT text FROM read_parquet('{sf}/documents.parquet')"
            ).fetchall()
        ]
        got = [tuple(r) for r in bpe_top_merges_local(spark, sf, k=200).collect()]
        assert got == _oracle(texts, 200)

    @pytest.mark.parametrize("sf", SFS)
    def test_batched_matches_python_oracle_at_k60(self, spark, sf):
        import duckdb

        from drug_target_discovery_spark.queries.round12 import (
            bpe_top_merges_batched,
        )

        con = duckdb.connect()
        texts = [
            t[0]
            for t in con.execute(
                f"SELECT text FROM read_parquet('{sf}/documents.parquet')"
            ).fetchall()
        ]
        got = [tuple(r) for r in bpe_top_merges_batched(spark, sf, k=60).collect()]
        assert got == _oracle(texts, 60)

    def test_adversarial_fixtures(self, spark):
        """The batch-safety edge cases, each a corpus engineered to
        trip a wrong batching rule:

        - overlap: "a a a" — non-overlapping application + l==r
          self-sharer bound (created (aa,aa) is bounded only by (a,a)
          itself, so the batch must END after an l==r take);
        - ties: equal counts resolved lexicographically;
        - shadow: the second-ranked pair shares a symbol with the top
          pair, so the batch must end at size 1 and the next round must
          see the DECREASED count;
        - collision: a merge creates a token string that already exists
          as a vocab symbol (inflating that symbol's pair counts) — the
          collision cut must end the batch."""
        corpora = {
            "overlap": ["a a a a a", "a a a", "b c b c"],
            "ties": ["x y", "y x", "p q", "q p"],
            "shadow": ["x a b " * 50 + "c d " * 30, "a b " * 10],
            "collision": ["ab x ab x", "a b c a b c", "ab ab ab"],
        }
        for name, texts in corpora.items():
            self._assert_all_forms_equal(spark, texts, k=8, label=name)

    def test_randomized_corpora_all_forms_equal(self, spark):
        """Deterministic fuzz (fixed seed): random small-alphabet
        corpora hit tie/overlap/collision interactions no hand fixture
        anticipates; all forms must equal the python oracle."""
        rng = random.Random(12)
        for trial in range(6):
            texts = [
                " ".join(
                    "".join(rng.choice("abc") for _ in range(rng.randint(1, 6)))
                    for _ in range(rng.randint(1, 8))
                )
                for _ in range(rng.randint(2, 6))
            ]
            self._assert_all_forms_equal(spark, texts, k=10, label=f"trial{trial}")

    def _assert_all_forms_equal(self, spark, texts, k, label):
        from drug_target_discovery_spark.queries.round9 import bpe_top_merges
        from drug_target_discovery_spark.queries.round12 import (
            bpe_top_merges_batched,
            bpe_top_merges_local,
        )

        docs = _docs_df(spark, texts)
        exp = _oracle(texts, k)
        seq = [tuple(r) for r in bpe_top_merges(spark, "", k=k, docs=docs).collect()]
        bat = [
            tuple(r)
            for r in bpe_top_merges_batched(spark, "", k=k, docs=docs).collect()
        ]
        loc = [
            tuple(r)
            for r in bpe_top_merges_local(spark, "", k=k, docs=docs).collect()
        ]
        assert seq == exp, f"{label}: sequential != python oracle"
        assert bat == exp, f"{label}: batched != python oracle"
        assert loc == exp, f"{label}: local != python oracle"

    def test_safe_batch_rule_hypothesis(self):
        """Property-based verification of the _safe_batch exactness
        argument WITHOUT Spark: a pure-python driver-loop simulator that
        reuses the ENGINE's _safe_batch (and the collision-cut rule,
        mirrored exactly) must reproduce naive sequential BPE on
        hundreds of random corpora. m is drawn SMALL (down to 2) to
        stress the top-M truncation bound n_m, and the alphabet is tiny
        so ties, overlaps (l==r), and token collisions are dense."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from drug_target_discovery_spark.queries.round12 import _safe_batch
        from tools.lane_check import _python_bpe

        class _Row(dict):  # _safe_batch reads rows like pyspark Rows
            def __getitem__(self, k):
                return dict.__getitem__(self, k)

        def batched_sim(texts, k, m):
            """The Spark driver loop, word-count-table semantics, in
            pure python: per round one full pair count, top-M rank
            collect, _safe_batch, collision cut against the CURRENT
            vocab symbols, then apply the batch in order."""
            from collections import Counter

            words = Counter()
            for t in texts:
                for w in t.split():
                    if w:
                        words[w] += 1
            vocab = {w: list(w) for w in words}

            def apply_one(syms, le, ri):
                out, pend = [], None
                for x in syms:
                    if pend is None:
                        pend = x
                    elif pend == le and x == ri:
                        out.append(le + ri)
                        pend = None
                    else:
                        out.append(pend)
                        pend = x
                if pend is not None:
                    out.append(pend)
                return out

            merges = []
            while len(merges) < k:
                pc = Counter()
                for w, syms in vocab.items():
                    for p in zip(syms, syms[1:]):
                        pc[p] += words[w]
                rows = [
                    _Row(l=l, r=r, n=n)
                    for (l, r), n in sorted(
                        pc.items(), key=lambda kv: (-kv[1], kv[0])
                    )[:m]
                    if n > 0
                ]
                batch = _safe_batch(rows, m)[: k - len(merges)]
                if not batch:
                    break
                symbols = {s for syms in vocab.values() for s in syms}
                colliding = {l + r for (l, r, _) in batch} & symbols
                if colliding:
                    cut = next(
                        i for i, (l, r, _) in enumerate(batch) if l + r in colliding
                    )
                    batch = batch[: cut + 1]
                base = len(merges)
                merges.extend(
                    (base + i + 1, l, r, l + r, n)
                    for i, (l, r, n) in enumerate(batch)
                )
                for l, r, _ in batch:
                    for w in vocab:
                        vocab[w] = apply_one(vocab[w], l, r)
            return merges

        word = st.text(alphabet="ab", min_size=1, max_size=6)
        corpus = st.lists(
            st.lists(word, min_size=1, max_size=6).map(" ".join),
            min_size=1,
            max_size=5,
        )

        @settings(max_examples=300, deadline=None)
        @given(texts=corpus, k=st.integers(1, 15), m=st.integers(2, 8))
        def check(texts, k, m):
            assert batched_sim(texts, k, m) == _python_bpe(texts, k)[:k]

        check()

    def test_local_bpe_hypothesis(self):
        """_local_bpe (the incremental-heap trainer core) vs the naive
        recompute, pure python, dense tie/overlap space."""
        from collections import Counter

        from hypothesis import given, settings
        from hypothesis import strategies as st

        from drug_target_discovery_spark.queries.round12 import _local_bpe
        from tools.lane_check import _python_bpe

        word = st.text(alphabet="abc", min_size=1, max_size=7)
        corpus = st.lists(
            st.lists(word, min_size=1, max_size=8).map(" ".join),
            min_size=1,
            max_size=6,
        )

        @settings(max_examples=300, deadline=None)
        @given(texts=corpus, k=st.integers(1, 20))
        def check(texts, k):
            words = Counter()
            for t in texts:
                for w in t.split():
                    if w:
                        words[w] += 1
            got = _local_bpe(sorted(words.items()), k)
            assert got == _python_bpe(texts, k)

        check()

    def test_local_vocab_ceiling_valve(self, spark, monkeypatch):
        """Over the distinct-word ceiling the local trainer must refuse
        (the collect is the wrong tool) and name the distributed
        fallback — WITHOUT shipping the vocabulary to the driver first
        (VERDICT r12 #5: the gate is a one-long count(), so collect()
        must never run on the over-ceiling path)."""
        from pyspark.sql import DataFrame

        from drug_target_discovery_spark.queries.round12 import (
            bpe_top_merges_local,
        )

        collects = []
        real_collect = DataFrame.collect
        monkeypatch.setattr(
            DataFrame,
            "collect",
            lambda self: collects.append(1) or real_collect(self),
        )
        docs = _docs_df(spark, ["aa bb cc dd ee"])
        with pytest.raises(ValueError, match="bpe_top_merges_batched"):
            bpe_top_merges_local(spark, "", k=3, docs=docs, max_vocab_rows=2)
        assert collects == [], "over-ceiling path must not run collect()"

    def test_safe_batch_dual_creator_cut(self):
        """ADVICE r12 proof-gap regression: two symbol-disjoint pairs
        creating the SAME merged token string ('aa'+'b' and 'a'+'ab'
        both create 'aab') must NOT share a batch — the created pairs'
        counts could sum across the two creations, under-bounded by the
        max-based S. The batch must end before the second creator."""
        from drug_target_discovery_spark.queries.round12 import _safe_batch

        rows = [
            {"l": "aa", "r": "b", "n": 100},
            {"l": "a", "r": "ab", "n": 90},
            {"l": "x", "r": "y", "n": 50},
        ]
        assert _safe_batch(rows, m=1024) == [("aa", "b", 100)]

    def test_empty_corpus(self, spark):
        from drug_target_discovery_spark.queries.round12 import (
            bpe_top_merges_batched,
            bpe_top_merges_local,
        )

        docs = _docs_df(spark, []).filter("doc_id IS NOT NULL")
        for fn in (bpe_top_merges_batched, bpe_top_merges_local):
            out = fn(spark, "", k=5, docs=docs)
            assert out.collect() == []
            assert [f.name for f in out.schema.fields] == [
                "merge_rank",
                "left",
                "right",
                "merged",
                "pair_count",
            ]

    def test_single_char_words_no_pairs(self, spark):
        """Words of length 1 yield no adjacent pairs: all forms return
        empty (the sequential trainer's n <= 0 stop)."""
        from drug_target_discovery_spark.queries.round12 import (
            bpe_top_merges_batched,
            bpe_top_merges_local,
        )

        docs = _docs_df(spark, ["a b c", "a a b"])
        for fn in (bpe_top_merges_batched, bpe_top_merges_local):
            assert fn(spark, "", k=4, docs=docs).collect() == []


class TestBpeEncodeScaled:
    @pytest.mark.parametrize("k", [8, 30])
    def test_equals_fold_chain_form(self, spark, k):
        """Identical output to round9.bpe_encode_stats wherever the fold
        chain is still legal (k under the analyzer cap)."""
        from drug_target_discovery_spark.queries.round9 import bpe_encode_stats
        from drug_target_discovery_spark.queries.round12 import (
            bpe_encode_stats_scaled,
        )

        sf = "/root/testdata/sf0.001"
        a = [tuple(r) for r in bpe_encode_stats(spark, sf, k=k).collect()]
        b = [tuple(r) for r in bpe_encode_stats_scaled(spark, sf, k=k).collect()]
        assert a == b and len(a) >= 1

    def test_large_k_past_fold_cap(self, spark, tmp_path):
        """k=300 with >100 learnable merges — the regime where the
        fold-chain form aborts in the analyzer and only the scaled
        encoder can apply the tokenizer — against the independent python
        recompute. (The shipped synthetic corpus exhausts at 89 merges,
        so this builds a numeric-words corpus rich enough to train past
        the cap.)"""
        from drug_target_discovery_spark.queries.round12 import (
            bpe_encode_stats_scaled,
        )
        from tools.lane_check import _encode, _python_bpe, _rnd6

        docs = [
            (f"s{j}", " ".join(str(i) for i in range(j * 100, j * 100 + 100)))
            for j in range(5)
        ]
        rows = [
            (j, text, "en", src, len(text)) for j, (src, text) in enumerate(docs)
        ]
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).write.parquet(str(tmp_path / "documents.parquet"))
        rules = [
            (le, ri) for _, le, ri, _, _ in _python_bpe([t for _, t in docs], 300)
        ]
        assert len(rules) > 100  # genuinely past the fold-chain cap
        got = [
            tuple(r)
            for r in bpe_encode_stats_scaled(spark, str(tmp_path), k=300).collect()
        ]
        stats = {}
        for source, t in docs:
            for w in t.split():
                if not w:
                    continue
                syms = _encode(w, rules)
                s = stats.setdefault(source, [0, 0, 0, set()])
                s[0] += 1
                s[1] += len(syms)
                s[2] += len(w)
                s[3].update(syms)
        exp = [
            (src, nw, nt, nc, len(dt), _rnd6(nt / nw), _rnd6(nc / nt))
            for src, (nw, nt, nc, dt) in sorted(stats.items())
        ]
        assert got == exp

    def test_encode_words_index_semantics(self):
        """_encode_words == per-word rank-order fold application on
        adversarial words (created-pair reuse, destroyed-pair staleness,
        overlap), including a merge whose pair only EXISTS because an
        earlier merge created it."""
        from drug_target_discovery_spark.queries.round12 import _encode_words
        from tools.lane_check import _encode

        merges = [("a", "b"), ("ab", "c"), ("c", "d"), ("ab", "cd"), ("x", "x")]
        words = ["abc", "abcd", "xxxx", "cdab", "aabbcc", ""]
        got = _encode_words(words, merges)
        exp = [_encode(w, merges) for w in words]
        assert got == exp


class TestUrlCanonicalDedup:
    SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

    @pytest.mark.parametrize("sf", SFS)
    def test_matches_duckdb_oracle(self, spark, sf):
        import duckdb

        from drug_target_discovery_spark.queries.round12 import (
            _URL_DEDUP_ORACLE,
            url_canonical_dedup,
        )

        got = [tuple(r) for r in url_canonical_dedup(spark, sf).collect()]
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf}/documents.parquet')"
        )
        exp = [tuple(r) for r in con.execute(_URL_DEDUP_ORACLE).fetchall()]
        assert got == exp
        assert len(got) >= 1
        for _, n_docs, n_raw, _rep in got:
            assert n_docs > 1 and 1 <= n_raw <= n_docs

    def test_canonicalization_cases(self, spark):
        """The normalize rules one by one, Spark expression vs the
        DuckDB twin on adversarial raw URLs (no table — VALUES both
        sides), plus the expected canonical string."""
        import duckdb

        from pyspark.sql import functions as F

        from drug_target_discovery_spark.queries.round12 import (
            _CANON_URL_DUCK_CTES,
            canonical_url_col,
        )

        cases = [
            # scheme / case / www / port equivalence
            ("HTTP://WWW.Ex.COM:80/A/b", "ex.com/A/b"),
            ("https://ex.com:443/A/b", "ex.com/A/b"),
            ("ftp://ex.com/x", "ex.com/x"),
            # trailing slash, fragment
            ("http://ex.com/x/", "ex.com/x"),
            ("http://ex.com/x#frag?notaquery", "ex.com/x"),
            # query sort + tracking drop; empty query collapses
            ("http://ex.com/x?b=2&a=1", "ex.com/x?a=1&b=2"),
            ("http://ex.com/x?utm_source=s&a=1&fbclid=z", "ex.com/x?a=1"),
            ("http://ex.com/x?utm_source=s", "ex.com/x"),
            ("http://ex.com/x?ref=home&gclid=1", "ex.com/x"),
            # path case preserved; host-only lowering
            ("http://Ex.COM/CaseSensitive", "ex.com/CaseSensitive"),
            # no path, no scheme, multiple '?'
            ("ex.com", "ex.com"),
            ("http://ex.com?a=1", "ex.com?a=1"),
            ("http://ex.com/x?a=1?b=2", "ex.com/x?a=1?b=2"),
            # www-only host must not strip to empty-like forms
            ("http://www.ex.com", "ex.com"),
            # port not at host position is untouched (path keeps it)
            ("http://ex.com/p:80", "ex.com/p:80"),
        ]
        sdf = spark.createDataFrame([(u,) for u, _ in cases], "url string")
        got = [
            r["c"]
            for r in sdf.select(canonical_url_col(F.col("url")).alias("c"))
            .collect()
        ]
        assert got == [c for _, c in cases], "spark canon != expected"
        vals = ", ".join(f"({i}, '{u}')" for i, (u, _) in enumerate(cases))
        sql = (
            f"WITH raw(i, url) AS (VALUES {vals}), "
            + _CANON_URL_DUCK_CTES.format(src="raw")
            + " SELECT canon_url FROM canon ORDER BY i"
        )
        duck = [r[0] for r in duckdb.connect().execute(sql).fetchall()]
        assert duck == [c for _, c in cases], "duckdb canon != expected"

    def test_representative_is_quality_argmax(self, spark):
        """rep_doc_id = largest n_chars, ties to smallest doc_id."""
        from drug_target_discovery_spark.queries.round12 import (
            url_canonical_dedup,
        )

        rows = [
            (1, "http://a.com/x", 10),
            (2, "https://a.com/x/", 90),
            (3, "http://WWW.A.com/x#f", 90),
            (7, "http://b.com/y?b=1&a=1", 5),
            (8, "http://b.com/y?a=1&b=1&utm_source=s", 5),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, url string, n_chars long")
        got = {
            r["canon_url"]: (r["n_docs"], r["n_raw_urls"], r["rep_doc_id"])
            for r in url_canonical_dedup(spark, "", docs=docs).collect()
        }
        assert got == {
            "a.com/x": (3, 3, 2),  # max n_chars 90, tie -> min doc_id 2
            "b.com/y?a=1&b=1": (2, 2, 7),
        }

    def test_docid_pack_fuse(self, spark):
        from drug_target_discovery_spark.queries.round12 import (
            url_canonical_dedup,
        )

        docs = spark.createDataFrame(
            [(-1, "http://a.com/x", 5), (2, "http://a.com/x/", 5)],
            "doc_id long, url string, n_chars long",
        )
        with pytest.raises(Exception, match="quality-pack width"):
            url_canonical_dedup(spark, "", docs=docs).collect()


class TestDomainQualityRollup:
    SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

    @pytest.mark.parametrize("sf", SFS)
    def test_matches_duckdb_oracle(self, spark, sf):
        import duckdb

        from drug_target_discovery_spark.queries.round12 import (
            _DOMAIN_ROLLUP_ORACLE,
            domain_quality_rollup,
        )

        got = [tuple(r) for r in domain_quality_rollup(spark, sf).collect()]
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf}/documents.parquet')"
        )
        exp = [tuple(r) for r in con.execute(_DOMAIN_ROLLUP_ORACLE).fetchall()]
        assert got == exp
        assert len(got) == 40  # the fixture's site0..site39 domains
        for row in got:
            # internal consistency: shares derive from the count columns
            _, n_docs, n_canon, dup, n_lowq, lowq, _, flagged = row
            assert 1 <= n_canon <= n_docs and 0 <= n_lowq <= n_docs
            assert flagged == (
                2 * (n_docs - n_canon) > n_docs or 2 * n_lowq > n_docs
            )

    def test_flag_rule_edges(self, spark):
        """Strict-majority flag in integer arithmetic: exactly half
        duplicated or low-quality does NOT flag; one past half does.
        The domain key unifies scheme/www/case variants."""
        from drug_target_discovery_spark.queries.round12 import (
            domain_quality_rollup,
        )

        rows = [
            # a.com: 4 docs, 2 canonical urls -> dup share exactly 1/2
            # (no flag); 2 of 4 low-quality -> exactly 1/2 (no flag)
            (1, "http://a.com/x", 50),
            (2, "https://WWW.A.com/x/", 50),
            (3, "http://a.com/y", 500),
            (4, "http://a.com/y#f", 500),
            # b.com: 3 docs, 1 canonical url -> dup share 2/3 (flag)
            (5, "http://b.com/p", 500),
            (6, "http://b.com/p/", 500),
            (7, "HTTP://www.B.com/p", 500),
            # c.com: 3 docs all distinct, 2 low-quality -> lowq 2/3 (flag)
            (8, "http://c.com/1", 50),
            (9, "http://c.com/2", 50),
            (10, "http://c.com/3", 500),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, url string, n_chars long")
        got = {
            r["domain"]: r for r in domain_quality_rollup(spark, "", docs=docs).collect()
        }
        assert set(got) == {"a.com", "b.com", "c.com"}
        a, b, c = got["a.com"], got["b.com"], got["c.com"]
        assert (a["n_docs"], a["n_canonical_urls"], a["n_low_quality"]) == (4, 2, 2)
        assert not a["flagged"]  # both shares exactly 1/2: strict > holds neither
        assert (b["n_docs"], b["n_canonical_urls"]) == (3, 1) and b["flagged"]
        assert (c["n_docs"], c["n_low_quality"]) == (3, 2) and c["flagged"]
