"""Round-13 lane operators: per-domain incremental URL dedup,
frequency-capped BPE training, and the PII redaction census."""

import pytest

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def _docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


class TestBpeCapped:
    def test_equals_uncapped_when_cap_covers_vocab(self, spark):
        """With top_words >= the distinct-word count the capped trainer
        IS the local trainer (same word table, same rule) — pinned on
        the real corpus."""
        from drug_target_discovery_spark.queries.round12 import (
            bpe_top_merges_local,
        )
        from drug_target_discovery_spark.queries.round13 import (
            bpe_top_merges_capped,
        )

        sf = "/root/testdata/sf0.001"
        cap = [tuple(r) for r in bpe_top_merges_capped(spark, sf, k=30).collect()]
        loc = [tuple(r) for r in bpe_top_merges_local(spark, sf, k=30).collect()]
        assert cap == loc and len(cap) == 30

    def test_capped_matches_python_recompute(self, spark):
        """A genuinely binding cap: train on the top-3 of 5 words and
        pin against the naive recount over the same capped table."""
        from tools.lane_check import _python_bpe_wc

        from drug_target_discovery_spark.queries.round13 import (
            bpe_top_merges_capped,
        )

        texts = ["abab abab abab cdcd", "abab cdcd efef", "gh gh ij"]
        docs = _docs_df(spark, texts)
        got = [
            tuple(r)
            for r in bpe_top_merges_capped(
                spark, "", k=5, docs=docs, top_words=3
            ).collect()
        ]
        from collections import Counter

        full = Counter(w for t in texts for w in t.split() if w)
        capped = dict(
            sorted(full.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        )
        assert got == _python_bpe_wc(capped, 5)
        assert got, "capped corpus must still train"

    def test_top_words_ceiling_valve(self, spark):
        """A cap past the driver-collect ceiling must refuse before any
        job runs (the VERDICT r12 #5 valve, applied to the new trainer)."""
        from drug_target_discovery_spark.queries.round12 import (
            _LOCAL_VOCAB_CEILING,
        )
        from drug_target_discovery_spark.queries.round13 import (
            bpe_top_merges_capped,
        )

        with pytest.raises(ValueError, match="driver-collect ceiling"):
            bpe_top_merges_capped(
                spark,
                "/root/testdata/sf0.001",
                k=3,
                top_words=_LOCAL_VOCAB_CEILING + 1,
            )

    def test_cap_tie_break_is_deterministic(self, spark):
        """Count ties at the cap boundary resolve by word string (asc):
        with four count-1 words and top_words=2, 'aa' and 'bb' make the
        cut, 'cc'/'dd' don't — so the top merge is (a, a)."""
        from drug_target_discovery_spark.queries.round13 import (
            bpe_top_merges_capped,
        )

        docs = _docs_df(spark, ["cc dd aa bb"])
        got = [
            tuple(r)
            for r in bpe_top_merges_capped(
                spark, "", k=2, docs=docs, top_words=2
            ).collect()
        ]
        assert got == [(1, "a", "a", "aa", 1), (2, "b", "b", "bb", 1)]


class TestPerDomainDownsample:
    @pytest.mark.parametrize("sf", SFS)
    def test_matches_duckdb_oracle(self, spark, sf):
        import duckdb

        from drug_target_discovery_spark.queries.round13 import (
            _DOMAIN_DOWNSAMPLE_ORACLE,
            per_domain_downsample,
        )

        got = [tuple(r) for r in per_domain_downsample(spark, sf).collect()]
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf}/documents.parquet')"
        )
        exp = [
            tuple(r) for r in con.execute(_DOMAIN_DOWNSAMPLE_ORACLE).fetchall()
        ]
        assert got == exp
        assert len(got) == 40

    @pytest.mark.parametrize("sf", SFS)
    def test_keep_rule_properties(self, spark, sf):
        """Unflagged domains keep everything; flagged domains keep a
        subset; the census exercises both states; a rerun is
        bit-identical (no RNG anywhere)."""
        from drug_target_discovery_spark.queries.round13 import (
            per_domain_downsample,
        )

        rows = per_domain_downsample(spark, sf).collect()
        for r in rows:
            if r["flagged"]:
                assert 0 <= r["n_kept"] <= r["n_docs"]
            else:
                assert r["n_kept"] == r["n_docs"] and r["kept_share"] == 1.0
        assert any(r["flagged"] for r in rows)
        assert any(not r["flagged"] for r in rows)
        again = per_domain_downsample(spark, sf).collect()
        assert [tuple(r) for r in rows] == [tuple(r) for r in again]

    def test_null_domain_survives_census(self, spark):
        """A NULL url canonicalizes to a NULL domain; the rollup groups
        it under NULL and the downsample census must carry the same row
        (null-safe join) instead of silently dropping those docs."""
        from drug_target_discovery_spark.queries.round13 import (
            per_domain_downsample,
        )

        docs = spark.createDataFrame(
            [
                (1, "http://a.com/x", 300),
                (2, "http://a.com/y", 300),
                (3, None, 300),
                (4, None, 100),
            ],
            "doc_id long, url string, n_chars long",
        )
        rows = {
            r["domain"]: r
            for r in per_domain_downsample(spark, "", docs=docs).collect()
        }
        assert None in rows, "NULL-domain docs vanished from the census"
        assert rows[None]["n_docs"] == 2
        assert rows["a.com"]["n_docs"] == 2
        assert sum(r["n_docs"] for r in rows.values()) == 4

    def test_permille_edges(self, spark):
        """permille=0 drops every doc under a flagged domain;
        permille=1000 keeps everything."""
        from drug_target_discovery_spark.queries.round13 import (
            per_domain_downsample,
        )

        sf = "/root/testdata/sf0.001"
        zero = per_domain_downsample(spark, sf, flagged_keep_permille=0)
        for r in zero.collect():
            assert r["n_kept"] == (0 if r["flagged"] else r["n_docs"])
        full = per_domain_downsample(spark, sf, flagged_keep_permille=1000)
        for r in full.collect():
            assert r["n_kept"] == r["n_docs"]


class TestIncrementalUrlDedup:
    @pytest.mark.parametrize("sf", SFS)
    def test_matches_duckdb_oracle(self, spark, sf):
        import duckdb

        from drug_target_discovery_spark.queries.round13 import (
            _INCR_URL_DEDUP_ORACLE,
            incremental_url_dedup_by_domain,
        )

        got = [
            tuple(r) for r in incremental_url_dedup_by_domain(spark, sf).collect()
        ]
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf}/documents.parquet')"
        )
        exp = [tuple(r) for r in con.execute(_INCR_URL_DEDUP_ORACLE).fetchall()]
        assert got == exp
        assert len(got) >= 1

    @pytest.mark.parametrize("sf", SFS)
    def test_counts_partition_the_batch(self, spark, sf):
        """Every batch doc is counted exactly once: a canonical group
        whose URL the reference holds contributes n ref-dups; a novel
        group contributes (n-1) batch-dups + 1 novel URL. So
        n_batch_docs = n_ref_dup + n_batch_dup + n_novel_urls per
        domain, and the fixture exercises every tier (the class-13
        all-batch group keeps n_batch_dup off zero — the VERDICT r12 #6
        discrimination rule)."""
        from drug_target_discovery_spark.queries.round13 import (
            incremental_url_dedup_by_domain,
        )

        rows = incremental_url_dedup_by_domain(spark, sf).collect()
        for r in rows:
            assert r["n_batch_docs"] == (
                r["n_ref_dup"] + r["n_batch_dup"] + r["n_novel_urls"]
            ), r
            assert 0 <= r["novel_url_share"] <= 1
        assert sum(r["n_ref_dup"] for r in rows) > 0
        assert sum(r["n_batch_dup"] for r in rows) > 0
        assert sum(r["n_novel_urls"] for r in rows) > 0

    def test_hand_fixture_statuses(self, spark):
        """Known split on hand-built URLs: doc 0/7/14 are batch (%7),
        doc 213 is batch via the class-13 clause (213 % 200 = 13);
        docs 3/10 are reference.

        - docs 0 and 3 share canonical a.com/x (raw forms differ)
          -> doc 0 is a ref-dup;
        - docs 7 and 14 share canonical b.com/y, which no reference doc
          holds -> one batch-dup + one novel URL;
        - doc 213's canonical c.com/z is batch-only and unique
          -> one novel URL;
        - doc 10's d.com/w is reference-only -> no output row for
          d.com (domains without batch docs don't appear)."""
        from drug_target_discovery_spark.queries.round13 import (
            incremental_url_dedup_by_domain,
        )

        rows = [
            (0, "http://a.com/x"),
            (3, "https://WWW.A.com/x/"),
            (7, "http://b.com/y?b=2&a=1"),
            (14, "http://b.com/y?a=1&b=2&utm_source=s"),
            (213, "http://c.com/z#frag"),
            (10, "http://d.com/w"),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, url string")
        got = {
            r["domain"]: (
                r["n_batch_docs"],
                r["n_ref_dup"],
                r["n_batch_dup"],
                r["n_novel_urls"],
            )
            for r in incremental_url_dedup_by_domain(spark, "", docs=docs).collect()
        }
        assert got == {
            "a.com": (1, 1, 0, 0),
            "b.com": (2, 0, 1, 1),
            "c.com": (1, 0, 0, 1),
        }

    def test_plan_shape(self, spark):
        """The 100 TB properties, asserted (the '.explain and iterate'
        mandate): batch/reference predicates push to the scan, the scan
        reads ONLY doc_id (canonicalization is derived map-side), both
        aggregates are partial (map-side combined), the reference
        distinct-URL set broadcasts into the left join, and no Python
        stage exists anywhere."""
        from drug_target_discovery_spark.queries.round13 import (
            incremental_url_dedup_by_domain,
        )

        df = incremental_url_dedup_by_domain(spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().executedPlan().toString()
        for py_stage in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
            assert py_stage not in plan, plan
        assert "BroadcastHashJoin" in plan and "LeftOuter" in plan, plan
        assert "partial_sum" in plan and "partial_count" in plan, plan
        # group agg + domain rollup + ref distinct; orderBy adds 1 range
        assert plan.count("Exchange hashpartitioning") <= 3, plan
        for chunk in plan.split("ReadSchema:")[1:]:
            schema = chunk.splitlines()[0]
            assert "text" not in schema and "n_chars" not in schema, schema

    def test_production_contract_explicit_ref(self, spark):
        """The production calling contract: docs = the new batch (ALL
        rows), ref_urls = the pre-materialized reference canonical-URL
        set — mirroring the streaming twin. doc 7 dups the reference,
        docs 1+2 collapse into one novel group."""
        from drug_target_discovery_spark.queries.round13 import (
            incremental_url_dedup_by_domain,
        )

        batch = spark.createDataFrame(
            [
                (1, "http://a.com/x"),
                (2, "https://WWW.A.com/x/"),
                (7, "http://b.com/y?utm_source=s"),
            ],
            "doc_id long, url string",
        )
        ref = spark.createDataFrame([("b.com/y",)], "canon_url string")
        got = {
            r["domain"]: (
                r["n_batch_docs"],
                r["n_ref_dup"],
                r["n_batch_dup"],
                r["n_novel_urls"],
            )
            for r in incremental_url_dedup_by_domain(
                spark, "", docs=batch, ref_urls=ref
            ).collect()
        }
        assert got == {"a.com": (2, 0, 1, 1), "b.com": (1, 1, 0, 0)}

    def test_empty_batch(self, spark):
        """No batch docs at all -> empty result with the full schema."""
        from drug_target_discovery_spark.queries.round13 import (
            incremental_url_dedup_by_domain,
        )

        docs = spark.createDataFrame(
            [(3, "http://a.com/x"), (10, "http://b.com/y")],
            "doc_id long, url string",
        )
        out = incremental_url_dedup_by_domain(spark, "", docs=docs)
        assert out.collect() == []
        assert [f.name for f in out.schema.fields] == [
            "domain",
            "n_batch_docs",
            "n_ref_dup",
            "n_batch_dup",
            "n_novel_urls",
            "novel_url_share",
        ]


class TestCcnetPerplexityBuckets:
    @pytest.mark.parametrize("sf", SFS)
    def test_matches_duckdb_oracle(self, spark, sf):
        import duckdb

        from drug_target_discovery_spark.queries.round13 import (
            _ccnet_oracle,
            ccnet_perplexity_buckets,
        )

        got = [
            tuple(r) for r in ccnet_perplexity_buckets(spark, sf).collect()
        ]
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf}/documents.parquet')"
        )
        exp = [tuple(r) for r in con.execute(_ccnet_oracle()).fetchall()]
        assert got == exp
        assert len(got) == 15  # 5 langs x 3 buckets

    @pytest.mark.parametrize("sf", SFS)
    def test_tercile_properties(self, spark, sf):
        """Buckets partition each language; shares are near-thirds;
        the CCNet orientation holds (head = highest mean log-prob);
        cutoff ranges are disjoint and ordered; rerun bit-identical."""
        from collections import defaultdict

        from drug_target_discovery_spark.queries.round13 import (
            ccnet_perplexity_buckets,
        )

        rows = ccnet_perplexity_buckets(spark, sf).collect()
        by_lang = defaultdict(dict)
        for r in rows:
            by_lang[r["lang"]][r["bucket"]] = r
        for lang, b in by_lang.items():
            assert set(b) == {"head", "middle", "tail"}
            assert abs(sum(r["doc_share"] for r in b.values()) - 1.0) < 1e-5
            for r in b.values():
                # near-thirds up to score-class tie granularity
                assert 0.2 < r["doc_share"] < 0.5, (lang, tuple(r))
            assert (
                b["head"]["mean_logprob"]
                > b["middle"]["mean_logprob"]
                > b["tail"]["mean_logprob"]
            )
            # contiguous, non-overlapping published cutoffs
            assert b["head"]["cut_lo_micro"] > b["middle"]["cut_hi_micro"]
            assert b["middle"]["cut_lo_micro"] > b["tail"]["cut_hi_micro"]
        again = ccnet_perplexity_buckets(spark, sf).collect()
        assert [tuple(r) for r in rows] == [tuple(r) for r in again]

    def test_plan_shape(self, spark):
        """No Python stage anywhere (the scorer and bucketing are all
        codegen/JVM), and every window in the plan is PARTITIONED BY
        lang — the cumulative rank runs at the bounded histogram
        grain, never as a global sort."""
        from drug_target_discovery_spark.queries.round13 import (
            ccnet_perplexity_buckets,
        )

        df = ccnet_perplexity_buckets(spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().executedPlan().toString()
        for py_stage in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
            assert py_stage not in plan, plan
        n_spec = plan.count("windowspecdefinition(")
        assert n_spec >= 2, plan
        assert plan.count("windowspecdefinition(lang#") == n_spec, plan

    def test_score_class_moves_whole(self, spark, tmp_path):
        """Cutoff ties move entire score classes: five identical docs
        (one shared score) plus one worse doc -> the class of five
        lands wholly in head, the outlier in tail, and no middle row
        exists (docs_above semantics, the histogram-cutoff contract)."""
        from drug_target_discovery_spark.queries.round13 import (
            ccnet_perplexity_buckets,
        )

        good = "alpha beta gamma delta epsilon"
        bad = "zeta zeta eta eta theta iota kappa"
        docs = spark.createDataFrame(
            [(i, "en", good) for i in range(5)] + [(9, "en", bad)],
            "doc_id long, lang string, text string",
        )
        docs.write.mode("overwrite").parquet(
            str(tmp_path / "documents.parquet")
        )
        rows = ccnet_perplexity_buckets(spark, str(tmp_path)).collect()
        census = {r["bucket"]: r["n_docs"] for r in rows}
        assert census == {"head": 5, "tail": 1}


class TestQualityGateKappa:
    @pytest.mark.parametrize("sf", SFS)
    def test_matches_duckdb_oracle(self, spark, sf):
        import duckdb

        from drug_target_discovery_spark.queries.round13 import (
            _kappa_oracle,
            quality_gate_kappa,
        )

        got = [tuple(r) for r in quality_gate_kappa(spark, sf).collect()]
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf}/documents.parquet')"
        )
        exp = [tuple(r) for r in con.execute(_kappa_oracle()).fetchall()]
        assert got == exp
        assert len(got) == 5
        # every confusion cell populated somewhere: the statistic
        # discriminates at fixture scale
        for ix in (2, 3, 4, 5):
            assert any(r[ix] > 0 for r in got)

    @pytest.mark.parametrize("sf", SFS)
    def test_formula_wiring(self, spark, sf):
        """po / pe / kappa recomputed in Python from the reported
        integer cells must equal the reported rounded values — the
        formula's wiring validated independently of the LM."""
        from drug_target_discovery_spark.queries.round13 import (
            quality_gate_kappa,
        )

        import math

        def rnd6(x):
            # the engine's rnd() semantics (floor(x*1e6+0.5)/1e6,
            # half-up) — NOT Python's round(), whose half-even rule
            # disagrees at exact decimal halves (e.g. 1/128)
            return math.floor(x * 1e6 + 0.5) / 1e6

        for r in quality_gate_kappa(spark, sf).collect():
            n = r["n_docs"]
            kk, kd, dk, dd = (
                r["n_keep_keep"],
                r["n_keep_drop"],
                r["n_drop_keep"],
                r["n_drop_drop"],
            )
            assert kk + kd + dk + dd == n
            po = (kk + dd) * 1.0 / n
            pa = (kk + kd) * 1.0 / n
            pb = (kk + dk) * 1.0 / n
            pe = pa * pb + (1.0 - pa) * (1.0 - pb)
            assert r["p_observed"] == rnd6(po)
            assert r["p_chance"] == rnd6(pe)
            assert r["kappa"] == rnd6((po - pe) / (1.0 - pe))

    def test_intersection_domain(self, spark, tmp_path):
        """A one-word doc is scored by the heuristic gate but not the
        LM gate (needs >= 2 tokens) — the census covers the
        intersection, so it is excluded rather than miscounted."""
        from drug_target_discovery_spark.queries.round13 import (
            quality_gate_kappa,
        )

        docs = spark.createDataFrame(
            [(1, "en", "alpha beta gamma"), (2, "en", "beta gamma delta"),
             (3, "en", "solo")],
            "doc_id long, lang string, text string",
        )
        docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
        rows = quality_gate_kappa(spark, str(tmp_path)).collect()
        assert sum(r["n_docs"] for r in rows) == 2

    def test_kappa_null_when_both_raters_constant(self, spark, tmp_path):
        """Fifty 2-word docs 'x w{i}': the heuristic gate drops all
        (word count < 30) and the self-trained LM drops all (context
        'x' spreads over 50 successors -> mean bigram log-prob far
        below the threshold) -> pe = 1 and kappa is NULL, the defined
        undefined-case behavior."""
        from drug_target_discovery_spark.queries.round13 import (
            quality_gate_kappa,
        )

        docs = spark.createDataFrame(
            [(i, "en", f"x w{i}") for i in range(50)],
            "doc_id long, lang string, text string",
        )
        docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
        (r,) = quality_gate_kappa(spark, str(tmp_path)).collect()
        assert r["n_drop_drop"] == 50 and r["n_docs"] == 50
        assert r["p_chance"] == 1.0
        assert r["kappa"] is None


class TestPiiRegexCrossDialect:
    """Adversarial fuzz of the three-engine regex agreement (Java via
    Spark codegen, RE2 via DuckDB, Python re as the referee): the PII
    patterns use only the shared dialect subset, so per-family match
    COUNTS and the sequential-redaction CHAR MASS must agree on ANY
    input — including boundary-adversarial strings the fixtures never
    produce. Few examples, each runs a Spark job; the value is the
    alphabet (digits, dots, dashes, @, glued word chars), not volume."""

    def test_fuzzed_counts_and_mass_agree(self, spark):
        import random
        import re as _re

        import duckdb

        from drug_target_discovery_spark.queries.round13 import (
            PII_EMAIL_RE,
            PII_IPV4_RE,
            PII_PHONE_RE,
            pii_redaction_census,
        )

        rng = random.Random(13)
        atoms = [
            "a", "B", "z9", "1", "23", "555", "0007", ".", "..", "-", "@",
            " ", "  ", "_", "%", "+", "x1.2.3.4", "1.2.3.4.5", "10.0.0.1",
            "a@b.io", "@b.c", "a@b", "555-012-3456", "55-012-3456",
            "555-012-34567", "user.name+tag@ex-ample.co", ".@.",
        ]
        texts = [
            "".join(rng.choice(atoms) for _ in range(rng.randint(1, 25)))
            for _ in range(120)
        ]
        docs = spark.createDataFrame(
            [(i, "s", t) for i, t in enumerate(texts)],
            "doc_id long, source string, text string",
        )
        (got,) = pii_redaction_census(spark, "", docs=docs).collect()
        con = duckdb.connect()
        # python-re referee (Java-compatible on this subset)
        emails = sum(len(_re.findall(PII_EMAIL_RE, t)) for t in texts)
        phones = sum(len(_re.findall(PII_PHONE_RE, t)) for t in texts)
        ips = sum(len(_re.findall(PII_IPV4_RE, t)) for t in texts)
        mass = sum(
            len(t)
            - len(
                _re.sub(
                    PII_IPV4_RE,
                    "",
                    _re.sub(PII_PHONE_RE, "", _re.sub(PII_EMAIL_RE, "", t)),
                )
            )
            for t in texts
        )
        assert (got["n_emails"], got["n_phones"], got["n_ips"]) == (
            emails,
            phones,
            ips,
        ), texts
        assert got["pii_chars"] == mass, texts
        # duckdb referee over the same rows
        con.execute(
            "CREATE TABLE t AS SELECT * FROM (VALUES "
            + ", ".join(f"(?)" for _ in texts)
            + ") v(txt)",
            texts,
        )
        dk = con.execute(
            f"""SELECT CAST(sum(len(regexp_extract_all(txt, '{PII_EMAIL_RE}'))) AS BIGINT),
                       CAST(sum(len(regexp_extract_all(txt, '{PII_PHONE_RE}'))) AS BIGINT),
                       CAST(sum(len(regexp_extract_all(txt, '{PII_IPV4_RE}'))) AS BIGINT),
                       CAST(sum(length(txt) - length(
                         regexp_replace(regexp_replace(regexp_replace(txt,
                           '{PII_EMAIL_RE}', '', 'g'),
                           '{PII_PHONE_RE}', '', 'g'),
                           '{PII_IPV4_RE}', '', 'g'))) AS BIGINT)
                FROM t"""
        ).fetchone()
        assert dk == (emails, phones, ips, mass), texts


def _pii_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


class TestPiiRedactionCensus:
    @pytest.mark.parametrize("sf", SFS)
    def test_matches_duckdb_oracle(self, spark, sf):
        import duckdb

        from drug_target_discovery_spark.queries.round13 import (
            _PII_CENSUS_ORACLE,
            pii_redaction_census,
        )

        got = [tuple(r) for r in pii_redaction_census(spark, sf).collect()]
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf}/documents.parquet')"
        )
        exp = [tuple(r) for r in con.execute(_PII_CENSUS_ORACLE).fetchall()]
        assert got == exp
        assert len(got) == 20

    @pytest.mark.parametrize("sf", SFS)
    def test_fixture_discriminates_within_sources(self, spark, sf):
        """Every census column must VARY across sources (the injection
        moduli are coprime with source = doc_id % 20 by construction —
        a modulus sharing a factor with 20 pins a column to a constant
        inside some source, and a constant column discriminates
        nothing)."""
        from drug_target_discovery_spark.queries.round13 import (
            pii_redaction_census,
        )

        rows = pii_redaction_census(spark, sf).collect()
        for col in ("n_emails", "n_phones", "n_ips", "pii_chars"):
            vals = {r[col] for r in rows}
            assert len(vals) > 1, f"{col} is constant across sources"
        for r in rows:
            assert 0 < r["pii_doc_share"] < 1

    def test_hand_fixture_counts(self, spark):
        """Exact census on five crafted docs: multi-match, each family
        alone, a clean doc, and a three-family mix — char masses
        computed by hand."""
        from drug_target_discovery_spark.queries.round13 import (
            pii_redaction_census,
        )

        docs = _pii_docs(
            spark,
            [
                (1, "s", "reach user1@mail2.org or admin@mail0.net"),
                (2, "s", "call 555-123-4567 now"),
                (3, "s", "ping 10.1.2.3 ok"),
                (4, "s", "clean text only"),
                (5, "s", "mix a@b.io 555-000-1111 1.2.3.4"),
            ],
        )
        (r,) = pii_redaction_census(spark, "", docs=docs).collect()
        assert tuple(r) == (
            "s",
            5,  # n_docs
            2,  # n_email_docs (1, 5)
            3,  # n_emails (two in doc 1)
            2,  # n_phone_docs (2, 5)
            2,
            2,  # n_ip_docs (3, 5)
            2,
            75,  # 30 + 12 + 8 + 0 + 25 chars removed
            0.8,
        )

    def test_redacted_col_placeholders(self, spark):
        """The production redaction column swaps each match for its
        typed token, globally, in family order."""
        from pyspark.sql import functions as F

        from drug_target_discovery_spark.queries.round13 import (
            pii_redacted_col,
        )

        df = spark.createDataFrame(
            [("a@b.io then 555-000-1111 at 1.2.3.4 and c@d.org",)],
            "text string",
        )
        (out,) = df.select(
            pii_redacted_col(F.col("text")).alias("red")
        ).collect()
        assert out["red"] == "<EMAIL> then <PHONE> at <IP> and <EMAIL>"

    def test_boundary_negatives(self, spark):
        """Word-boundary guards: digits glued to a word char are not a
        phone; a 5-octet dotted run still yields only one 4-octet IPv4
        match (regex greediness is identical in both engines — the
        DuckDB twin of this pin lives in the lane check)."""
        from drug_target_discovery_spark.queries.round13 import (
            pii_redaction_census,
        )

        docs = _pii_docs(
            spark,
            [
                (1, "s", "x555-012-3456 not a phone"),
                (2, "s", "v1.2.3.4.5 versions"),
            ],
        )
        (r,) = pii_redaction_census(spark, "", docs=docs).collect()
        assert r["n_phones"] == 0
        # 'v1' glues a word char to the first octet (no \b there), so
        # the single match starts at the next boundary, after "1.":
        # both engines find exactly "2.3.4.5" and nothing else.
        assert r["n_ips"] == 1

    def test_plan_shape(self, spark):
        """The 100 TB properties, asserted: the scrub is pure codegen
        (no Python stage — the regex work runs JVM-side), the census
        aggregate is partial (map-side combined) so the shuffle
        carries ~20 census rows per map partition instead of text, and
        the only exchanges are the source-grain hash + the final
        orderBy range."""
        from drug_target_discovery_spark.queries.round13 import (
            pii_redaction_census,
        )

        df = pii_redaction_census(spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().executedPlan().toString()
        for py_stage in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
            assert py_stage not in plan, plan
        assert "partial_sum" in plan and "partial_count" in plan, plan
        assert plan.count("Exchange hashpartitioning") == 1, plan
        assert plan.count("Exchange rangepartitioning") == 1, plan

    def test_production_contract_and_determinism(self, spark):
        """Explicit (doc_id, source, text) input: no fixture column is
        applied, totals partition the corpus, rerun is bit-identical."""
        from drug_target_discovery_spark.queries.round13 import (
            pii_redaction_census,
        )

        docs = _pii_docs(
            spark,
            [(i, f"s{i % 2}", "no pii here at all") for i in range(10)],
        )
        rows = pii_redaction_census(spark, "", docs=docs).collect()
        assert [tuple(r) for r in rows] == [
            ("s0", 5, 0, 0, 0, 0, 0, 0, 0, 0.0),
            ("s1", 5, 0, 0, 0, 0, 0, 0, 0, 0.0),
        ]
        again = pii_redaction_census(spark, "", docs=docs).collect()
        assert [tuple(r) for r in rows] == [tuple(r) for r in again]
