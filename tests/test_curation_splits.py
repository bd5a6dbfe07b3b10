"""leakage_safe_splits: the property that matters is structural — no
normalized-duplicate group ever straddles two splits. The oracle gate
proves cross-engine value equality; these pin the leakage guarantee and
the determinism/coverage contract on real testdata plus a crafted
duplicate-heavy fixture."""

import pytest

from drug_target_discovery_spark.queries.curation import leakage_safe_splits

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def split_rows(spark):
    return leakage_safe_splits(spark, SF_DIR).collect()


class TestLeakageSafeSplits:
    def test_covers_every_doc_once(self, spark, split_rows):
        ids = [r["doc_id"] for r in split_rows]
        n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
        assert len(ids) == len(set(ids)) == n_docs

    def test_groups_never_straddle_splits(self, split_rows):
        by_group = {}
        for r in split_rows:
            by_group.setdefault(r["canonical_id"], set()).add(r["split"])
        straddlers = {g: s for g, s in by_group.items() if len(s) > 1}
        assert not straddlers, straddlers

    def test_canonical_flag_and_group_size(self, split_rows):
        from collections import Counter

        sizes = Counter(r["canonical_id"] for r in split_rows)
        for r in split_rows:
            assert r["group_size"] == sizes[r["canonical_id"]], r
            assert r["is_canonical"] == (r["doc_id"] == r["canonical_id"]), r
        # exactly one canonical per group
        n_canon = sum(1 for r in split_rows if r["is_canonical"])
        assert n_canon == len(sizes)

    def test_split_values_and_rough_proportions(self, split_rows):
        splits = {r["split"] for r in split_rows}
        assert splits <= {"train", "validation", "test"}
        frac_train = sum(r["split"] == "train" for r in split_rows) / len(split_rows)
        # 80% target; generous tolerance at 500 docs (binomial noise)
        assert 0.65 <= frac_train <= 0.95, frac_train

    def test_contamination_audit_consistent_with_splits(self, spark, split_rows):
        from drug_target_discovery_spark.queries.curation import (
            split_contamination_audit,
        )

        split_of = {r["doc_id"]: r["split"] for r in split_rows}
        group_of = {r["doc_id"]: r["canonical_id"] for r in split_rows}
        audit = split_contamination_audit(spark, SF_DIR).collect()
        for r in audit:
            # the audit's split columns must agree with leakage_safe_splits
            assert r["split_d1"] == split_of[r["d1"]], r
            assert r["split_d2"] == split_of[r["d2"]], r
            assert r["crosses_split"] == (r["split_d1"] != r["split_d2"]), r
            assert r["jaccard"] > 0.8, r
            # normalized-exact dups share a group, hence a split, by
            # construction — only genuine near-dups may cross
            if group_of[r["d1"]] == group_of[r["d2"]]:
                assert not r["crosses_split"], r

    def test_null_text_docs_kept_and_grouped(self, spark, tmp_path):
        # NULL text coalesces to '' in the shared digest (norm_sha_col /
        # NORM_SHA_DUCK), so NULL-text docs stay in the output, group with
        # empty/whitespace-only docs, and both engines agree — the r4
        # review found the pre-coalesce oracle dropped them via the NULL
        # join key while Spark's window kept them
        import duckdb

        rows = [
            (1, "real content here okay", "en", "s", 0),
            (2, None, "en", "s", 0),
            (3, "   ", "en", "s", 0),
            (4, "!!!", "en", "s", 0),
        ]
        df = spark.createDataFrame(
            rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars INT"
        )
        d = tmp_path / "nulls"
        df.coalesce(1).write.parquet(str(d / "documents.parquet"))
        out = {r["doc_id"]: r for r in leakage_safe_splits(spark, str(d)).collect()}
        assert set(out) == {1, 2, 3, 4}
        # NULL, whitespace-only, and punctuation-only all normalize to ''
        assert out[2]["canonical_id"] == out[3]["canonical_id"] == out[4]["canonical_id"] == 2
        assert out[2]["group_size"] == 3
        # cross-engine: DuckDB oracle returns the same 4 docs
        from drug_target_discovery_spark.queries.registry import all_queries

        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet/*.parquet')"
        )
        oracle = con.execute(all_queries()["leakage_safe_splits"].oracle).df()
        assert sorted(oracle["doc_id"]) == [1, 2, 3, 4]
        o = oracle.set_index("doc_id")
        assert set(o.loc[[2, 3, 4], "canonical_id"]) == {2}

    def test_norm_digest_cross_engine_on_tricky_whitespace(self, spark):
        # norm_sha_col (Java regex) and NORM_SHA_DUCK (RE2) must produce
        # byte-identical digests on every whitespace variant. \x0B is the
        # documented trap: Java's \s includes it, RE2's doesn't — the
        # explicit [ \t\n\r\f] class makes both strip it as punctuation.
        import duckdb

        from drug_target_discovery_spark.operators.dedup import (
            NORM_SHA_DUCK,
            norm_sha_col,
        )

        texts = [
            "a\x0bb", "a\tb", "a\nb", "a\rb", "a\x0cb",
            "A  b!!", None, "  ", "x\x0b \ty", "Mixed\tCASE\n and. punct?",
        ]
        con = duckdb.connect()
        con.execute("CREATE TABLE t(text VARCHAR)")
        con.executemany("INSERT INTO t VALUES (?)", [(t,) for t in texts])
        duck = [
            r[0]
            for r in con.execute(
                f"SELECT {NORM_SHA_DUCK.format(col='text')} FROM t"
            ).fetchall()
        ]
        df = spark.createDataFrame([(t,) for t in texts], "text STRING")
        sp = [r[0] for r in df.select(norm_sha_col("text")).collect()]
        for t, d, s in zip(texts, duck, sp):
            assert d == s, f"digest diverges on {t!r}"

    def test_duplicates_share_group_and_split(self, spark, tmp_path):
        # case/punctuation variants of one text must collapse into one
        # group and get one split; distinct texts may differ
        rows = [
            (1, "The quick brown fox!", "en", "s", 0),
            (2, "the QUICK  brown fox", "en", "s", 0),
            (3, "THE quick brown FOX.", "en", "s", 0),
            (4, "a completely different document", "en", "s", 0),
        ]
        df = spark.createDataFrame(
            rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars INT"
        )
        d = tmp_path / "docs"
        df.coalesce(1).write.parquet(str(d / "documents.parquet"))
        out = {r["doc_id"]: r for r in leakage_safe_splits(spark, str(d)).collect()}
        assert out[1]["canonical_id"] == out[2]["canonical_id"] == out[3]["canonical_id"] == 1
        assert out[1]["split"] == out[2]["split"] == out[3]["split"]
        assert out[1]["group_size"] == 3
        assert out[4]["group_size"] == 1 and out[4]["canonical_id"] == 4
