"""Unit tests for the sequence-packing kernel (greedy reset-scan edge
cases; the oracle gate covers it end-to-end via the recursive-CTE replay)."""

from drug_target_discovery_spark.operators.packing import pack_sequences


def _collect(df):
    return {
        r["doc_id"]: (r["pack_id"], r["pack_pos"])
        for r in df.collect()
    }


class TestSequencePacking:
    def test_greedy_reset_and_exact_fit(self, spark):
        # budget 10: [4, 6] fills pack 0 exactly; 5 opens pack 1; 5 fits
        # pack 1 exactly; 1 opens pack 2
        rows = [(1, "a", 4), (2, "a", 6), (3, "a", 5), (4, "a", 5), (5, "a", 1)]
        docs = spark.createDataFrame(rows, "doc_id BIGINT, source STRING, n_tokens BIGINT")
        got = _collect(pack_sequences(docs, budget=10))
        assert got == {1: (0, 0), 2: (0, 1), 3: (1, 0), 4: (1, 1), 5: (2, 0)}

    def test_oversized_doc_gets_own_pack(self, spark):
        # a doc longer than the budget is placed alone (the chunker splits
        # it upstream in a real run), and the scan continues after it
        rows = [(1, "a", 3), (2, "a", 99), (3, "a", 3), (4, "a", 3)]
        docs = spark.createDataFrame(rows, "doc_id BIGINT, source STRING, n_tokens BIGINT")
        got = _collect(pack_sequences(docs, budget=10))
        assert got == {1: (0, 0), 2: (1, 0), 3: (2, 0), 4: (2, 1)}

    def test_groups_pack_independently(self, spark):
        rows = [(1, "a", 6), (2, "b", 6), (3, "a", 6), (4, "b", 6)]
        docs = spark.createDataFrame(rows, "doc_id BIGINT, source STRING, n_tokens BIGINT")
        got = _collect(pack_sequences(docs, budget=10))
        # each group restarts at pack 0; 6+6 > 10 so second doc opens pack 1
        assert got == {1: (0, 0), 3: (1, 0), 2: (0, 0), 4: (1, 0)}
