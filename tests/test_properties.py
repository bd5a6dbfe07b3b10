"""Property-based checks (hypothesis) for the algebraically-rewritten
operators: random inputs, exact agreement with the reference formulation.
Few examples, high value — each example runs Spark jobs, so the point is
adversarial structure (ties, NaNs, skew, empty groups), not volume."""

from __future__ import annotations

import collections

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from drug_target_discovery_spark.functions.stats import bh_fdr, bh_fdr_scalable
from drug_target_discovery_spark.operators.heavyhitters import exact_heavy_hitters

_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from([f"t{i}" for i in range(40)]), min_size=0, max_size=30
        ),
        min_size=1,
        max_size=60,
    ),
    k=st.sampled_from([3, 7, 15]),
)
@settings(**_SETTINGS)
def test_heavy_hitters_match_bruteforce(spark, docs, k):
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(4)
    counts = collections.Counter(t for toks in docs for t in toks)
    n = sum(counts.values())
    expected = {t: c for t, c in counts.items() if c * (k + 1) > n}
    got = {r["token"]: r["cnt"] for r in exact_heavy_hitters(df, k=k).collect()}
    assert got == expected


@given(
    ps=st.lists(
        st.one_of(
            st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
            st.just(float("nan")),
            st.none(),
            # forced ties: a handful of exact repeated values
            st.sampled_from([0.25, 0.5, 0.5, 0.75]),
        ),
        min_size=1,
        max_size=200,
    ),
    parts=st.sampled_from([2, 5, 16]),
)
@settings(**_SETTINGS)
def test_bh_scalable_equals_reference(spark, ps, parts):
    rows = [(i, p) for i, p in enumerate(ps)]
    df = spark.createDataFrame(rows, "id long, pvalue double").repartition(3)
    ref = {
        r["id"]: r["adj"]
        for r in bh_fdr(df, "pvalue", "adj").collect()
    }
    got = {
        r["id"]: r["adj"]
        for r in bh_fdr_scalable(df, "pvalue", "adj", partitions=parts).collect()
    }
    assert set(ref) == set(got)
    for i in ref:
        a, b = ref[i], got[i]
        assert (a is None and b is None) or a == b, (i, a, b)
