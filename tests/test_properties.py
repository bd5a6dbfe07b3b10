"""Property-based checks (hypothesis) for the algebraically-rewritten
operators: random inputs, exact agreement with the reference formulation.
Few examples, high value — each example runs Spark jobs, so the point is
adversarial structure (ties, NaNs, skew, empty groups), not volume."""

from __future__ import annotations

import collections

from hypothesis import HealthCheck, example, given, settings, strategies as st

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


@given(
    n_left=st.integers(min_value=1, max_value=40),
    n_right=st.integers(min_value=0, max_value=40),
    n_keys=st.sampled_from([1, 3]),
    tol=st.sampled_from([None, 5]),
    seed=st.integers(min_value=0, max_value=10_000),
)
@settings(**_SETTINGS)
def test_asof_backward_matches_pandas_merge_asof(
    spark, n_left, n_right, n_keys, tol, seed
):
    """Independent oracle for the union+carry-forward as-of join: pandas
    merge_asof (direction='backward') on random keyed event streams,
    including equal-timestamp ties (<= semantics) and the tolerance arm."""
    import numpy as np
    import pandas as pd

    from drug_target_discovery_spark.operators.asof import asof_join_backward

    rng = np.random.default_rng(seed)
    lts = rng.integers(0, 30, size=n_left)
    rts = rng.integers(0, 30, size=n_right)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys, size=n_left),
            "lid": np.arange(n_left),
            "ts": pd.to_datetime(lts, unit="s"),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys, size=n_right),
            "val": rng.integers(0, 100, size=n_right).astype("int64"),
            "rts": pd.to_datetime(rts, unit="s"),
        }
    )
    # merge_asof needs a deterministic winner at equal (k, ts): keep only
    # the max-val right row per (k, rts) so ties cannot flip arbitrarily
    right = (
        right.sort_values(["k", "rts", "val"])
        .groupby(["k", "rts"], as_index=False)
        .last()[["k", "val", "rts"]]  # schema below maps BY POSITION
    )
    ldf = spark.createDataFrame(left, "k long, lid long, ts timestamp")
    rdf = spark.createDataFrame(right, "k long, val long, rts timestamp")
    got = {
        r["lid"]: r["asof_val"]
        for r in asof_join_backward(
            ldf, rdf, on="k", left_ts="ts", right_ts="rts",
            right_cols=["val"], tolerance_seconds=tol,
        ).collect()
    }
    exp_df = pd.merge_asof(
        left.sort_values(["ts", "lid"]),
        right.sort_values("rts"),
        left_on="ts",
        right_on="rts",
        by="k",
        direction="backward",
        tolerance=None if tol is None else pd.Timedelta(seconds=tol),
    )
    exp = {
        int(r.lid): (None if pd.isna(r.val) else int(r.val))
        for r in exp_df.itertuples()
    }
    assert got == exp


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from([f"w{i}" for i in range(12)]), min_size=0, max_size=12
        ),
        min_size=2,
        max_size=12,
    ),
    threshold=st.sampled_from([0.3, 0.6]),
)
@settings(**_SETTINGS)
def test_jaccard_verify_matches_bruteforce(spark, docs, threshold):
    """jaccard_verify_pairs vs a python set-algebra brute force over ALL
    pairs — verification must score exactly the shingle-set Jaccard and
    apply the strict > threshold, with <n-token docs dropping out."""
    from drug_target_discovery_spark.operators.dedup import jaccard_verify_pairs

    n = 3
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    all_pairs = [
        (i, j) for i in range(len(docs)) for j in range(i + 1, len(docs))
    ]
    pairs = spark.createDataFrame(all_pairs, "d1 long, d2 long")
    got = {
        (r["d1"], r["d2"]): round(r["jaccard"], 9)
        for r in jaccard_verify_pairs(df, pairs, n=n, threshold=threshold).collect()
    }
    shingles = {
        i: {" ".join(toks[k : k + n]) for k in range(len(toks) - n + 1)}
        for i, toks in enumerate(docs)
        if len(toks) >= n
    }
    exp = {}
    for i, j in all_pairs:
        if i in shingles and j in shingles:
            inter = len(shingles[i] & shingles[j])
            union = len(shingles[i] | shingles[j])
            if union and inter / union > threshold:
                exp[(i, j)] = round(inter / union, 9)
    assert got == exp


@given(
    corpora=st.lists(
        st.sets(st.integers(min_value=0, max_value=25), min_size=1, max_size=15),
        min_size=2,
        max_size=14,
    ),
    t=st.sampled_from([0.5, 0.7, 0.9]),
)
@settings(max_examples=200, deadline=None)
@example(
    # Round-9 hypothesis-discovered failure of the earlier IEEE formula
    # floor((1.0 - t) * sz) + 1: at t=0.9 the double (1-t) is
    # 0.0999...98, so sz=10 gave plen 1 instead of 2 and the
    # exactly-at-threshold doc missed the prefix. Kept as a permanent
    # regression example for the exact integer formula.
    corpora=[{0, 1, 2, 3, 4, 5, 6, 7, 8}, {0, 1, 2, 3, 4, 5, 6, 7, 8, 9}],
    t=0.9,
)
def test_containment_prefix_theorem(corpora, t):
    """The SSJoin prefix theorem as implemented (round 7; exact-integer
    prefix length since round 9): for every doc A, taking its first
    floor((1-t)|A|)+1 shingles in GLOBAL ascending-(df, shingle) order —
    the exact ordering and prefix-length formula of
    _containment_via_prefix — every B with C(A,B) >= t must share at
    least one prefix shingle. Pure-python model, adversarial small sets
    (heavy overlap, ties in df, singleton docs); 200 examples since no
    Spark job runs. This is the property that makes the candidate set a
    provable superset of the answer, so a formula regression (e.g.
    floor vs ceil, >= vs >, or the IEEE rounding of (1-t) this test
    caught at round 9) fails here before it silently drops pairs."""
    df: dict[int, int] = {}
    for s in corpora:
        for sh in s:
            df[sh] = df.get(sh, 0) + 1
    t_num = int(round(t * 1_000_000))
    for a_idx, A in enumerate(corpora):
        order = sorted(A, key=lambda sh: (df[sh], sh))
        # mirrors _containment_via_prefix's integer DIV formula exactly
        plen = ((1_000_000 - t_num) * len(A)) // 1_000_000 + 1
        prefix = set(order[:plen])
        for b_idx, B in enumerate(corpora):
            if a_idx == b_idx:
                continue
            if len(A & B) / len(A) >= t:
                assert prefix & B, (
                    f"prefix theorem violated: A={sorted(A)} B={sorted(B)} "
                    f"t={t} prefix={sorted(prefix)}"
                )


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "a", "a", "b", "c"]),  # skewed keys
            st.one_of(st.none(), st.integers(min_value=-100, max_value=100)),
        ),
        min_size=1,
        max_size=60,
    ),
    buckets=st.sampled_from([2, 16]),
)
@settings(**_SETTINGS)
def test_two_phase_agg_equals_plain_groupby(spark, rows, buckets):
    """Salted two-phase aggregation vs the plain groupBy under random
    skew AND NULLs in the input column — 'count' must keep count(*)
    semantics (the ADVICE-r5 class: F.count(col) silently diverges on
    nullable inputs), and sum must ignore NULLs identically."""
    import pyspark.sql.functions as F

    from drug_target_discovery_spark.operators.skew import two_phase_agg

    df = spark.createDataFrame(rows, "k string, v long").repartition(4)
    got = {
        r["k"]: (r["n"], r["s"])
        for r in two_phase_agg(
            df, "k", {"n": ("v", "count"), "s": ("v", "sum")}, salt_buckets=buckets
        ).collect()
    }
    exp = {
        r["k"]: (r["n"], r["s"])
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    assert got == exp
