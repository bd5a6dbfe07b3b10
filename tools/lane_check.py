"""check_correctness twin for the TESTS-ONLY LANE (OPERATORS.md lane
section): runs every unregistered operator at the given sf_dir against
its prepared oracle — DuckDB SQL, independent python/library recompute,
or the registered-twin equality — and reports exact-match status.

The pytest suite runs these same comparisons at sf0.001/0.01; this tool
exists so the lane's evidence can be re-produced at ANY scale factor
with one command (the driver gate only covers registered queries).

Usage:  python tools/lane_check.py [sf_dir] [--json OUT.json]
(default sf0.01). Exit code 0 iff every check passes. With --json the
per-operator pass table is written as a committed round artifact
(LANE_r{N}.json — VERDICT r10 #2: the lane gets the same auditable
evidence stream as the registry's CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from drug_target_discovery_spark.caching import release_caches
from drug_target_discovery_spark.session import get_spark
from drug_target_discovery_spark.sources.tables import load_table

_ARGS = sys.argv[1:]
JSON_OUT = None
if "--json" in _ARGS:
    i = _ARGS.index("--json")
    if i + 1 >= len(_ARGS):
        sys.exit("usage: python tools/lane_check.py [sf_dir] [--json OUT.json]")
    JSON_OUT = _ARGS[i + 1]
    _ARGS = _ARGS[:i] + _ARGS[i + 2 :]
SF = _ARGS[0] if _ARGS else "/root/testdata/sf0.01"


def _con(*tables: str):
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


def _python_bpe(texts, k):
    """Independent recompute of the deterministic BPE merge rule (the
    same model tests/test_round9_ops.py pins against)."""
    from collections import Counter

    words = Counter()
    for t in texts:
        for w in t.split():
            if w:
                words[w] += 1
    return _python_bpe_wc(words, k)


def _python_bpe_wc(words, k):
    """The merge rule over an explicit (word -> count) table — shared
    by _python_bpe and the capped-trainer oracle (round 13), which
    trains on a TOP-N word-count table rather than raw texts."""
    from collections import Counter

    words = dict(words)
    vocab = {w: list(w) for w in words}
    merges = []
    for rank in range(1, k + 1):
        pc = Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += words[w]
        if not pc:
            break
        (le, ri), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, le, ri, le + ri, n))
        for w, syms in vocab.items():
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
            vocab[w] = out
    return merges


def _encode(word, rules):
    syms = list(word)
    for le, ri in rules:
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
        syms = out
    return syms


def _rnd6(x):
    return math.floor(x * 1e6 + 0.5) / 1e6


def check_substring_spans(spark):
    from drug_target_discovery_spark.queries.round9 import (
        _EXACT_SUBSTR_ORACLE,
        exact_substring_dup_stats,
    )

    got = [tuple(r) for r in exact_substring_dup_stats(spark, SF).collect()]
    exp = [
        tuple(r) for r in _con("documents").execute(_EXACT_SUBSTR_ORACLE).fetchall()
    ]
    ok = (
        [g[:4] for g in got] == [e[:4] for e in exp]
        and len(got) == len(exp)
        and all(abs(float(g[4]) - float(e[4])) < 1e-9 for g, e in zip(got, exp))
        and bool(got)
    )
    return ok, f"{len(got)} sources"


def check_substring_valve(spark):
    from drug_target_discovery_spark.queries.round9 import (
        exact_substring_dup_stats,
    )

    exact = sorted(map(tuple, exact_substring_dup_stats(spark, SF).collect()))
    release_caches(fixtures=True)
    valved = sorted(
        map(
            tuple,
            exact_substring_dup_stats(spark, SF, trivial_dup_df=4).collect(),
        )
    )
    return exact == valved, "valve(df=4) == exact"


def check_ivf_audit(spark):
    from drug_target_discovery_spark.queries.round9 import (
        _IVF_REFRESH_ORACLE,
        ivf_index_refresh_audit,
    )

    got = [tuple(r) for r in ivf_index_refresh_audit(spark, SF).collect()]
    exp = [
        tuple(r) for r in _con("embeddings").execute(_IVF_REFRESH_ORACLE).fetchall()
    ]
    return got == exp and len(got) > 1, f"{len(got)} cells"


def check_ivf_retrain(spark):
    from drug_target_discovery_spark.queries.round9 import (
        _IVF_RETRAIN_NORETRAIN_ORACLE,
        ivf_drift_retrain,
    )

    got = [tuple(r) for r in ivf_drift_retrain(spark, SF).collect()]
    exp = [
        tuple(r)
        for r in _con("embeddings")
        .execute(_IVF_RETRAIN_NORETRAIN_ORACLE)
        .fetchall()
    ]
    return got == exp and bool(got), f"{len(got)} cells (no-drift branch)"


def check_epoch_shuffle(spark):
    from drug_target_discovery_spark.queries.round9 import (
        _EPOCH_SHUFFLE_ORACLE,
        _SHUF_SEED,
        deterministic_epoch_shuffle,
    )

    got = [tuple(r) for r in deterministic_epoch_shuffle(spark, SF).collect()]
    exp = [
        tuple(r) for r in _con("documents").execute(_EPOCH_SHUFFLE_ORACLE).fetchall()
    ]
    # belt-and-braces: hashlib agrees with the engines on the first rows
    head = sorted(
        (
            int(hashlib.md5(f"{_SHUF_SEED}:{d}".encode()).hexdigest()[:15], 16),
            d,
        )
        for d, _, _ in got
    )[:5]
    hash_ok = [d for _, d in head] == [g[0] for g in got[:5]]
    return got == exp and hash_ok and bool(got), f"{len(got)} docs"


def check_bpe_merges(spark, k=8):
    from drug_target_discovery_spark.queries.round9 import bpe_top_merges

    got = [tuple(r) for r in bpe_top_merges(spark, SF, k=k).collect()]
    texts = [
        r[0]
        for r in _con("documents").execute("SELECT text FROM documents").fetchall()
    ]
    exp = _python_bpe(texts, k)
    return got == exp and len(got) == k, f"k={k} merges"


def check_bpe_merges_batched(spark, k=40):
    """Round-12 scale form: exact batched training (j merges per driver
    round) must equal the python oracle at a k large enough to span
    many rounds. PASS gates on VALUE EQUALITY ONLY (ADVICE r12: a
    tie-saturated corpus legitimately degenerates to ~1 merge/round, and
    the lane contract is runnable-at-any-SF); batching efficiency is
    reported in the detail string for the probe log to read."""
    from drug_target_discovery_spark.queries.round12 import bpe_top_merges_batched

    stats = {}
    got = [
        tuple(r)
        for r in bpe_top_merges_batched(spark, SF, k=k, stats=stats).collect()
    ]
    texts = [
        r[0]
        for r in _con("documents").execute("SELECT text FROM documents").fetchall()
    ]
    exp = _python_bpe(texts, k)
    # the corpus may EXHAUST before k merges (every word fully fused —
    # sf0.01's synthetic vocabulary runs dry at 89); equality with the
    # oracle is the ONLY gate
    ok = got == exp and bool(got)
    batched = stats.get("rounds", 0) < max(2, len(got))
    return ok, (
        f"{len(got)} merges (k={k}) in {stats.get('rounds')} driver rounds"
        f" (batching {'engaged' if batched else 'degenerate — tie-bound'})"
    )


def check_bpe_merges_local(spark, k=200):
    """Round-12 scale form: the threshold-gated driver-local trainer at
    production-ish k must equal the python oracle exactly."""
    from drug_target_discovery_spark.queries.round12 import bpe_top_merges_local

    got = [tuple(r) for r in bpe_top_merges_local(spark, SF, k=k).collect()]
    texts = [
        r[0]
        for r in _con("documents").execute("SELECT text FROM documents").fetchall()
    ]
    exp = _python_bpe(texts, k)
    return got == exp and bool(got), (
        f"{len(got)} merges (k={k}, corpus-exhaustion-truncated), driver-local"
    )


def check_bpe_encode_scaled(spark, k=60):
    """Round-12 scale form: the Arrow-batched pair-index encoder (the
    fold chain's analyzer-cap escape) vs the python train+encode
    recompute at a k the committed fold form never reaches in one
    projection chain."""
    from drug_target_discovery_spark.queries.round12 import bpe_encode_stats_scaled

    got = [tuple(r) for r in bpe_encode_stats_scaled(spark, SF, k=k).collect()]
    docs = (
        _con("documents").execute("SELECT source, text FROM documents").fetchall()
    )
    rules = [(le, ri) for _, le, ri, _, _ in _python_bpe([t for _, t in docs], k)]
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
    return got == exp and bool(got), f"{len(got)} sources at k={k} (pandas-UDF apply)"


def check_url_dedup(spark):
    """Round-12 lane: URL canonicalization dedup vs the prepared DuckDB
    oracle (the CCNet first pass over the deterministic messy-URL
    fixture column)."""
    from drug_target_discovery_spark.queries.round12 import (
        _URL_DEDUP_ORACLE,
        url_canonical_dedup,
    )

    got = [tuple(r) for r in url_canonical_dedup(spark, SF).collect()]
    exp = [tuple(r) for r in _con("documents").execute(_URL_DEDUP_ORACLE).fetchall()]
    return got == exp and bool(got), f"{len(got)} multi-doc canonical groups"


def check_domain_rollup(spark):
    """Round-12 lane: per-domain quality/duplication rollup (the CCNet
    group-by-domain pass) vs the prepared DuckDB oracle."""
    from drug_target_discovery_spark.queries.round12 import (
        _DOMAIN_ROLLUP_ORACLE,
        domain_quality_rollup,
    )

    got = [tuple(r) for r in domain_quality_rollup(spark, SF).collect()]
    exp = [
        tuple(r) for r in _con("documents").execute(_DOMAIN_ROLLUP_ORACLE).fetchall()
    ]
    n_flag = sum(1 for r in got if r[-1])
    return got == exp and bool(got), f"{len(got)} domains, {n_flag} flagged"


def check_bpe_merges_capped(spark, k=60, top_words=40):
    """Round-13 scale form: frequency-capped training (the
    above-ceiling production path) must equal an independent python
    recompute over the SAME deterministically-capped word table — raw
    texts come from DuckDB, then the word counts, the (count desc,
    word asc) top-N cap, AND the training all recompute in pure python
    (python's .split() matches the engine's \\s+ tokenizer, which
    DuckDB's string_split would not). The cap (40) is far below the
    corpus's distinct-word count at every SF, so the capped path is
    genuinely exercised."""
    from drug_target_discovery_spark.queries.round13 import bpe_top_merges_capped

    from collections import Counter

    got = [
        tuple(r)
        for r in bpe_top_merges_capped(spark, SF, k=k, top_words=top_words).collect()
    ]
    texts = [
        r[0]
        for r in _con("documents").execute("SELECT text FROM documents").fetchall()
    ]
    full = Counter(w for t in texts for w in t.split() if w)
    capped = dict(sorted(full.items(), key=lambda kv: (-kv[1], kv[0]))[:top_words])
    exp = _python_bpe_wc(capped, k)
    return got == exp and bool(got), (
        f"{len(got)} merges (k={k}) on the top-{top_words} capped vocabulary"
    )


def check_incremental_url_dedup(spark):
    """Round-13 lane: per-domain incremental crawl dedup by canonical
    URL (new-crawl batch vs the reference corpus — the CCNet pass after
    canonicalization) vs the prepared DuckDB oracle."""
    from drug_target_discovery_spark.queries.round13 import (
        _INCR_URL_DEDUP_ORACLE,
        incremental_url_dedup_by_domain,
    )

    got = [
        tuple(r) for r in incremental_url_dedup_by_domain(spark, SF).collect()
    ]
    exp = [
        tuple(r)
        for r in _con("documents").execute(_INCR_URL_DEDUP_ORACLE).fetchall()
    ]
    tiers = (
        sum(r[2] for r in got),
        sum(r[3] for r in got),
        sum(r[4] for r in got),
    )
    return got == exp and bool(got), (
        f"{len(got)} domains; ref_dup/batch_dup/novel = {tiers}"
    )


def check_domain_downsample(spark):
    """Round-13 lane: the CCNet act-on-rollup pass (per-domain
    deterministic downsampling) vs the prepared DuckDB oracle."""
    from drug_target_discovery_spark.queries.round13 import (
        _DOMAIN_DOWNSAMPLE_ORACLE,
        per_domain_downsample,
    )

    got = [tuple(r) for r in per_domain_downsample(spark, SF).collect()]
    exp = [
        tuple(r)
        for r in _con("documents").execute(_DOMAIN_DOWNSAMPLE_ORACLE).fetchall()
    ]
    n_flag = sum(1 for r in got if r[1])
    kept = sum(r[3] for r in got)
    total = sum(r[2] for r in got)
    return got == exp and bool(got), (
        f"{len(got)} domains ({n_flag} flagged); kept {kept}/{total} docs"
    )


def check_quality_gate_kappa(spark):
    """Round-13 lane: Cohen's kappa between the Gopher heuristic gate
    and the bigram-LM gate (per-language confusion census +
    chance-corrected agreement) vs the prepared DuckDB oracle."""
    from drug_target_discovery_spark.queries.round13 import (
        _kappa_oracle,
        quality_gate_kappa,
    )

    got = [tuple(r) for r in quality_gate_kappa(spark, SF).collect()]
    exp = [tuple(r) for r in _con("documents").execute(_kappa_oracle()).fetchall()]
    kappas = [r[8] for r in got if r[8] is not None]
    detail = (
        f"{len(got)} langs; kappa range {min(kappas):.3f}..{max(kappas):.3f}"
        if kappas
        else f"{len(got)} langs; all kappas NULL (pe=1)"
    )
    return got == exp and bool(got), detail


def check_scrub_census(spark):
    """Round-13 streaming tier, batch twin: the windowed scrub census
    over the documents fixture with a deterministic ingest timestamp
    (doc_id % 180 minutes past a fixed origin -> three 1-hour windows)
    vs a prepared DuckDB oracle at the (window, source) grain.
    Streaming parity and append-mode watermark semantics are pinned in
    tests/test_streaming.py (TestScrubIngest)."""
    from pyspark.sql import functions as F

    from drug_target_discovery_spark.queries.round13 import (
        _PII_TEXT_DUCK,
        PII_EMAIL_RE,
        PII_IPV4_RE,
        PII_PHONE_RE,
        pii_text_col,
    )
    from drug_target_discovery_spark.sources.tables import load_table
    from drug_target_discovery_spark.streaming.scrub import (
        scrub_ingest_census,
    )

    docs = (
        load_table(spark, SF, "documents")
        .select("doc_id", "source", "text")
        .withColumn("text", pii_text_col())
        .withColumn(
            "fetched_at",
            F.expr(
                "timestampadd(MINUTE, CAST(doc_id % 180 AS INT), "
                "timestamp'2024-01-01 00:00:00')"
            ),
        )
    )
    # window bounds compared as UTC-formatted STRINGS, not collected
    # datetimes: PySpark renders collected timestamps through the
    # SYSTEM timezone (datetime.fromtimestamp), which the UTC session
    # pin does not control — string-casting in-plan uses the session
    # TZ, so the comparison is host-TZ-portable.
    census = scrub_ingest_census(docs, window="1 hour")
    got = [
        tuple(r)
        for r in census.select(
            F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("ws"),
            F.date_format("window_end", "yyyy-MM-dd HH:mm:ss").alias("we"),
            *census.columns[2:],
        )
        .orderBy("ws", "source")
        .collect()
    ]
    oracle = """
    WITH raw AS (
      SELECT doc_id, source, {pii_text} AS text,
             TIMESTAMP '2024-01-01 00:00:00'
               + to_minutes(doc_id % 180) AS fetched_at
      FROM documents
    ),
    per_doc AS (
      SELECT date_trunc('hour', fetched_at) AS window_start, source,
             len(regexp_extract_all(text, '{email}')) AS n_email,
             len(regexp_extract_all(text, '{phone}')) AS n_phone,
             len(regexp_extract_all(text, '{ipv4}')) AS n_ip,
             length(text) - length(
               regexp_replace(regexp_replace(regexp_replace(
                 text, '{email}', '', 'g'), '{phone}', '', 'g'),
                 '{ipv4}', '', 'g')) AS chars
      FROM raw
    )
    SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS ws,
           strftime(window_start + to_hours(1), '%Y-%m-%d %H:%M:%S') AS we,
           source,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN n_email > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_email_docs,
           CAST(sum(n_email) AS BIGINT) AS n_emails,
           CAST(sum(CASE WHEN n_phone > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_phone_docs,
           CAST(sum(n_phone) AS BIGINT) AS n_phones,
           CAST(sum(CASE WHEN n_ip > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_ip_docs,
           CAST(sum(n_ip) AS BIGINT) AS n_ips,
           CAST(sum(chars) AS BIGINT) AS pii_chars,
           CAST(sum(CASE WHEN n_email + n_phone + n_ip > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hit
    FROM per_doc
    GROUP BY window_start, source
    ORDER BY window_start, source
    """.format(
        pii_text=_PII_TEXT_DUCK,
        email=PII_EMAIL_RE,
        phone=PII_PHONE_RE,
        ipv4=PII_IPV4_RE,
    )
    exp = [tuple(r) for r in _con("documents").execute(oracle).fetchall()]
    n_win = len({r[0] for r in got})
    return got == exp and bool(got), (
        f"{len(got)} (window, source) rows over {n_win} windows"
    )


def check_ccnet_buckets(spark):
    """Round-13 lane: CCNet per-language perplexity terciles (shared
    JM-LM scorer, histogram-cutoff bucketing, integer micro-score
    grain) vs the prepared DuckDB oracle."""
    from drug_target_discovery_spark.queries.round13 import (
        _ccnet_oracle,
        ccnet_perplexity_buckets,
    )

    got = [tuple(r) for r in ccnet_perplexity_buckets(spark, SF).collect()]
    exp = [tuple(r) for r in _con("documents").execute(_ccnet_oracle()).fetchall()]
    langs = len({r[0] for r in got})
    shares = [r[3] for r in got]
    return got == exp and bool(got), (
        f"{langs} langs x 3 buckets; share range "
        f"{min(shares):.3f}-{max(shares):.3f}"
    )


def check_pii_census(spark):
    """Round-13 lane: the PII scrub census (email/phone/IPv4 regex
    counts + sequential-redaction char mass, source grain) vs the
    prepared DuckDB oracle — this is also the cross-dialect regex pin
    (Java codegen vs RE2) at full fixture scale."""
    from drug_target_discovery_spark.queries.round13 import (
        _PII_CENSUS_ORACLE,
        pii_redaction_census,
    )

    got = [tuple(r) for r in pii_redaction_census(spark, SF).collect()]
    exp = [tuple(r) for r in _con("documents").execute(_PII_CENSUS_ORACLE).fetchall()]
    emails = sum(r[3] for r in got)
    phones = sum(r[5] for r in got)
    ips = sum(r[7] for r in got)
    chars = sum(r[8] for r in got)
    return got == exp and bool(got), (
        f"{len(got)} sources; emails/phones/ips = {emails}/{phones}/{ips}, "
        f"{chars} chars redacted"
    )


def check_crawl_ingest(spark):
    """Round-13 streaming tier, batch twin: the crawl-ingest
    canonical-URL dedup's DETERMINISTIC columns (the novel canonical-URL
    set) vs the prepared DuckDB oracle. Which document represents a
    group is arrival-order by design (see the operator's determinism
    note) — streaming parity and cross-batch watermark state are pinned
    in tests/test_streaming.py."""
    from pyspark.sql import functions as F

    from drug_target_discovery_spark.queries.round12 import messy_url_col
    from drug_target_discovery_spark.queries.round13 import (
        _CRAWL_NOVEL_ORACLE,
        _is_batch_col,
        canonical_url_col,
    )
    from drug_target_discovery_spark.sources.tables import load_table
    from drug_target_discovery_spark.streaming.crawl import crawl_ingest_url_dedup

    docs = (
        load_table(spark, SF, "documents")
        .select("doc_id")
        .withColumn("url", messy_url_col())
    )
    crawl = docs.filter(_is_batch_col())
    ref = (
        docs.filter(~_is_batch_col())
        .select(canonical_url_col(F.col("url")).alias("canon_url"))
        .distinct()
    )
    got = sorted(
        r["canon_url"]
        for r in crawl_ingest_url_dedup(crawl, ref, watermark=None).collect()
    )
    exp = [r[0] for r in _con("documents").execute(_CRAWL_NOVEL_ORACLE).fetchall()]
    return got == exp and bool(got), f"{len(got)} novel canonical URLs"


def check_bpe_encode(spark, k=8):
    from drug_target_discovery_spark.queries.round9 import bpe_encode_stats

    got = [tuple(r) for r in bpe_encode_stats(spark, SF, k=k).collect()]
    docs = (
        _con("documents")
        .execute("SELECT source, text FROM documents")
        .fetchall()
    )
    rules = [(le, ri) for _, le, ri, _, _ in _python_bpe([t for _, t in docs], k)]
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
    return got == exp and bool(got), f"{len(got)} sources"


def check_gini_twin(spark):
    from drug_target_discovery_spark.queries.round8 import (
        order_value_gini_by_nation,
        order_value_gini_by_nation_scalable,
    )

    base = [tuple(r) for r in order_value_gini_by_nation(spark, SF).collect()]
    twin = [
        tuple(r)
        for r in order_value_gini_by_nation_scalable(spark, SF).collect()
    ]
    return base == twin and bool(base), f"{len(base)} nations"


def check_weighted_median(spark):
    from drug_target_discovery_spark.operators.prefixsum import (
        weighted_median_by_key,
    )

    li = load_table(spark, SF, "lineitem").select(
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
        _con("lineitem")
        .execute(
            """
            WITH g AS (
              SELECT l_returnflag AS k,
                     CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v,
                     CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS HUGEINT) AS w
              FROM lineitem GROUP BY 1, 2
            ),
            c AS (
              SELECT k, v, sum(w) OVER (PARTITION BY k ORDER BY v) AS cum,
                     sum(w) OVER (PARTITION BY k) AS tot
              FROM g
            )
            SELECT k, CAST(min(v) AS BIGINT) FROM c
            WHERE 2 * cum >= tot GROUP BY k
            """
        )
        .fetchall()
    )
    return got == exp and bool(got), f"{len(got)} keys"


def check_modularity(spark):
    import networkx as nx

    from drug_target_discovery_spark.graph.algorithms import label_propagation
    from drug_target_discovery_spark.queries.dedup import candidate_pairs
    from drug_target_discovery_spark.queries.round8 import _LPA_ITERS
    from drug_target_discovery_spark.queries.round9 import (
        lpa_community_modularity,
    )

    got = lpa_community_modularity(spark, SF).collect()[0]
    pairs = candidate_pairs(spark, SF)
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
    ok = (
        got["n_edges"] == len(edge_list)
        and got["n_nodes"] == g.number_of_nodes()
        and got["n_communities"] == len(comms)
        and abs(float(got["modularity"]) - q) < 1e-6
        and got["n_edges"] > 0
    )
    return ok, f"Q={got['modularity']}, {got['n_communities']} communities"


def check_xsrc_overlap(spark):
    from drug_target_discovery_spark.queries.round10 import (
        _XSRC_ORACLE,
        cross_source_shingle_overlap,
    )

    got = [tuple(r) for r in cross_source_shingle_overlap(spark, SF).collect()]
    exp = [tuple(r) for r in _con("documents").execute(_XSRC_ORACLE).fetchall()]
    return got == exp and bool(got), f"{len(got)} source pairs"


def check_bigram_lm(spark):
    from drug_target_discovery_spark.queries.round10 import (
        _JM_ORACLE,
        bigram_lm_quality_by_source,
    )

    got = [tuple(r) for r in bigram_lm_quality_by_source(spark, SF).collect()]
    exp = [tuple(r) for r in _con("documents").execute(_JM_ORACLE).fetchall()]
    return got == exp and bool(got), f"{len(got)} sources"


def check_pq_recall(spark):
    # reuse the pytest oracle verbatim so tool and test cannot drift
    import importlib.util

    p = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests",
        "test_round10_ops.py",
    )
    spec = importlib.util.spec_from_file_location("_t10", p)
    t10 = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(t10)

    from drug_target_discovery_spark.queries.round10 import (
        _PQ_ITERS,
        _PQ_K,
        _PQ_M,
        _PQ_PROBE_STRIDE,
        _PQ_TOPK,
        pq_adc_recall,
    )

    got = sorted(
        (int(r["query_vid"]), int(r["n_overlap"]), _rnd6(float(r["recall_at_k"])))
        for r in pq_adc_recall(spark, SF).collect()
    )
    exp = [
        (q, n, _rnd6(rec))
        for q, n, rec in t10._numpy_pq_oracle(
            SF, _PQ_M, _PQ_K, _PQ_ITERS, _PQ_TOPK, _PQ_PROBE_STRIDE
        )
    ]
    mean = sum(g[2] for g in got) / len(got) if got else 0.0
    return got == exp and bool(got), f"{len(got)} probes, mean recall {mean:.3f}"


def check_ivfpq_recall(spark):
    import importlib.util

    p = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests",
        "test_round10_ops.py",
    )
    spec = importlib.util.spec_from_file_location("_t10b", p)
    t10 = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(t10)

    from drug_target_discovery_spark.queries.round10 import (
        _IVFPQ_NPROBE,
        _PQ_ITERS,
        _PQ_K,
        _PQ_M,
        _PQ_PROBE_STRIDE,
        _PQ_TOPK,
        ivfpq_adc_recall,
    )

    got = sorted(
        (
            int(r["query_vid"]),
            int(r["n_overlap"]),
            _rnd6(float(r["recall_at_k"])),
            _rnd6(float(r["scan_frac"])),
        )
        for r in ivfpq_adc_recall(spark, SF).collect()
    )
    exp = [
        (q, n, _rnd6(rec), _rnd6(scan))
        for q, n, rec, scan in t10._numpy_ivfpq_oracle(
            SF, _PQ_M, _PQ_K, _PQ_ITERS, _PQ_TOPK, _PQ_PROBE_STRIDE, _IVFPQ_NPROBE
        )
    ]
    mean = sum(g[2] for g in got) / len(got) if got else 0.0
    mscan = sum(g[3] for g in got) / len(got) if got else 0.0
    return got == exp and bool(got), (
        f"{len(got)} probes, mean recall {mean:.3f} at mean scan_frac {mscan:.3f}"
    )


def check_hilbert_layout(spark):
    import importlib.util

    p = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests",
        "test_round10_ops.py",
    )
    spec = importlib.util.spec_from_file_location("_t10c", p)
    t10 = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(t10)

    from drug_target_discovery_spark.queries.round10 import (
        hilbert_vs_zorder_skip_stats,
    )

    got = [
        (
            r["layout"],
            r["pred_dim"],
            int(r["n_files"]),
            _rnd6(float(r["mean_skip_frac"])),
            _rnd6(float(r["mean_rows_scanned_frac"])),
        )
        for r in hilbert_vs_zorder_skip_stats(spark, SF).collect()
    ]
    exp = [
        (a, b, c, _rnd6(d), _rnd6(e))
        for a, b, c, d, e in t10._python_hilbert_layout(SF)
    ]
    box = {g[0]: g[4] for g in got if g[1] == "box"}
    return got == exp and bool(got), (
        f"{len(got)} rows; box rows-scanned hilbert {box.get('hilbert')} "
        f"vs zorder {box.get('zorder')}"
    )


def check_lsh_recall(spark):
    from drug_target_discovery_spark.queries.round10 import (
        _lsh_recall_oracle,
        lsh_candidate_recall_audit,
    )

    got = [tuple(r) for r in lsh_candidate_recall_audit(spark, SF).collect()]
    exp = [
        tuple(r) for r in _con("documents").execute(_lsh_recall_oracle()).fetchall()
    ]
    detail = "; ".join(f"t={g[0]}: {g[2]}/{g[1]}" for g in got)
    return got == exp and bool(got), detail


def check_mmd_drift(spark):
    import importlib.util

    p = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests",
        "test_round10_ops.py",
    )
    spec = importlib.util.spec_from_file_location("_t10d", p)
    t10 = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(t10)

    from drug_target_discovery_spark.queries.round10 import embedding_mmd_drift

    got = sorted(
        (r["comparison"], int(r["n_quadruples"]), r["sum_h_pico"], float(r["mmd2"]))
        for r in embedding_mmd_drift(spark, SF).collect()
    )
    exp = t10._numpy_mmd_oracle(SF)
    d = {g[0]: g[3] for g in got}
    # Label both legs explicitly (VERDICT r11 #7): at real SFs the %10
    # "batch" stripe IS same-distribution, so BOTH mmd2 values sit near 0
    # and drift may print below null — that is correct behavior here, not
    # a failed detection (drift >> null is pinned on the shifted-batch
    # fixture in tests/test_round10_ops.py).
    return got == exp and bool(got), (
        f"mmd2_drift={d.get('base_vs_batch')} "
        f"mmd2_null={d.get('base_vs_base_null')} "
        "(same-distribution stripe: both ~0 expected)"
    )


def check_xcorpus_contam(spark):
    from drug_target_discovery_spark.queries.round10 import (
        _XCON_ORACLE,
        cross_corpus_contamination,
    )

    got = [tuple(r) for r in cross_corpus_contamination(spark, SF).collect()]
    exp = [tuple(r) for r in _con("documents").execute(_XCON_ORACLE).fetchall()]
    hit = sum(g[2] for g in got)
    n = sum(g[1] for g in got)
    return got == exp and bool(got), f"{hit}/{n} train docs contaminated"


def check_conformal(spark):
    from drug_target_discovery_spark.queries.round10 import (
        _CONF_ORACLE,
        split_conformal_price_intervals,
    )

    got = [tuple(r) for r in split_conformal_price_intervals(spark, SF).collect()]
    exp = [
        tuple(r)
        for r in _con("lineitem", "part").execute(_CONF_ORACLE).fetchall()
    ]
    detail = "; ".join(
        f"a={g[0]}: cov {g[6]} vs target {g[7]} (unmodeled {g[3]})" for g in got
    )
    return got == exp and bool(got), detail


def check_epoch_manifest(spark):
    """Composed training-epoch pipeline (round 11): BPE encode -> mixture
    selection -> epoch shuffle -> packing -> shard cut, vs the hybrid
    python-BPE + DuckDB oracle."""
    import pandas as pd

    from drug_target_discovery_spark.queries.round11 import (
        _EPOCH_BPE_K,
        _EPOCH_ORACLE,
        training_epoch_manifest,
    )

    got = [tuple(r) for r in training_epoch_manifest(spark, SF).collect()]
    con = _con("documents")
    texts = [t[0] for t in con.execute("SELECT text FROM documents").fetchall()]
    rules = [(m[1], m[2]) for m in _python_bpe(texts, _EPOCH_BPE_K)]
    words = sorted({w for t in texts for w in t.split() if w})
    con.register(
        "wtok",
        pd.DataFrame(
            {"word": words, "n_tok": [len(_encode(w, rules)) for w in words]}
        ),
    )
    exp = [tuple(r) for r in con.execute(_EPOCH_ORACLE).fetchall()]
    n_seq = len(got)
    n_docs = sum(g[2] for g in got)
    n_shards = len({g[5] for g in got})
    return (
        got == exp and bool(got),
        f"{n_seq} sequences / {n_docs} docs / {n_shards} shards",
    )


def check_mixture_sample(spark):
    from drug_target_discovery_spark.queries.round10 import (
        _MIX_ORACLE,
        temperature_mixture_sample,
    )

    got = [tuple(r) for r in temperature_mixture_sample(spark, SF).collect()]
    exp = [tuple(r) for r in _con("documents").execute(_MIX_ORACLE).fetchall()]
    t = sum(g[3] for g in got)
    return got == exp and bool(got), f"{len(got)} sources, {t} seats apportioned"


def check_curated_epoch(spark):
    """Curate-then-load composition (round 11): the epoch pipeline over
    exactly the curation-kept train split, tokenizer trained on the
    curated corpus, vs the curation-oracle -> kept_ids -> python-BPE ->
    DuckDB replay."""
    import pandas as pd

    from drug_target_discovery_spark.queries.registry import all_queries
    from drug_target_discovery_spark.queries.round11 import (
        _CURATED_EPOCH_ORACLE,
        _EPOCH_BPE_K,
        curated_epoch_manifest,
    )

    got = [tuple(r) for r in curated_epoch_manifest(spark, SF).collect()]
    con = _con("documents")
    cur_oracle = all_queries()["curation_end_to_end"].oracle
    con.execute(
        "CREATE TEMP TABLE kept_ids AS SELECT doc_id FROM "
        f"({cur_oracle}) WHERE status = 'kept' AND split = 'train'"
    )
    texts = [
        t[0]
        for t in con.execute(
            "SELECT text FROM documents JOIN kept_ids USING (doc_id)"
        ).fetchall()
    ]
    rules = [(m[1], m[2]) for m in _python_bpe(texts, _EPOCH_BPE_K)]
    words = sorted({w for t in texts for w in t.split() if w})
    con.register(
        "wtok",
        pd.DataFrame(
            {"word": words, "n_tok": [len(_encode(w, rules)) for w in words]}
        ),
    )
    exp = [tuple(r) for r in con.execute(_CURATED_EPOCH_ORACLE).fetchall()]
    n_kept = con.execute("SELECT count(*) FROM kept_ids").fetchone()[0]
    n_docs = sum(g[2] for g in got)
    return (
        got == exp and bool(got),
        f"{len(got)} sequences / {n_docs} of {n_kept} kept-train docs",
    )


def check_semantic_decon(spark):
    """Embedding-leg benchmark decontamination (round 11): block-pair
    GEMM train x bench + exact fold rerank, vs the prepared DuckDB
    oracle."""
    from drug_target_discovery_spark.queries.round11 import (
        _semdecon_oracle,
        semantic_decontamination,
    )

    got = [tuple(r) for r in semantic_decontamination(spark, SF).collect()]
    exp = [
        tuple(r)
        for r in _con("embeddings").execute(_semdecon_oracle()).fetchall()
    ]
    return (
        got == exp and bool(got),
        f"{len(got)} train docs flagged above cosine 0.4",
    )


def check_lsh_autotune(spark):
    """MinHash-LSH banding auto-tuner (round 11): measured-spectrum
    S-curve fold over every (b, r) in the permutation budget, integer
    choice rule, vs the prepared DuckDB oracle."""
    from drug_target_discovery_spark.queries.round11 import (
        _lsh_autotune_oracle,
        lsh_parameter_autotune,
    )

    got = [tuple(r) for r in lsh_parameter_autotune(spark, SF).collect()]
    exp = [
        tuple(r)
        for r in _con("documents").execute(_lsh_autotune_oracle()).fetchall()
    ]
    c = next((g for g in got if g[7]), None)
    detail = (
        f"{len(got)} configs; chosen b={c[0]} r={c[1]} "
        f"(exp_recall {c[5]}, exp_fp {c[6]})"
        if c
        else "no chosen row"
    )
    return got == exp and c is not None, detail


CHECKS = [
    ("exact_substring_dup_stats", check_substring_spans),
    ("exact_substring_dup_stats[valve]", check_substring_valve),
    ("ivf_index_refresh_audit", check_ivf_audit),
    ("ivf_drift_retrain", check_ivf_retrain),
    ("deterministic_epoch_shuffle", check_epoch_shuffle),
    ("bpe_top_merges", check_bpe_merges),
    ("bpe_top_merges_batched", check_bpe_merges_batched),
    ("bpe_top_merges_local", check_bpe_merges_local),
    ("bpe_encode_stats", check_bpe_encode),
    ("bpe_encode_stats_scaled", check_bpe_encode_scaled),
    ("url_canonical_dedup", check_url_dedup),
    ("domain_quality_rollup", check_domain_rollup),
    ("incremental_url_dedup_by_domain", check_incremental_url_dedup),
    ("per_domain_downsample", check_domain_downsample),
    ("bpe_top_merges_capped", check_bpe_merges_capped),
    ("crawl_ingest_url_dedup[batch-twin]", check_crawl_ingest),
    ("pii_redaction_census", check_pii_census),
    ("ccnet_perplexity_buckets", check_ccnet_buckets),
    ("scrub_ingest_census[batch-twin]", check_scrub_census),
    ("quality_gate_kappa", check_quality_gate_kappa),
    ("order_value_gini_by_nation_scalable", check_gini_twin),
    ("weighted_median_by_key", check_weighted_median),
    ("lpa_community_modularity", check_modularity),
    ("cross_source_shingle_overlap", check_xsrc_overlap),
    ("bigram_lm_quality_by_source", check_bigram_lm),
    ("pq_adc_recall", check_pq_recall),
    ("ivfpq_adc_recall", check_ivfpq_recall),
    ("hilbert_vs_zorder_skip_stats", check_hilbert_layout),
    ("temperature_mixture_sample", check_mixture_sample),
    ("split_conformal_price_intervals", check_conformal),
    ("training_epoch_manifest", check_epoch_manifest),
    ("lsh_parameter_autotune", check_lsh_autotune),
    ("curated_epoch_manifest", check_curated_epoch),
    ("semantic_decontamination", check_semantic_decon),
    ("cross_corpus_contamination", check_xcorpus_contam),
    ("embedding_mmd_drift", check_mmd_drift),
    ("lsh_candidate_recall_audit", check_lsh_recall),
]


def main() -> int:
    spark = get_spark("lane_check")
    failed = 0
    results: dict[str, dict] = {}
    for name, fn in CHECKS:
        t0 = time.perf_counter()
        try:
            ok, detail = fn(spark)
        except Exception as exc:  # noqa: BLE001 — report, keep checking
            ok, detail = False, f"error: {exc}"
        release_caches(fixtures=True)
        results[name] = {
            "pass": bool(ok),
            "detail": str(detail),
            "sec": round(time.perf_counter() - t0, 3),
        }
        print(f"{'PASS' if ok else 'FAIL'} {name}: {detail}", flush=True)
        failed += 0 if ok else 1
    print(f"\n{len(CHECKS) - failed} pass, {failed} fail at {SF}")
    if JSON_OUT:
        with open(JSON_OUT, "w") as fh:
            json.dump(
                {
                    "sf_dir": SF,
                    "n_pass": len(CHECKS) - failed,
                    "n_fail": failed,
                    "checks": results,
                },
                fh,
                indent=1,
            )
        print(f"wrote {JSON_OUT}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
