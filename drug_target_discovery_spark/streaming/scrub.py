"""Streaming PII scrub — round 13's redaction pass as a Structured
Streaming ingest stage.

A production corpus scrubs on INGEST, not in a nightly batch: documents
arrive on a feed, the redaction is a stateless map-side projection (the
cheapest possible streaming stage — no state, no watermark needed), and
the audit census the batch operator reports per source becomes a
watermark-bounded tumbling-window aggregate per (window, source) — the
shape a governance dashboard tails.

Shares every expression with the batch operator
(``queries.round13.pii_redaction_census``): same three Java-regex
patterns, same typed-placeholder redaction column, same sequential
char-mass definition — the batch twin of the census is pinned equal to
the batch operator's per-source totals in tests/test_streaming.py.

Reference parity note: the reference engine (pipeline2.py) has no
streaming surface; this extends the engine's §2.10 streaming tier for
LLM-data-pipeline work as SURVEY.md directs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from drug_target_discovery_spark.queries.round13 import (
    PII_EMAIL_RE,
    PII_IPV4_RE,
    PII_PHONE_RE,
    pii_redacted_col,
)


def scrub_ingest(docs: DataFrame) -> DataFrame:
    """The map-only scrub stage: every input column passes through,
    plus per-family match counts, the exact sequential-redaction char
    mass, and ``text_redacted`` (typed placeholder tokens — the column
    the sink writes instead of ``text``). Stateless projection: works
    identically on batch and streaming input, needs no watermark, and
    at 100 TB is scan-bound — the floor for any pass that must read
    every byte. Zero UDF: three ``regexp_count`` + two chained
    ``regexp_replace`` expressions, all codegen."""
    t = F.col("text")
    return docs.select(
        "*",
        F.regexp_count(t, F.lit(PII_EMAIL_RE)).alias("n_email"),
        F.regexp_count(t, F.lit(PII_PHONE_RE)).alias("n_phone"),
        F.regexp_count(t, F.lit(PII_IPV4_RE)).alias("n_ip"),
        (F.length(t) - F.length(pii_redacted_col(t, "", "", ""))).alias(
            "pii_chars"
        ),
        pii_redacted_col(t).alias("text_redacted"),
    )


def scrub_ingest_census(
    docs: DataFrame,
    ts_col: str = "fetched_at",
    window: str = "10 minutes",
    watermark: str | None = "1 hour",
) -> DataFrame:
    """The governance dashboard's feed: per (tumbling ``window``,
    source) scrub census over the ingest stream — document count,
    per-family hit-doc/match counts, redacted char mass. Append-mode
    safe: the watermark bounds window state (a window finalizes and
    emits once the watermark passes its end; later-than-horizon
    stragglers are dropped — the documented trade of every streaming
    census). The batch twin (non-streaming input) is the same plan
    minus the watermark, and its per-source totals summed over windows
    equal the batch operator's census — pinned in tests.

    Scale shape: the scrub is the stateless projection above; the
    census aggregate is map-side combinable and its state is bounded
    by (windows in the watermark horizon) x (source vocabulary),
    independent of document volume.
    """
    scored = scrub_ingest(docs)
    if scored.isStreaming:
        if watermark is None:
            # Spark itself rejects an append-mode windowed aggregate
            # with no watermark, but only at stream START with a plan
            # dump; fail at construction with the actual reason.
            raise ValueError(
                "scrub_ingest_census: a streaming census needs a "
                "watermark to bound window state and finalize windows; "
                "pass watermark='<horizon>' (or run the batch twin)"
            )
        scored = scored.withWatermark(ts_col, watermark)
    hit = (F.col("n_email") + F.col("n_phone") + F.col("n_ip")) > 0
    g = scored.groupBy(
        F.window(F.col(ts_col), window).alias("win"), F.col("source")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("n_email") > 0).cast("long")).alias("n_email_docs"),
        F.sum("n_email").cast("long").alias("n_emails"),
        F.sum((F.col("n_phone") > 0).cast("long")).alias("n_phone_docs"),
        F.sum("n_phone").cast("long").alias("n_phones"),
        F.sum((F.col("n_ip") > 0).cast("long")).alias("n_ip_docs"),
        F.sum("n_ip").cast("long").alias("n_ips"),
        F.sum("pii_chars").cast("long").alias("pii_chars"),
        F.sum(hit.cast("long")).alias("n_hit"),
    )
    return g.select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        "source",
        "n_docs",
        "n_email_docs",
        "n_emails",
        "n_phone_docs",
        "n_phones",
        "n_ip_docs",
        "n_ips",
        "pii_chars",
        "n_hit",
    )
