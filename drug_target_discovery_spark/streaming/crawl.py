"""Streaming crawl-ingest URL dedup — round 13's incremental CCNet pass
as a Structured Streaming stage.

A production crawl arrives as a STREAM, not a batch: the canonical-URL
dedup that ``queries.round13.incremental_url_dedup_by_domain`` runs as
a batch rollup has a streaming front half — drop re-crawls of URLs the
reference corpus already holds, then keep only the first arrival of
each new canonical URL — and that front half is exactly expressible
with stream-static anti-join + watermark-bounded dedup state, no custom
stateful operator needed.

Reference parity note: the reference engine (pipeline2.py) has no
streaming surface; this extends the engine's §2.10 streaming tier for
LLM-data-pipeline work as SURVEY.md directs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from drug_target_discovery_spark.queries.round12 import (
    canonical_host_col,
    canonical_url_col,
)


def crawl_ingest_url_dedup(
    crawl: DataFrame,
    ref_urls: DataFrame,
    ts_col: str = "fetched_at",
    watermark: str | None = "1 hour",
    broadcast_ref: bool = True,
) -> DataFrame:
    """The streaming CCNet first pass over a crawl feed: canonicalize
    each fetched URL map-side, drop documents whose canonical URL the
    reference corpus already holds, and keep only the FIRST arrival of
    each new canonical URL. Output = the novel-document stream handed
    to content hashing / quality scoring, with ``canon_url`` and
    ``domain`` columns added.

    - ``crawl``: streaming (or batch-twin) DataFrame carrying at least
      (url, ``ts_col``); every input column passes through.
    - ``ref_urls``: the STATIC reference canonical-URL set — one
      ``canon_url`` column (at scale, the precomputed crawl-index table
      the batch operator's docstring describes). Stream-static LEFT
      ANTI join; broadcast by default so the unbounded stream side
      never shuffles for it (``broadcast_ref=False`` for reference sets
      beyond broadcast size — the anti-join then shuffles the stream on
      canon_url, the same key the dedup state uses).
    - within-stream dedup: ``dropDuplicatesWithinWatermark`` on
      canon_url — per-key state expires at the watermark, the ONLY
      dedup form whose state survives an unbounded crawl (a crawl
      frontier re-fetches the same URL within hours, not months, so a
      bounded horizon is the semantics you want anyway). The batch twin
      (``watermark=None`` or a non-streaming input) is plain
      ``dropDuplicates`` on the same key.

    Determinism note (pinned in tests): the SET of surviving canonical
    URLs is deterministic; WHICH document represents a canonical group
    is arrival-order (streaming) or partition-order (batch) — callers
    needing the quality-argmax representative run the batch
    ``url_canonical_dedup`` pass over the accumulated corpus instead.

    Evidence class: pytest pins (streaming/batch parity + cross-batch
    watermark-state dedup) + a lane_check batch-twin oracle on the
    deterministic columns; no driver SQL oracle by nature (streaming).
    """
    canon = crawl.withColumn(
        "canon_url", canonical_url_col(F.col("url"))
    ).withColumn("domain", canonical_host_col(F.col("url")))
    ref = F.broadcast(ref_urls) if broadcast_ref else ref_urls
    novel = canon.join(ref, "canon_url", "left_anti")
    if novel.isStreaming:
        if watermark is None:
            # Spark would ACCEPT dropDuplicates on a stream — with
            # per-key state growing unbounded (one entry per distinct
            # canonical URL, forever). Fail fast instead: an unbounded
            # crawl feed needs the watermark-bounded form.
            raise ValueError(
                "crawl_ingest_url_dedup: a streaming input requires a "
                "watermark — unbounded dropDuplicates state does not "
                "survive an unbounded crawl; pass watermark='<horizon>'"
            )
        return novel.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            ["canon_url"]
        )
    return novel.dropDuplicates(["canon_url"])
