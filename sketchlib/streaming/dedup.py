"""Streaming deduplication: exact first-occurrence dedup over an unbounded
stream with watermark-bounded state.

The batch dedup operators (:mod:`sketchlib.dedup`) assume a fixed corpus; a
continuously-ingested crawl needs the streaming equivalent: drop a document
if its content was already seen, without state growing with the stream's
lifetime.  Spark-first shape: the dedup key is a JVM-side 64-bit content
fingerprint (xxhash64 of normalized text — the same key
:func:`sketchlib.text.analysis.fingerprint_key` uses for batch exact dedup),
and the dedup itself is the built-in ``dropDuplicatesWithinWatermark``
stateful operator — JVM state store (RocksDB-capable on a real cluster),
checkpoint-recoverable, with per-key state evicted once the watermark passes
its event time.  No Python in the path.

State is O(distinct keys within the watermark horizon), NOT O(stream
lifetime) — the operator guarantees suppression of duplicates that arrive
within the watermark delay of the first occurrence, which is the
crawl-dedup contract (re-fetches cluster in time).  Lifetime-exact dedup
of an unbounded stream requires unbounded state by definition; for that,
run the batch exact-dedup over the accumulated table instead.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_dedup(stream_df: DataFrame, ts_col: str,
                    watermark: str = "1 hour",
                    key_cols: Sequence[str] | None = None,
                    text_col: str | None = None,
                    fp_col: str = "__fp") -> DataFrame:
    """First occurrence of each key survives; later arrivals within
    ``watermark`` of it are dropped.  Keys: either explicit ``key_cols`` or
    a content fingerprint of ``text_col`` (64-bit; collision odds n²/2⁶⁵ —
    at 10⁹ docs/day horizon that loses ~0.03 docs/day, far below crawl
    noise).  Exactly one of ``key_cols`` / ``text_col`` must be given.

    Returns an append-mode streaming DataFrame with the input's columns."""
    if (key_cols is None) == (text_col is None):
        raise ValueError("pass exactly one of key_cols / text_col")
    wm = stream_df.withWatermark(ts_col, watermark)
    if text_col is not None:
        from ..text.analysis import fingerprint_key

        while fp_col in stream_df.columns:  # never clobber a user column
            fp_col += "_"
        keyed = wm.withColumn(fp_col, fingerprint_key(F.col(text_col)))
        return (keyed.dropDuplicatesWithinWatermark([fp_col])
                .drop(fp_col))
    return wm.dropDuplicatesWithinWatermark(list(key_cols))
