"""Crawl-snapshot delta: added / removed / changed / unchanged urls
between two crawls of the same corpus — the bookkeeping every
incremental Common-Crawl-style pipeline runs before deciding what to
re-process (no reference analogue; pipeline surface per SURVEY.md §8.3).

Scale shape: each side is projected to ``(key, 8-byte fingerprint)``
BEFORE the join, so the full-outer join — the one unavoidable shuffle —
moves ~(url + 8B) per row, never text or html.  Per-side key dedup is a
map-side-combinable ``groupBy(key).agg(min/max(struct))`` (deterministic
winner; with ``ts_col`` the LATEST capture wins, ties broken by
fingerprint).  Keys are effectively unique per crawl after that, so the
join is skew-free by construction.

For the common "what changed vs a corpus too large to rescan" case,
compose differently: keep a cuckoo/Bloom seen-set and use
:func:`sketchlib.dedup.incremental.drop_seen` — this module is for the
exact two-snapshot diff where both sides are readable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STATUSES = ("added", "removed", "changed", "unchanged")


def _one_per_key(df: DataFrame, key_col: str, fingerprint: Column,
                 ts_col: str | None, out_fp: str) -> DataFrame:
    """(key, fingerprint) with exactly one row per key: winner = max
    (ts, fp) struct when ``ts_col`` is given (latest capture, ties by
    fingerprint), else min(fp) — deterministic either way.  Null keys
    are dropped (a url-less page can't be tracked across crawls)."""
    d = df.filter(F.col(key_col).isNotNull())
    if ts_col is not None:
        w = (d.select(F.col(key_col).alias("__key"),
                      F.struct(F.col(ts_col).alias("ts"),
                               fingerprint.alias("fp")).alias("__w"))
             .groupBy("__key").agg(F.max("__w").alias("__w")))
        return w.select("__key", F.col("__w.fp").alias(out_fp))
    return (d.select(F.col(key_col).alias("__key"),
                     fingerprint.alias("__fp"))
            .groupBy("__key").agg(F.min("__fp").alias(out_fp)))


def crawl_delta(old: DataFrame, new: DataFrame, key_col: str = "url",
                fingerprint: Column | None = None,
                ts_col: str | None = None) -> DataFrame:
    """Per-key diff of two crawl snapshots:
    ``(key, status, old_fp, new_fp)`` with status in
    added / removed / changed / unchanged.

    ``fingerprint`` is the content-identity expression evaluated against
    EACH side's rows (default ``xxhash64(text)``); rows whose
    fingerprints are null on both sides compare null-safe as unchanged.
    ``ts_col`` picks the latest capture per key within each snapshot
    (otherwise the minimum fingerprint wins — deterministic)."""
    fp = fingerprint if fingerprint is not None else F.xxhash64("text")
    o = (_one_per_key(old, key_col, fp, ts_col, "old_fp")
         .withColumn("__in_old", F.lit(True)))
    n = (_one_per_key(new, key_col, fp, ts_col, "new_fp")
         .withColumn("__in_new", F.lit(True)))
    j = o.join(n, "__key", "full_outer")
    status = (F.when(F.col("__in_old").isNull(), F.lit("added"))
              .when(F.col("__in_new").isNull(), F.lit("removed"))
              .when(F.col("old_fp").eqNullSafe(F.col("new_fp")),
                    F.lit("unchanged"))
              .otherwise(F.lit("changed")))
    return j.select(F.col("__key").alias(key_col),
                    status.alias("status"), "old_fp", "new_fp")


def delta_summary(delta: DataFrame) -> DataFrame:
    """(status, n_keys) — all four statuses present, zero-filled, so
    downstream alerting never key-errors on an absent status."""
    spark = delta.sparkSession
    all_s = spark.createDataFrame([(s,) for s in STATUSES],
                                  "status string")
    counts = delta.groupBy("status").agg(F.count(F.lit(1)).alias("n_keys"))
    return (all_s.join(counts, "status", "left")
            .select("status",
                    F.coalesce("n_keys", F.lit(0)).alias("n_keys")))
