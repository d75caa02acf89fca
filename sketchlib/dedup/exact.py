"""Exact deduplication: hash-groupBy on a content fingerprint.

Scale shape: one shuffle on the 64-bit fingerprint (8 bytes/row, not the
document body), then a window/min per group. The fingerprint is computed
JVM-side (xxhash64 of normalized text) so the scan never feeds text through
Python; at 100 TB the shuffle payload is id+fingerprint only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..text.analysis import fingerprint_key


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                extra_key_cols: tuple = ()) -> DataFrame:
    """Keep one row per distinct normalized text (lowest id wins —
    deterministic). Returns the surviving rows with all original columns."""
    key: Column = fingerprint_key(F.col(text_col))
    parts = [key] + [F.col(c) for c in extra_key_cols]
    w = Window.partitionBy(*parts).orderBy(F.col(id_col).asc())
    return (df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).drop("__rn"))


def dedup_summary(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """One-row dedup audit ``(n_docs, n_kept, id_checksum)`` in a SINGLE
    scan: total rows, surviving groups, and the checksum of kept ids (min
    id per normalized-text group — the same survivor rule as
    :func:`dedup_exact`).

    Scale shape: one partial-aggregable groupBy on the 8-byte fingerprint
    (count + min combine map-side), then a global fold of the tiny group
    table — no window sort, and no separate ``df.count()`` scan (at 100 TB
    that second scan is a full extra pass over the corpus)."""
    key: Column = fingerprint_key(F.col(text_col))
    groups = df.groupBy(key.alias("__fp")).agg(
        F.count("*").alias("__c"), F.min(id_col).alias("__m"))
    # coalesce(agg, 0): an empty corpus audits as 0 docs, not NULL.
    # Checksum via bit_xor, not sum: kept ids at web scale are 64-bit
    # hash values and summing them overflows long (ANSI error / wrap).
    return groups.agg(
        F.coalesce(F.sum("__c"), F.lit(0)).alias("n_docs"),
        F.count("*").alias("n_kept"),
        F.coalesce(F.bit_xor("__m"), F.lit(0)).alias("id_checksum"))


def duplicate_groups(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Histogram of duplicate-group sizes: (group_size, n_groups) — the
    standard dedup audit output."""
    key = fingerprint_key(F.col(text_col))
    sizes = df.groupBy(key.alias("__fp")).agg(F.count("*").alias("group_size"))
    return (sizes.groupBy("group_size").agg(F.count("*").alias("n_groups"))
            .orderBy("group_size"))
