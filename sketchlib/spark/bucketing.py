"""Bucketed-table helpers — co-located storage for shuffle-free joins.

At 100 TB the dominant cost of repeated join/dedup pipelines is the
exchange: every join on ``fingerprint`` / ``doc_id`` / ``url_host``
re-shuffles the full table.  Spark's bucketing fixes the partitioning *in
storage*: rows are written into ``n_buckets`` files per partition by
``hash(bucket_col)``, the catalog remembers it, and any join or aggregation
keyed on the bucket column reads both sides already co-partitioned — the
physical plan has NO Exchange (verified in tests/test_bucketing.py).

Typical sketchlib uses:

* exact-dedup fingerprint tables joined against tomorrow's crawl,
* MinHash/SimHash candidate pairs re-verified against the corpus by doc_id,
* materialized sketch-partial tables rolled up repeatedly by group key
  (bucket on the group key -> rollups never exchange raw partials).

Bucket counts should divide evenly into cluster cores (e.g. 4096 buckets on
a 1000-executor cluster); both join sides must use the SAME count, or one
side must be a multiple of the other (Spark coalesces bucket scans).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame


def write_bucketed(df: DataFrame, table: str, bucket_cols: str | Sequence[str],
                   n_buckets: int, path: str | None = None,
                   sorted_by: str | Sequence[str] | None = None,
                   mode: str = "overwrite") -> DataFrame:
    """Materialize ``df`` as a bucketed (optionally sort-within-bucket)
    table and return a DataFrame reading it back through the catalog (the
    catalog read is what carries the bucketing guarantee — a plain
    ``spark.read.parquet`` of the same files would not).

    ``path`` makes it an external table (data at ``path``, metadata in the
    session catalog); omit it to use the warehouse dir."""
    if isinstance(bucket_cols, str):
        bucket_cols = [bucket_cols]
    bucket_cols = list(bucket_cols)
    w = (df.write.mode(mode)
         .bucketBy(n_buckets, bucket_cols[0], *bucket_cols[1:]))
    if sorted_by is not None:
        if isinstance(sorted_by, str):
            sorted_by = [sorted_by]
        w = w.sortBy(sorted_by[0], *sorted_by[1:])
    if path is not None:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)
    return df.sparkSession.table(table)


def colocated_join(left: DataFrame, right: DataFrame,
                   on: str | Sequence[str], how: str = "inner") -> DataFrame:
    """Join two (bucketed) tables on their bucket key with broadcast
    disabled for this plan, so equal bucketing yields an exchange-free
    sort-merge join.  Works on any DataFrames — bucketing is what removes
    the exchange, this wrapper only stops AQE from silently substituting a
    broadcast (which would hide a missing co-location at test scale)."""
    from pyspark.sql import functions as F

    on = [on] if isinstance(on, str) else list(on)
    hinted = left.hint("merge").join(right.hint("merge"), on=on, how=how)
    return hinted
