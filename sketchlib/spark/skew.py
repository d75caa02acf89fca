"""Explicit skew & shuffle handling (north rule: "partitioning / shuffle /
skew handled explicitly").

Web text is Zipf-skewed: one ``lang`` (en) dominates, a few hosts dominate
urls. The two-stage sketch aggregation is already skew-*resistant* — a hot
group contributes at most one partial sketch per input partition, so stage 2
never shuffles raw rows of the hot key. Two residual skew points remain, each
with an explicit tool here:

1. **Input-side skew**: a ``lang``-partitioned table puts 60% of bytes in
   one directory; Spark's scan splits big files by ``maxPartitionBytes``, but
   downstream per-partition state (one sketch per group per partition) is
   cheapest when rows of a group are *co-located*, and salting spreads a hot
   group across exactly ``s`` tasks instead of all of them.
   ``salted_repartition(df, cols, s)`` shuffles on ``(cols..., salt)`` with a
   deterministic salt — mergeability makes the final estimate *identical*
   (register max is idempotent), which test_salting_exact pins.

2. **Merge fan-in skew**: at 10k input partitions a single group's stage-2
   ``collect_list`` holds 10k blobs (160 MB of dense HLLs) in one task.
   ``tree_merge_partials`` inserts salted pre-merge levels —
   ``groupBy(keys, pmod(partition_salt, fanout))`` then ``groupBy(keys)`` —
   the DataFrame form of ``treeAggregate`` (reference analog:
   ``ParallelMerge``, CardinalityEstimatorExtensions.cs:87-103).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .aggregate import merge_blobs_udf


def salt_col(df: DataFrame, buckets: int, source_cols: Sequence[str] | None = None):
    """Deterministic salt in [0, buckets): hash of high-cardinality source
    columns (never rand() — reruns must produce identical partials)."""
    cols = [F.col(c) for c in (source_cols or df.columns)]
    return F.pmod(F.xxhash64(*cols), F.lit(buckets))


def salted_repartition(df: DataFrame, cols: Sequence[str], buckets: int,
                       n_partitions: int | None = None,
                       salt_source: Sequence[str] | None = None) -> DataFrame:
    """Repartition on ``(cols..., salt)`` so a hot key spreads over exactly
    ``buckets`` tasks. Safe for any mergeable downstream aggregation."""
    s = salt_col(df, buckets, salt_source)
    parts = [F.col(c) for c in cols] + [s]
    return df.repartition(n_partitions, *parts) if n_partitions else df.repartition(*parts)


def tree_merge_capped(partials: DataFrame, group_cols: Sequence[str] = (),
                      spec=None, sketch_col: str = "sketch",
                      fanout: int = 8,
                      n_partials: int | None = None) -> DataFrame:
    """Fold-merge partial sketches so that NO task ever folds more than
    ~``fanout`` blobs, whatever the partial count: salt width starts at
    ``ceil(P / fanout)`` and shrinks by ``fanout`` each round
    (:func:`tree_merge_partials` keeps a FIXED salt width, so its level-0
    tasks still fold P/fanout blobs — fine for cheap bitwise merges like
    HLL/Bloom, wrong for merges that are O(sketch size) per blob, e.g. the
    cuckoo filter's fingerprint re-insertion).

    Set-level associativity+commutativity of the merge is the only
    requirement; pass ``n_partials`` when the caller already knows P (one
    ``getNumPartitions`` otherwise)."""
    from .aggregate import HllSpec, merge_blobs_udf

    group_cols = list(group_cols)
    spec = spec or HllSpec()
    merge = merge_blobs_udf(spec)
    if fanout < 2:
        raise ValueError("fanout must be >= 2 (1 can never shrink the "
                         "salt width and would loop forever)")
    p = n_partials if n_partials is not None else \
        partials.rdd.getNumPartitions()
    df = partials
    width = (max(p, 1) + fanout - 1) // fanout
    level = 0
    while width > 1:
        # salt by (blob, SOURCE PARTITION, level) — all deterministic
        # under stage retries (monotonically_increasing_id is not: its
        # row counter follows shuffle-fetch arrival order, so a retried
        # map task re-salts blobs differently and a partial can be
        # dropped or folded twice — fatal for additive merges).  The
        # partition id is what separates byte-identical partials (a
        # replicated dimension produces one identical blob per partition;
        # blob-only hashing would collapse them into a single bin and
        # re-create the flat fold this tree exists to avoid).
        salt = F.pmod(F.xxhash64(F.col(sketch_col),
                                 F.spark_partition_id().cast("long"),
                                 F.lit(level)), F.lit(width))
        df = (df.withColumn("__salt", salt)
                .groupBy(*group_cols, "__salt")
                .agg(F.collect_list(sketch_col).alias("__blobs"))
                .select(*group_cols, merge("__blobs").alias(sketch_col)))
        width = (width + fanout - 1) // fanout
        level += 1
    collected = F.collect_list(sketch_col).alias("__blobs")
    agged = (df.groupBy(*group_cols).agg(collected) if group_cols
             else df.agg(collected))
    return agged.select(*group_cols, merge("__blobs").alias(sketch_col))


def tree_merge_partials(partials: DataFrame, group_cols: Sequence[str] = (),
                        spec=None, sketch_col: str = "sketch",
                        fanout: int = 64, levels: int = 1) -> DataFrame:
    """Fold-merge partial sketches with ``levels`` salted pre-merge rounds
    before the final per-group merge. With P partials per group, each task in
    round i merges ~P/fanout^i blobs — no single task sees the full fan-in.

    Correctness relies only on merge associativity+commutativity, which the
    canonical-bytes tests pin; the result is bit-identical to a flat merge.
    """
    from .aggregate import HllSpec

    group_cols = list(group_cols)
    spec = spec or HllSpec()
    merge = merge_blobs_udf(spec)
    df = partials
    for level in range(levels):
        salt = F.pmod(F.xxhash64(F.col(sketch_col), F.lit(level)), F.lit(fanout))
        df = (df.withColumn("__salt", salt)
                .groupBy(*group_cols, "__salt")
                .agg(F.collect_list(sketch_col).alias("__blobs"))
                .select(*group_cols, merge("__blobs").alias(sketch_col)))
    collected = F.collect_list(sketch_col).alias("__blobs")
    if group_cols:
        agged = df.groupBy(*group_cols).agg(collected)
    else:
        agged = df.agg(collected)
    return agged.select(*group_cols, merge("__blobs").alias(sketch_col))
