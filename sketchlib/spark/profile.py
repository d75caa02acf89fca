"""One-pass multi-column table profiler (the "what is in this table?" scan).

Before cleaning 100 TB you profile it: row count, null fraction, min/max,
and distinct cardinality per column. Exact per-column COUNT(DISTINCT) is a
full shuffle *per column*; the profiler instead builds one HLL sketch per
column in a single scan:

- exact scalars (count / nulls / min / max) come from ONE whole-stage-codegen
  aggregate over the unmelted table (no shuffle beyond the 1-row agg);
- distinct estimates come from ONE melted scan: each row explodes to
  (column_name, xxhash64(value)) pairs — 8 bytes per cell, computed JVM-side,
  regardless of value width — then the standard two-stage sketch aggregation
  groups by column name (N_columns groups, blob-only shuffle).

Total: two scans for any number of columns, versus N_columns exact-distinct
shuffles of raw values. The melt multiplies rows by N_columns but each melted
row is a (small string, int64) pair, and Catalyst prunes every unprofiled
column at the scan.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

from .aggregate import HllSpec, estimate_col, sketch_agg


def profile_columns(df: DataFrame, columns: Sequence[str] | None = None,
                    p: int = 14) -> DataFrame:
    """Profile ``columns`` (default: all top-level columns) in two scans.

    Returns one row per column:
    ``(column, n_rows, n_nulls, min_value, max_value, distinct_estimate)``
    with min/max cast to string (uniform schema across column types) and
    the distinct estimate from a per-column HLL over 64-bit JVM fingerprints
    (exact for <=100-distinct columns via direct-count mode; within
    1.04/sqrt(2^p) beyond).
    """
    cols = list(columns) if columns is not None else list(df.columns)
    if not cols:
        raise ValueError("profile_columns needs at least one column")

    # scan 1: exact scalars, one codegen'd aggregate row
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        aggs.append(F.count(F.col(c)).alias(f"__nn_{i}"))
        aggs.append(F.min(F.col(c)).cast("string").alias(f"__min_{i}"))
        aggs.append(F.max(F.col(c)).cast("string").alias(f"__max_{i}"))
    [row] = df.agg(*aggs).collect()
    spark = df.sparkSession
    exact = spark.createDataFrame(
        [(c, int(row["__n"]), int(row["__n"]) - int(row[f"__nn_{i}"]),
          row[f"__min_{i}"], row[f"__max_{i}"])
         for i, c in enumerate(cols)],
        "column string, n_rows long, n_nulls long, "
        "min_value string, max_value string")

    # scan 2: melted per-column fingerprints -> one HLL per column.
    # xxhash64 is computed before the explode so each melted cell is 8 bytes;
    # nulls melt to a null fingerprint and are dropped by the prehash path's
    # not-null filter (a null cell has no distinct value to count).
    kv = F.explode(F.array(*[
        F.struct(F.lit(c).alias("column"),
                 F.when(F.col(c).isNotNull(), F.xxhash64(c)).alias("h"))
        for c in cols])).alias("kv")
    melted = df.select(kv).select("kv.column", "kv.h")
    spec = HllSpec(p=p, prehashed=True)
    est = (sketch_agg(melted, "h", ["column"], spec)
           .select("column", estimate_col(spec).alias("distinct_estimate")))

    return exact.join(est, "column", "left").select(
        "column", "n_rows", "n_nulls", "min_value", "max_value",
        F.coalesce("distinct_estimate", F.lit(0)).alias("distinct_estimate"))


_NUMERIC_TYPES = {"byte", "short", "integer", "long", "float", "double",
                  "decimal"}


def profile_quantiles(df: DataFrame, columns: Sequence[str] | None = None,
                      spec=None) -> DataFrame:
    """One melted scan -> a mergeable quantile-sketch blob per numeric
    column: ``(column string, sketch binary)``.

    The blobs are the currency of the quantile surface: feed one to
    ``spark/quantiles.quantiles_col`` for estimates, or to
    ``spark/ranges.boundaries_from_blob`` for a zero-extra-scan
    ``balanced_sort`` — profiling the table once prices range-layout
    decisions for every numeric column at no further reads.

    Same shape as the distinct profile above: each row explodes to
    (column_name, double) pairs, the two-stage sketch aggregation groups
    by column name (N_columns groups, blob-only shuffle), and Catalyst
    prunes every unprofiled column at the scan."""
    from .specs import KllSpec

    spec = spec or KllSpec()
    if columns is None:
        columns = [f.name for f in df.schema.fields
                   if f.dataType.typeName().split("(")[0] in _NUMERIC_TYPES]
    cols = list(columns)
    if not cols:
        raise ValueError("profile_quantiles needs at least one numeric "
                         "column")
    for c in cols:
        t = df.schema[c].dataType.typeName().split("(")[0]
        if t not in _NUMERIC_TYPES:
            raise ValueError(f"column {c!r} is {t}, not numeric")
    kv = F.explode(F.array(*[
        F.struct(F.lit(c).alias("column"),
                 F.col(c).cast("double").alias("v")) for c in cols]))
    melted = df.select(kv.alias("kv")).select("kv.column", "kv.v").na.drop()
    return sketch_agg(melted, "v", ["column"], spec)
