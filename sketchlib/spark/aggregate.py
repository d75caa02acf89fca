"""Two-stage distributed sketch aggregation.

Spark has no Python UDAF with a partial/final split, so we build the classic
two-phase aggregation explicitly (SURVEY.md §4):

* **stage 1 — partial build** (``mapInPandas``): each input partition streams
  through a Python worker as Arrow batches; per (group, partition) one partial
  sketch is built with vectorized numpy (batch hash + register max).  Output:
  one row per group per partition — ``(group_cols..., sketch: binary)``.
  This caps shuffle volume at ``#partitions x #groups x sketch_size`` no
  matter how many raw rows went in, and removes data skew from the shuffle:
  a hot group contributes at most one partial per partition.
* **stage 2 — final merge** (``groupBy(group).applyInPandas``): fold-merge the
  group's partials (register-wise max — associative & commutative, so any
  merge order yields bit-identical canonical bytes).

This is the DataFrame-native equivalent of the reference's build-then-Merge
pipeline (``CardinalityEstimator.cs:704-730``, ``CardinalityEstimatorExtensions.cs:87-103``)
and of RDD ``treeAggregate`` — Spark's shuffle IS the parallel merge.

The reference's ``ParallelAdd`` partition strategies (``CardinalityEstimatorExtensions.cs:224-322``)
map to explicit repartitioning: Hash -> ``repartition(n, col)``,
RoundRobin -> ``repartition(n)``, Chunked -> ``coalesce(n)``; see
:mod:`sketchlib.spark.skew` for the salting used on Zipf-skewed inputs.
"""

from __future__ import annotations

from typing import Iterable, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..encoding import encode_binary_series, encode_numeric_batch, encode_string_series
from ..hashing import HASHES
from ..hll import HllSketch


def hash_series(series: pd.Series, hash_name: str = "murmur3") -> np.ndarray:
    """Vectorized 64-bit hash of a pandas Series using the normative element
    encodings (sketchlib.encoding).  Integer width follows the Spark column
    type (int32 -> 4-byte LE, int64 -> 8-byte LE), matching the reference's
    distinct Add(int)/Add(long) encodings."""
    _scalar, flat_fn = HASHES[hash_name]
    dt = series.dtype
    if pd.api.types.is_integer_dtype(dt):
        kind = "int32" if dt.itemsize == 4 else "int64"
        flat, offsets = encode_numeric_batch(series.to_numpy(), kind)
    elif pd.api.types.is_float_dtype(dt):
        kind = "float32" if dt.itemsize == 4 else "float64"
        flat, offsets = encode_numeric_batch(series.to_numpy(), kind)
    elif pd.api.types.is_datetime64_any_dtype(dt):
        flat, offsets = encode_numeric_batch(series.to_numpy("datetime64[us]").view(np.int64), "int64")
    else:
        first = series.iloc[0] if len(series) else ""
        if isinstance(first, (bytes, bytearray)):
            flat, offsets = encode_binary_series(series)
        else:
            flat, offsets = encode_string_series(series)
    return flat_fn(flat, offsets)


def hash_columns(pdf: pd.DataFrame, cols: Sequence[str], hash_name: str = "murmur3") -> np.ndarray:
    """Composite element hash.  Single column: the element hash itself
    (reference-compatible).  Multi-column: hash of the concatenated per-column
    hashes (16/24/... fixed-width bytes) — unambiguous, vectorized, and
    library-normative (the reference is single-element only)."""
    per = [hash_series(pdf[c], hash_name) for c in cols]
    if len(per) == 1:
        return per[0]
    _scalar, flat_fn = HASHES[hash_name]
    combo = np.empty((per[0].shape[0], len(per)), dtype="<u8")
    for j, h in enumerate(per):
        combo[:, j] = h
    flat = combo.reshape(-1).view(np.uint8)
    offsets = np.arange(per[0].shape[0] + 1, dtype=np.int64) * (8 * len(per))
    return flat_fn(flat, offsets)


class HllSpec:
    """Sketch-spec protocol binding :class:`HllSketch` into the two-stage
    aggregation.  Sibling sketches (bloom/cms/kll/tdigest) implement the same
    four methods plus ``estimate_fields``."""

    name = "hll"

    def __init__(self, p: int = 14, hash_name: str = "murmur3",
                 use_direct_counting: bool = True) -> None:
        self.p = p
        self.hash_name = hash_name
        self.use_direct_counting = use_direct_counting

    def make(self):
        return HllSketch(p=self.p, use_direct_counting=self.use_direct_counting)

    def prepare(self, pdf: pd.DataFrame, element_cols: Sequence[str]) -> np.ndarray:
        return hash_columns(pdf, element_cols, self.hash_name)

    def ingest(self, sketch: HllSketch, prepared: np.ndarray) -> None:
        sketch.add_hashes(prepared)

    def to_bytes(self, sketch: HllSketch) -> bytes:
        return sketch.to_bytes()

    def from_bytes(self, blob: bytes) -> HllSketch:
        return HllSketch.from_bytes(blob)

    def merge(self, a: HllSketch, b: HllSketch) -> HllSketch:
        a.merge(b)
        return a

    estimate_type = T.LongType()

    def estimate(self, sketch: HllSketch) -> int:
        return sketch.count()


def _group_field(df: DataFrame, name: str) -> T.StructField:
    f = df.schema[name]
    return T.StructField(f.name, f.dataType, True)


def build_partials(df: DataFrame, element_cols: Sequence[str] | str,
                   group_cols: Sequence[str] = (), spec: HllSpec | None = None,
                   sketch_col: str = "sketch") -> DataFrame:
    """Stage 1: one partial sketch per (group, input partition).

    Only ``group_cols + element_cols`` are selected, so Catalyst prunes every
    other column at the scan (never deserializes e.g. an ``html`` payload)."""
    if isinstance(element_cols, str):
        element_cols = [element_cols]
    element_cols = list(element_cols)
    group_cols = list(group_cols)
    spec = spec or HllSpec()

    out_schema = T.StructType(
        [_group_field(df, g) for g in group_cols] + [T.StructField(sketch_col, T.BinaryType(), False)]
    )

    def build(batches: Iterable[pd.DataFrame]):
        sketches: dict[tuple, object] = {}
        for pdf in batches:
            pdf = pdf.dropna(subset=element_cols)
            if pdf.empty:
                continue
            prepared = spec.prepare(pdf, element_cols)
            if group_cols:
                indices = pdf.groupby(group_cols, sort=False, dropna=False).indices
                for key, idx in indices.items():
                    k = key if isinstance(key, tuple) else (key,)
                    sk = sketches.get(k)
                    if sk is None:
                        sk = spec.make()
                        sketches[k] = sk
                    spec.ingest(sk, prepared[idx])
            else:
                sk = sketches.get(())
                if sk is None:
                    sk = spec.make()
                    sketches[()] = sk
                spec.ingest(sk, prepared)
        if sketches:
            rows = [list(k) + [spec.to_bytes(s)] for k, s in sketches.items()]
            yield pd.DataFrame(rows, columns=group_cols + [sketch_col])

    needed = list(dict.fromkeys(group_cols + element_cols))  # dedupe overlap
    return df.select(*needed).mapInPandas(build, out_schema)


def merge_partials(partials: DataFrame, group_cols: Sequence[str] = (),
                   spec: HllSpec | None = None, sketch_col: str = "sketch") -> DataFrame:
    """Stage 2: fold-merge each group's partial sketches into one."""
    group_cols = list(group_cols)
    spec = spec or HllSpec()
    out_schema = T.StructType(
        [_group_field(partials, g) for g in group_cols]
        + [T.StructField(sketch_col, T.BinaryType(), False)]
    )

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        merged = None
        for blob in pdf[sketch_col]:
            sk = spec.from_bytes(bytes(blob))
            merged = sk if merged is None else spec.merge(merged, sk)
        head = pdf.iloc[[0]][group_cols].reset_index(drop=True)
        head[sketch_col] = [spec.to_bytes(merged)]
        return head

    if not group_cols:
        # global aggregate: single group -> single-partition applyInPandas
        def merge_global(pdf: pd.DataFrame) -> pd.DataFrame:
            out = merge(pdf.drop(columns=["__g"]))
            out.insert(0, "__g", 1)
            return out

        global_schema = T.StructType([T.StructField("__g", T.IntegerType())] + list(out_schema))
        return (partials.withColumn("__g", F.lit(1))
                .groupBy("__g").applyInPandas(merge_global, global_schema)
                .drop("__g"))
    return partials.groupBy(*group_cols).applyInPandas(merge, out_schema)


def estimate_col(spec: HllSpec | None = None, sketch_col: str | Column = "sketch") -> Column:
    """Scalar estimate as a vectorized pandas UDF over sketch blobs (one blob
    per group — Python cost is per-group, not per-row)."""
    spec = spec or HllSpec()

    @F.pandas_udf(spec.estimate_type)
    def _estimate(blobs: pd.Series) -> pd.Series:
        return pd.Series([spec.estimate(spec.from_bytes(bytes(b))) for b in blobs])

    return _estimate(sketch_col if isinstance(sketch_col, Column) else F.col(sketch_col))


def sketch_agg(df: DataFrame, element_cols, group_cols: Sequence[str] = (),
               spec: HllSpec | None = None, sketch_col: str = "sketch") -> DataFrame:
    """Full two-stage aggregation -> one sketch blob per group."""
    spec = spec or HllSpec()
    partials = build_partials(df, element_cols, group_cols, spec, sketch_col)
    return merge_partials(partials, group_cols, spec, sketch_col)


def distinct_count(df: DataFrame, element_cols, group_cols: Sequence[str] = (),
                   p: int = 14, hash_name: str = "murmur3",
                   estimate_name: str = "estimate") -> DataFrame:
    """Approximate ``COUNT(DISTINCT element_cols...)`` per group via HLL.

    Exact (direct-count mode) for groups with <= 100 distinct elements;
    within 1.04/sqrt(2^p) relative std-error beyond (README.md:58).
    """
    spec = HllSpec(p=p, hash_name=hash_name)
    merged = sketch_agg(df, element_cols, group_cols, spec)
    cols = list(group_cols) + [estimate_col(spec).alias(estimate_name)]
    return merged.select(*cols)
