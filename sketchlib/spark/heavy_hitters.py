"""Heavy hitters via count-min sketch + bounded per-partition candidates.

Classic two-part design (Cormode & Muthukrishnan 2005 §4; same shape as
Spark's own ``countMinSketch``-based frequent-items): the CMS alone cannot
*enumerate* heavy values (it only answers point queries), so stage 1 also
emits each partition's locally-frequent values as candidates:

* stage 1 (``mapInPandas``, one pass): per (group, partition) a partial CMS
  over all values **and** the top ``candidates_per_partition`` values by a
  *bounded* Misra–Gries-style candidate tracker (capacity ``4*n_cand``):
  every batch's per-value weight sums feed the CMS immediately (CMS cells
  are additive, so per-batch adds equal one bulk add), and when the
  candidate table exceeds ``2*cap`` entries it is compacted by subtracting
  the (cap+1)-th largest count and dropping the non-positive remainder —
  the vectorized decrement step of Misra–Gries / Space-Saving.  Executor
  memory is therefore bounded by ``#groups x (2*cap rows + cms_size)``
  regardless of how many distinct values the partition holds (urls at
  100 TB).  Any value with global frequency >= N/n_cand is still locally
  frequent in at least one partition holding >= its fair share, so the
  candidate union covers the true heavy hitters with the standard
  oversampling argument; the MG decrement only *undercounts* survivors, so
  ``local_count`` stays a valid lower bound.
* stage 2 (one shuffle, grouped ``applyInPandas``): per group, candidate
  local counts sum exactly, CMS partials fold cell-wise, every candidate is
  estimated against the merged CMS (upper-biased, overcount <= eps*N
  w.h.p.), and the top k by (estimate, value) are kept.  One pass over the
  partials — no persist/recompute, no cogroup.

Scale notes: shuffle volume is ``#partitions x #groups x (cms_size + C rows)``
— independent of input rows; the CMS at (w=4096, d=5) is 160 KB. Skewed
values are exactly what the operator is for; they cost one candidate row per
partition, not a shuffle hot key.  A group's stage-2 task folds one CMS blob
per input partition; at >=10k partitions pre-merge units via
:class:`sketchlib.spark.checkpoint.HeavyHittersCheckpoint`.
"""

from __future__ import annotations

from typing import Iterable, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .aggregate import _group_field, hash_series
from .blobcache import col_type as _col_type
from .specs import CmsSpec


def _int_weights(w: pd.Series) -> np.ndarray:
    """Validate a weight column: non-negative integral values only.

    Fractional weights used to be silently truncated by the int64 cast and
    negative weights wrapped through uint64 in the CMS cells — reject both
    loudly instead (weights are counts: bytes, occurrences, ...)."""
    arr = w.to_numpy()
    if np.issubdtype(arr.dtype, np.floating):
        if not np.isfinite(arr).all():
            raise ValueError("weight_col contains NaN/inf")
        if (arr != np.rint(arr)).any():
            raise ValueError("weight_col must hold integral values "
                             "(fractional weights would be truncated)")
        arr = arr.astype(np.int64)
    else:
        arr = arr.astype(np.int64)
    if (arr < 0).any():
        raise ValueError("weight_col must be non-negative")
    return arr


def _mg_update(cur: pd.Series | None, s: pd.Series, cap: int) -> pd.Series:
    """Fold a batch's (value -> count) sums into the bounded candidate table.

    Misra–Gries decrement, vectorized: past ``2*cap`` entries, subtract the
    (cap+1)-th largest count and keep the positive remainder (<= cap rows).
    Each survivor is undercounted by at most the sum of decrements, so the
    counts remain lower bounds; the table never exceeds ``2*cap`` entries."""
    cur = s if cur is None else cur.add(s, fill_value=0)
    if len(cur) > 2 * cap:
        a = cur.to_numpy()
        thr = np.partition(a, len(a) - cap - 1)[len(a) - cap - 1]
        cur = cur[a > thr] - thr
    return cur


def heavy_hitters_partials(df: DataFrame, value_col: str,
                           group_cols: Sequence[str] = (),
                           spec: CmsSpec | None = None,
                           n_cand: int = 80,
                           weight_col: str | None = None) -> DataFrame:
    """Stage 1 only (one pass): mixed rows of per-partition candidates
    (``value``, ``local_count``) and partial CMS blobs (``cms``). Exposed so
    checkpointed jobs can persist per-unit partials and resume.

    ``weight_col``: rank by SUM(weight) instead of row count (e.g. hosts by
    total bytes) — the CMS becomes a weighted-frequency sketch, guarantees
    unchanged (weights just scale the counters).  Weights must be
    non-negative integers.

    Candidate state is capacity-bounded (Misra–Gries decrement at
    ``cap = max(4*n_cand, 256)``); the CMS absorbs the full stream, so
    stage-2 estimates are unaffected — only ``local_count`` lower bounds
    shrink for values that survive a compaction."""
    group_cols = list(group_cols)
    spec = spec or CmsSpec()
    cap = max(4 * n_cand, 256)

    part_schema = T.StructType(
        [_group_field(df, g) for g in group_cols]
        + [T.StructField("value", _col_type(df, value_col), True),
           T.StructField("local_count", T.LongType(), True),
           T.StructField("cms", T.BinaryType(), True)]
    )

    def build(batches):
        # Arrow-native stage 1: the per-batch (value -> weight-sum) reduction
        # runs in Arrow's C++ hash aggregation and values hash straight from
        # the Arrow buffers — raw rows are NEVER materialized as pandas
        # objects (measured 6.8x on the 200k-row batch reduction alone; the
        # old mapInPandas path also paid a full per-batch string
        # materialization before the kernel even started).  Only the <=
        # uniques-sized aggregate crosses into pandas for the MG table.
        import pyarrow as pa
        import pyarrow.compute as pc

        from ..encoding import arrow_flat_bytes
        from ..hashing import HASHES

        flat_fn = HASHES[spec.hash_name][1]
        cands: dict[tuple, pd.Series] = {}   # <= 2*cap entries per group
        sketches: dict[tuple, object] = {}

        def ingest(kt: tuple, values_arr, counts: np.ndarray) -> None:
            sk = sketches.get(kt)
            if sk is None:
                sk = spec.make()
                sketches[kt] = sk
            flat, offsets = arrow_flat_bytes(values_arr)
            sk.add_hashes(flat_fn(flat, offsets), counts=counts)
            s = pd.Series(counts, index=values_arr.to_pandas().to_numpy())
            cands[kt] = _mg_update(cands.get(kt), s, cap)

        for batch in batches:
            tbl = pa.Table.from_batches([batch])
            tbl = tbl.filter(pc.is_valid(tbl[value_col]))
            if tbl.num_rows == 0:
                continue
            if weight_col is None:
                w = pa.array(np.ones(tbl.num_rows, dtype=np.int64))
            else:
                w = pa.array(_int_weights(pd.Series(
                    tbl[weight_col].to_numpy(zero_copy_only=False))))
            tbl = tbl.append_column("__w", w)
            agg = (tbl.group_by(group_cols + [value_col], use_threads=False)
                   .aggregate([("__w", "sum")]))
            vals = agg[value_col].combine_chunks()
            counts = agg["__w_sum"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            if group_cols:
                # group split on the <= uniques-sized aggregate only
                adf = agg.select(group_cols).to_pandas()
                adf["__i"] = np.arange(len(adf))
                for key, sub in adf.groupby(group_cols, sort=False,
                                            dropna=False):
                    kt = key if isinstance(key, tuple) else (key,)
                    idx = sub["__i"].to_numpy()
                    ingest(kt, vals.take(pa.array(idx)), counts[idx])
            else:
                ingest((), vals, counts)
        if not sketches:
            return
        out_rows = []
        for key, sk in sketches.items():
            top = cands[key].sort_values(ascending=False, kind="stable").head(n_cand)
            for v, c in top.items():
                out_rows.append(list(key) + [v, int(c), None])
            out_rows.append(list(key) + [None, None, spec.to_bytes(sk)])
        out = pd.DataFrame(out_rows,
                           columns=group_cols + ["value", "local_count", "cms"])
        from pyspark.sql.pandas.types import to_arrow_schema

        yield pa.RecordBatch.from_pandas(out, schema=to_arrow_schema(part_schema),
                                         preserve_index=False)

    needed = list(dict.fromkeys(group_cols + [value_col]
                                + ([weight_col] if weight_col else [])))
    return df.select(*needed).mapInArrow(build, part_schema)


def heavy_hitters_from_partials(partials: DataFrame,
                                k: int = 20, group_cols: Sequence[str] = (),
                                spec: CmsSpec | None = None) -> DataFrame:
    """Stage 2 over (possibly unioned-across-units) stage-1 partials: ONE
    grouped ``applyInPandas`` pass that sums candidate lower bounds, folds
    the group's CMS blobs cell-wise, point-estimates every candidate and
    keeps the top k.  Consumes the partials exactly once (no persist)."""
    group_cols = list(group_cols)
    spec = spec or CmsSpec()

    vtype = partials.schema["value"].dataType
    out_schema = T.StructType(
        [_group_field(partials, g) for g in group_cols]
        + [T.StructField("value", vtype, True),
           T.StructField("est_count", T.LongType(), True),
           T.StructField("lower_bound", T.LongType(), True)]
    )
    # the CMS marker rows carry NULL values, which promotes an integer value
    # column to float64 in pandas — cast candidates back to the declared type
    # so the point-query hashes the same bytes the build side hashed
    _np_value = {"long": np.int64, "integer": np.int32, "short": np.int16,
                 "byte": np.int8, "double": np.float64,
                 "float": np.float32}.get(vtype.typeName())

    def rank(pdf: pd.DataFrame) -> pd.DataFrame:
        blobs = pdf["cms"].dropna()
        cand = pdf[pdf["value"].notna()]
        if blobs.empty or cand.empty:
            return pd.DataFrame(columns=[f.name for f in out_schema.fields])
        cms = spec.from_bytes(bytes(blobs.iloc[0]))
        for b in blobs.iloc[1:]:
            cms = spec.merge(cms, spec.from_bytes(bytes(b)))
        lower = cand.groupby("value", sort=False)["local_count"].sum()
        values = pd.Series(lower.index)
        if _np_value is not None:
            values = values.astype(_np_value)
        est = cms.estimate_hashes(hash_series(values, spec.hash_name))
        out = pd.DataFrame({"value": values.to_numpy(),
                            "est_count": est.astype(np.int64),
                            "lower_bound": lower.to_numpy(dtype=np.int64)})
        out = out.sort_values(["est_count", "value"],
                              ascending=[False, True], kind="stable").head(k)
        for g in group_cols:
            out[g] = pdf[g].iloc[0]
        return out[[*group_cols, "value", "est_count", "lower_bound"]]

    if group_cols:
        return (partials.groupBy(*group_cols)
                .applyInPandas(lambda pdf: rank(pdf), out_schema))
    schema_g = T.StructType([T.StructField("__g", T.IntegerType())] + list(out_schema))
    return (partials.withColumn("__g", F.lit(1)).groupBy("__g")
            .applyInPandas(lambda pdf: rank(pdf).assign(__g=1), schema_g)
            .drop("__g"))


def heavy_hitters(df: DataFrame, value_col: str, k: int = 20,
                  group_cols: Sequence[str] = (), spec: CmsSpec | None = None,
                  candidates_per_partition: int | None = None,
                  weight_col: str | None = None) -> DataFrame:
    """Approximate top-k most frequent ``value_col`` per group.

    Returns ``(group_cols..., value, est_count, lower_bound)`` with
    ``lower_bound <= true count <= est_count`` and
    ``est_count <= true + eps*N`` w.h.p. (eps = e/width).
    """
    spec = spec or CmsSpec()
    n_cand = candidates_per_partition or max(4 * k, 64)
    partials = heavy_hitters_partials(df, value_col, group_cols, spec, n_cand,
                                      weight_col=weight_col)
    return heavy_hitters_from_partials(partials, k, group_cols, spec)


def estimate_counts(df: DataFrame, value_col: str, cms_blob: bytes,
                    spec: CmsSpec | None = None,
                    est_name: str = "est_count") -> DataFrame:
    """Point-query every row's value against one serialized CMS.

    The blob ships via ``sc.broadcast`` (torrent distribution, one copy per
    executor) rather than the UDF closure — a right-sized 100 TB CMS/Bloom
    can be GBs, and closures re-ship per task."""
    from .blobcache import (blob_digest, blob_token, broadcast_blob,
                            col_type, get_or_load, zero_lit)

    spec = spec or CmsSpec()
    sc = df.sparkSession.sparkContext
    blob_bc = broadcast_blob(sc, cms_blob)  # reused across calls per blob
    # content-derived: repeated estimate_counts calls over the same
    # (blob, spec) share one per-worker deserialization
    token = blob_token(blob_digest(cms_blob), spec)

    @F.pandas_udf(T.LongType())
    def _est(values: pd.Series) -> pd.Series:
        # deserialize ONCE per worker PROCESS, not per task or Arrow
        # batch: a closure-level cache dict is re-pickled into every task,
        # so only the module-level blobcache survives task boundaries —
        # and re-parsing a right-sized (GBs at 100 TB) blob once per short
        # task would dominate a large probe stage.
        cms = get_or_load(token, lambda: spec.from_bytes(blob_bc.value))
        return pd.Series(cms.estimate_hashes(hash_series(values, spec.hash_name)).astype(np.int64))

    # nulls never reach pandas: one null in an Arrow batch degrades an
    # int64 key column to float64 (mis-hashing every key in the batch);
    # coalesce JVM-side — where the type is known — and mask to 0 (a null
    # key was never counted by the build side)
    col = F.col(value_col)
    safe = F.coalesce(col, zero_lit(col_type(df, value_col)))
    return df.withColumn(
        est_name, F.when(col.isNotNull(), _est(safe)).otherwise(F.lit(0)))
