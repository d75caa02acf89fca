"""Heavy hitters via count-min sketch + per-partition candidate generation.

Classic two-part design (Cormode & Muthukrishnan 2005 §4; same shape as
Spark's own ``countMinSketch``-based frequent-items): the CMS alone cannot
*enumerate* heavy values (it only answers point queries), so stage 1 also
emits each partition's locally-frequent values as candidates:

* stage 1 (``mapInPandas``, one pass): per (group, partition) a partial CMS
  over all values **and** the top ``candidates_per_partition`` values by local
  exact count. Any value with global frequency >= N/C appears in the local
  top-C of at least one partition that holds >= its fair share, so the
  candidate union covers the true heavy hitters with standard oversampling.
* stage 2: CMS partials merge cell-wise (JVM collect_list + vectorized UDF);
  candidate local counts sum exactly (plain ``groupBy().sum()`` — their sum is
  a *lower* bound on the true count since non-top-C occurrences are dropped).
* stage 3 (cogrouped ``applyInPandas``, one pandas call per group): estimate
  every candidate against the group's merged CMS (upper-biased, overcount
  <= eps*N w.h.p.) and keep the top k by (estimate, value).

Scale notes: shuffle volume is ``#partitions x #groups x (cms_size + C rows)``
— independent of input rows; the CMS at (w=4096, d=5) is 160 KB. Skewed
values are exactly what the operator is for; they cost one candidate row per
partition, not a shuffle hot key.
"""

from __future__ import annotations

from typing import Iterable, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .aggregate import _group_field, hash_series, merge_blobs_udf
from .specs import CmsSpec


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
    unchanged (weights just scale the counters)."""
    group_cols = list(group_cols)
    spec = spec or CmsSpec()

    part_schema = T.StructType(
        [_group_field(df, g) for g in group_cols]
        + [T.StructField("value", df.schema[value_col].dataType, True),
           T.StructField("local_count", T.LongType(), True),
           T.StructField("cms", T.BinaryType(), True)]
    )

    def build(batches: Iterable[pd.DataFrame]):
        counts: dict[tuple, pd.Series] = {}
        for pdf in batches:
            pdf = pdf.dropna(subset=[value_col])
            if pdf.empty:
                continue
            if weight_col is None:
                pdf = pdf.assign(__w=1)
            else:
                pdf = pdf.rename(columns={weight_col: "__w"})
            if group_cols:
                vc = (pdf.groupby(group_cols + [value_col], sort=False, dropna=False)
                      ["__w"].sum())
                frame = vc.reset_index(name="n")
                for key, sub in frame.groupby(group_cols, sort=False, dropna=False):
                    kt = key if isinstance(key, tuple) else (key,)
                    s = pd.Series(sub["n"].to_numpy(), index=sub[value_col].to_numpy())
                    counts[kt] = s if kt not in counts else counts[kt].add(s, fill_value=0)
            else:
                s = pdf.groupby(value_col, sort=False)["__w"].sum()
                counts[()] = s if () not in counts else counts[()].add(s, fill_value=0)
        if not counts:
            return
        out_rows = []
        for key, s in counts.items():
            values = pd.Series(s.index)
            weights = s.to_numpy(dtype=np.int64)
            cms = spec.make()
            cms.add_hashes(hash_series(values, spec.hash_name), counts=weights)
            top = s.sort_values(ascending=False, kind="stable").head(n_cand)
            for v, c in top.items():
                out_rows.append(list(key) + [v, int(c), None])
            out_rows.append(list(key) + [None, None, spec.to_bytes(cms)])
        yield pd.DataFrame(out_rows, columns=group_cols + ["value", "local_count", "cms"])

    needed = list(dict.fromkeys(group_cols + [value_col]
                                + ([weight_col] if weight_col else [])))
    return df.select(*needed).mapInPandas(build, part_schema)


def heavy_hitters_from_partials(partials: DataFrame,
                                k: int = 20, group_cols: Sequence[str] = (),
                                spec: CmsSpec | None = None) -> DataFrame:
    """Stages 2-3 over (possibly unioned-across-units) stage-1 partials."""
    group_cols = list(group_cols)
    spec = spec or CmsSpec()
    cms_rows = partials.filter(F.col("cms").isNotNull())
    if group_cols:
        merged_cms = (cms_rows.groupBy(*group_cols).agg(F.collect_list("cms").alias("__blobs"))
                      .select(*group_cols, merge_blobs_udf(spec)("__blobs").alias("cms")))
    else:
        merged_cms = (cms_rows.agg(F.collect_list("cms").alias("__blobs"))
                      .select(merge_blobs_udf(spec)("__blobs").alias("cms")))

    cand = (partials.filter(F.col("value").isNotNull())
            .groupBy(*(group_cols + ["value"]))
            .agg(F.sum("local_count").alias("lower_bound")))

    out_schema = T.StructType(
        [_group_field(partials, g) for g in group_cols]
        + [T.StructField("value", partials.schema["value"].dataType, True),
           T.StructField("est_count", T.LongType(), True),
           T.StructField("lower_bound", T.LongType(), True)]
    )

    def rank(cand_pdf: pd.DataFrame, cms_pdf: pd.DataFrame) -> pd.DataFrame:
        if cand_pdf.empty or cms_pdf.empty:
            return pd.DataFrame(columns=[f.name for f in out_schema.fields])
        cms = spec.from_bytes(bytes(cms_pdf["cms"].iloc[0]))
        est = cms.estimate_hashes(hash_series(cand_pdf["value"], spec.hash_name))
        cand_pdf = cand_pdf.assign(est_count=est.astype(np.int64))
        cand_pdf = cand_pdf.sort_values(
            ["est_count", "value"], ascending=[False, True], kind="stable").head(k)
        return cand_pdf[[*group_cols, "value", "est_count", "lower_bound"]]

    if group_cols:
        cog = cand.groupBy(*group_cols).cogroup(merged_cms.groupBy(*group_cols))
        return cog.applyInPandas(lambda l, r: rank(l, r), out_schema)
    cog = (cand.withColumn("__g", F.lit(1)).groupBy("__g")
           .cogroup(merged_cms.withColumn("__g", F.lit(1)).groupBy("__g")))
    schema_g = T.StructType([T.StructField("__g", T.IntegerType())] + list(out_schema))
    return (cog.applyInPandas(
        lambda l, r: rank(l.drop(columns="__g"), r.drop(columns="__g")).assign(__g=1),
        schema_g).drop("__g"))


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
                                      weight_col=weight_col).persist()
    return heavy_hitters_from_partials(partials, k, group_cols, spec)


def estimate_counts(df: DataFrame, value_col: str, cms_blob: bytes,
                    spec: CmsSpec | None = None,
                    est_name: str = "est_count") -> DataFrame:
    """Point-query every row's value against one serialized CMS (closure-
    captured; ~160 KB ships once per task like a broadcast var)."""
    spec = spec or CmsSpec()

    @F.pandas_udf(T.LongType())
    def _est(values: pd.Series) -> pd.Series:
        cms = spec.from_bytes(cms_blob)
        return pd.Series(cms.estimate_hashes(hash_series(values, spec.hash_name)).astype(np.int64))

    return df.withColumn(est_name, _est(F.col(value_col)))
