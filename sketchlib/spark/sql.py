"""SQL-string access to the sketch library.

``register_sql_functions(spark)`` registers vectorized UDFs so sketch
columns produced by the two-stage aggregation are queryable from plain
``spark.sql``:

    SELECT lang, hll_estimate(sketch) FROM sketches_by_lang
    SELECT hll_estimate(hll_merge_all(sketch)) FROM partials      -- via agg
    SELECT bloom_estimate(sketch), cms_total(sketch) ...
    SELECT tdigest_quantile(sketch, 0.5), kll_quantile(sketch, 0.9),
           ddsketch_quantile(ddsketch_merge_all(sketch), 0.99) ...

(Per-group *building* stays with the Python API — Spark has no Python UDAF
with a partial/final split, SURVEY.md §7 — but merge/estimate compose in SQL
through collect_list + these functions.)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def register_sql_functions(spark: SparkSession) -> None:
    from ..ams import AmsSketch
    from ..bloom import BloomFilter
    from ..cms import CountMinSketch
    from ..ddsketch import DDSketch
    from ..hll import HllSketch
    from ..kll import KllSketch
    from ..mg import MisraGriesSketch
    from ..tdigest import TDigest
    from ..theta import ThetaSketch

    def _merge_all_udf(from_bytes):
        """One fold-merge-blobs body for every family: in-place merges
        return None (keep the accumulator), set-algebra merges (Theta)
        return the merged sketch."""
        @F.pandas_udf(T.BinaryType())
        def merge_all(lists: pd.Series) -> pd.Series:
            out = []
            for blobs in lists:
                merged = None
                for b in blobs:
                    sk = from_bytes(bytes(b))
                    merged = sk if merged is None else (merged.merge(sk)
                                                        or merged)
                out.append(None if merged is None else merged.to_bytes())
            return pd.Series(out)
        return merge_all

    hll_merge_all = _merge_all_udf(HllSketch.from_bytes)
    ddsketch_merge_all = _merge_all_udf(DDSketch.from_bytes)
    theta_merge_all = _merge_all_udf(ThetaSketch.from_bytes)
    mg_merge_all = _merge_all_udf(MisraGriesSketch.from_bytes)

    @F.pandas_udf(T.LongType())
    def hll_estimate(blobs: pd.Series) -> pd.Series:
        return pd.Series([None if b is None else HllSketch.from_bytes(bytes(b)).count()
                          for b in blobs])

    @F.pandas_udf(T.LongType())
    def hll_count_additions(blobs: pd.Series) -> pd.Series:
        return pd.Series([None if b is None else
                          HllSketch.from_bytes(bytes(b)).count_additions
                          for b in blobs])

    @F.pandas_udf(T.LongType())
    def bloom_estimate(blobs: pd.Series) -> pd.Series:
        return pd.Series([None if b is None else
                          BloomFilter.from_bytes(bytes(b)).estimate_cardinality()
                          for b in blobs])

    @F.pandas_udf(T.LongType())
    def cms_total(blobs: pd.Series) -> pd.Series:
        return pd.Series([None if b is None else
                          CountMinSketch.from_bytes(bytes(b)).count_additions
                          for b in blobs])

    @F.pandas_udf(T.DoubleType())
    def tdigest_quantile(blobs: pd.Series, qs: pd.Series) -> pd.Series:
        # pd.isna(q), not q is None: a NULL in the double q column
        # reaches the UDF as NaN, and NaN passes the [0,1] range check
        # (comparisons are False) to silently return the sketch MAX
        return pd.Series([None if (b is None or pd.isna(q)) else
                          float(TDigest.from_bytes(bytes(b)).quantile(float(q)))
                          for b, q in zip(blobs, qs)])

    @F.pandas_udf(T.DoubleType())
    def kll_quantile(blobs: pd.Series, qs: pd.Series) -> pd.Series:
        # pd.isna(q), not q is None: a NULL in the double q column
        # reaches the UDF as NaN, and NaN passes the [0,1] range check
        # (comparisons are False) to silently return the sketch MAX
        return pd.Series([None if (b is None or pd.isna(q)) else
                          float(KllSketch.from_bytes(bytes(b)).quantile(float(q)))
                          for b, q in zip(blobs, qs)])

    @F.pandas_udf(T.DoubleType())
    def ddsketch_quantile(blobs: pd.Series, qs: pd.Series) -> pd.Series:
        # pd.isna(q), not q is None: a NULL in the double q column
        # reaches the UDF as NaN, and NaN passes the [0,1] range check
        # (comparisons are False) to silently return the sketch MAX
        return pd.Series([None if (b is None or pd.isna(q)) else
                          float(DDSketch.from_bytes(bytes(b)).quantile(float(q)))
                          for b, q in zip(blobs, qs)])

    @F.pandas_udf(T.LongType())
    def theta_estimate(blobs: pd.Series) -> pd.Series:
        return pd.Series([None if b is None else
                          ThetaSketch.from_bytes(bytes(b)).count()
                          for b in blobs])

    @F.pandas_udf(T.LongType())
    def theta_intersect_estimate(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series([
            None if (x is None or y is None) else
            ThetaSketch.from_bytes(bytes(x)).intersect_count(
                ThetaSketch.from_bytes(bytes(y)))[0]
            for x, y in zip(a, b)])

    @F.pandas_udf(T.LongType())
    def theta_a_not_b_estimate(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series([
            None if (x is None or y is None) else
            ThetaSketch.from_bytes(bytes(x)).a_not_b_count(
                ThetaSketch.from_bytes(bytes(y)))[0]
            for x, y in zip(a, b)])

    @F.pandas_udf(T.LongType())
    def mg_point_estimate(blobs: pd.Series, hashes: pd.Series) -> pd.Series:
        import numpy as np

        # pd.isna(h): a NULL long hash arrives as float64 NaN, and
        # np.int64(NaN) raises instead of yielding NULL
        return pd.Series([
            None if (b is None or pd.isna(h)) else
            int(MisraGriesSketch.from_bytes(bytes(b)).estimate_hashes(
                np.array([np.int64(h)], dtype=np.int64).view(np.uint64))[0])
            for b, h in zip(blobs, hashes)])

    @F.pandas_udf(T.LongType())
    def mg_error_bound(blobs: pd.Series) -> pd.Series:
        return pd.Series([None if b is None else
                          MisraGriesSketch.from_bytes(bytes(b)).error_bound()
                          for b in blobs])

    ams_merge_all = _merge_all_udf(AmsSketch.from_bytes)

    @F.pandas_udf(T.LongType())
    def ams_f2_estimate(blobs: pd.Series) -> pd.Series:
        return pd.Series([None if b is None else
                          AmsSketch.from_bytes(bytes(b)).estimate_f2()
                          for b in blobs])

    @F.pandas_udf(T.LongType())
    def countsketch_point_estimate(blobs: pd.Series, hashes: pd.Series) -> pd.Series:
        import numpy as np

        return pd.Series([
            None if (b is None or pd.isna(h)) else
            int(AmsSketch.from_bytes(bytes(b)).estimate_hashes(
                np.array([np.int64(h)], dtype=np.int64).view(np.uint64))[0])
            for b, h in zip(blobs, hashes)])

    spark.udf.register("hll_estimate", hll_estimate)
    spark.udf.register("hll_merge_all", hll_merge_all)
    spark.udf.register("hll_count_additions", hll_count_additions)
    spark.udf.register("bloom_estimate", bloom_estimate)
    spark.udf.register("cms_total", cms_total)
    spark.udf.register("tdigest_quantile", tdigest_quantile)
    spark.udf.register("kll_quantile", kll_quantile)
    spark.udf.register("ddsketch_quantile", ddsketch_quantile)
    spark.udf.register("ddsketch_merge_all", ddsketch_merge_all)
    spark.udf.register("theta_estimate", theta_estimate)
    spark.udf.register("theta_merge_all", theta_merge_all)
    spark.udf.register("theta_intersect_estimate", theta_intersect_estimate)
    spark.udf.register("theta_a_not_b_estimate", theta_a_not_b_estimate)
    spark.udf.register("mg_merge_all", mg_merge_all)
    spark.udf.register("mg_point_estimate", mg_point_estimate)
    spark.udf.register("mg_error_bound", mg_error_bound)
    spark.udf.register("ams_merge_all", ams_merge_all)
    spark.udf.register("ams_f2_estimate", ams_f2_estimate)
    spark.udf.register("countsketch_point_estimate", countsketch_point_estimate)
