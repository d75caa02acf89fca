"""Sketch-driven balanced range partitioning (sketchlib/spark/ranges.py).

Oracles are full re-derivations: numpy searchsorted for the bucket
expression, exact quantiles for balance, per-partition min/max collect for
the global-sort property.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from sketchlib.spark.ranges import (balanced_sort, boundaries_from_blob,
                                    bucket_expr, hash_preimage_relabel,
                                    kll_boundaries,
                                    repartition_by_boundaries)


def _df(spark, vals, parts=7):
    return spark.createDataFrame(
        [Row(i=i, v=float(v)) for i, v in enumerate(vals)]).repartition(parts)


def test_bucket_expr_matches_searchsorted(spark):
    rng = np.random.default_rng(7)
    vals = np.concatenate([rng.normal(0, 100, 4000),
                           rng.choice([1.0, 2.5, -3.75], 500)])  # boundary ties
    b = np.sort(rng.normal(0, 100, 31))
    b[5] = b[6] = vals[0]  # duplicate boundary AND an exact hit
    b = np.sort(b)
    got = (_df(spark, vals)
           .select("i", bucket_expr("v", b).alias("bkt"))
           .toPandas().sort_values("i")["bkt"].to_numpy())
    want = np.searchsorted(b, vals, side="right")
    assert np.array_equal(got, want)


def test_bucket_expr_null_and_nan(spark):
    b = [0.0, 10.0]
    df = spark.createDataFrame(
        [Row(v=None), Row(v=float("nan")), Row(v=-1.0), Row(v=0.0),
         Row(v=5.0), Row(v=10.0), Row(v=11.0)])
    got = [r["bkt"] for r in
           df.select(bucket_expr("v", b).alias("bkt")).collect()]
    # NULL->0 (nulls first), NaN->B-1 (NaN sorts last), searchsorted-right
    assert got == [0, 2, 0, 1, 1, 2, 2]


def test_bucket_expr_rejects_bad_boundaries():
    with pytest.raises(ValueError):
        bucket_expr("v", [3.0, 1.0])
    with pytest.raises(ValueError):
        bucket_expr("v", [0.0, float("nan")])
    with pytest.raises(ValueError):
        bucket_expr("v", [])


def test_bucket_expr_infinite_boundaries(spark):
    """±inf boundaries are legal (a column with >= 1/B mass at ±inf puts
    infinities in its quantile set) and keep searchsorted-right parity."""
    inf = float("inf")
    b = np.array([-inf, -inf, 0.0, 5.0, inf, inf])
    vals = np.array([-inf, -10.0, 0.0, 3.0, 5.0, 100.0, inf])
    df = spark.createDataFrame([Row(i=i, v=float(v))
                                for i, v in enumerate(vals)])
    got = (df.select("i", bucket_expr("v", b).alias("bkt"))
           .toPandas().sort_values("i")["bkt"].to_numpy())
    want = np.searchsorted(b, vals, side="right")
    assert np.array_equal(got, want)


def test_balanced_sort_with_inf_heavy_column(spark):
    """A double column whose top 1/B mass is +inf must still sort: the KLL
    quantiles contain inf, and the inf rows land in the last partition."""
    vals = np.concatenate([np.arange(2000, dtype=np.float64),
                           np.full(500, np.inf)])
    df = spark.createDataFrame([Row(v=float(v)) for v in vals]).repartition(8)
    out = balanced_sort(df, "v", 4)
    per_part = (out.withColumn("pid", F.spark_partition_id())
                .groupBy("pid").agg(F.count("*").alias("n"),
                                    F.min("v").alias("lo"),
                                    F.max("v").alias("hi"))
                .orderBy("pid").collect())
    assert sum(r["n"] for r in per_part) == vals.shape[0]
    # strict cross-partition ordering over the non-empty partitions
    seen = [r for r in per_part if r["n"] > 0]
    for a, b2 in zip(seen, seen[1:]):
        assert a["hi"] <= b2["lo"]
    assert math.isinf(seen[-1]["hi"])


@pytest.mark.parametrize("nb", [2, 5, 32])
def test_hash_preimage_relabel(spark, nb):
    relabel = hash_preimage_relabel(spark, nb)
    assert sorted(set(relabel.tolist())) == sorted(relabel.tolist())
    got = (spark.createDataFrame([Row(v=int(v)) for v in relabel])
           .select(F.pmod(F.hash(F.col("v").cast("int")), F.lit(nb))
                   .alias("j")).collect())
    assert sorted(r["j"] for r in got) == list(range(nb))


def test_repartition_one_bucket_per_partition(spark):
    rng = np.random.default_rng(11)
    vals = rng.exponential(50, 6000)
    b = np.quantile(vals, np.arange(1, 8) / 8)  # exact boundaries, B=8
    out = repartition_by_boundaries(_df(spark, vals), "v", b,
                                    bucket_col="bkt")
    placed = (out.select("bkt", F.spark_partition_id().alias("pid"))
              .distinct().collect())
    assert sorted((r["bkt"], r["pid"]) for r in placed) == \
        [(j, j) for j in range(8)]
    assert out.rdd.getNumPartitions() == 8


def test_balanced_sort_is_global_sort_and_balanced(spark):
    rng = np.random.default_rng(13)
    vals = rng.normal(0, 1, 20000)
    out = balanced_sort(_df(spark, vals, parts=11), "v", 16)
    stats = (out.groupBy(F.spark_partition_id().alias("pid"))
             .agg(F.min("v").alias("lo"), F.max("v").alias("hi"),
                  F.count("*").alias("n"))
             .orderBy("pid").collect())
    assert len(stats) == 16
    for a, b in zip(stats, stats[1:]):
        assert a["hi"] < b["lo"]  # strict: buckets never overlap
    # KLL k=200 rank error ~1%: every bucket within 1/16 +- 2.5%
    shares = np.array([r["n"] for r in stats]) / 20000
    assert abs(shares.sum() - 1.0) < 1e-12
    assert np.all(np.abs(shares - 1 / 16) < 0.025)
    # within-partition sort => the concatenation is the fully sorted array
    got = np.concatenate(
        [np.array(p) for p in
         out.select("v").rdd.map(lambda r: r["v"]).glom().collect()])
    assert np.array_equal(got, np.sort(vals))


def test_boundaries_from_blob_zero_scan_path(spark):
    rng = np.random.default_rng(17)
    vals = rng.uniform(0, 1000, 8000)
    df = _df(spark, vals)
    from sketchlib.spark.specs import KllSpec
    from sketchlib.spark.aggregate import sketch_agg
    blob = bytes(sketch_agg(df, "v", (), KllSpec()).collect()[0]["sketch"])
    b = boundaries_from_blob(blob, 10)
    exact = np.quantile(vals, np.arange(1, 10) / 10)
    assert b.shape == (9,)
    # each sketch boundary's exact rank within KLL error of its target
    ranks = np.searchsorted(np.sort(vals), b) / len(vals)
    assert np.all(np.abs(ranks - np.arange(1, 10) / 10) < 0.02), (ranks, exact)
    with pytest.raises(ValueError):
        boundaries_from_blob(blob, 1)


def test_empty_and_all_null_raise(spark):
    with pytest.raises(ValueError, match="empty|no non-null"):
        kll_boundaries(spark.createDataFrame([], "v double"), "v", 4)
    with pytest.raises(ValueError, match="empty|no non-null"):
        kll_boundaries(
            spark.createDataFrame([Row(v=None)] * 10, "v double"), "v", 4)


def test_kll_boundaries_skips_nulls(spark):
    df = spark.createDataFrame(
        [Row(v=float(i)) for i in range(1000)] + [Row(v=None)] * 50)
    b = kll_boundaries(df, "v", 4)
    assert b.shape == (3,)
    assert 200 < b[0] < 300 and 450 < b[1] < 550 and 700 < b[2] < 800


def test_heavy_tie_colocates(spark):
    # one value holds 50% of rows: ties must share a bucket (range
    # semantics), so that bucket absorbs the mass and others stay exact
    vals = np.concatenate([np.full(5000, 42.0),
                           np.linspace(0, 40, 2500),
                           np.linspace(44, 100, 2500)])
    out = repartition_by_boundaries(
        _df(spark, vals), "v", kll_boundaries(_df(spark, vals), "v", 8),
        bucket_col="bkt")
    per_val = (out.filter(F.col("v") == 42.0).select("bkt")
               .distinct().collect())
    assert len(per_val) == 1


def test_str_order_key_monotone(spark):
    from sketchlib.spark.ranges import str_order_key
    rng = np.random.default_rng(23)
    pool = list("abcXYZ09/.-_") + ["é", "☃", "\x01", "\x7f"]
    strs = ["".join(rng.choice(pool, size=rng.integers(0, 14)))
            for _ in range(400)]
    strs += ["", "prefix08", "prefix08a", "prefix08b",  # 8-byte prefix ties
             "https://a.example.com/x", "https://a.example.com/y"]
    df = spark.createDataFrame([Row(i=i, s=s) for i, s in enumerate(strs)])
    rows = (df.select("s", str_order_key("s").alias("k"))
            .orderBy("s").collect())  # Spark's own binary string order
    keys = [r["k"] for r in rows]
    assert all(a <= b for a, b in zip(keys, keys[1:]))  # monotone
    # exact parity with the python rederivation: float(u64 of the 8-byte
    # zero-padded utf-8 prefix).  (Strictness is NOT promised for every
    # distinct prefix pair: u64 -> double rounding can merge keys whose
    # prefixes differ only in the low bits — ties colocate, never invert.)
    for r in rows:
        want = float(int.from_bytes(
            r["s"].encode()[:8].ljust(8, b"\0"), "big"))
        assert r["k"] == want, (r, want)
    assert len(set(keys)) > 300  # and the key still separates most strings


def test_str_common_prefix_len(spark):
    from sketchlib.spark.ranges import str_common_prefix_len
    df = spark.createDataFrame(
        [Row(u=f"https://h{i:03d}.example.com/p") for i in range(100)])
    # i in [0, 99]: every host starts h0.., so the LCP includes the digit
    assert str_common_prefix_len(df, "u") == len("https://h0")
    df2 = spark.createDataFrame(
        [Row(u=f"https://h{i:03d}.example.com/p") for i in range(500)])
    assert str_common_prefix_len(df2, "u") == len("https://h")
    same = spark.createDataFrame([Row(u="identical")] * 5)
    assert str_common_prefix_len(same, "u") == len("identical")


def test_balanced_sort_on_string_urls(spark):
    # every url shares "https://" — the LCP auto-skip is what makes the
    # 8-byte order key see the varying host bytes at all
    rng = np.random.default_rng(29)
    hosts = [f"h{i:04d}.example.com" for i in range(500)]
    urls = [f"https://{rng.choice(hosts)}/p/{i}" for i in range(8000)]
    df = spark.createDataFrame([Row(u=u) for u in urls]).repartition(9)
    out = balanced_sort(df, "u", 8)
    stats = (out.groupBy(F.spark_partition_id().alias("pid"))
             .agg(F.min("u").alias("lo"), F.max("u").alias("hi"),
                  F.count("*").alias("n")).orderBy("pid").collect())
    assert len(stats) == 8
    for a, b in zip(stats, stats[1:]):
        assert a["hi"] < b["lo"]  # global string order across partitions
    shares = np.array([r["n"] for r in stats]) / 8000
    assert abs(shares.sum() - 1.0) < 1e-12
    # host granularity (500 hosts, ~16 urls each) + KLL error: loose bound
    assert shares.max() < 1 / 8 + 0.05
    # concatenated partitions == fully sorted url list
    got = [u for p in
           out.select("u").rdd.map(lambda r: r["u"]).glom().collect()
           for u in p]
    assert got == sorted(urls)


def test_post_lcp_ties_colocate(spark):
    # strings identical through LCP+8 bytes share an order key => 1 bucket
    from sketchlib.spark.ranges import kll_boundaries
    df = spark.createDataFrame(
        [Row(u=f"https://host.example.com/page/{i}") for i in range(2000)])
    # LCP(min,max) = "https://host.example.com/page/" followed by digits;
    # min=/page/0, max=/page/999 -> LCP ends at "/page/", keys vary
    b = kll_boundaries(df, "u", 4)
    out = repartition_by_boundaries(df, "u", b, bucket_col="bkt")
    assert out.select("bkt").distinct().count() >= 2  # LCP skip engaged
    same = spark.createDataFrame([Row(u="https://same.url/x")] * 500)
    bs = kll_boundaries(same, "u", 4)
    outs = repartition_by_boundaries(same, "u", bs, bucket_col="bkt")
    assert outs.select("bkt").distinct().count() == 1


def test_sampled_boundaries_still_balanced(spark):
    rng = np.random.default_rng(31)
    vals = rng.gamma(2.0, 10.0, 30000)
    df = _df(spark, vals, parts=6)
    b = kll_boundaries(df, "v", 8, sample_fraction=0.2)
    out = repartition_by_boundaries(df, "v", b, bucket_col="bkt")
    counts = [r["n"] for r in
              out.groupBy("bkt").agg(F.count("*").alias("n")).collect()]
    shares = np.array(counts) / 30000
    # sketch ~1% + DKW sampling error at f*n=6000 (~1.5%): loose 4% bar
    assert np.all(np.abs(shares - 1 / 8) < 0.04)
    with pytest.raises(ValueError):
        kll_boundaries(df, "v", 8, sample_fraction=1.5)
    # deterministic: same fraction + seed -> identical boundaries
    b2 = kll_boundaries(df, "v", 8, sample_fraction=0.2)
    assert np.array_equal(b, b2)


def test_write_read_range_partitioned(spark, tmp_path):
    from sketchlib.spark.ranges import (read_range_pruned, scan_footers,
                                        write_range_partitioned)
    rng = np.random.default_rng(37)
    vals = rng.uniform(0, 1000, 20000)
    df = _df(spark, vals, parts=6)
    path = str(tmp_path / "ranged")
    manifest = write_range_partitioned(df, "v", path, 8)
    assert len(manifest) == 8
    assert sum(m["rows"] for m in manifest) == 20000
    # files disjoint and ordered once sorted by lo
    ms = sorted(manifest, key=lambda m: m["lo"])
    assert all(a["hi"] < b["lo"] for a, b in zip(ms, ms[1:]))
    # a narrow range touches few files and matches the exact filter
    lo, hi = 250.0, 300.0
    pruned = read_range_pruned(spark, path, "v", lo, hi, manifest=manifest)
    got = sorted(r["v"] for r in pruned.collect())
    want = sorted(v for v in vals if lo <= v <= hi)
    assert np.allclose(got, want)
    touched = [m for m in manifest
               if m["lo"] <= hi and m["hi"] >= lo]
    assert len(touched) <= 2  # ~5% of the value domain -> 1-2 of 8 files
    # footer scan path (no manifest) gives the same answer
    again = read_range_pruned(spark, path, "v", lo, hi)
    assert again.count() == len(want)
    # empty-overlap range returns an empty frame with the right schema
    none = read_range_pruned(spark, path, "v", 5000.0, 6000.0)
    assert none.count() == 0 and "v" in none.columns
    # scan_footers standalone agrees with the returned manifest
    assert scan_footers(path, "v") == manifest


def test_write_range_partitioned_strings(spark, tmp_path):
    from sketchlib.spark.ranges import (read_range_pruned,
                                        write_range_partitioned)
    urls = [f"https://h{i % 199:03d}.example.com/p/{i}" for i in range(6000)]
    df = spark.createDataFrame([Row(u=u) for u in urls]).repartition(5)
    path = str(tmp_path / "urls")
    manifest = write_range_partitioned(df, "u", path, 6)
    assert sum(m["rows"] for m in manifest) == 6000
    lo, hi = "https://h050", "https://h059￿"
    pruned = read_range_pruned(spark, path, "u", lo, hi, manifest=manifest)
    want = sorted(u for u in urls if lo <= u <= hi)
    assert sorted(r["u"] for r in pruned.collect()) == want
    assert len([m for m in manifest
                if m["lo"] <= hi and m["hi"] >= lo]) < 6  # pruning engaged


def test_profile_quantiles_feeds_balanced_sort(spark):
    from sketchlib.spark.profile import profile_quantiles
    from sketchlib.spark.ranges import boundaries_from_blob
    rng = np.random.default_rng(41)
    df = spark.createDataFrame(
        [Row(a=float(x), b=float(y), s="txt")
         for x, y in zip(rng.normal(0, 5, 6000),
                         rng.exponential(9, 6000))]).repartition(5)
    prof = {r["column"]: bytes(r["sketch"])
            for r in profile_quantiles(df, ["a", "b"]).collect()}
    assert set(prof) == {"a", "b"}
    # blob -> boundaries -> balanced partitions with ZERO further scans of df
    b = boundaries_from_blob(prof["b"], 4)
    out = repartition_by_boundaries(df, "b", b, bucket_col="bkt")
    counts = [r["n"] for r in
              out.groupBy("bkt").agg(F.count("*").alias("n")).collect()]
    assert all(abs(c / 6000 - 0.25) < 0.04 for c in counts)
    # auto-detect numeric columns; reject non-numeric explicitly
    assert {r["column"] for r in profile_quantiles(df).collect()} == \
        {"a", "b"}
    with pytest.raises(ValueError, match="not numeric"):
        profile_quantiles(df, ["s"])


def test_math_sanity():
    assert math.isclose(np.searchsorted([1.0, 2.0], 2.0, side="right"), 2)


def test_scan_footers_with_nested_column_before_value(spark, tmp_path):
    """Parquet flattens a struct into one leaf per field: stats must be
    located by LEAF path, not the Arrow top-level field index — with a
    struct before v, the field index would silently read a struct leaf's
    bounds and prune wrongly."""
    from sketchlib.spark.ranges import scan_footers, write_range_partitioned

    rng = np.random.default_rng(5)
    vals = rng.uniform(0.0, 100.0, 4000)
    df = (spark.createDataFrame([Row(v=float(x)) for x in vals])
          .select(F.struct((F.col("v") * 1000.0).alias("a"),
                           F.lit(-1.0).alias("b")).alias("meta"), "v"))
    path = str(tmp_path / "nested")
    write_range_partitioned(df, "v", path, 4)
    fts = scan_footers(path, "v")
    assert sum(m["rows"] for m in fts) == 4000
    # bounds live in v's [0, 100] domain, not meta.a's [0, 100000] or
    # meta.b's constant -1
    assert min(m["lo"] for m in fts) >= 0.0
    assert max(m["hi"] for m in fts) <= 100.0
    ms = sorted(fts, key=lambda m: m["lo"])
    assert all(a["hi"] < b["lo"] for a, b in zip(ms, ms[1:]))
    with pytest.raises(ValueError, match="not a leaf column"):
        scan_footers(path, "nope")


def test_read_range_pruned_keeps_nan_rows(spark, tmp_path):
    """Spark orders NaN greater than every double, so `v >= lo` matches
    NaN rows — but parquet footer stats exclude NaN, so pure-stats pruning
    would drop the file holding them (verified pre-fix: a lo above the
    largest real value pruned every file and returned 0 rows while the
    unpruned filter returned the NaN rows).  The writer sorts NaN into the
    top file; pruning must keep it whenever the upper bound is open."""
    from sketchlib.spark.ranges import read_range_pruned, write_range_partitioned

    df = spark.range(4000).selectExpr(
        "cast(id as double) as v").unionAll(
        spark.sql("select cast('NaN' as double) v union all "
                  "select cast('NaN' as double) v"))
    path = str(tmp_path / "nan_rp")
    manifest = write_range_partitioned(df, "v", path, 8)

    # open upper bound above every real value: only the NaN rows match
    got = read_range_pruned(spark, path, "v", lo=5000.0)
    assert got.count() == 2
    unpruned = spark.read.parquet(path).filter(F.col("v") >= 5000.0)
    assert unpruned.count() == 2
    # closed upper bound: NaN rows must NOT match, pruning still exact
    mid = read_range_pruned(spark, path, "v", lo=100.0, hi=200.0,
                            manifest=manifest)
    assert mid.count() == 101


def test_repartition_by_boundaries_enforces_bucket_cap(spark):
    """A caller-supplied boundary list past MAX_BUCKETS must fail fast —
    the WHEN tree and relabel array are plan literals."""
    import pytest as _pytest

    from sketchlib.spark.ranges import (MAX_BUCKETS, bucket_expr,
                                        repartition_by_boundaries)

    too_many = list(range(MAX_BUCKETS + 5))
    with _pytest.raises(ValueError, match="MAX_BUCKETS|num_buckets"):
        repartition_by_boundaries(spark.range(10), "id", too_many)
    with _pytest.raises(ValueError, match="MAX_BUCKETS"):
        bucket_expr("id", too_many)


def test_hash_preimage_relabel_memoized(spark):
    """The probe is a pure function of the bucket count; repeated calls
    must reuse the table instead of re-running the probe job."""
    from sketchlib.spark import ranges as R

    R._RELABEL_CACHE.clear()
    a = R.hash_preimage_relabel(spark, 64)
    b = R.hash_preimage_relabel(spark, 64)
    assert a is b  # same object -> served from the memo


def test_hash_preimage_relabel_cache_is_frozen(spark):
    """The memo hands out the same array object; a caller mutating it
    would poison every later repartition at that bucket count — the
    cached array must be read-only."""
    import numpy as np
    import pytest as _pytest

    from sketchlib.spark import ranges as R

    R._RELABEL_CACHE.clear()
    a = R.hash_preimage_relabel(spark, 32)
    with _pytest.raises(ValueError):
        a[0] = 999
    b = R.hash_preimage_relabel(spark, 32)
    assert np.array_equal(a, b)


def test_part_files_single_slash_file_uri(spark, tmp_path):
    """Hadoop emits both file:///x and the single-slash file:/x; the
    footer scan must resolve both to the local directory instead of
    globbing a literal 'file:/x' relative path (which finds nothing and
    fails AFTER the expensive write)."""
    from sketchlib.spark.ranges import scan_footers, write_range_partitioned

    df = spark.range(1000).selectExpr("cast(id as double) as v")
    path = str(tmp_path / "uri_rp")
    write_range_partitioned(df, "v", path, 4)

    for spelling in (f"file://{path}", f"file:/{path.lstrip('/')}"):
        manifest = scan_footers(spelling, "v")
        assert sum(m["rows"] for m in manifest) == 1000


def test_pyarrow_uri_translates_hadoop_s3_spellings():
    """Spark writes s3a:// / s3n:// fine; pyarrow's from_uri does not
    know those spellings — the guard must translate, not reject."""
    from sketchlib.spark.ranges import _pyarrow_uri

    assert _pyarrow_uri("s3a://bucket/dir") == "s3://bucket/dir"
    assert _pyarrow_uri("s3n://bucket/dir") == "s3://bucket/dir"
    assert _pyarrow_uri("s3://bucket/dir") == "s3://bucket/dir"
    assert _pyarrow_uri("hdfs://nn:8020/d") == "hdfs://nn:8020/d"
    assert _pyarrow_uri("/local/dir") == "/local/dir"


def test_manifest_spark_uris_readable(spark, tmp_path):
    """Manifest 'file' entries must be paths spark.read.parquet resolves
    — for a file:// input the scheme-stripped pyarrow listing and the
    Spark path coincide; the read-back must work end-to-end."""
    from sketchlib.spark.ranges import read_range_pruned, scan_footers, \
        write_range_partitioned

    df = spark.range(2000).selectExpr("cast(id as double) as v")
    path = str(tmp_path / "mani_rp")
    write_range_partitioned(df, "v", path, 4)
    manifest = scan_footers(f"file://{path}", "v")
    got = read_range_pruned(spark, path, "v", lo=100.0, hi=200.0,
                            manifest=manifest)
    assert got.count() == 101
