"""SQL-string access: registered UDFs over sketch columns."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    from sketchlib.spark.sql import register_sql_functions

    register_sql_functions(spark)


def test_hll_sql_roundtrip(spark, sf_dir):
    from sketchlib.spark.aggregate import sketch_agg

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    sketch_agg(orders, "o_custkey", ["o_orderstatus"]).createOrReplaceTempView("sk")
    rows = spark.sql("""
        SELECT o_orderstatus, hll_estimate(sketch) AS est,
               hll_count_additions(sketch) AS adds FROM sk""").collect()
    exact = {r["o_orderstatus"]: (r["n"], r["c"]) for r in
             orders.groupBy("o_orderstatus")
             .agg(F.countDistinct("o_custkey").alias("n"), F.count("*").alias("c"))
             .collect()}
    for r in rows:
        n, c = exact[r["o_orderstatus"]]
        tol = 0 if n <= 100 else 10 * 0.008125 * n
        assert abs(r["est"] - n) <= tol
        assert r["adds"] == c


def test_hll_merge_all_sql(spark, sf_dir):
    from sketchlib.spark.aggregate import build_partials

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    build_partials(orders, "o_custkey", ()).createOrReplaceTempView("partials")
    [row] = spark.sql("""
        SELECT hll_estimate(hll_merge_all(collect_list(sketch))) AS est
        FROM partials""").collect()
    want = orders.select(F.countDistinct("o_custkey")).first()[0]
    assert abs(row["est"] - want) <= max(10 * 0.008125 * want, 2)


def test_quantile_sql(spark, sf_dir):
    from sketchlib.spark.aggregate import sketch_agg
    from sketchlib.spark.specs import TDigestSpec, KllSpec

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    sketch_agg(ev, "value", (), TDigestSpec()).createOrReplaceTempView("td")
    sketch_agg(ev, "value", (), KllSpec()).createOrReplaceTempView("kll")
    [td] = spark.sql("SELECT tdigest_quantile(sketch, 0.5) AS m FROM td").collect()
    [kl] = spark.sql("SELECT kll_quantile(sketch, 0.5) AS m FROM kll").collect()
    lo, hi = ev.selectExpr("percentile(value, 0.42)", "percentile(value, 0.58)").first()
    assert lo <= td["m"] <= hi
    assert lo <= kl["m"] <= hi


def test_ddsketch_sql_quantile_and_merge(spark, sf_dir):
    from sketchlib.spark.aggregate import sketch_agg
    from sketchlib.spark.specs import DdSpec

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    spec = DdSpec(alpha=0.01)
    sketch_agg(ev, "value", (), spec).createOrReplaceTempView("dd")
    sketch_agg(ev, "value", ["event_type"], spec).createOrReplaceTempView("ddg")
    [one] = spark.sql("SELECT ddsketch_quantile(sketch, 0.5) AS m FROM dd").collect()
    # merging the per-group sketches in SQL must answer exactly like the
    # global build (bucket-wise sum is partition-invariant)
    [merged] = spark.sql(
        "SELECT ddsketch_quantile(ddsketch_merge_all(collect_list(sketch)), 0.5)"
        " AS m FROM ddg").collect()
    assert merged["m"] == one["m"]
    exact = ev.selectExpr("percentile(value, 0.5)").first()[0]
    assert abs(one["m"] - exact) <= 0.011 * exact


def test_theta_sql_set_algebra(spark, sf_dir):
    from sketchlib.spark.aggregate import sketch_agg
    from sketchlib.spark.specs import ThetaSpec

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    sketch_agg(orders, "o_custkey", ["o_orderstatus"],
               ThetaSpec(k=4096)).createOrReplaceTempView("tsk")
    row = spark.sql("""
        SELECT theta_estimate(a.sketch) AS est_a,
               theta_intersect_estimate(a.sketch, b.sketch) AS est_i,
               theta_a_not_b_estimate(a.sketch, b.sketch) AS est_d
        FROM (SELECT sketch FROM tsk WHERE o_orderstatus = 'O') a,
             (SELECT sketch FROM tsk WHERE o_orderstatus = 'F') b""").collect()[0]
    oo = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey").distinct()
    ff = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    n_a, n_i = oo.count(), oo.intersect(ff).count()
    n_d = oo.exceptAll(ff).count()
    assert abs(row["est_a"] - n_a) <= max(6 * 0.016 * n_a, 2)
    assert abs(row["est_i"] - n_i) <= max(0.25 * n_i, 16)
    assert abs(row["est_d"] - n_d) <= max(0.5 * max(n_d, 1), 16)


def test_mg_sql_point_estimate_and_merge(spark, sf_dir):
    import pandas as pd
    from sketchlib.spark.aggregate import build_partials, hash_columns, sketch_agg
    from sketchlib.spark.specs import MgSpec

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    probe = orders.groupBy("o_custkey").count().orderBy(
        F.desc("count"), "o_custkey").first()
    probe_key, probe_n = probe["o_custkey"], probe["count"]
    probe_hash = int(hash_columns(
        pd.DataFrame({"o_custkey": pd.Series([probe_key], dtype="int64")}),
        ["o_custkey"])[0])
    ph_signed = probe_hash - (1 << 64) if probe_hash >= (1 << 63) else probe_hash

    sketch_agg(orders, "o_custkey", (), MgSpec(k=128)
               ).createOrReplaceTempView("mgsk")
    [row] = spark.sql(f"""
        SELECT mg_point_estimate(sketch, {ph_signed}L) AS est,
               mg_error_bound(sketch) AS eb FROM mgsk""").collect()
    # deterministic sandwich: est <= f(x) <= est + total_decrement
    assert row["est"] <= probe_n <= row["est"] + row["eb"]
    assert row["eb"] <= orders.count() // (128 + 1)

    # SQL merge of partials keeps the same sandwich under a different tree
    build_partials(orders.repartition(6), "o_custkey", (),
                   MgSpec(k=128)).createOrReplaceTempView("mgpart")
    [m] = spark.sql(f"""
        SELECT mg_point_estimate(s, {ph_signed}L) AS est, mg_error_bound(s) AS eb
        FROM (SELECT mg_merge_all(collect_list(sketch)) AS s FROM mgpart)""").collect()
    assert m["est"] <= probe_n <= m["est"] + m["eb"]


def test_theta_merge_all_sql(spark, sf_dir):
    from sketchlib.spark.aggregate import build_partials
    from sketchlib.spark.specs import ThetaSpec
    from sketchlib.theta import ThetaSketch

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    build_partials(orders.repartition(6), "o_custkey", (),
                   ThetaSpec(k=1024)).createOrReplaceTempView("tpart")
    blob = spark.sql(
        "SELECT theta_merge_all(collect_list(sketch)) AS s FROM tpart"
    ).collect()[0]["s"]
    est = ThetaSketch.from_bytes(bytes(blob)).count()
    n = orders.select("o_custkey").distinct().count()
    assert abs(est - n) <= 6 / (1023 ** 0.5) * n + 2


def test_ams_sql_f2_and_countsketch_point(spark, sf_dir):
    """ams_f2_estimate / countsketch_point_estimate / ams_merge_all: the
    CountSketch surface from plain SQL, with the linear-sketch property
    that merged partials answer exactly like the one-shot build."""
    import pandas as pd
    from sketchlib.spark.aggregate import build_partials, hash_columns, sketch_agg
    from sketchlib.spark.specs import AmsSpec

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    probe = orders.groupBy("o_custkey").count().orderBy(
        F.desc("count"), "o_custkey").first()
    probe_key, probe_n = probe["o_custkey"], probe["count"]
    probe_hash = int(hash_columns(
        pd.DataFrame({"o_custkey": pd.Series([probe_key], dtype="int64")}),
        ["o_custkey"])[0])
    ph_signed = probe_hash - (1 << 64) if probe_hash >= (1 << 63) else probe_hash

    spec = AmsSpec(width=1 << 12, depth=7)
    sketch_agg(orders, "o_custkey", (), spec).createOrReplaceTempView("amssk")
    [row] = spark.sql(f"""
        SELECT ams_f2_estimate(sketch) AS f2,
               countsketch_point_estimate(sketch, {ph_signed}L) AS est
        FROM amssk""").collect()
    [e] = (orders.groupBy("o_custkey").count()
           .agg(F.sum(F.col("count") * F.col("count")).alias("f2")).collect())
    exact_f2 = int(e["f2"])
    assert abs(row["f2"] - exact_f2) <= 6.8 * (2.0 / spec.width) ** 0.5 * exact_f2
    assert abs(row["est"] - probe_n) <= (3.0 * exact_f2 / spec.width) ** 0.5

    build_partials(orders.repartition(6), "o_custkey", (), spec
                   ).createOrReplaceTempView("amspart")
    [m] = spark.sql(f"""
        SELECT ams_f2_estimate(s) AS f2,
               countsketch_point_estimate(s, {ph_signed}L) AS est
        FROM (SELECT ams_merge_all(collect_list(sketch)) AS s FROM amspart)
    """).collect()
    assert (m["f2"], m["est"]) == (row["f2"], row["est"])
