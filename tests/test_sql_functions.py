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
