"""Bucketed tables: joins and rollup-style aggregations on the bucket key
must be exchange-free (the co-located-join scale pattern)."""

import pytest

from sketchlib.spark.bucketing import colocated_join, write_bucketed


def _final_plan(df) -> str:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0]


@pytest.fixture(scope="module")
def bucketed_pair(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("buckets")
    a = spark.createDataFrame(
        [(i % 500, f"u{i}") for i in range(5000)], "k long, payload string")
    b = spark.createDataFrame(
        [(i % 500, i) for i in range(3000)], "k long, w long")
    ta = write_bucketed(a, "bkt_a", "k", 8, path=str(base / "a"),
                        sorted_by="k")
    tb = write_bucketed(b, "bkt_b", "k", 8, path=str(base / "b"),
                        sorted_by="k")
    return ta, tb


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    ta, tb = bucketed_pair
    j = colocated_join(ta, tb, "k")
    j.collect()
    plan = _final_plan(j)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan  # co-located: no shuffle either side


def test_unbucketed_join_does_exchange(spark, bucketed_pair):
    """Control: the same join through plain parquet reads (no catalog
    bucketing info) must shuffle — proving the bucketed plan's absence of
    Exchange comes from bucketing, not from the data size."""
    ta, tb = bucketed_pair
    a = spark.createDataFrame(
        [(i % 500, f"u{i}") for i in range(5000)], "k long, payload string")
    j = colocated_join(a, tb, "k")
    j.collect()
    assert "Exchange" in _final_plan(j)


def test_bucketed_join_correct(spark, bucketed_pair):
    ta, tb = bucketed_pair
    got = colocated_join(ta, tb, "k").count()
    want = ta.join(tb, "k").count()
    assert got == want == 5000 * 6  # 500 keys x 10 left x 6 right per key


def test_bucketed_groupby_has_no_exchange(spark, bucketed_pair):
    """Aggregation keyed on the bucket column reads pre-partitioned data:
    no exchange before the final aggregate."""
    from pyspark.sql import functions as F

    ta, _ = bucketed_pair
    agg = ta.groupBy("k").agg(F.count("*").alias("n"))
    agg.collect()
    assert "Exchange" not in _final_plan(agg)
