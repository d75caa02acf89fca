"""Salting and tree-merge: skew handling must not change results —
bit-identical canonical sketches, identical estimates."""

import numpy as np

from sketchlib.hll import HllSketch
from sketchlib.spark.aggregate import build_partials, merge_partials, sketch_agg
from sketchlib.spark.skew import salted_repartition, tree_merge_partials


def _zipf_pages(spark, n=20_000):
    """Zipf-skewed lang column (en ~ 60%)."""
    from sketchlib.data.pages import generate_pages

    pdf = generate_pages(n, seed=11)
    return spark.createDataFrame(pdf[["url", "lang"]])


def test_salting_exact(spark):
    """Salted repartition -> identical merged sketch bytes and estimates
    (mergeability makes salting exact, SURVEY.md §4.2)."""
    df = _zipf_pages(spark)
    plain = {r["lang"]: bytes(r["sketch"])
             for r in sketch_agg(df, "url", ["lang"]).collect()}
    salted_df = salted_repartition(df, ["lang"], buckets=8, n_partitions=16,
                                   salt_source=["url"])
    salted = {r["lang"]: bytes(r["sketch"])
              for r in sketch_agg(salted_df, "url", ["lang"]).collect()}
    assert plain == salted


def test_salting_spreads_hot_key(spark):
    """The hot lang must actually land on multiple partitions after salting."""
    from pyspark.sql import functions as F

    df = _zipf_pages(spark)
    salted = salted_repartition(df, ["lang"], buckets=8, n_partitions=16,
                                salt_source=["url"])
    parts = (salted.filter(F.col("lang") == "en")
             .select(F.spark_partition_id().alias("pid")).distinct().count())
    assert parts >= 4


def test_tree_merge_bit_identical_to_flat(spark):
    df = _zipf_pages(spark, n=10_000).repartition(32)
    partials = build_partials(df, "url", ["lang"]).persist()
    flat = {r["lang"]: bytes(r["sketch"])
            for r in merge_partials(partials, ["lang"]).collect()}
    tree = {r["lang"]: bytes(r["sketch"])
            for r in tree_merge_partials(partials, ["lang"], fanout=4, levels=2).collect()}
    assert flat == tree
    partials.unpersist()


def test_tree_merge_global(spark):
    df = _zipf_pages(spark, n=5_000).repartition(16)
    partials = build_partials(df, "url", ()).persist()
    [flat] = merge_partials(partials, ()).collect()
    [tree] = tree_merge_partials(partials, (), fanout=4, levels=1).collect()
    assert bytes(flat["sketch"]) == bytes(tree["sketch"])
    est = HllSketch.from_bytes(bytes(tree["sketch"])).count()
    exact = df.select("url").distinct().count()
    assert abs(est - exact) / exact <= 10 * 0.008125
    partials.unpersist()
