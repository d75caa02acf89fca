"""Vocabulary-growth curve: monotonicity, merge-equals-global bit
consistency, bucket accounting, degenerate inputs."""

from pyspark.sql import functions as F

from sketchlib.spark.aggregate import HllSpec, sketch_agg
from sketchlib.hll import HllSketch
from sketchlib.text.decontaminate import tokens_col
from sketchlib.text.vocab import vocab_growth


def _docs(spark, n=300):
    rows = [(i, " ".join(f"tok{(i * 7 + j) % 97}" for j in range(12)))
            for i in range(n)]
    rows.append((n, None))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_curve_monotone_and_accounted(spark):
    docs = _docs(spark)
    out = vocab_growth(docs, n_buckets=6).collect()
    assert [r["bucket"] for r in out] == list(range(6))
    ests = [r["est_cum_distinct_tokens"] for r in out]
    assert ests == sorted(ests)  # prefix unions only grow
    assert sum(r["n_docs"] for r in out) == 300  # null-text doc excluded
    assert out[-1]["cum_docs"] == 300


def test_final_prefix_merge_equals_global_sketch(spark):
    """Merging the B per-bucket sketches must give the SAME estimate as one
    global sketch over all tokens — associativity, the property the whole
    operator rests on."""
    docs = _docs(spark)
    out = vocab_growth(docs, n_buckets=6).collect()
    toks = (docs.filter(F.col("text").isNotNull())
            .select(F.explode(tokens_col(F.col("text"))).alias("tok")))
    [row] = sketch_agg(toks, "tok", (), HllSpec()).collect()
    assert (out[-1]["est_cum_distinct_tokens"]
            == HllSketch.from_bytes(bytes(row["sketch"])).count())


def test_single_bucket_and_exactness_small(spark):
    docs = _docs(spark, n=40)  # 97 distinct tokens > direct threshold?
    out = vocab_growth(docs, n_buckets=1).collect()
    assert len(out) == 1
    exact = (docs.filter(F.col("text").isNotNull())
             .select(F.explode(tokens_col(F.col("text"))).alias("tok"))
             .agg(F.countDistinct("tok")).collect()[0][0])
    est = out[0]["est_cum_distinct_tokens"]
    assert abs(est - exact) <= max(2.0, 0.0081 * 2 * exact)


def test_empty_and_all_null(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert vocab_growth(empty, 4).count() == 0
    nulls = spark.createDataFrame([(1, None)], "doc_id long, text string")
    assert vocab_growth(nulls, 4).count() == 0


def test_partition_independent(spark):
    docs = _docs(spark)
    a = vocab_growth(docs.repartition(1), n_buckets=5).collect()
    b = vocab_growth(docs.repartition(7), n_buckets=5).collect()
    assert a == b
