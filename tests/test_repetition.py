"""Within-doc repetition stats (sketchlib.text.repetition)."""

from pyspark.sql import functions as F

from sketchlib.text.repetition import repetition_keep, repetition_stats


def _stats(spark, text):
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    return repetition_stats(df).collect()[0].asDict()


def test_counts_basic(spark):
    s = _stats(spark, "a b a b a c")
    # 2-grams: "a b" x2, "b a" x2, "a c" x1 -> top by (-count, gram) = "a b"
    assert s["n_2grams"] == 5
    assert s["top_2gram_count"] == 2 and s["top_2gram_len"] == 3
    # 5-grams: "a b a b a", "b a b a c" -> no duplicates
    assert s["n_5grams"] == 2 and s["dup_5gram_chars"] == 0


def test_duplicate_5grams(spark):
    text = " ".join(["x y z w v"] * 4)  # 20 tokens, heavy 5-gram repeats
    s = _stats(spark, text)
    assert s["n_5grams"] == 16
    assert s["dup_5gram_chars"] > 0


def test_short_and_null(spark):
    df = spark.createDataFrame([(0, "one"), (1, None)],
                               "doc_id long, text string")
    rows = repetition_stats(df).collect()
    assert len(rows) == 1  # null text dropped
    s = rows[0].asDict()
    assert s["n_2grams"] == 0 and s["top_2gram_count"] == 0


def test_keep_rule(spark):
    import random

    rng = random.Random(1)
    varied = " ".join(f"w{rng.randrange(10**6)}" for _ in range(100))
    loopy = " ".join(["spam ham"] * 60)
    df = spark.createDataFrame([(0, varied), (1, loopy)],
                               "doc_id long, text string")
    kept = (repetition_stats(df).select("doc_id", repetition_keep())
            .collect())
    got = {r["doc_id"]: r["keep"] for r in kept}
    assert got == {0: True, 1: False}


def test_deterministic_tiebreak(spark):
    # "b a" and "a b" both appear twice; lexicographic min "a b" wins
    s = _stats(spark, "b a b a b")
    assert s["top_2gram_count"] == 2 and s["top_2gram_len"] == 3
