"""Benchmark decontamination (sketchlib.text.decontaminate)."""

from pyspark.sql import functions as F

from sketchlib.text import contamination_report, decontaminate, ngram_hash_col


def _corpus(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog today"),
        (1, "a completely unrelated sentence about spark plans"),
        (2, "quick brown fox jumps over the lazy dog and cat"),  # overlaps 0
        (3, "short doc"),
        (4, None),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_ngram_fallback_and_counts(spark):
    df = _corpus(spark).select(
        "doc_id", F.size(ngram_hash_col("text", 5)).alias("k"))
    got = {r["doc_id"]: r["k"] for r in df.filter(F.col("text").isNull()
                                                  | F.lit(True)).collect()}
    assert got[0] == 6  # 10 tokens -> 6 five-grams
    assert got[3] == 1  # whole-text fallback below n tokens


def test_contamination_and_decontaminate(spark):
    corpus = _corpus(spark)
    eval_df = spark.createDataFrame(
        [(100, "brown fox jumps over the lazy")],  # 6 tokens -> 2 five-grams
        "eval_id long, text string")
    rep = {r["doc_id"]: r["n_hits"]
           for r in contamination_report(corpus, eval_df, n=5).collect()}
    # docs 0 and 2 contain "brown fox jumps over the" / "fox jumps over the
    # lazy"; doc 1/3 share nothing
    assert set(rep) == {0, 2}
    assert rep[0] == 2 and rep[2] == 2
    clean = sorted(r["doc_id"] for r in
                   decontaminate(corpus, eval_df, n=5).collect())
    assert clean == [1, 3, 4]


def test_case_and_whitespace_normalization(spark):
    corpus = spark.createDataFrame(
        [(0, "Alpha  Beta\tGamma Delta Epsilon")], "doc_id long, text string")
    eval_df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon")], "eval_id long, text string")
    assert contamination_report(corpus, eval_df, n=5).count() == 1


def test_broadcast_in_plan(spark):
    """The eval side must broadcast — the corpus is scanned, not shuffled."""
    corpus = _corpus(spark)
    eval_df = spark.createDataFrame([(1, "x y z")], "eval_id long, text string")
    plan = (contamination_report(corpus, eval_df, n=2)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_public_api_and_internal_gram_domains_match(spark):
    """Grams precomputed with the public ngram_hash_col join against
    contamination_report's internal gram rows (one normative hash domain —
    regression for the formerly disjoint string-hash vs hash-of-hash
    spaces)."""
    from pyspark.sql import functions as F

    from sketchlib.text.decontaminate import _gram_rows, ngram_hash_col

    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "x")], "doc_id long, text string")
    public = (df.select(F.explode(ngram_hash_col("text", n=3)).alias("__g"))
              .distinct())
    internal = _gram_rows(df, "text", 3, []).distinct()
    pub = {r["__g"] for r in public.collect()}
    intl = {r["__g"] for r in internal.collect()}
    assert pub == intl and len(pub) >= 3
