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


def _counter_reference(tokens):
    """The normative definition, spelled with a Counter over joined-gram
    strings (the pre-vectorization implementation)."""
    from collections import Counter

    g2 = Counter(" ".join(tokens[i:i + 2]) for i in range(len(tokens) - 1))
    if g2:
        top = min(g2.items(), key=lambda kv: (-kv[1], kv[0]))
        top_count, top_len = top[1], len(top[0])
    else:
        top_count = top_len = 0
    g5 = Counter(" ".join(tokens[i:i + 5]) for i in range(len(tokens) - 4))
    dup_chars = sum(len(g) * c for g, c in g5.items() if c >= 2)
    return (sum(g2.values()), top_count, top_len, sum(g5.values()), dup_chars)


def test_vectorized_matches_counter_reference(spark):
    """Differential test vs the joined-string Counter definition on
    adversarial token material: prefix tokens ('ab' vs 'abc' — exercises
    the trailing-space rank order), control characters below 0x20 (where
    raw-token order and joined-string order diverge), unicode, and heavy
    tie fields (all counts 1 -> tie-break over every gram)."""
    import random

    rng = random.Random(42)
    vocab = ["ab", "abc", "ab\x01", "a", "\x01a", "é", "é½", "z" * 30,
             "ab!", "ab~", "0", "00"]
    docs = []
    for i in range(60):
        n = rng.randrange(1, 40)
        docs.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
    docs.append((1000, "one"))
    docs.append((1001, " ".join(["loop gram " * 3] * 10)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert len(got) == len(docs)
    for doc_id, text in docs:
        tokens = text.lower().strip().split()
        if not tokens:
            tokens = [""]
        n2, tc, tl, n5, dup = _counter_reference(tokens)
        r = got[doc_id]
        assert (r["n_2grams"], r["top_2gram_count"], r["top_2gram_len"],
                r["n_5grams"], r["dup_5gram_chars"]) == (n2, tc, tl, n5, dup), \
            f"doc {doc_id}: {text!r}"
