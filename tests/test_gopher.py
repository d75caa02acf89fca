"""Gopher repetition/quality heuristics (sketchlib.text.gopher)."""

import pytest
from pyspark.sql import functions as F

from sketchlib.text.gopher import gopher_filter, gopher_keep, gopher_stats


def _stats(spark, text):
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    row = df.select(*gopher_stats(F.col("text"))).collect()[0]
    return row.asDict()


def test_counts(spark):
    s = _stats(spark, "alpha beta 123 gamma# ...\nline two\nline two\n- item")
    assert s["n_words"] == 11
    assert s["n_alpha_words"] == 8  # '123', '...' and '-' have no alpha
    assert s["n_symbols"] == 2      # one '#', one '...'
    assert s["n_lines"] == 4
    assert s["n_distinct_lines"] == 3  # 'line two' repeats
    assert s["n_bullet_lines"] == 1
    assert s["n_ellipsis_lines"] == 1


def test_empty_lines_ignored(spark):
    s = _stats(spark, "one\n\n\ntwo")
    assert s["n_lines"] == 2 and s["n_distinct_lines"] == 2


def test_filter_rules(spark):
    good = " ".join(f"word{i}" for i in range(80))
    too_short = "just a few words here"
    symbol_heavy = " ".join("#tag" for _ in range(80))
    repeated = "\n".join(["same line"] * 50) + "\n" + " ".join(
        f"w{i}" for i in range(60))
    df = spark.createDataFrame(
        [(0, good), (1, too_short), (2, symbol_heavy), (3, repeated)],
        "doc_id long, text string")
    kept = sorted(r["doc_id"] for r in gopher_filter(df).collect())
    assert kept == [0]
    # relaxing the word floor admits the short doc
    kept2 = sorted(r["doc_id"]
                   for r in gopher_filter(df, min_words=3).collect())
    assert 1 in kept2


def test_filter_preserves_schema(spark):
    df = spark.createDataFrame([(0, " ".join(["ok"] * 60), "en")],
                               "doc_id long, text string, lang string")
    out = gopher_filter(df)
    assert out.columns == ["doc_id", "text", "lang"]


def test_stat_name_clash_raises(spark):
    from sketchlib.text.gopher import with_gopher_stats

    df = spark.createDataFrame([("hi there", 3)], "text string, n_words long")
    with pytest.raises(ValueError, match="n_words"):
        with_gopher_stats(df)


def test_user_temp_columns_pass_through(spark):
    from sketchlib.text.gopher import gopher_filter

    df = spark.createDataFrame(
        [("lorem ipsum dolor sit amet " * 20, "keepme", "metoo")],
        "text string, __w string, __ln string")
    out = gopher_filter(df, min_words=10)
    assert set(out.columns) == {"text", "__w", "__ln"}
    row = out.collect()[0]
    assert row["__w"] == "keepme" and row["__ln"] == "metoo"


def test_blank_and_wrapped_docs_word_counts(spark):
    """Full-whitespace trim: '\nhello world\n' is 2 words (was 4 with
    phantom empty tokens), a blank doc is 0 words (was 1), U+2026 counts
    as an ellipsis, and the keep decision survives n_words = 0 under ANSI
    mode (short-circuited behind the min_words floor)."""
    import pytest

    from sketchlib.text.gopher import gopher_filter, gopher_keep, with_gopher_stats

    rows = [(0, "\nhello world\n"), (1, "  \t "),
            (2, "truncated line ends with…\nanother line here now ok")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in with_gopher_stats(df).collect()}
    assert got[0]["n_words"] == 2
    assert got[1]["n_words"] == 0
    assert got[2]["n_symbols"] == 1          # the U+2026
    assert got[2]["n_ellipsis_lines"] == 1
    # blank doc must be droppable without a DIVIDE_BY_ZERO abort
    kept = gopher_filter(df).collect()
    assert all(r["doc_id"] != 1 for r in kept)
    with pytest.raises(ValueError, match="min_words"):
        gopher_keep(min_words=0)
