"""C4 cleaning rules (sketchlib/text/c4.py — Raffel et al. 2020 §2.2):
Python re-derivation oracle, NULL/edge handling, DuckDB SQL-fragment
parity, and the filter composition."""

import re

import pytest
from pyspark.sql import functions as F

from sketchlib.text import c4

DOCS = [
    (0, "This is a proper sentence with enough words here.\n"
        "Another full sentence follows right after it today.\n"
        "And a third complete sentence closes the page out."),
    (1, "Too short.\nAlso tiny!\nNope?"),                     # <5 words/line
    (2, "no terminal punctuation on this line of words\n"
        "this one also just trails off into nothing at all"),  # no punct
    (3, "Please enable javascript to view this page properly.\n"
        "This sentence is fine and long enough to keep around.\n"
        "So is this one which also ends with a period today.\n"
        "A third keeper sentence makes the page long enough."),
    (4, "Lorem ipsum dolor sit amet consectetur adipiscing elit today.\n"
        "This otherwise fine sentence cannot save the page now.\n"
        "Nor can this third one because lorem ipsum poisons pages."),
    (5, "function f() { return 42; } is code not prose today.\n"
        "This fine sentence cannot save a page containing braces.\n"
        "Neither can this third perfectly reasonable sentence."),
    (6, "This page mentions porn exactly once in passing today.\n"
        "The bad-word page rule still drops the whole page now.\n"
        "Even though every line here is individually acceptable."),
    (7, 'He said "this quoted line should count as terminal."\n'
        "A second proper sentence keeps the page going along.\n"
        "A third proper sentence finishes the quota nicely."),
    (8, ""),                                                   # empty
    (9, None),                                                 # NULL
    (10, "Only two good sentences live on this page right now.\n"
         "The three-sentence rule therefore drops the page."),  # 2 sentences
    (11, "A CRLF page still keeps its proper first sentence.\r\n"
         "The second carriage-return line also survives fine.\r\n"
         "And the third one makes the sentence quota today."),  # CRLF keeps
    (12, "First proper sentence is long enough to pass today.\n"
         "Second proper sentence also passes the bar just fine.\n"
         "Stray final carriage return breaks this line now.\r"),  # \r at EOF
]


def _py_line_keep(ln: str) -> bool:
    # mirrors the fixed engine semantics exactly: rtrim strips only 0x20,
    # the punctuation anchor is absolute end-of-text (\Z = Java/RE2 \z),
    # word whitespace is the explicit [ \t\x0b\f\r] class
    return (bool(re.search(r'[.!?"”]\Z', ln.rstrip(" ")))
            and len(re.split(r"[ \t\x0b\f\r]+", ln.strip(" "))) >= 5
            and "javascript" not in ln.lower())


def _py_c4(text):
    """Independent re-derivation of every stat column."""
    if text is None:
        return dict(c4_n_lines=None, c4_n_kept_lines=None,
                    c4_n_sentences=None, c4_has_lorem_ipsum=None,
                    c4_has_brace=None, c4_has_bad_word=None,
                    c4_keep=False, c4_text=None)
    lines = re.split(r"\r?\n", text)
    kept = [ln for ln in lines if _py_line_keep(ln)]
    clean = "\n".join(kept)
    n_sent = len(re.split(r"[.!?]", clean)) - 1
    lower = text.lower()
    has_lorem = "lorem ipsum" in lower
    has_brace = "{" in text
    has_bad = bool(re.search(c4._bad_word_pattern(c4.DEFAULT_BAD_WORDS), lower))
    keep = (n_sent >= c4.MIN_SENTENCES and not has_lorem and not has_brace
            and not has_bad)
    return dict(c4_n_lines=len(lines), c4_n_kept_lines=len(kept),
                c4_n_sentences=n_sent, c4_has_lorem_ipsum=has_lorem,
                c4_has_brace=has_brace, c4_has_bad_word=has_bad,
                c4_keep=keep, c4_text=clean)


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


class TestC4Stats:
    def test_matches_python_rederivation(self, spark, docs_df):
        rows = {r["doc_id"]: r.asDict()
                for r in c4.with_c4_stats(docs_df).collect()}
        for doc_id, text in DOCS:
            want = _py_c4(text)
            got = rows[doc_id]
            for k, v in want.items():
                assert got[k] == v, (doc_id, k, got[k], v)

    def test_expected_verdicts(self, spark, docs_df):
        keep = {r["doc_id"]: r["c4_keep"]
                for r in c4.with_c4_stats(docs_df).collect()}
        assert keep == {0: True, 1: False, 2: False, 3: True, 4: False,
                        5: False, 6: False, 7: True, 8: False, 9: False,
                        10: False, 11: True, 12: False}

    def test_javascript_line_dropped_but_page_kept(self, spark, docs_df):
        [r] = c4.with_c4_stats(docs_df.where("doc_id = 3")).collect()
        assert r["c4_n_lines"] == 4 and r["c4_n_kept_lines"] == 3
        assert "javascript" not in r["c4_text"]

    def test_stat_clash_raises(self, spark, docs_df):
        with pytest.raises(ValueError, match="c4_keep"):
            c4.with_c4_stats(docs_df.withColumn("c4_keep", F.lit(True)))

    def test_empty_bad_words_raises(self, spark, docs_df):
        with pytest.raises(ValueError, match="bad_words"):
            c4.with_c4_stats(docs_df, bad_words=())

    def test_filter_replaces_text_and_drops_stats(self, spark, docs_df):
        out = c4.c4_filter(docs_df)
        assert set(out.columns) == {"doc_id", "text"}
        rows = {r["doc_id"]: r["text"] for r in out.collect()}
        assert set(rows) == {0, 3, 7, 11}
        assert rows[3] == "\n".join(DOCS[3][1].split("\n")[1:])
        # CRLF page comes out newline-joined with the \r consumed
        assert rows[11] == DOCS[11][1].replace("\r\n", "\n")

    def test_duckdb_sql_parity(self, spark, docs_df):
        """The shipped SQL fragments agree with the Spark expressions on
        every row and every stat column (the oracle contract)."""
        import duckdb

        pdf = docs_df.toPandas()
        con = duckdb.connect()
        con.register("docs", pdf)
        frags = c4.sql_c4_stats("text")
        sel = ", ".join(f"{expr} AS {name}" for name, expr in frags.items())
        duck = (con.sql(f"SELECT doc_id, {sel} FROM docs").df()
                .set_index("doc_id").sort_index())
        got = (c4.with_c4_stats(docs_df).toPandas()
               .set_index("doc_id").sort_index())
        for col in frags:
            s, d = got[col], duck[col]
            both_null = s.isna() & d.isna()
            assert (both_null | (s == d)).all(), (
                col, s.to_dict(), d.to_dict())

    def test_on_real_documents_table(self, spark, sf_dir):
        """Runs on the synthetic corpus: stats are internally consistent
        and the filter output equals the keep-flag subset."""
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        st = c4.with_c4_stats(docs).select(
            "c4_n_lines", "c4_n_kept_lines", "c4_n_sentences", "c4_keep")
        agg = st.agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("c4_n_kept_lines") > F.col("c4_n_lines"), 1)
                  .otherwise(0)).alias("bad_counts"),
            F.sum(F.when(F.col("c4_keep"), 1).otherwise(0)).alias("n_keep"),
        ).first()
        assert agg["bad_counts"] == 0
        assert 0 <= agg["n_keep"] <= agg["n"]
        assert c4.c4_filter(docs).count() == agg["n_keep"]

    def test_filter_is_fixpoint(self, spark, docs_df):
        """c4_filter(c4_filter(x)) == c4_filter(x): kept lines all pass the
        line rules, and surviving pages keep passing the page rules."""
        once = c4.c4_filter(docs_df)
        twice = c4.c4_filter(once)
        a = {r["doc_id"]: r["text"] for r in once.collect()}
        b = {r["doc_id"]: r["text"] for r in twice.collect()}
        assert a == b
