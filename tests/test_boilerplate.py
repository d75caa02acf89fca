"""Duplicated-line boilerplate removal (sketchlib/text/boilerplate.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sketchlib.text.boilerplate import (
    frequent_line_hashes,
    remove_boilerplate,
    strip_boilerplate,
)

FOOTER = "Copyright Example Corp"
BANNER = "  COOKIE notice  "  # normalizes equal to "cookie notice"

DOCS = [
    (0, f"unique zero\n{FOOTER}\nmore zero"),
    (1, f"{FOOTER}\nunique one\n\ncookie notice"),
    (2, f"unique two\n{BANNER}\n{FOOTER}"),
    (3, "entirely unique doc"),
    (4, f"{FOOTER}"),  # doc that is pure boilerplate
]


@pytest.fixture()
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_frequency_pass_normalizes_and_thresholds(spark, docs_df):
    fh = frequent_line_hashes(docs_df, min_count=2)
    # footer (4 docs) and normalized cookie banner (2 docs) qualify
    assert len(fh) == 2
    fh3 = frequent_line_hashes(docs_df, min_count=3)
    assert len(fh3) == 1
    # cap keeps the most frequent
    fh_cap = frequent_line_hashes(docs_df, min_count=2, max_lines=1)
    assert list(fh_cap) == list(fh3)


def test_strip_removes_only_frequent_lines(spark, docs_df):
    out = {r.doc_id: r for r in
           remove_boilerplate(docs_df, min_count=2).collect()}
    assert out[0].clean_text == "unique zero\nmore zero"
    # blank line kept; both banner spellings removed via normalization
    assert out[1].clean_text == "unique one\n"
    assert out[2].clean_text == "unique two"
    assert out[3].clean_text == "entirely unique doc"
    assert out[4].clean_text == ""
    assert (out[1].n_lines, out[1].n_removed) == (4, 2)
    assert (out[3].n_lines, out[3].n_removed) == (1, 0)
    # original columns pass through
    assert out[2].text == DOCS[2][1]


def test_empty_frequent_set_is_identity(spark, docs_df):
    out = strip_boilerplate(docs_df, np.array([], dtype=np.int64))
    rows = {r.doc_id: r for r in out.collect()}
    for doc_id, text in DOCS:
        assert rows[doc_id].clean_text == text
        assert rows[doc_id].n_removed == 0


def test_blank_lines_never_counted(spark):
    df = spark.createDataFrame(
        [(i, "a\n\n \nb") for i in range(10)], "doc_id long, text string")
    # '' and ' ' repeat 10x each but must not qualify
    fh = frequent_line_hashes(df, min_count=2)
    got = {r["h"] for r in
           df.select(F.xxhash64(F.lit("")).alias("h")).limit(1).collect()}
    assert not (set(fh.tolist()) & got)
    out = strip_boilerplate(df, fh).first()
    assert out.clean_text == "\n "  # a and b removed, blank lines kept


def test_min_count_validation(spark, docs_df):
    with pytest.raises(ValueError, match="min_count"):
        frequent_line_hashes(docs_df, min_count=1)


def test_strip_plan_is_map_only(spark, docs_df):
    plan = (strip_boilerplate(docs_df, np.array([1, 2], dtype=np.int64))
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan


def test_partition_independent(spark, docs_df):
    fh = frequent_line_hashes(docs_df, min_count=2)
    a = sorted((r.doc_id, r.clean_text) for r in
               strip_boilerplate(docs_df.repartition(1), fh).collect())
    b = sorted((r.doc_id, r.clean_text) for r in
               strip_boilerplate(docs_df.repartition(5), fh).collect())
    assert a == b


def test_strip_null_text_yields_empty(spark):
    """A mixed-null corpus passes the counting pass (which skips nulls) —
    the strip pass must not TypeError on the NULL row."""
    from sketchlib.text.boilerplate import remove_boilerplate

    df = spark.createDataFrame(
        [(1, "keep\nfooter"), (2, "other\nfooter"), (3, None)],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           remove_boilerplate(df, min_count=2).collect()}
    assert out[3]["clean_text"] == ""
    assert out[3]["n_lines"] == 0 and out[3]["n_removed"] == 0
    assert "footer" not in out[1]["clean_text"]
