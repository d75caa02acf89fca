"""Exact-substring span dedup (sketchlib/text/spandedup.py)."""

import pytest
from pyspark.sql import functions as F

from sketchlib.text.spandedup import (
    duplicate_gram_positions,
    remove_duplicate_spans,
    span_dedup_summary,
)

# corpus with a shared 6-token run across docs 0/1, a self-repetition
# inside doc 2, a short doc, and a unique doc
DOCS = [
    (0, "alpha beta gamma delta epsilon zeta unique0 tail0"),
    (1, "head1 alpha beta gamma delta epsilon zeta unique1"),
    (2, "x y z x y z x y z"),          # self-repeating 3-gram period
    (3, "tiny doc"),                    # shorter than n -> no grams
    (4, "totally distinct words here nothing repeats at all"),
]


def _py_reference(docs, n, min_count):
    """Token-level reference: flag positions whose n-gram (joined token
    string) occurs >= min_count times corpus-wide; merge to spans; strip."""
    toks = {i: t.strip().lower().split() for i, t in docs}
    counts: dict = {}
    for t in toks.values():
        for p in range(len(t) - n + 1):
            g = " ".join(t[p:p + n])
            counts[g] = counts.get(g, 0) + 1
    out = {}
    for i, t in toks.items():
        ps = [p for p in range(len(t) - n + 1)
              if counts[" ".join(t[p:p + n])] >= min_count]
        covered = set()
        for p in ps:
            covered.update(range(p, p + n))
        # span count: maximal runs of flagged starts with gap <= n
        spans = 0
        last = None
        for p in ps:
            if last is None or p - last > n:
                spans += 1
            last = p
        clean = " ".join(tok for j, tok in enumerate(t) if j not in covered)
        out[i] = (len(t), len(ps), spans, len(covered), clean)
    return out


@pytest.fixture()
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


@pytest.mark.parametrize("n,min_count", [(3, 2), (6, 2), (3, 3)])
def test_matches_python_reference(spark, docs_df, n, min_count):
    got = {r["doc_id"]: (r["n_tokens"], r["n_dup_grams"], r["n_spans"],
                         r["dup_tokens"], r["clean_text"])
           for r in remove_duplicate_spans(docs_df, n=n,
                                           min_count=min_count).collect()}
    assert got == _py_reference(DOCS, n, min_count)


def test_shared_run_flagged_in_both_docs(spark, docs_df):
    out = {r["doc_id"]: r for r in
           remove_duplicate_spans(docs_df, n=6).collect()}
    # the 6-token shared run is flagged in docs 0 and 1, nowhere else
    assert out[0]["n_spans"] == 1 and out[1]["n_spans"] == 1
    assert out[0]["dup_tokens"] == 6 and out[1]["dup_tokens"] == 6
    assert out[0]["clean_text"] == "unique0 tail0"
    assert out[1]["clean_text"] == "head1 unique1"
    assert out[4]["n_spans"] == 0
    assert out[4]["clean_text"] == DOCS[4][1]


def test_self_repetition_merges_to_one_span(spark, docs_df):
    out = {r["doc_id"]: r for r in
           remove_duplicate_spans(docs_df, n=3).collect()}
    # doc 2 is periodic: every 3-gram repeats -> one span covering all
    assert out[2]["n_spans"] == 1
    assert out[2]["dup_tokens"] == out[2]["n_tokens"] == 9
    assert out[2]["clean_text"] == ""


def test_short_doc_passthrough(spark, docs_df):
    out = {r["doc_id"]: r for r in
           remove_duplicate_spans(docs_df, n=3).collect()}
    assert out[3]["n_dup_grams"] == 0 and out[3]["clean_text"] == "tiny doc"


def test_partition_independent(spark, docs_df):
    a = sorted(map(tuple, remove_duplicate_spans(
        docs_df.repartition(1), n=3).collect()))
    b = sorted(map(tuple, remove_duplicate_spans(
        docs_df.repartition(7), n=3).collect()))
    assert a == b


def test_positions_and_summary(spark, docs_df):
    pos = {(r["doc_id"], r["pos"])
           for r in duplicate_gram_positions(docs_df, n=6).collect()}
    # doc 2 is periodic with period 3: its 6-grams at p=0 and p=3 coincide
    assert pos == {(0, 0), (1, 1), (2, 0), (2, 3)}
    summ = span_dedup_summary(
        remove_duplicate_spans(docs_df, n=6)).collect()[0]
    assert summ["n_docs"] == 5 and summ["docs_with_dups"] == 3
    assert summ["dup_tokens"] == 12 + 9


def test_validation(spark, docs_df):
    with pytest.raises(ValueError, match="min_count"):
        duplicate_gram_positions(docs_df, min_count=1)
    with pytest.raises(ValueError, match="n must"):
        duplicate_gram_positions(docs_df, n=0)


def test_extra_columns_preserved(spark):
    df = spark.createDataFrame(
        [(0, "a b c d", "s1"), (1, "a b c d", "s2")],
        "doc_id long, text string, source string")
    out = remove_duplicate_spans(df, n=4)
    assert "source" in out.columns and "text" not in out.columns
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[0]["source"] == "s1" and rows[0]["clean_text"] == ""
