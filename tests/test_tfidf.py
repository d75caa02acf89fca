"""TF-IDF keyword extraction (sketchlib/text/tfidf.py)."""

import math

import pytest
from pyspark.sql import functions as F

from sketchlib.text.tfidf import IdfModel, fit_idf, top_keywords

DOCS = [
    (0, "spark spark spark shuffle join"),
    (1, "spark join join catalyst"),
    (2, "catalyst optimizer rules rules rules"),
    (3, "spark catalyst"),
    (4, "unique singleton"),
]


def _py_reference(vocab_size=1000, k=3):
    toks = {i: t.strip().lower().split() for i, t in DOCS}
    n = len(DOCS)
    dfc: dict = {}
    for t in toks.values():
        for tok in set(t):
            dfc[tok] = dfc.get(tok, 0) + 1
    vocab = sorted(dfc, key=lambda t: (-dfc[t], t))[:vocab_size]
    idf = {t: round(1000.0 * math.log((n + 1.0) / (dfc[t] + 1.0)))
           for t in vocab}
    out = []
    for i, t in toks.items():
        tf: dict = {}
        for tok in t:
            if tok in idf:
                tf[tok] = tf.get(tok, 0) + 1
        ranked = sorted(tf, key=lambda x: (-tf[x] * idf[x], x))[:k]
        for r, tok in enumerate(ranked, 1):
            out.append((i, r, tok, tf[tok], tf[tok] * idf[tok]))
    return sorted(out)


@pytest.fixture()
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_matches_python_reference(spark, docs_df):
    model = fit_idf(docs_df, vocab_size=1000)
    got = sorted((r["doc_id"], r["rnk"], r["token"], r["tf"],
                  r["score_milli"])
                 for r in top_keywords(docs_df, model, k=3).collect())
    assert got == _py_reference()


def test_vocab_cap_and_oov(spark, docs_df):
    # vocab_size=2 keeps the two highest-df terms (spark df=3, catalyst
    # df=3, join df=2 -> 'catalyst','spark' after the token tie-break)
    model = fit_idf(docs_df, vocab_size=2)
    assert sorted(model.tokens) == ["catalyst", "spark"]
    kws = top_keywords(docs_df, model, k=5).collect()
    assert {r["token"] for r in kws} <= {"catalyst", "spark"}
    # doc 4 has only OOV terms -> no keyword rows
    assert not [r for r in kws if r["doc_id"] == 4]


def test_rare_terms_outscore_common(spark, docs_df):
    model = fit_idf(docs_df, vocab_size=1000)
    top1 = {r["doc_id"]: r["token"]
            for r in top_keywords(docs_df, model, k=1).collect()}
    # doc 2: 'rules' (tf 3, df 1) beats 'catalyst' (tf 1, df 3)
    assert top1[2] == "rules"
    # doc 4's singleton terms outrank nothing else: top is alphabetical
    # between two (tf 1, df 1) ties
    assert top1[4] == "singleton"


def test_partition_independent(spark, docs_df):
    model = fit_idf(docs_df, vocab_size=1000)
    a = sorted(map(tuple, top_keywords(
        docs_df.repartition(1), model, k=2).collect()))
    b = sorted(map(tuple, top_keywords(
        docs_df.repartition(7), model, k=2).collect()))
    assert a == b


def test_plan_shape(spark, docs_df):
    model = fit_idf(docs_df, vocab_size=10)
    df = top_keywords(docs_df, model, k=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan          # map-side rank pre-cap
    assert "BroadcastHashJoin" in plan         # vocab rides a broadcast
    assert "Python" not in plan and "MapIn" not in plan


def test_validation(spark, docs_df):
    with pytest.raises(ValueError, match="vocab_size"):
        fit_idf(docs_df, vocab_size=0)
    model = IdfModel(tokens=__import__("numpy").array(["a"], dtype=object),
                     idf_milli=__import__("numpy").array([100]),
                     n_docs=1)
    with pytest.raises(ValueError, match="k must"):
        top_keywords(docs_df, model, k=0)
