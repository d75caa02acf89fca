"""TF-IDF keyword extraction over a document corpus.

Classic corpus analysis (Sparck Jones 1972; the SMART weighting family):
score term *t* in document *d* by ``tf(t,d) * idf(t)`` with
``idf = ln((N+1)/(df_t+1))`` (the add-one-smoothed variant, defined for
every term), and report each document's top-k terms.

Spark-first shape, following the library's bit-reproducibility and
bounded-driver-state conventions (:mod:`sketchlib.text.lmscore`,
:mod:`sketchlib.text.dsir`):

* **Doc-term counts** are one ``explode -> groupBy(id, token)`` shuffle.
  A document's tokens live in one input partition, so map-side partial
  aggregation collapses within-doc repeats before the exchange — the
  shuffled volume is O(distinct (doc, term) pairs), not O(tokens).
* **IDF fit** keeps the top-``vocab_size`` terms by document frequency
  (ties broken by token string): the model is a BOUNDED driver table at
  any corpus size, ``ln`` runs in numpy on the driver (glibc — the same
  libm an oracle engine uses), and the quantized integer **milli-nat**
  idf makes every downstream score integer-exact and engine-reproducible.
  Out-of-vocab terms simply score no keywords — the standard trade for a
  fixed-size model.
* **Scoring** broadcasts the vocab table (``tf * idf_milli`` stays a
  JVM integer expression — no Python stage anywhere in this module) and
  ranks per document with a window; Catalyst's rank-limit pushdown
  (``WindowGroupLimit``) pre-caps map-side exactly as in
  :func:`sketchlib.sampling.cap_per_group`, so a hub document cannot
  create a hot reducer.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .decontaminate import tokens_col

MAX_VOCAB = 5_000_000


@dataclass(frozen=True)
class IdfModel:
    """Fitted idf table: parallel (token, idf_milli) arrays plus the
    corpus document count the smoothing used."""
    tokens: np.ndarray        # object array of vocab token strings
    idf_milli: np.ndarray     # int64, round(1000 * ln((N+1)/(df+1)))
    n_docs: int


def fit_idf(df: DataFrame, text_col: str = "text",
            vocab_size: int = 50_000) -> IdfModel:
    """Fit the top-``vocab_size`` idf table (df-desc, token-asc order).

    Document frequency counts each document once per term regardless of
    within-doc repeats; ``ln`` is quantized to integer milli-nats on the
    driver so scores reproduce bit-for-bit across engines."""
    if vocab_size < 1 or vocab_size > MAX_VOCAB:
        raise ValueError(f"vocab_size must be in [1, {MAX_VOCAB}]")
    n_docs = df.filter(F.col(text_col).isNotNull()).count()
    rows = (df.filter(F.col(text_col).isNotNull())
            .select(F.explode(F.array_distinct(
                tokens_col(F.col(text_col)))).alias("tok"))
            # blank/whitespace-only text tokenizes to [''] — the empty
            # token would climb the df ordering into the vocab and score
            # as a "keyword" for every blank doc
            .filter(F.col("tok") != "")
            .groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
            .orderBy(F.desc("df"), F.asc("tok"))
            .limit(vocab_size)
            .collect())
    toks = np.array([r["tok"] for r in rows], dtype=object)
    dfs = np.array([r["df"] for r in rows], dtype=np.float64)
    idf = np.round(1000.0 * np.log((n_docs + 1.0) / (dfs + 1.0)))
    return IdfModel(toks, idf.astype(np.int64), n_docs)


def top_keywords(df: DataFrame, model: IdfModel, k: int = 5,
                 text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Per-document top-``k`` keywords by integer tf*idf score.

    Output: ``(id_col, rnk, token, tf, score_milli)`` with the
    deterministic total order (score desc, token asc) per document.
    Plan: one doc-term count shuffle (map-side combined), a broadcast
    join against the vocab table, and a ``WindowGroupLimit``-pre-capped
    rank — no Python stage."""
    if k < 1:
        raise ValueError("k must be >= 1")
    spark = df.sparkSession
    vocab = F.broadcast(spark.createDataFrame(
        [(str(t), int(i)) for t, i in zip(model.tokens, model.idf_milli)],
        "token string, idf_milli long"))
    pairs = (df.filter(F.col(text_col).isNotNull())
             .select(id_col, F.explode(
                 tokens_col(F.col(text_col))).alias("token"))
             .filter(F.col("token") != "")
             .groupBy(id_col, "token")
             .agg(F.count(F.lit(1)).alias("tf")))
    scored = (pairs.join(vocab, "token")
              .withColumn("score_milli",
                          (F.col("tf") * F.col("idf_milli")).cast("long")))
    w = (Window.partitionBy(id_col)
         .orderBy(F.desc("score_milli"), F.asc("token")))
    return (scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select(id_col, "rnk", "token", F.col("tf").cast("long").alias("tf"),
                    "score_milli"))
