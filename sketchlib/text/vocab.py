"""Vocabulary-growth (Heaps' law) curve via HLL prefix merges.

Corpus analytics: how many DISTINCT tokens has the corpus accumulated
after each successive slice of documents?  The curve (Heaps 1978:
``V(n) ~ K * n^beta``) is the standard diagnostic for corpus diversity
and dedup health — a flattening curve means new shards add boilerplate,
not vocabulary.

Why sketches are the right tool: the exact answer needs one
COUNT DISTINCT per prefix — B scans of the token stream (or a
first-occurrence shuffle of every distinct token).  With mergeable HLL
sketches the corpus is scanned ONCE into B per-bucket sketches (the
standard two-stage blob aggregation), and the B prefix unions are
driver-side merges of B tiny blobs — associativity is doing the work,
which is the whole point of the sketch algebra (reference semantics:
``CardinalityEstimation`` Merge, CardinalityEstimator.cs:278-305).

Scale shape: one explode -> groupBy(bucket) shuffle of (bucket, token)
pairs with map-side partial blob merge; driver state is B blobs
(<= 16 KB each at p=14), independent of corpus size.  Buckets are
derived map-only from the id range, not a global sort — the curve's
"order" is id order, which for ingestion-timestamped ids is crawl order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..hll import HllSketch
from ..spark.aggregate import HllSpec, sketch_agg
from .decontaminate import tokens_col


def vocab_growth(docs: DataFrame, n_buckets: int = 10,
                 text_col: str = "text", id_col: str = "doc_id",
                 spec: HllSpec | None = None) -> DataFrame:
    """(bucket, n_docs, cum_docs, est_cum_distinct_tokens) — one row per
    id-range bucket, cumulative over buckets in id order.

    Empty buckets (no docs in that id sub-range) still appear, carrying
    the running totals forward.  Two tiny driver actions (id bounds +
    the B-blob collect) frame one full scan of the corpus."""
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    spec = spec or HllSpec()
    spark = docs.sparkSession
    base = docs.filter(F.col(text_col).isNotNull())
    bounds = base.agg(F.min(id_col).alias("lo"),
                      F.max(id_col).alias("hi")).collect()[0]
    if bounds["lo"] is None:
        return spark.createDataFrame(
            [], "bucket int, n_docs long, cum_docs long, "
                "est_cum_distinct_tokens long")
    lo, hi = int(bounds["lo"]), int(bounds["hi"])
    span = max(hi - lo + 1, 1)
    # bucket from driver-computed boundary comparisons, NOT the closed
    # form floor((id - lo) * n / span): for 64-bit hash ids the span can
    # exceed Long.MAX (F.lit would fail) and (id - lo) * n overflows long
    # (ANSI error / silent negative buckets).  Every edge is an exact
    # python big-int that lands back inside [lo, hi], so each comparison
    # is long-safe; id >= edge_b  <=>  floor((id-lo)*n/span) >= b, so the
    # assignment is bit-identical to the closed form where that form is
    # computable.
    edges = [lo + (b * span + n_buckets - 1) // n_buckets
             for b in range(1, n_buckets)]
    bucket_expr = F.lit(0)
    for e in edges:
        bucket_expr = bucket_expr + (F.col(id_col) >= F.lit(e)).cast("int")
    bucket = bucket_expr.cast("int").alias("bucket")

    toks = base.select(bucket, F.explode(
        tokens_col(F.col(text_col))).alias("tok"))
    blob_rows = {r["bucket"]: bytes(r["sketch"]) for r in
                 sketch_agg(toks, "tok", ["bucket"], spec).collect()}
    doc_rows = {r["bucket"]: r["n"] for r in
                base.select(bucket).groupBy("bucket")
                .agg(F.count("*").alias("n")).collect()}

    out = []
    acc: HllSketch | None = None
    cum_docs = 0
    for b in range(n_buckets):
        if b in blob_rows:
            sk = HllSketch.from_bytes(blob_rows[b])
            if acc is None:
                acc = sk
            else:
                acc.merge(sk)
        cum_docs += int(doc_rows.get(b, 0))
        out.append((b, int(doc_rows.get(b, 0)), cum_docs,
                    int(acc.count()) if acc is not None else 0))
    return spark.createDataFrame(
        out, "bucket int, n_docs long, cum_docs long, "
             "est_cum_distinct_tokens long")
