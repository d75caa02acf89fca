"""Training-sequence packing: assign documents to fixed-token-budget
sequences, the GPT-style concat-then-chunk layout.

LM pretraining consumes a corpus as a stream of fixed-length sequences:
documents are concatenated in a deterministic order and the stream is cut
every ``budget`` tokens (docs may straddle a cut).  At corpus scale the
packing must be parallel AND reproducible, so the stream is sharded first:

* every doc lands in one of ``n_buckets`` deterministic buckets
  (``xxhash64(id, salt) % n_buckets`` by default, or any user column —
  partition-independent, growth-stable for existing ids);
* each bucket is an independent concatenation stream: a window cumsum
  over a total order within the bucket yields each doc's start offset,
  hence its first/last sequence index (``offset // budget``).

One shuffle of the (id, token-count) projection — pass a narrow frame and
join the assignment back rather than shipping text through the window.
Each bucket's stream is a few GB at any corpus size (pick
``n_buckets ~ corpus_tokens / 10^9``), so per-partition window state stays
bounded; sequence ids are globally unique as (bucket, local_seq).

Every assignment is a closed-form function of the (bucket, order, tokens)
triple, so an external engine replays it exactly — the gate oracle does.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(df: DataFrame, token_col: str, budget: int,
                   id_col: str = "doc_id", n_buckets: int = 1024,
                   salt: str = "pack-v1",
                   bucket_col: str | None = None,
                   order_col: str | None = None) -> DataFrame:
    """Append ``bucket``, ``start_offset``, ``first_seq``, ``last_seq``.

    ``first_seq``/``last_seq`` are the bucket-local sequence indices the
    doc's tokens fall into (inclusive; a doc may straddle sequences).
    Zero-token docs get ``last_seq = first_seq`` (they occupy no tokens
    at their start offset).  Global sequence identity is the pair
    ``(bucket, seq)``.

    ``bucket_col``/``order_col`` override the default hash bucketing and
    intra-bucket order (hash asc, id asc) with existing columns — use for
    curriculum or length-sorted packing, or for cross-engine replay."""
    if budget < 1:
        raise ValueError("budget must be >= 1")
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    added = ["bucket", "start_offset", "first_seq", "last_seq"]
    clash = [c for c in added if c in df.columns]
    if clash:
        raise ValueError(f"input already has column(s) {clash}")

    h = F.xxhash64(F.col(id_col), F.lit(salt))
    bucket = (F.col(bucket_col) if bucket_col
              else F.pmod(h, F.lit(n_buckets)).cast("int"))
    order = [F.col(order_col).asc()] if order_col \
        else [h.asc(), F.col(id_col).asc()]

    # NULL token counts pack as zero-token docs (they occupy no stream
    # space); a NEGATIVE count would silently walk the running sum
    # backwards and corrupt every later offset in the bucket — fail the
    # row loudly instead (raise_error evaluates JVM-side, no extra scan)
    t = F.coalesce(F.col(token_col).cast("long"), F.lit(0))
    t = F.when(t >= 0, t).otherwise(F.raise_error(F.concat(
        F.lit(f"negative {token_col} for "),
        F.col(id_col).cast("string"))).cast("long"))
    w = Window.partitionBy(bucket).orderBy(*order) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    end = F.sum(t).over(w)
    start = (end - t).alias("start_offset")
    first = F.floor((end - t) / budget).cast("long")
    last = F.when(t > 0, F.floor((end - 1) / budget).cast("long")) \
        .otherwise(first)
    return df.select(
        "*",
        bucket.alias("bucket"),
        start,
        first.alias("first_seq"),
        last.alias("last_seq"))


def packing_summary(packed: DataFrame, token_col: str,
                    budget: int) -> DataFrame:
    """Per-bucket packing stats: docs, tokens, sequences used, and fill
    ratio of the budget (last partial sequence counted as full).

    ``n_seqs = ceil(n_tokens / budget)`` — the stream is contiguous, so
    that IS the number of sequences holding at least one token.  (Taking
    ``max(last_seq) + 1`` instead over-counts when a trailing zero-token
    doc's start offset lands exactly on a budget boundary: its empty
    ``first_seq == last_seq`` names a sequence no token occupies.)  An
    all-empty bucket reports 0 sequences and a NULL fill ratio."""
    t = F.coalesce(F.col(token_col).cast("long"), F.lit(0))
    return (packed.groupBy("bucket").agg(
        F.count("*").alias("n_docs"),
        F.sum(t).alias("n_tokens"),
        F.ceil(F.sum(t) / F.lit(budget)).cast("long").alias("n_seqs"),
    ).withColumn(
        "fill_ratio",
        F.when(F.col("n_seqs") > 0,
               F.col("n_tokens").cast("double")
               / (F.col("n_seqs") * F.lit(float(budget))))))
