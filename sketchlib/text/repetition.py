"""Within-document repetition statistics — the second half of the Gopher
filtering rules (Rae et al. 2021, A1.1): the character mass of the most
frequent word 2-gram and of duplicated word 5-grams.

These are per-document argmax/group-count computations over a document's
own n-grams.  Spark's built-in column expressions cannot express "count
each gram, take the most frequent" without either an O(tokens^2) inline
expression or exploding every gram through a corpus-wide shuffle, so this
is the documented escalation path: a vectorized ``mapInPandas`` UDF —
JVM-side tokenization (the split happens in the plan, only the token array
crosses the Arrow boundary), one Python pass per document batch with a
``Counter`` over its grams, O(tokens) per doc, zero shuffle.

Outputs are integer counts (not ratios) so the DuckDB oracle reproduces
them exactly; the keep rule derives its fractions from the same integers.
Normative definitions (ties on gram counts break by lexicographically
smallest gram; duplicated-gram chars count every occurrence):

* ``top_2gram_count`` / ``top_2gram_len`` — occurrences and string length
  of the most frequent space-joined 2-gram;
* ``dup_5gram_chars``   — sum of ``len(gram) x count`` over 5-grams whose
  count >= 2.
"""

from __future__ import annotations

from collections import Counter
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Gopher A1.1 thresholds on the derived character fractions
MAX_TOP_2GRAM_CHAR_FRAC = 0.20
MAX_DUP_5GRAM_CHAR_FRAC = 0.15

_SCHEMA = T.StructType([
    T.StructField("__id", T.LongType()),
    T.StructField("n_chars", T.LongType()),
    T.StructField("n_2grams", T.LongType()),
    T.StructField("top_2gram_count", T.LongType()),
    T.StructField("top_2gram_len", T.LongType()),
    T.StructField("n_5grams", T.LongType()),
    T.StructField("dup_5gram_chars", T.LongType()),
])


def _doc_stats(tokens: list, n_chars: int) -> tuple:
    g2 = Counter(" ".join(tokens[i:i + 2]) for i in range(len(tokens) - 1))
    if g2:
        # max count, lexicographically-smallest gram on ties -> deterministic
        top = min(g2.items(), key=lambda kv: (-kv[1], kv[0]))
        top_count, top_len = top[1], len(top[0])
    else:
        top_count = top_len = 0
    g5 = Counter(" ".join(tokens[i:i + 5]) for i in range(len(tokens) - 4))
    dup_chars = sum(len(g) * c for g, c in g5.items() if c >= 2)
    return (n_chars, sum(g2.values()), top_count, top_len,
            sum(g5.values()), dup_chars)


def repetition_stats(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """``(id_col, n_chars, n_2grams, top_2gram_count, top_2gram_len,
    n_5grams, dup_5gram_chars)`` per non-null-text document."""
    base = (df.filter(F.col(text_col).isNotNull())
            .select(F.col(id_col).alias("__id"),
                    F.length(text_col).alias("__nc"),
                    F.split(F.lower(F.trim(F.col(text_col))),
                            r"\s+").alias("__t")))

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [(i, *_doc_stats(list(t), int(nc)))
                    for i, nc, t in zip(pdf["__id"], pdf["__nc"], pdf["__t"])]
            yield pd.DataFrame(rows, columns=[f.name for f in _SCHEMA.fields])

    return (base.mapInPandas(compute, _SCHEMA)
            .withColumnRenamed("__id", id_col))


def repetition_keep() -> F.Column:
    """Boolean keep decision over :func:`repetition_stats` columns: drop
    docs whose top 2-gram covers > 20% of characters or whose duplicated
    5-grams cover > 15% (published Gopher thresholds).  Fractions derive
    from the integer counts, so the boolean reproduces cross-engine."""
    n_chars = F.col("n_chars")
    top_frac = (F.col("top_2gram_count") * F.col("top_2gram_len")) / n_chars
    dup_frac = F.col("dup_5gram_chars") / n_chars
    return ((n_chars == 0)
            | ((top_frac <= MAX_TOP_2GRAM_CHAR_FRAC)
               & (dup_frac <= MAX_DUP_5GRAM_CHAR_FRAC))).alias("keep")
