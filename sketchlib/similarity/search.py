"""Approximate nearest neighbors over an ``array<float>`` embedding column.

Two paths, per the training-pipeline playbook:

* **Brute-force cosine top-k** — the exactness baseline. Queries (a small
  set) are closure-shipped as a dense numpy matrix; one ``mapInPandas`` pass
  over the base table computes an Arrow-batch x query matmul (BLAS) and keeps
  each batch's local top-k per query; a final window takes the global top-k.
  Scale: one full scan, zero shuffle of vectors — shuffle carries only
  ``batches x queries x k`` candidate rows.

* **SRP-LSH** (Charikar 2002 signed random projections) — ``n_bits``
  hyperplane signs from a fixed-seed Gaussian matrix; Hamming distance on
  signatures estimates angle. Banding the signature buckets the table so
  near-dup detection joins only within buckets (same shape as
  MinHash/SimHash). Deterministic: projection matrix derives from a seed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_DEF_SEED = 0xE5D


def _proj_matrix(dim: int, n_bits: int, seed: int = _DEF_SEED) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((dim, n_bits))


def cosine_topk(base: DataFrame, queries: list[tuple], k: int = 10,
                vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Exact cosine top-k of each query against the base table.

    ``queries`` is a list of (query_id, vector) — small enough to ship in the
    task closure (the usual case: a probe set, not a second table).
    Returns (query_id, vec_id, cosine, rnk) with rnk 1..k ordered by
    (cosine desc, vec_id asc) — a deterministic total order.
    """
    qids = [int(q) for q, _ in queries]
    qmat = np.asarray([v for _, v in queries], dtype=np.float64)
    qnorm = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)

    schema = T.StructType([
        T.StructField("query_id", T.LongType()),
        T.StructField(id_col, base.schema[id_col].dataType),
        T.StructField("cosine", T.DoubleType()),
    ])

    def scan(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            sims = (mat / norms) @ qnorm.T  # (batch, n_queries)
            ids = pdf[id_col].to_numpy()
            out = []
            for j, qid in enumerate(qids):
                col = sims[:, j]
                top = min(k, col.shape[0])
                # keep EVERY row tied at the cut similarity: argpartition
                # alone breaks boundary ties by partition order, which the
                # global (cosine desc, id asc) window can't repair once a
                # tied id was dropped batch-side (same guard as the ADC
                # scan in pq.py — integer-grid embeddings tie often)
                thr = np.partition(-col, top - 1)[top - 1]
                for i in np.flatnonzero(-col <= thr):
                    out.append((qid, ids[i], float(col[i])))
            yield pd.DataFrame(out, columns=["query_id", id_col, "cosine"])

    local = base.select(id_col, vec_col).mapInPandas(scan, schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return (local.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k))


def srp_signature_col(vec_col: str | Column, dim: int, n_bits: int = 16,
                      seed: int = _DEF_SEED) -> Column:
    """Signed-random-projection signature (n_bits <= 64) as a long."""
    proj = _proj_matrix(dim, n_bits, seed)
    bits = (np.uint64(1) << np.arange(n_bits, dtype=np.uint64))

    @F.pandas_udf(T.LongType())
    def _sig(vecs: pd.Series) -> pd.Series:
        mat = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        if mat.size == 0:
            return pd.Series(np.zeros(len(vecs), dtype=np.int64))
        signs = (mat @ proj) > 0
        return pd.Series((signs @ bits).astype(np.int64))

    return _sig(F.col(vec_col) if isinstance(vec_col, str) else vec_col)


def cosine_near_dup_pairs(df: DataFrame, vec_col: str = "embedding",
                          id_col: str = "vec_id", threshold: float = 0.95,
                          dim: int | None = None, n_bits: int = 16,
                          n_tables: int = 8, max_bucket: int = 10_000) -> DataFrame:
    """(id_a, id_b, cosine) pairs with cosine >= threshold, via ``n_tables``
    independent SRP signatures (candidates = same full signature in any
    table) and exact cosine verification. Recall per table: (1 - theta/pi)^
    n_bits with theta = arccos(threshold); tables multiply coverage.
    """
    if dim is None:
        row = (df.select(F.size(vec_col).alias("__d"))
               .where(F.col(vec_col).isNotNull()).first())
        if row is None:
            raise ValueError(
                f"cannot infer the embedding dim: no non-null {vec_col!r} "
                "rows (empty input?) — pass dim= explicitly")
        dim = int(row["__d"])
    sigs = [srp_signature_col(vec_col, dim, n_bits, seed=_DEF_SEED + t).alias(f"__sig{t}")
            for t in range(n_tables)]
    with_sig = df.select(id_col, vec_col, *sigs)
    banded = with_sig.select(
        id_col, vec_col,
        F.posexplode(F.array(*[F.col(f"__sig{t}") for t in range(n_tables)]))
        .alias("table_id", "bucket"))
    w = Window.partitionBy("table_id", "bucket")
    banded = (banded.withColumn("__n", F.count("*").over(w))
              .filter(F.col("__n") <= max_bucket).drop("__n"))
    a = banded.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"),
                      "table_id", "bucket")
    b = banded.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"),
                      "table_id", "bucket")
    pairs = (a.join(b, ["table_id", "bucket"])
             .filter(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b", "v_a", "v_b").distinct())

    @F.pandas_udf(T.DoubleType())
    def _cos(va: pd.Series, vb: pd.Series) -> pd.Series:
        ma = np.asarray([np.asarray(v, dtype=np.float64) for v in va])
        mb = np.asarray([np.asarray(v, dtype=np.float64) for v in vb])
        if ma.size == 0:
            return pd.Series(np.zeros(len(va)))
        num = (ma * mb).sum(axis=1)
        den = np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1)
        den[den == 0] = 1.0
        return pd.Series(num / den)

    return (pairs.withColumn("cosine", _cos("v_a", "v_b"))
            .filter(F.col("cosine") >= threshold)
            .select("id_a", "id_b", "cosine"))
