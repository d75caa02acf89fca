"""SemDeDup semantic dedup (sketchlib/similarity/semdedup.py)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from sketchlib.similarity.semdedup import _cluster_keep_mask, semantic_dedup


def _brute_keep(V, ids, tau):
    """Reference O(n^2) implementation of the paper's rule."""
    U = V / np.linalg.norm(V, axis=1, keepdims=True)
    cent = V.mean(axis=0)
    simc = U @ (cent / np.linalg.norm(cent))
    keep = np.ones(len(ids), dtype=bool)
    for i in range(len(ids)):
        for j in range(len(ids)):
            if i == j or U[i] @ U[j] < tau:
                continue
            if (simc[j], ids[j]) < (simc[i], ids[i]):
                keep[i] = False
    return keep


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


def test_kernel_matches_bruteforce(rng):
    V = rng.normal(size=(80, 16))
    # plant duplicate groups: rows 0-2 near-identical, rows 10-11 identical
    V[1] = V[0] + 1e-3 * rng.normal(size=16)
    V[2] = V[0] + 1e-3 * rng.normal(size=16)
    V[11] = V[10]
    ids = np.arange(80, dtype=np.int64)
    got = _cluster_keep_mask(V, ids, tau=0.95)
    want = _brute_keep(V, ids, tau=0.95)
    assert (got == want).all()
    assert (~got).sum() >= 3  # the planted dups actually dropped


def test_kernel_blockwise_equals_unblocked(rng):
    V = rng.normal(size=(50, 8))
    V[7] = 2.0 * V[3]
    ids = np.arange(50, dtype=np.int64)
    full = _cluster_keep_mask(V, ids, tau=0.9, block=4096)
    tiny = _cluster_keep_mask(V, ids, tau=0.9, block=3)
    assert (full == tiny).all()


def test_exact_clone_tie_keeps_lower_id(rng):
    V = rng.normal(size=(10, 8))
    both = np.vstack([V, 2.0 * V])  # clone block, cosine exactly 1
    ids = np.arange(20, dtype=np.int64)
    keep = _cluster_keep_mask(both, ids, tau=0.75)
    assert keep[:10].all() and not keep[10:].any()


def test_spark_matches_kernel_and_partition_independent(spark, rng):
    V = rng.normal(size=(60, 8))
    V[5] = 2.0 * V[4]
    V[30] = -V[29]  # cosine -1: NOT a duplicate
    rows = [(int(i), [float(x) for x in V[i]], int(i % 3))
            for i in range(60)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int")
    out = {r["vec_id"]: r["keep"]
           for r in semantic_dedup(df, cluster_col="label",
                                   tau=0.9).collect()}
    # reference: per-label brute force
    for lbl in range(3):
        m = np.array([i % 3 == lbl for i in range(60)])
        want = _brute_keep(V[m], np.arange(60)[m], tau=0.9)
        for i, w in zip(np.arange(60)[m], want):
            assert out[int(i)] == bool(w), f"vec {i}"
    out7 = {r["vec_id"]: r["keep"]
            for r in semantic_dedup(df.repartition(7),
                                    cluster_col="label", tau=0.9).collect()}
    assert out7 == out


def test_auto_kmeans_path(spark, rng):
    # two well-separated blobs + one exact clone in each
    # 0.3 spread: blob-mates stay under cosine ~0.95, well below tau=0.99
    a = rng.normal(size=(40, 8)) * 0.3 + 2.0 * np.eye(8)[0]
    b = rng.normal(size=(40, 8)) * 0.3 + 2.0 * np.eye(8)[1]
    V = np.vstack([a, b])
    # x2 is IEEE-lossless, so the clone's centroid-similarity ties its
    # original EXACTLY and the id tie-break decides (x3 would round and
    # could flip the ulp-level simc order either way)
    V[1] = 2.0 * V[0]
    V[41] = 2.0 * V[40]
    rows = [(int(i), [float(x) for x in V[i]]) for i in range(80)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    res = semantic_dedup(df, cluster_col=None, n_clusters=2, tau=0.99)
    rows = res.collect()
    assert len(rows) == 80 and res.columns == ["vec_id", "cluster", "keep"]
    dropped = {r["vec_id"] for r in rows if not r["keep"]}
    # clones dropped, their originals kept (other blob-mates may or may
    # not clear tau=0.99 — the kernel's exactness is pinned elsewhere)
    assert {1, 41} <= dropped and not {0, 40} & dropped


def test_cluster_cap_raises(spark, rng):
    rows = [(i, [float(i), 1.0], 0) for i in range(30)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int")
    with pytest.raises(Exception, match="max_cluster_rows"):
        semantic_dedup(df, cluster_col="label", tau=0.9,
                       max_cluster_rows=10).collect()
