"""Connected-components dedup clustering (sketchlib.dedup.clusters)."""

import random

import pytest
from pyspark.sql import functions as F

from sketchlib.dedup.clusters import (
    assign_clusters,
    cluster_summary,
    connected_components,
    dedup_near_keep,
)


def _exact_components(edges, nodes=None):
    """Driver-side union-find ground truth: node -> component min."""
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
            parent.setdefault(lo, lo)

    for u, v in edges:
        parent.setdefault(u, u)
        parent.setdefault(v, v)
        union(u, v)
    allnodes = set(parent) | set(nodes or [])
    return {n: find(n) if n in parent else n for n in allnodes}


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["id"]: r["component"]
           for r in connected_components(df, **kw).collect()}
    return got


@pytest.mark.parametrize("thresh", [0, 1_000_000],
                         ids=["distributed", "driver"])
def test_chain_worst_case_diameter(spark, thresh):
    # a 64-node path is the adversarial case for label propagation; the
    # star algorithm must still collapse it in O(log^2 n) rounds
    edges = [(i, i + 1) for i in range(63)]
    got = _run(spark, edges, driver_threshold=thresh)
    assert got == {i: 0 for i in range(64)}


@pytest.mark.parametrize("thresh", [0, 1_000_000],
                         ids=["distributed", "driver"])
def test_multiple_components_and_ordering(spark, thresh):
    edges = [(5, 3), (3, 9), (20, 21), (40, 41), (41, 42), (42, 40)]
    got = _run(spark, edges, driver_threshold=thresh)
    expect = _exact_components(edges)
    assert got == expect
    assert got[9] == 3 and got[21] == 20 and got[42] == 40


@pytest.mark.parametrize("thresh", [0, 1_000_000],
                         ids=["distributed", "driver"])
def test_randomized_vs_union_find(spark, thresh):
    rng = random.Random(7)
    edges = [(rng.randrange(200), rng.randrange(200)) for _ in range(150)]
    edges = [(u, v) for u, v in edges if u != v]
    got = _run(spark, edges, driver_threshold=thresh)
    assert got == _exact_components(edges)


def test_empty_and_self_loop_pairs(spark):
    df = spark.createDataFrame([(1, 1), (2, None)], "id_a long, id_b long")
    assert connected_components(df).count() == 0


def test_assign_and_keep_canonical(spark):
    docs = spark.createDataFrame([(i, f"d{i}") for i in range(8)],
                                 "doc_id long, text string")
    pairs = spark.createDataFrame([(1, 4), (4, 6), (2, 3)],
                                  "id_a long, id_b long")
    clustered = assign_clusters(docs, pairs)
    m = {r["doc_id"]: r["cluster_id"] for r in clustered.collect()}
    assert m == {0: 0, 1: 1, 4: 1, 6: 1, 2: 2, 3: 2, 5: 5, 7: 7}
    kept = sorted(r["doc_id"] for r in dedup_near_keep(docs, pairs).collect())
    assert kept == [0, 1, 2, 5, 7]


def test_cluster_summary(spark):
    pairs = spark.createDataFrame([(1, 4), (4, 6), (2, 3)],
                                  "id_a long, id_b long")
    rows = {r["component"]: (r["size"], r["id_checksum"])
            for r in cluster_summary(pairs).collect()}
    assert rows == {1: (3, 1 ^ 4 ^ 6), 2: (2, 2 ^ 3)}


def test_nonconvergence_guard(spark):
    df = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    with pytest.raises(RuntimeError):
        connected_components(df, max_iters=0, driver_threshold=0)


def test_precomputed_components_reused(spark, monkeypatch):
    """assign_clusters + cluster_summary with a shared component map run
    connected-components exactly once."""
    import sketchlib.dedup.clusters as C

    edges = [(1, 2), (2, 3), (10, 11)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    docs = spark.createDataFrame([(i,) for i in range(1, 13)], "doc_id long")

    calls = {"n": 0}
    real_cc = C.connected_components

    def counted(*a, **kw):
        calls["n"] += 1
        return real_cc(*a, **kw)

    monkeypatch.setattr(C, "connected_components", counted)
    comp = C.connected_components(pairs)
    assigned = C.assign_clusters(docs, pairs, components=comp)
    summary = C.cluster_summary(pairs, components=comp)
    got = {r["doc_id"]: r["cluster_id"] for r in assigned.collect()}
    truth = _exact_components(edges, nodes=range(1, 13))
    assert got == truth
    sizes = {r["component"]: r["size"] for r in summary.collect()}
    assert sizes == {1: 3, 10: 2}
    assert calls["n"] == 1
