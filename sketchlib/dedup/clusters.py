"""Duplicate-cluster assignment: connected components over a near-dup pair
list, and canonical-document selection per cluster.

Pair generators (:func:`sketchlib.dedup.minhash.near_dup_pairs`,
:func:`sketchlib.dedup.simhash.simhash_near_dup_pairs`) emit *edges*; a real
corpus-dedup pipeline must then group transitively-linked documents (A~B, B~C
=> {A,B,C} is one duplicate cluster) and keep ONE representative per cluster.
The reference repo stops at per-sketch estimates (it has no dedup surface);
this operator follows the published MapReduce connected-components algorithm
of Kiveris et al., "Connected Components in MapReduce and Beyond" (ACM SoCC
2014): alternate **large-star** and **small-star** rounds until the edge set
is a fixed point, at which moment every edge is (node -> its component's
minimum id).

Spark-first shape, and why it scales:

* each round is two hash-shuffles on node id (a ``groupBy(min)`` and a join
  back) over the EDGE list only — document text never moves;
* the round count is O(log^2 n) in theory and 2-4 in practice for near-dup
  graphs (LSH clusters are star-like, diameters are tiny);
* skew is the algorithm's own concern: large-star splits high-degree hubs so
  no reducer ever materializes a giant component's full neighbor list — the
  reason to use this over naive label propagation (whose hot node would
  receive one row per member every round);
* iterative lineage is truncated every round (``localCheckpoint``; on a real
  cluster set ``spark.sparkContext.setCheckpointDir`` to reliable storage and
  eager ``checkpoint()`` has the same role) — without it each extra round
  doubles the re-execution DAG;
* convergence is detected with a deterministic O(1)-row signature
  (edge count + sum of per-edge ``xxhash64``) instead of an
  ``exceptAll``-based diff, so the check is one tiny job per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _symmetrize(edges: DataFrame) -> DataFrame:
    rev = edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    return edges.unionByName(rev)


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to min(N(u) ∪ {u})."""
    sym = _symmetrize(edges)
    mins = sym.groupBy("u").agg(F.min("v").alias("__mn"))
    m = F.least(F.col("__mn"), F.col("u"))
    return (sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), m.alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct())


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges large->small; connect every neighbor (and u itself) to
    min(N(u) ∪ {u})."""
    directed = edges.select(F.greatest("u", "v").alias("u"),
                            F.least("u", "v").alias("v"))
    mins = directed.groupBy("u").agg(F.min("v").alias("__mn"))
    withm = directed.join(mins, "u")
    out = (withm.select(F.col("v").alias("u"), F.col("__mn").alias("v"))
           .unionByName(mins.select(F.col("u"), F.col("__mn").alias("v"))))
    return out.filter(F.col("u") != F.col("v")).distinct()


def _signature(edges: DataFrame) -> tuple:
    # bit_xor is order-insensitive and overflow-free (sum of hashes would
    # trip Spark 4's ANSI long-overflow check); edges are distinct, so the
    # xor is a faithful set signature.  Convergence detection via this
    # signature is probabilistic: a collision between successive rounds
    # (~2^-64 per comparison, with the edge count as an extra guard) would
    # silently accept a non-converged edge set.  Accepted trade-off — an
    # exact set-equality check would cost a full self-join per round.
    row = edges.agg(
        F.count("*").alias("n"),
        F.bit_xor(F.xxhash64("u", "v")).alias("h")).collect()[0]
    return (row["n"], row["h"])


def _driver_components(edges: DataFrame) -> DataFrame:
    """Small-graph fast path: collect the edge list and run union-find with
    path compression on the driver.  The near-dup edge list is typically
    minuscule next to the corpus (only duplicate pairs appear), so this is
    the same size-based decision as a broadcast join — and it replaces
    ~4 shuffle stages per star round with one collect."""
    spark = edges.sparkSession
    rows = edges.collect()
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for r in rows:
        u, v = r["u"], r["v"]
        parent.setdefault(u, u)
        parent.setdefault(v, v)
        ru, rv = find(u), find(v)
        if ru != rv:
            lo, hi = min(ru, rv), max(ru, rv)
            parent[hi] = lo
    out = [(n, find(n)) for n in parent]
    schema = edges.select(F.col("u").alias("id"),
                          F.col("v").alias("component")).schema
    return spark.createDataFrame(out, schema)


def connected_components(pairs: DataFrame, src_col: str = "id_a",
                         dst_col: str = "id_b",
                         max_iters: int = 16,
                         driver_threshold: int = 1_000_000) -> DataFrame:
    """Map every node appearing in ``pairs`` to its component id (the
    component's minimum node id).  Returns ``(id, component)`` — one row per
    distinct node, including component roots (mapped to themselves).

    ``pairs`` rows with NULL endpoints or self-loops are ignored.  Edge
    lists at or below ``driver_threshold`` edges solve on the driver
    (union-find over a ~16 MB collect — the broadcast-join size decision);
    larger graphs run the distributed star rounds.  Raises if the edge set
    has not reached a fixed point within ``max_iters`` alternating rounds
    (the published bound is O(log^2 n) rounds; near-dup graphs converge in
    a handful)."""
    edges = (pairs
             .select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
             .filter(F.col("u").isNotNull() & F.col("v").isNotNull()
                     & (F.col("u") != F.col("v")))
             .distinct())
    # lazy checkpoint: the signature job below is the action that
    # materializes (and caches) the deduped edge set — one pass instead of
    # an eager checkpoint pass plus a signature pass over the same rows
    edges = edges.localCheckpoint(eager=False)
    prev = _signature(edges)
    if prev[0] == 0:
        return edges.select(F.col("u").alias("id"),
                            F.col("v").alias("component"))
    if prev[0] <= driver_threshold:
        return _driver_components(edges)
    for _ in range(max_iters):
        # same fusion per star round: the signature materializes the round
        edges = _small_star(_large_star(edges)).localCheckpoint(eager=False)
        sig = _signature(edges)
        if sig == prev:
            break
        prev = sig
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds")
    # fixed point: every edge is (member -> component min); roots map to
    # themselves
    members = edges.select(F.col("u").alias("id"),
                           F.col("v").alias("component"))
    roots = (edges.select(F.col("v").alias("id"))
             .distinct()
             .withColumn("component", F.col("id")))
    return members.unionByName(roots)


def assign_clusters(df: DataFrame, pairs: DataFrame,
                    id_col: str = "doc_id",
                    cluster_col: str = "cluster_id",
                    src_col: str = "id_a", dst_col: str = "id_b",
                    components: DataFrame | None = None) -> DataFrame:
    """Add ``cluster_col`` to ``df``: the duplicate-cluster id (component min)
    for docs that appear in ``pairs``, else the doc's own id (a singleton
    cluster).  The component mapping is tiny relative to the corpus (only
    near-dup members appear), so the join broadcasts under AQE.

    Pass ``components`` (a precomputed ``connected_components(pairs)``
    result) when a pipeline also calls :func:`cluster_summary` — the
    star-round/union-find computation then runs once, not per consumer."""
    comp = (components if components is not None
            else connected_components(pairs, src_col, dst_col))
    comp = comp.withColumnRenamed("id", id_col)
    return (df.join(comp, id_col, "left")
            .withColumn(cluster_col,
                        F.coalesce(F.col("component"), F.col(id_col)))
            .drop("component"))


def dedup_near_keep(df: DataFrame, pairs: DataFrame,
                    id_col: str = "doc_id",
                    components: DataFrame | None = None) -> DataFrame:
    """Keep exactly one document per duplicate cluster — the minimum id,
    which is the component id itself, so no per-cluster aggregation is
    needed: a row survives iff its id equals its cluster id."""
    clustered = assign_clusters(df, pairs, id_col, components=components)
    return (clustered.filter(F.col("cluster_id") == F.col(id_col))
            .drop("cluster_id"))


def cluster_summary(pairs: DataFrame, src_col: str = "id_a",
                    dst_col: str = "id_b",
                    components: DataFrame | None = None) -> DataFrame:
    """Per-cluster membership summary: ``(component, size, id_checksum)``
    over the nodes that appear in ``pairs`` (singletons excluded — they are
    every doc not in any pair).  Accepts a precomputed ``components`` map
    (see :func:`assign_clusters`) so pipelines computing both run
    connected-components once."""
    comp = (components if components is not None
            else connected_components(pairs, src_col, dst_col))
    # bit_xor, not sum: cluster members at web scale are 64-bit hash ids,
    # and summing two ~9e18 values overflows long (ANSI error / silent
    # wrap) — the same hazard _signature documents above.  XOR is the
    # standard overflow-free set checksum (order- and partition-free).
    return comp.groupBy("component").agg(
        F.count("*").alias("size"),
        F.bit_xor("id").alias("id_checksum"))
