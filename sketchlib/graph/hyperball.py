"""HyperBall / HyperANF: neighborhood function and geometric centralities
via one HLL counter per node.

Published algorithm: Palmer, Gibbons & Faloutsos, "ANF: A Fast and Scalable
Tool for Data Mining in Massive Graphs" (KDD 2002) with HLL counters per
Boldi & Vigna, "In-Core Computation of Geometric Centralities with
HyperBall" (2013).  Per node ``v`` keep an HLL sketch of the ball
``B(v, r)`` = nodes reachable from ``v`` in at most ``r`` hops; one
relaxation round computes every ``B(v, r+1)`` as the *sketch union* of
``B(v, r)`` with the balls of ``v``'s out-neighbors — exactly the
register-wise max-merge this library's HLL already provides, so each round
is one blob-only DataFrame job.  Exact ball computation stores ``O(n^2)``
pair rows; HyperBall stores one ≤(2^p)-byte counter per node, which is what
makes the neighborhood function of a 10^9-node host graph computable at
all.

Spark shape per round (and why it scales):

* ``counters`` is ``(node, sketch)`` — |V| rows of ≤16 KB blobs; raw pages
  never enter the loop (callers build edges first, e.g. via
  :func:`sketchlib.graph.links.host_edges`);
* one round = ``edges ⋈ counters`` on the *destination* (hash shuffle of
  edge rows + blob rows) feeding ``merge_partials`` (map-side
  ``collect_list`` combine, one blob shuffle) — two shuffles of sketch
  blobs, never of page payloads.  Pre-bucket ``edges`` by ``dst`` to make
  the join exchange-free across rounds on a real cluster;
* hub skew (every host links to google.com) is bounded by construction:
  a node's merge input is ``1 + out_degree`` blobs, and the map-side
  combine collapses same-node blobs per partition before the shuffle, so
  a 10^7-out-degree hub contributes at most one partial per partition —
  the same guarantee :func:`sketchlib.spark.aggregate.merge_partials`
  gives every grouped sketch merge;
* iterative lineage is truncated every round (``localCheckpoint``; on a
  real cluster set a reliable ``spark.sparkContext.setCheckpointDir`` —
  SURVEY.md §6 / docs/RUNBOOK.md);
* convergence is bit-exact, not heuristic: canonical serialization makes
  merge idempotent, so the ball system has reached its fixed point (every
  ball = its reachable set) exactly when no node's blob changed — detected
  with an order-insensitive ``bit_xor(xxhash64(node, sketch))`` signature,
  one O(1)-row job per round (same device as
  ``sketchlib/dedup/clusters.py``).

Accuracy: each ball estimate carries HLL's published 1.04/sqrt(2^p)
relative standard error; balls with ≤100 distinct nodes sit in the
reference's direct-count mode (HllConstants.cs:42) and are *exact*, so on
graphs whose balls stay under 100 nodes HyperBall reproduces exact BFS
counts bit-for-bit (the pytest oracle exploits this).  Estimates of nested
balls use the SAME counter per node across rounds (not independent
sketches), so per-node ball-size sequences are monotone by construction —
centralities never see a negative shell.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sketchlib.spark.aggregate import (
    HllSpec,
    estimate_col,
    merge_partials,
    premerge_partials,
    sketch_agg,
)


def _signature(counters: DataFrame) -> tuple:
    # Fixed-point detection must ignore the blob's trailing u64
    # countAdditions field (v3.1 wire, HllSketch.to_bytes): merging keeps
    # summing addition counts even after every register has stabilized, so
    # the full blob never converges.  Everything BEFORE those 8 bytes is
    # canonical content (sorted direct hashes / sparse entries / dense
    # registers + mode flags), and mode transitions are content-driven, so
    # content-prefix equality IS register fixed point.  bit_xor of per-node
    # hashes is order-insensitive; collision risk ~2^-64 per round (same
    # accepted trade-off as sketchlib/dedup/clusters.py).
    content = F.expr("substring(sketch, 1, length(sketch) - 8)")
    row = counters.agg(
        F.count("*").alias("n"),
        F.bit_xor(F.xxhash64("node", content)).alias("h")).collect()[0]
    return (row["n"], row["h"])


def hyperball(edges: DataFrame, max_r: int, spec: HllSpec | None = None,
              src_col: str = "u", dst_col: str = "v",
              directed: bool = True, premerge: bool = True) -> DataFrame:
    """Ball-size estimates ``(node, r, ball_est)`` for ``r = 0 .. r_eff``.

    ``edges`` rows with NULL endpoints are ignored; self-loops are harmless
    (a node is always in its own ball).  ``directed=True`` computes
    *outgoing* balls (nodes reachable FROM ``v``); ``directed=False``
    symmetrizes first.  Stops before ``max_r`` when every counter reached
    its fixed point (graph diameter exhausted) — the returned frame's max
    ``r`` is the effective radius actually computed, so callers can detect
    saturation.  ``spec`` defaults to p=14; for billion-node graphs p=10-12
    (1-4 KB/counter) is the published memory/accuracy trade-off.
    ``premerge`` (default on) folds same-node blobs map-side before each
    round's merge shuffle — 99.7x fewer shuffled rows measured on a
    power-law host graph, ~nothing on uniform-degree graphs (see
    :func:`sketchlib.spark.aggregate.premerge_partials`); results are
    bit-identical either way.
    """
    if max_r < 0:
        raise ValueError(f"max_r must be >= 0, got {max_r}")
    spec = spec or HllSpec()
    e = (edges
         .select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
         .filter(F.col("u").isNotNull() & F.col("v").isNotNull()))
    if not directed:
        e = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    # lazy localCheckpoints: the NEXT action (the r=0 signature job below)
    # materializes both the deduped edge set and the initial counters in ONE
    # job — an eager checkpoint + separate signature pass would pay two
    # full passes per materialization for the same bytes
    e = e.distinct().localCheckpoint(eager=False)

    nodes = (e.select(F.col("u").alias("node"))
             .unionByName(e.select(F.col("v").alias("node")))
             .distinct())
    # B(v, 0) = {v}: one single-element sketch per node (direct mode -> the
    # r=0 estimate is exactly 1.0)
    counters = sketch_agg(nodes, "node", ["node"], spec).localCheckpoint(eager=False)
    prev = _signature(counters)

    def _snap(c: DataFrame, r: int) -> DataFrame:
        return c.select(F.col("node"), F.lit(r).alias("r"),
                        estimate_col(spec).alias("ball_est"))

    frames = [_snap(counters, 0)]
    for r in range(1, max_r + 1):
        contrib = (e.join(counters, e["v"] == counters["node"])
                   .select(e["u"].alias("node"), "sketch"))
        merge_in = counters.unionByName(contrib)
        if premerge:
            # map-side blob combine: a node's contributions from all its
            # out-neighbors in one partition collapse to a single blob
            # before the shuffle — |E| rows drop to ≤ |V| × partitions
            # (bit-identical; premerge_partials docstring)
            merge_in = premerge_partials(merge_in, ["node"], spec)
        # lazy checkpoint: the signature job both materializes this round's
        # counters (caching them for the next round / the final snapshot
        # union) and computes the fixed-point hash — one pass per round
        # instead of a checkpoint pass plus a signature pass
        counters = (merge_partials(merge_in, ["node"], spec)
                    .localCheckpoint(eager=False))
        sig = _signature(counters)
        if sig == prev:
            # fixed point: B(v, r) == B(v, r-1) for every v — the frame for
            # this r would duplicate the previous one; stop early.
            break
        prev = sig
        frames.append(_snap(counters, r))

    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out


def neighborhood_function(edges: DataFrame, max_r: int,
                          spec: HllSpec | None = None,
                          src_col: str = "u", dst_col: str = "v",
                          directed: bool = True) -> DataFrame:
    """ANF's N(r): estimated #(u, v) pairs with ``d(u, v) <= r`` —
    ``(r, n_pairs_est)``, one row per computed radius.

    If the graph saturates before ``max_r`` (diameter < max_r), rows for the
    remaining radii repeat the final plateau value so the output always has
    ``max_r + 1`` rows — the neighborhood function is constant past the
    diameter by definition.
    """
    from pyspark.sql.window import Window

    balls = hyperball(edges, max_r, spec, src_col, dst_col, directed)
    # double sum: N(r) approaches |V|^2 pairs, past long range on 10^9-node
    # graphs under ANSI overflow checking
    nf = balls.groupBy("r").agg(
        F.sum(F.col("ball_est").cast("double")).alias("n_pairs_est"))
    radii = (balls.sparkSession.range(max_r + 1)
             .select(F.col("id").cast("int").alias("r")))
    last = F.last("n_pairs_est", ignorenulls=True).over(
        Window.orderBy("r").rowsBetween(Window.unboundedPreceding, 0))
    return (radii.join(nf, "r", "left")
            # empty graph: no balls at any radius -> N(r) = 0, not NULL
            .select("r", F.coalesce(last, F.lit(0.0)).alias("n_pairs_est"))
            .orderBy("r"))


def effective_diameter(nf, q: float = 0.9) -> float:
    """Effective diameter at quantile ``q`` (ANF's headline statistic): the
    smallest radius r where N(r) >= q * N(max computed radius), linearly
    interpolated between the bracketing radii (the convention of Palmer et
    al. / the HyperANF papers, so sub-integer values are comparable across
    systems).  Input is :func:`neighborhood_function` output — the
    DataFrame, or an already-collected list of ``(r, n_pairs)`` tuples
    (callers that aggregated N(r) themselves skip a second hyperball run).
    Returns 0.0 for an empty graph."""
    if not 0 < q <= 1:
        raise ValueError(f"q must be in (0, 1], got {q}")
    if isinstance(nf, DataFrame):
        rows = sorted((r["r"], r["n_pairs_est"]) for r in nf.collect())
    else:
        rows = sorted((int(r), float(n)) for r, n in nf)
    if not rows or rows[-1][1] <= 0:
        return 0.0
    target = q * rows[-1][1]
    prev_r, prev_n = rows[0]
    if prev_n >= target:
        return float(prev_r)
    for r, n in rows[1:]:
        if n >= target:
            # interpolate inside the shell that crosses the target
            return float(prev_r) + (target - prev_n) / (n - prev_n)
        prev_r, prev_n = r, n
    return float(rows[-1][0])


def _shells(balls: DataFrame):
    from pyspark.sql.window import Window

    w = Window.partitionBy("node").orderBy("r")
    # double arithmetic throughout: shell products (reachable^2, shell*r)
    # would overflow ANSI-checked longs on 10^9-node graphs
    b = F.col("ball_est").cast("double")
    prev = F.lag(b, 1, 0.0).over(w)
    # monotone by construction (same counter, union-only merges), so the
    # shell is never negative
    return balls.select("node", "r", "ball_est",
                        (b - prev).alias("__shell"))


def harmonic_centrality(balls: DataFrame) -> DataFrame:
    """Harmonic centrality H(v) = sum over u != v of 1/d(v, u), estimated
    from ball sizes: the shell at radius r (|B(v,r)| - |B(v,r-1)|) counts
    nodes at distance exactly r, each contributing 1/r.  Input is
    :func:`hyperball` output; returns ``(node, harmonic)``.  Boldi & Vigna's
    headline centrality — finite on disconnected graphs (unreached nodes
    contribute 0), which is why it replaces closeness at web scale.
    """
    sh = _shells(balls).filter(F.col("r") >= 1)
    agg = (sh.groupBy("node")
           .agg(F.sum(F.col("__shell") / F.col("r")).alias("harmonic")))
    # keep a row for every node even when no shell row exists (a graph that
    # saturates at r=0 — all self-loops — emits only r=0 ball rows)
    universe = balls.select("node").distinct()
    return (universe.join(agg, "node", "left")
            .select("node", F.coalesce("harmonic", F.lit(0.0)).alias("harmonic")))


def closeness_centrality(balls: DataFrame) -> DataFrame:
    """Lin's index variant of closeness for possibly-disconnected graphs:
    ``(node, reachable, total_dist, lin_index)`` where ``reachable`` =
    |B(v, r_max)| - 1, ``total_dist`` = sum of estimated distances to
    reachable nodes, and ``lin_index = reachable^2 / total_dist`` (Lin 1976
    as used by HyperBall; nodes reaching nothing get 0).
    """
    sh = _shells(balls).filter(F.col("r") >= 1)
    agg = sh.groupBy("node").agg(
        F.sum("__shell").alias("reachable"),
        F.sum(F.col("__shell") * F.col("r")).alias("total_dist"))
    universe = balls.select("node").distinct()
    agg = (universe.join(agg, "node", "left")
           .select("node",
                   F.coalesce("reachable", F.lit(0.0)).alias("reachable"),
                   F.coalesce("total_dist", F.lit(0.0)).alias("total_dist")))
    lin = (F.when(F.col("total_dist") > 0,
                  F.col("reachable") * F.col("reachable") / F.col("total_dist"))
           .otherwise(F.lit(0.0)))
    return agg.select("node", "reachable", "total_dist", lin.alias("lin_index"))
