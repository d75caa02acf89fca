"""PageRank over the host link graph in exact fixed-point integer arithmetic.

Standard power iteration (Page, Brin, Motwani & Winograd 1999; damping 0.85)
with one deliberate twist: ranks are **integer micro-units** and every step
is integer arithmetic —

    share(u)   = rank(u) div out_degree(u)            (integer division)
    dangling   = sum of rank(u) over out-degree-0 nodes
    rank'(v)   = (100-d_pct)*scale div 100
               + d_pct * (sum of in-shares + dangling div |V|) div 100

Why integers: long addition is associative and commutative, so the per-node
sums are **bit-identical across partitionings, shuffle orders, executor
counts, and engines** — a float PageRank differs in final ulps between any
two runs (sum order), which breaks both the repo's bit-reproducibility
discipline and any hash-checked oracle.  The cost is a quantization error
of at most ``n_iter * (out_degree truncation + 1)`` micro-units per node —
at the default ``scale=10^6`` that is parts-per-million, far below anything
that affects ranking order.  The same trick the library already uses for
LM scores, IDF, and DSIR log-ratios (integer milli-nats).

Spark shape per iteration, and why it scales:

* ``edges ⋈ ranks`` on the source key, then ``groupBy(dst).sum`` — both
  hash-shuffle the *edge-shaped* rows only (two longs each); page payloads
  never enter the loop.  Pre-bucket edges by ``u`` on a real cluster to
  make the join exchange-free across all iterations;
* in-degree hubs (everyone links to google.com) are handled by the sum's
  map-side partial aggregation — a 10^7-in-degree hub receives one partial
  per upstream partition, never 10^7 rows into one task;
* the dangling-mass term is a single O(1)-row aggregate per iteration
  (collected scalar — the only driver traffic);
* lineage is truncated every iteration (``localCheckpoint``; set a reliable
  checkpoint dir on a real cluster — docs/RUNBOOK.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(edges: DataFrame, n_iter: int = 10, damping_pct: int = 85,
             scale: int = 1_000_000, src_col: str = "u",
             dst_col: str = "v", seeds: DataFrame | None = None,
             seed_col: str = "node") -> DataFrame:
    """Fixed-point integer PageRank: ``(node, rank)`` after ``n_iter`` power
    iterations, ``rank`` in units of ``scale`` (initial rank = ``scale``,
    i.e. 1.0 per node).

    Parallel edges are collapsed (multi-links don't multiply authority —
    the host-graph convention); NULL endpoints are dropped; self-loops
    count like any edge.  ``damping_pct`` is an integer percentage so the
    damping multiply stays exact.

    ``seeds`` switches to **personalized** PageRank (random walk with
    restart): initial mass, the (1-damping) teleport, and the dangling
    redistribution all go to the seed nodes only, so rank measures
    proximity-weighted authority relative to the seed set (e.g. "hosts
    like these known-good hosts").  Global PageRank is exactly the
    ``seeds = all nodes`` special case — same arithmetic, bit-identical
    output.  Seeds not present in the graph are ignored; raises if none
    remain.
    """
    if n_iter < 0:
        raise ValueError(f"n_iter must be >= 0, got {n_iter}")
    if not 0 <= damping_pct <= 100:
        raise ValueError(f"damping_pct must be in [0, 100], got {damping_pct}")
    e = (edges
         .select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
         .filter(F.col("u").isNotNull() & F.col("v").isNotNull())
         .distinct()
         .localCheckpoint(eager=True))
    nodes = (e.select(F.col("u").alias("node"))
             .unionByName(e.select(F.col("v").alias("node")))
             .distinct()
             .localCheckpoint(eager=True))
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.withColumn("rank", F.lit(0).cast("long"))
    if seeds is None:
        flagged = nodes.select("node", F.lit(True).alias("__seed"))
        n_seeds = n_nodes
    else:
        s = (seeds.select(F.col(seed_col).alias("node"))
             .filter(F.col("node").isNotNull()).distinct()
             .withColumn("__seed", F.lit(True)))
        flagged = (nodes.join(s, "node", "left")
                   .select("node", F.coalesce("__seed", F.lit(False))
                           .alias("__seed")))
        n_seeds = flagged.filter("__seed").count()
        if n_seeds == 0:
            raise ValueError("no seed appears in the graph")
    flagged = flagged.localCheckpoint(eager=True)
    deg = e.groupBy("u").agg(F.count("*").alias("deg"))
    # edges with the source's out-degree attached — constant across
    # iterations, so join it once and checkpoint
    ed = (e.join(deg, "u")
          .select("u", "v", "deg")
          .localCheckpoint(eager=True))
    base = ((100 - damping_pct) * scale) // 100
    seed_base = F.when(F.col("__seed"), F.lit(base)).otherwise(F.lit(0)) \
        .cast("long")

    ranks = flagged.select(
        "node",
        F.when(F.col("__seed"), F.lit(scale)).otherwise(F.lit(0))
        .cast("long").alias("rank"))
    for _ in range(n_iter):
        shares = (ed.join(ranks, ed["u"] == ranks["node"])
                  .select(F.col("v").alias("node"),
                          F.expr("rank div deg").alias("share")))
        summed = shares.groupBy("node").agg(F.sum("share").alias("in_sum"))
        # dangling mass: rank held by nodes with no out-edges, shared
        # uniformly over the SEED set (integer floor) — one O(1)-row job
        # per iteration
        dang_row = (ranks.join(deg, ranks["node"] == deg["u"], "left_anti")
                    .agg(F.coalesce(F.sum("rank"), F.lit(0)).alias("s"))
                    .collect()[0])
        dang_share = int(dang_row["s"]) // n_seeds
        # `div` (integer division) end-to-end: a float `/` would round
        # through double and lose exactness past 2^53
        contrib = (F.coalesce(F.col("in_sum"), F.lit(0).cast("long"))
                   + F.when(F.col("__seed"), F.lit(dang_share))
                   .otherwise(F.lit(0)).cast("long"))
        rank_new = (seed_base
                    + F.expr(f"CAST({damping_pct} AS BIGINT) "
                             f"* __contrib div 100"))
        ranks = (flagged.join(summed, "node", "left")
                 .select("node", F.col("__seed"), contrib.alias("__contrib"))
                 .select("node", rank_new.alias("rank"))
                 .localCheckpoint(eager=True))
    return ranks
