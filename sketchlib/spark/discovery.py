"""Join discovery: find joinable column pairs across tables via theta sketches.

The data-lake question: given hundreds of tables, which column pairs are
join keys? Exact pairwise containment is O(T^2) distinct-joins over raw
values — infeasible at warehouse scale. The sketch shape (Datasketches'
"joinability discovery"; Zhu et al. 2016 LSH Ensemble is the same problem):

1. ONE melted scan per table builds a theta sketch per profiled column
   (values fingerprinted JVM-side with ``F.xxhash64`` before the explode, so
   sketches from different tables share a hash domain and 8 bytes/cell cross
   the Arrow boundary);
2. the K sketches (<=32 KB each) are collected once; all K^2 containments
   are estimated driver-side from sketch intersections — no further scans,
   no joins of raw data.

Containment(A in B) = |A ∩ B| / |A| is the FK->PK signal (1.0 means every
value of A appears in B). The estimator is the witness-ratio under the
common θ (:meth:`sketchlib.theta.ThetaSketch.containment`), exact whenever
a column has fewer distinct values than k.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..theta import ThetaSketch
from .aggregate import sketch_agg
from .specs import ThetaSpec


def column_sketches(tables: Mapping[str, DataFrame],
                    columns: Mapping[str, Sequence[str]],
                    k: int = 4096) -> dict[str, ThetaSketch]:
    """One theta sketch per qualified ``table.column`` — ONE Spark job for
    the whole warehouse.

    Each table is melted to (qualified_column_name, xxhash64(value)) pairs
    inside the JVM (nulls dropped: null cells have no joinable value), the
    per-table melts are unioned, and a single two-stage sketch aggregation
    groups by qualified name.  One job instead of one sequential
    collect per table: every table's scan tasks run concurrently and only
    one blob shuffle is paid, so the wall is max(table scan) not
    sum(table scan) — the theta union is order-insensitive (k smallest
    distinct hashes), so the per-column blobs are unchanged.
    """
    spec = ThetaSpec(k=k, prehashed=True)
    out: dict[str, ThetaSketch] = {}
    integral = {"tinyint", "smallint", "int", "bigint"}
    melted_frames = []
    for tname, df in tables.items():
        cols = list(columns[tname])
        if not cols:
            continue
        dtypes = dict(df.dtypes)
        # Spark's xxhash64 hashes int and bigint DIFFERENTLY for the same
        # value — widen every integral column to bigint so containment
        # compares value domains, not physical widths
        def _norm(c: str):
            return (F.col(c).cast("bigint") if dtypes.get(c) in integral
                    else F.col(c))
        kv = F.explode(F.array(*[
            F.struct(F.lit(f"{tname}.{c}").alias("column"),
                     F.when(F.col(c).isNotNull(), F.xxhash64(_norm(c))).alias("h"))
            for c in cols])).alias("kv")
        melted_frames.append(df.select(kv).select("kv.column", "kv.h"))
    if not melted_frames:
        return out
    melted = melted_frames[0]
    for fr in melted_frames[1:]:
        melted = melted.unionByName(fr)
    for row in sketch_agg(melted, "h", ["column"], spec).collect():
        out[row["column"]] = ThetaSketch.from_bytes(bytes(row["sketch"]))
    return out


def joinable_pairs(spark: SparkSession, sketches: Mapping[str, ThetaSketch],
                   threshold: float = 0.5) -> DataFrame:
    """All ordered pairs with estimated containment(A in B) >= threshold.

    Driver-side O(K^2) over collected sketches (K = number of profiled
    columns, each sketch <= k hashes); returns a deterministic DataFrame
    ``(col_a, col_b)`` sorted by name — the value-overlap join-candidate
    graph. Self-pairs and same-table pairs are kept out: same-table columns
    sharing values is a fact but not a join edge.
    """
    names = sorted(sketches)
    rows = []
    for a in names:
        for b in names:
            # rsplit: the TABLE part is everything before the LAST dot
            # ('db.table.col'); split-first would collapse every dotted
            # table name to its catalog prefix and suppress all
            # cross-table pairs within it
            if a == b or a.rsplit(".", 1)[0] == b.rsplit(".", 1)[0]:
                continue
            if sketches[a].containment(sketches[b]) >= threshold:
                rows.append((a, b))
    return spark.createDataFrame(rows or [("", "")],
                                 "col_a string, col_b string").filter(
        F.col("col_a") != F.lit(""))
