"""Deterministic sampling operators for training-data pipelines: per-group
document caps, reproducible train/val/test splits, fixed-fraction
subsampling, and target-proportion source mixing — all pure JVM column
expressions (zero Python beyond an O(#sources) collected map) and all
reproducible run-to-run regardless of partitioning.

These are corpus-construction primitives the reference repo (a sketch
library) does not ship but any 100 TB web-text pipeline needs next to
dedup/quality filtering: cap the documents one host can contribute, carve a
held-out set that never migrates between splits when the corpus grows, and
cut reproducible subsamples for ablations.

Scale notes:

* :func:`cap_per_group` is the only one that shuffles (by the group key),
  and Catalyst's rank-limit pushdown (``WindowGroupLimit``, Spark >= 3.5)
  pre-caps each map task's output to ``cap`` rows per group BEFORE the
  exchange, bounding a hub group's shuffled volume to
  ``cap x n_partitions`` rows — the distributed-top-k combiner, for free.
* :func:`hash_split` / :func:`sample_by_hash` are stateless per-row
  projections/filters (``xxhash64`` inside whole-stage codegen): no shuffle,
  no RNG state, stable under repartitioning, backfills, and re-runs —
  unlike ``df.sample`` / ``randomSplit``, whose output depends on partition
  layout and seed plumbing.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: hash-space bucket count for split/sample fractions; 1e6 buckets keeps the
#: worst-case fraction granularity at 1e-6 while staying far from int64 bias
_BUCKETS = 1_000_000


def _as_list(cols) -> list:
    return [cols] if isinstance(cols, str) else list(cols)


def _bucket(key_cols: Sequence, salt: str) -> Column:
    """Deterministic bucket in [0, _BUCKETS) from the key columns + salt.
    ``pmod`` (not ``%``) so negative hashes land in-range."""
    return F.pmod(F.xxhash64(F.lit(salt), *key_cols), F.lit(_BUCKETS))


def cap_per_group(df: DataFrame, group_cols, cap: int, order_cols) -> DataFrame:
    """Keep at most ``cap`` rows per group — the first ``cap`` in ascending
    ``order_cols`` order (add a computed column first for custom orders,
    e.g. a negated quality score to keep the best, or a ``xxhash64`` column
    for an unbiased deterministic per-group sample).  Exact and
    deterministic given a total order; break ties by including a unique id
    in ``order_cols``.

    Scale shape: Catalyst's rank-limit pushdown compiles
    ``row_number() <= cap`` into a *Partial* ``WindowGroupLimit`` BEFORE the
    shuffle (verify with ``.explain``), so each map task forwards at most
    ``cap`` rows per group and a hub group ships ``cap x n_partitions`` rows
    instead of its full size — the distributed-top-k combiner, entirely
    JVM-side.  No hand-rolled per-partition pre-cap needed."""
    group_cols = _as_list(group_cols)
    order_cols = _as_list(order_cols)
    if cap < 1:
        raise ValueError("cap must be >= 1")
    # uniquified temp name: withColumn would silently REPLACE (then drop) a
    # pre-existing user column of the same name
    rn = "__rn"
    while rn in df.columns:
        rn += "_"
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (df.withColumn(rn, F.row_number().over(w))
            .filter(F.col(rn) <= cap).drop(rn))


def hash_split(df: DataFrame, key_cols, weights: dict[str, float],
               split_col: str = "split", salt: str = "split-v1") -> DataFrame:
    """Assign every row to exactly one named split by hashing ``key_cols``
    — reproducible, partition-independent, and *stable under growth*: a row's
    split depends only on its key, so new data never flips existing rows
    between train and held-out (the property ``randomSplit`` lacks).

    ``weights`` maps split name -> fraction; fractions must sum to 1 (±1e-9).
    Rows with equal keys land in the same split (deduplicate first, or split
    on a stable document id)."""
    key_cols = _as_list(key_cols)
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    if any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-negative")
    bucket = _bucket([F.col(c) for c in key_cols], salt)
    expr = None
    cum = 0.0
    items = list(weights.items())
    for name, w in items[:-1]:
        cum += w
        cond = bucket < int(round(cum * _BUCKETS))
        expr = (F.when(cond, F.lit(name)) if expr is None
                else expr.when(cond, F.lit(name)))
    last = F.lit(items[-1][0])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)


def mix_fractions(df: DataFrame, source_col: str, targets: dict[str, float],
                  weight_col: str | None = None) -> dict[str, float]:
    """Per-source keep fractions that re-mix the corpus to the ``targets``
    proportions by downsampling only (never upsampling).

    With per-source mass ``T_s`` (sum of ``weight_col``, e.g. a token
    count, or row count when None) and target share ``w_s``, the largest
    achievable budget without upsampling is ``B = min_s T_s / w_s``; each
    source keeps ``w_s * B / T_s`` of its mass.  The rarest-relative-to-
    target source keeps everything; the rest are cut to match.  One
    groupBy over a handful of sources; the collected map is O(#sources).

    Sources absent from ``targets`` (or with target 0) get fraction 0.
    Raises if a targeted source has no mass (its share is unachievable)."""
    total = sum(targets.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"target shares must sum to 1, got {total}")
    if any(w < 0 for w in targets.values()):
        raise ValueError("target shares must be non-negative")
    mass_expr = (F.count(F.lit(1)) if weight_col is None
                 else F.sum(weight_col))
    # SUM over an all-NULL weight column is NULL — map it to 0 mass so an
    # unpopulated source routes into the clear "no mass" error below
    # instead of a bare float(None) TypeError
    mass = {r["s"]: float(r["m"]) if r["m"] is not None else 0.0 for r in
            df.groupBy(F.col(source_col).alias("s"))
            .agg(mass_expr.cast("double").alias("m")).collect()}
    missing = [s for s, w in targets.items() if w > 0 and not mass.get(s)]
    if missing:
        raise ValueError(f"targeted sources with no mass: {sorted(missing)}")
    budget = min(mass[s] / w for s, w in targets.items() if w > 0)
    return {s: (targets.get(s, 0.0) * budget / mass[s] if targets.get(s)
                else 0.0) for s in mass}


def mix_by_source(df: DataFrame, source_col: str, targets: dict[str, float],
                  key_cols, weight_col: str | None = None,
                  salt: str = "mix-v1") -> DataFrame:
    """Deterministically re-mix a multi-source corpus to target proportions
    ("60% web / 30% code / 10% books" by token mass) via per-source hash
    subsampling — the data-mixing step of an LLM training pipeline.

    Each source ``s`` keeps the :func:`mix_fractions` share of its rows,
    selected by hashing ``key_cols`` (stable under repartitioning, growth,
    and re-runs; nested like :func:`sample_by_hash`).  Achieved shares are
    exact in expectation and concentrate binomially row-wise.  Plan shape:
    one tiny groupBy (collected: O(#sources) rows) + one stateless
    whole-stage-codegen filter over the corpus — no shuffle of the data."""
    fracs = mix_fractions(df, source_col, targets, weight_col)
    key_cols = _as_list(key_cols)
    bucket = _bucket([F.col(c) for c in key_cols], salt)
    thresh = F.create_map(*[x for s, f in fracs.items()
                            for x in (F.lit(s), F.lit(int(round(f * _BUCKETS))))])
    return df.filter(bucket < F.coalesce(thresh[F.col(source_col)], F.lit(0)))


def weighted_sample_per_group(df: DataFrame, group_cols, weight_col: str,
                              k: int, id_cols,
                              salt: str = "wsample-v1") -> DataFrame:
    """Deterministic weighted sample WITHOUT replacement: the ``k`` rows
    per group with the largest Efraimidis–Spirakis key ``u^(1/w)``
    (Efraimidis & Spirakis 2006), where ``u`` is a hash-uniform of
    ``id_cols`` + ``salt`` — so the draw is reproducible, partition-
    independent, and growth-stable like every sampler in this module
    (new rows can displace old ones but never re-randomize them).

    For ``k = 1`` the inclusion probability is exactly ``w_i / sum(w)``;
    change ``salt`` for an independent draw.  Rows with null or
    non-positive weight are excluded (they have no sampling mass).

    Ranking uses the monotone transform ``ln(u)/w`` (descending) instead
    of ``u^(1/w)`` — same order, no pow underflow for large weights.
    Plan shape: map-only key derivation + one row_number window per
    group; Catalyst's rank-limit pushdown (``WindowGroupLimit``) pre-caps
    map-side, so a hub group never concentrates a reducer."""
    if k < 1:
        raise ValueError("k must be >= 1")
    group_cols = _as_list(group_cols)
    id_cols = _as_list(id_cols)
    m = 1 << 52
    u = (F.pmod(F.xxhash64(F.lit(salt), *[F.col(c) for c in id_cols]),
                F.lit(m)) + F.lit(0.5)) / F.lit(float(m))
    es_key = F.log(u) / F.col(weight_col)
    rn = "__rn"
    while rn in df.columns:
        rn += "_"
    w = Window.partitionBy(*group_cols).orderBy(
        F.desc(es_key), *[F.col(c).asc() for c in id_cols])
    # ~isnan too: Spark's NaN orders LARGER than every number, so a NaN
    # weight passes `> 0`, makes es_key NaN, and NaN sorts first under
    # desc — NaN-weight garbage rows would displace the entire sample
    return (df.filter(F.col(weight_col).isNotNull()
                      & ~F.isnan(F.col(weight_col).cast("double"))
                      & (F.col(weight_col) > 0))
            .withColumn(rn, F.row_number().over(w))
            .filter(F.col(rn) <= k).drop(rn))


def sample_by_hash(df: DataFrame, key_cols, fraction: float,
                   salt: str = "sample-v1") -> DataFrame:
    """Deterministic ~``fraction`` subsample: keep rows whose key hashes into
    the lowest ``fraction`` of bucket space.  Samples are *nested*: the 1%
    sample is a subset of the 10% sample under the same salt — change the
    salt for an independent draw."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    key_cols = _as_list(key_cols)
    bucket = _bucket([F.col(c) for c in key_cols], salt)
    return df.filter(bucket < int(round(fraction * _BUCKETS)))
