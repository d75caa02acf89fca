"""Pre-flight skew diagnosis for a planned groupBy / join key.

The 100 TB failure mode this prevents: a shuffle on a Zipf key (lang, host,
user_id) sends the hot key's rows to ONE reducer, and the job dies hours in.
The north rule demands explicit salting for skewed partitions
(:mod:`sketchlib.spark.skew`); this module answers the question that comes
BEFORE salting — *is this key skewed, how badly, and how many salt buckets
does it need* — from two cheap blob-only passes instead of a failed
full-scale shuffle:

* pass 1 — ONE scan builds Theta (distinct keys) and AMS (F2, the self-join
  size / collision mass) together via :class:`~sketchlib.spark.specs.
  ComboSpec`: only a ≤300 KB combined blob per partition crosses the
  shuffle;
* pass 2 — :func:`~sketchlib.spark.heavy_hitters.heavy_hitters` enumerates
  the top-k hot VALUES with the (lower_bound <= true <= est_count)
  CMS/Misra–Gries sandwich.

From those, closed-form planning numbers: under hash partitioning into P
tasks the hot key's task holds ~``hot + (n - hot)/P`` rows vs the ``n/P``
average — a skew factor of ``share*P + 1`` — so spreading the hot key over
``ceil(share * P)`` salt buckets levels it (`salt_buckets`).  ``est_count``
is an upper bound, so the recommendation never under-salts w.h.p.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame

from .aggregate import sketch_agg
from .heavy_hitters import heavy_hitters
from .specs import AmsSpec, CmsSpec, ComboSpec, ThetaSpec


@dataclass(frozen=True)
class SkewDiagnosis:
    """Sketch-derived skew profile of one key column."""

    n_rows: int
    ndv: int                 #: Theta distinct estimate
    ndv_rse: float           #: Theta one-sigma relative std error
    f2: int                  #: AMS self-join-size estimate
    #: top-k (value, est_count, lower_bound) with lower <= true <= est
    hot_keys: tuple[tuple[object, int, int], ...]

    @property
    def collision_prob(self) -> float:
        """P(two random rows share a key) = F2 / n^2 — the shuffle
        planner's collision mass (1/ndv for uniform keys, ~share^2 for a
        hub-dominated key)."""
        return self.f2 / (self.n_rows * self.n_rows) if self.n_rows else 0.0

    @property
    def top_share_upper(self) -> float:
        """Upper bound on the hottest key's row share (CMS is one-sided)."""
        if not self.hot_keys or not self.n_rows:
            return 0.0
        return self.hot_keys[0][1] / self.n_rows

    @property
    def top_share_lower(self) -> float:
        if not self.hot_keys or not self.n_rows:
            return 0.0
        return self.hot_keys[0][2] / self.n_rows

    def skew_factor(self, n_partitions: int) -> float:
        """Hot task rows / average task rows under hash partitioning."""
        return self.top_share_upper * n_partitions + 1.0

    def salt_buckets(self, n_partitions: int) -> int:
        """Salt buckets that level the hot key's task to ~average:
        ceil(top_share * P), clamped to [1, P].  Derived from the CMS
        UPPER bound, so it never under-salts w.h.p."""
        s = math.ceil(self.top_share_upper * n_partitions)
        return max(1, min(int(s), int(n_partitions)))

    def recommendation(self, n_partitions: int,
                       tolerance: float = 2.0) -> str:
        """'none' when the hot task stays within ``tolerance`` x average;
        otherwise 'salt(<buckets>)' for
        :func:`sketchlib.spark.skew.salted_repartition`."""
        if self.skew_factor(n_partitions) <= tolerance:
            return "none"
        return f"salt({self.salt_buckets(n_partitions)})"


def diagnose_skew(df: DataFrame, key_col: str, k: int = 10,
                  theta_k: int = 4096, ams_width: int = 1 << 12,
                  ams_depth: int = 7, cms_spec: CmsSpec | None = None,
                  hash_name: str = "murmur3") -> SkewDiagnosis:
    """Two blob-only passes over ``df[key_col]`` -> :class:`SkewDiagnosis`.

    Cost is independent of skew by construction: pass 1's combo partials
    are fixed-size per partition; pass 2's candidate tracker is
    capacity-bounded per partition (heavy_hitters docstring) — the hot key
    this function exists to find never becomes a hot key of the diagnosis
    itself."""
    combo = ComboSpec([ThetaSpec(k=theta_k, hash_name=hash_name),
                       AmsSpec(width=ams_width, depth=ams_depth,
                               hash_name=hash_name)])
    [row] = sketch_agg(df, key_col, (), combo).collect()
    theta_sk, ams_sk = combo.from_bytes(bytes(row["sketch"]))
    hh = heavy_hitters(df, key_col, k=k,
                       spec=cms_spec or CmsSpec(hash_name=hash_name)).collect()
    hot = tuple(sorted(((r["value"], int(r["est_count"]), int(r["lower_bound"]))
                        for r in hh), key=lambda t: (-t[1], str(t[0]))))
    return SkewDiagnosis(
        n_rows=int(ams_sk.count_additions),
        ndv=int(theta_sk.count()),
        ndv_rse=float(theta_sk.relative_std_error()),
        f2=int(ams_sk.estimate_f2()),
        hot_keys=hot,
    )
