"""Sketch-based equi-join size estimation (CMS inner product).

The planner question at 100 TB: "how many rows will R JOIN S ON k produce?"
answered without running the join. Build one Count-Min sketch per side
(distributed two-stage aggregation — only ≤160 KB blobs cross the shuffle,
never raw rows), then take the inner product of the two counter grids
(Cormode–Muthukrishnan 2005 §4.2): min over rows of sum_j A[r,j]*B[r,j].

Guarantee: estimate >= |R ⋈ S| always (one-sided, like point queries), and
<= true + eps*|R|*|S| with probability 1-delta (eps = e/width). The same
machinery estimates self-join size (F2) when both sides are the same
relation — cross-checked against the AMS sketch, whose estimate is unbiased
rather than one-sided.

Both sides must be built with the same (width, depth, hash) spec: the grids
are only comparable cell-by-cell when the column/row hash streams agree.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame

from ..cms import CountMinSketch
from .aggregate import sketch_agg
from .specs import CmsSpec


@dataclass(frozen=True)
class JoinSizeEstimate:
    """Result of a sketched join-size estimation.

    ``estimate`` never underestimates the true join size; ``upper_margin``
    is the eps*|R|*|S| additive slack the published bound allows above the
    true size with probability 1 - delta.
    """

    estimate: int
    n_left: int
    n_right: int
    eps: float
    delta: float

    @property
    def upper_margin(self) -> float:
        return self.eps * self.n_left * self.n_right


def cms_blob(df: DataFrame, key_cols, spec: CmsSpec) -> bytes:
    """Distributed CMS build -> one serialized blob on the driver."""
    [row] = sketch_agg(df, key_cols, (), spec).collect()
    return bytes(row["sketch"])


def join_size_estimate(df_left: DataFrame, left_key,
                       df_right: DataFrame, right_key,
                       spec: CmsSpec | None = None) -> JoinSizeEstimate:
    """Estimate |df_left ⋈ df_right| on the given equi-join keys.

    Two independent distributed sketch builds (one scan per side, no join,
    no shuffle of raw rows) + an O(width*depth) driver-side inner product.
    """
    spec = spec or CmsSpec()
    a = CountMinSketch.from_bytes(cms_blob(df_left, left_key, spec))
    b = CountMinSketch.from_bytes(cms_blob(df_right, right_key, spec))
    return JoinSizeEstimate(
        estimate=a.inner_product(b),
        n_left=a.count_additions,
        n_right=b.count_additions,
        eps=math.e / spec.width,
        delta=math.exp(-spec.depth),
    )
