"""t-digest: mergeable quantile sketch (Dunning & Ertl, "Computing extremely
accurate quantiles using t-digests", 2019).

Variant: the *merging* digest with the k1 scale function
``k(q) = (delta / 2pi) * asin(2q - 1)``, implemented as a fully vectorized
uniform k-partition: all inputs (existing centroids + new points) are sorted
by mean and cut where ``floor(k(q_mid))`` changes, then each cluster collapses
to its weighted mean via ``np.add.reduceat``. This is the deterministic limit
form of Dunning's one-pass merge loop: identical multiset of (mean, weight)
in -> identical centroids out, regardless of how the multiset was split
across partitions beforehand (the sort canonicalizes order), which is what
makes distributed merges reproducible. Size bound: at most ``delta`` clusters
(k spans [−delta/4, delta/4] -> <= delta/2 integer cells, x2 safety), ~16 B
per centroid.

Accuracy: rank error per cluster is bounded by the k-cell width — O(q(1-q)/
delta) in the interior, exact at the extremes (min/max are tracked and
clusters at q≈0/1 have near-zero width). Merge is associative/commutative at
the estimate level; canonical serialization makes equal-state digests
byte-equal.
"""

from __future__ import annotations

import struct

import numpy as np
from ._wire import read_array, unpack

WIRE_MAGIC = b"TD"
WIRE_VERSION = 1

_BUFFER_CAP = 8192


class TDigest:
    """Mergeable t-digest over float64 values. NaNs are rejected; +/-inf
    allowed but degrade interpolation (like the reference implementations)."""

    __slots__ = ("delta", "means", "weights", "min", "max", "count_additions",
                 "_buf")

    def __init__(self, delta: int = 200,
                 means: np.ndarray | None = None,
                 weights: np.ndarray | None = None,
                 vmin: float = np.inf, vmax: float = -np.inf,
                 count_additions: int = 0) -> None:
        if not 10 <= delta <= 10_000:
            raise ValueError(f"delta must be in [10, 10000], got {delta}")
        self.delta = delta
        self.means = means if means is not None else np.zeros(0, dtype=np.float64)
        self.weights = weights if weights is not None else np.zeros(0, dtype=np.float64)
        self.min = vmin
        self.max = vmax
        self.count_additions = count_additions
        self._buf: list[np.ndarray] = []

    # -- scale function --------------------------------------------------------

    def _k(self, q: np.ndarray) -> np.ndarray:
        return (self.delta / (2 * np.pi)) * np.arcsin(np.clip(2 * q - 1, -1, 1))

    # -- build -----------------------------------------------------------------

    def add_values(self, values: np.ndarray) -> None:
        v = np.ascontiguousarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.shape[0] == 0:
            return
        self.count_additions += int(v.shape[0])
        self.min = min(self.min, float(v.min()))
        self.max = max(self.max, float(v.max()))
        self._buf.append(v)
        if sum(b.shape[0] for b in self._buf) >= _BUFFER_CAP:
            self._flush()

    def _flush(self) -> None:
        if not self._buf:
            return
        pts = np.concatenate(self._buf)
        self._buf = []
        self._compress(np.concatenate([self.means, pts]),
                       np.concatenate([self.weights, np.ones(pts.shape[0])]))

    def _compress(self, means: np.ndarray, weights: np.ndarray) -> None:
        """Sort by (mean, weight), cut where floor(k(q_mid)) changes, collapse
        each cell to its weighted mean — one vectorized pass."""
        if means.shape[0] == 0:
            self.means = means
            self.weights = weights
            return
        order = np.lexsort((weights, means))
        m = means[order]
        w = weights[order]
        total = w.sum()
        cum = np.cumsum(w)
        q_mid = (cum - w / 2) / total
        cell = np.floor(self._k(q_mid)).astype(np.int64)
        starts = np.nonzero(np.diff(cell, prepend=cell[0] - 1))[0]
        wsum = np.add.reduceat(w, starts)
        msum = np.add.reduceat(m * w, starts)
        self.means = msum / wsum
        self.weights = wsum

    # -- merge -----------------------------------------------------------------

    def merge(self, other: "TDigest") -> None:
        if other.delta != self.delta:
            raise ValueError("cannot merge t-digests with different delta")
        self._flush()
        other._flush()
        self.count_additions += other.count_additions
        self.min = min(self.min, other.min)
        self.max = max(self.max, other.max)
        self._compress(np.concatenate([self.means, other.means]),
                       np.concatenate([self.weights, other.weights]))

    # -- estimate ---------------------------------------------------------------

    def quantile(self, q) -> np.ndarray | float:
        """Quantile estimate(s) by piecewise-linear interpolation between
        centroid midpoints, pinned to tracked min/max at the extremes."""
        self._flush()
        scalar = np.isscalar(q)
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        if np.any((qs < 0) | (qs > 1)):
            raise ValueError("q must be in [0, 1]")
        n = self.weights.sum()
        if n == 0:
            out = np.full(qs.shape, np.nan)
            return float(out[0]) if scalar else out
        # step function over centroid rank spans: r in (cum[i-1], cum[i]] ->
        # mean[i]. Robust to discrete tie mass (a heavy repeated value owns
        # its whole span), and rank error stays bounded by the k-cell width —
        # unlike midpoint interpolation, which smears a heavy centroid's mass
        # across its neighbors.
        cum = np.cumsum(self.weights)
        idx = np.searchsorted(cum, qs * n, side="left")
        idx = np.clip(idx, 0, self.means.shape[0] - 1)
        out = self.means[idx]
        out = np.where(qs <= 0, self.min, out)
        out = np.where(qs >= 1, self.max, out)
        return float(out[0]) if scalar else out

    def rank(self, x) -> np.ndarray | float:
        """Approximate CDF: fraction of mass <= x (inverse of quantile)."""
        self._flush()
        scalar = np.isscalar(x)
        xs = np.atleast_1d(np.asarray(x, dtype=np.float64))
        n = self.weights.sum()
        if n == 0:
            out = np.full(xs.shape, np.nan)
            return float(out[0]) if scalar else out
        # mid-rank of the covering centroid (step CDF, symmetric with quantile)
        cum = np.cumsum(self.weights)
        lo = np.searchsorted(self.means, xs, side="left")
        hi = np.searchsorted(self.means, xs, side="right")
        below = np.where(lo > 0, cum[np.maximum(lo - 1, 0)], 0.0)
        at = np.where(hi > lo, cum[np.minimum(hi, cum.shape[0]) - 1] - below, 0.0)
        out = (below + at / 2) / n
        return float(out[0]) if scalar else out

    # -- serialization -----------------------------------------------------------

    def to_bytes(self) -> bytes:
        self._flush()
        return (WIRE_MAGIC
                + struct.pack("<BBiiQdd", WIRE_VERSION, 0, self.delta,
                              self.means.shape[0],
                              self.count_additions & ((1 << 64) - 1),
                              self.min, self.max)
                + self.means.astype("<f8").tobytes()
                + self.weights.astype("<f8").tobytes())

    @classmethod
    def from_bytes(cls, blob: bytes) -> "TDigest":
        if blob[:2] != WIRE_MAGIC:
            raise ValueError("not a t-digest blob")
        version, _pad, delta, n, count_additions, vmin, vmax = unpack(
            "<BBiiQdd", blob, 2, "t-digest")
        if version > WIRE_VERSION:
            raise ValueError(f"incompatible t-digest wire version {version}")
        off = 2 + struct.calcsize("<BBiiQdd")
        if len(blob) - off != 16 * n:
            raise ValueError("t-digest payload length mismatch")
        means = read_array(blob, "<f8", n, off, "t-digest").astype(np.float64)
        weights = read_array(blob, "<f8", n, off + 8 * n, "t-digest").astype(np.float64)
        return cls(delta=delta, means=means, weights=weights, vmin=vmin, vmax=vmax,
                   count_additions=count_additions)

    def __eq__(self, other: object) -> bool:
        if not isinstance(other, TDigest):
            return NotImplemented
        self._flush()
        other._flush()
        return (self.delta == other.delta
                and bool(np.array_equal(self.means, other.means))
                and bool(np.array_equal(self.weights, other.weights))
                and (self.min, self.max, self.count_additions)
                == (other.min, other.max, other.count_additions))

    __hash__ = None  # type: ignore[assignment]
