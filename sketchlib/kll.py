"""KLL quantile sketch (Karnin, Lang, Liberty, "Optimal quantile
approximation in streams", FOCS 2016).

A hierarchy of compactors: level i holds items each representing 2^i input
points; when a level overflows its capacity ``k_i = max(ceil(k * c^(depth-i)),
8)`` (c = 2/3), it sorts and promotes every other item to level i+1.
Normalized rank error is O(1/k) w.h.p.; k=200 gives ~1% in practice.

Determinism: the published algorithm flips a fair coin per compaction for the
odd/even choice. For reproducible distributed runs (north rule: same input ->
same bytes at any partitioning *of a single build*; merges reproducible given
the same merge tree) the coin is replaced by a counter-seeded xorshift —
deterministic given the compaction sequence. Estimate-level accuracy is
unchanged (the alternation is still unbiased across compactions); this is the
same trade Apache DataSketches exposes as "deterministic mode".

Merge: level-wise concatenation followed by standard compaction — the
classic mergeable-summary construction from the paper (§3).
"""

from __future__ import annotations

import math
import struct

import numpy as np
from ._wire import read_array, unpack

WIRE_MAGIC = b"KL"
WIRE_VERSION = 1

_C = 2.0 / 3.0


class KllSketch:
    """Mergeable KLL over float64 values."""

    __slots__ = ("k", "compactors", "count_additions", "min", "max", "_coin")

    def __init__(self, k: int = 200, count_additions: int = 0,
                 vmin: float = np.inf, vmax: float = -np.inf,
                 compactors: list[np.ndarray] | None = None, coin: int = 0) -> None:
        if not 8 <= k <= 65535:
            raise ValueError(f"k must be in [8, 65535], got {k}")
        self.k = k
        self.compactors = compactors if compactors is not None else [np.zeros(0)]
        self.count_additions = count_additions
        self.min = vmin
        self.max = vmax
        self._coin = coin

    # -- capacities ------------------------------------------------------------

    def _capacity(self, level: int) -> int:
        depth = len(self.compactors) - 1
        return max(int(math.ceil(self.k * (_C ** (depth - level)))), 8)

    def _total(self) -> int:
        return sum(c.shape[0] for c in self.compactors)

    def _cap_total(self) -> int:
        return sum(self._capacity(i) for i in range(len(self.compactors)))

    # -- build -----------------------------------------------------------------

    def add_values(self, values: np.ndarray) -> None:
        v = np.ascontiguousarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.shape[0] == 0:
            return
        self.count_additions += int(v.shape[0])
        self.min = min(self.min, float(v.min()))
        self.max = max(self.max, float(v.max()))
        self.compactors[0] = np.concatenate([self.compactors[0], v])
        self._compact_all()

    def _next_coin(self) -> int:
        # xorshift64 over a counter: deterministic, well-mixed parity
        x = (self._coin + 0x9E3779B97F4A7C15) & ((1 << 64) - 1)
        x ^= x >> 30
        x = (x * 0xBF58476D1CE4E5B9) & ((1 << 64) - 1)
        x ^= x >> 27
        self._coin = x
        return int(x & 1)

    def _compact_all(self) -> None:
        while self._total() > self._cap_total():
            for level in range(len(self.compactors)):
                if self.compactors[level].shape[0] > self._capacity(level):
                    self._compact_level(level)
                    break
            else:
                break

    def _compact_level(self, level: int) -> None:
        items = np.sort(self.compactors[level])
        odd = items.shape[0] & 1
        if odd:  # keep one item at this level so no weight is invented
            keep, items = items[:1], items[1:]
        else:
            keep = items[:0]
        start = self._next_coin()
        promoted = items[start::2]
        self.compactors[level] = keep
        if level + 1 == len(self.compactors):
            self.compactors.append(np.zeros(0))
        self.compactors[level + 1] = np.concatenate(
            [self.compactors[level + 1], promoted])

    # -- merge -----------------------------------------------------------------

    def merge(self, other: "KllSketch") -> None:
        if other.k != self.k:
            raise ValueError("cannot merge KLL sketches with different k")
        while len(self.compactors) < len(other.compactors):
            self.compactors.append(np.zeros(0))
        for i, c in enumerate(other.compactors):
            if c.shape[0]:
                self.compactors[i] = np.concatenate([self.compactors[i], c])
        self.count_additions += other.count_additions
        self.min = min(self.min, other.min)
        self.max = max(self.max, other.max)
        self._coin ^= other._coin
        self._compact_all()

    # -- estimate ---------------------------------------------------------------

    def _weighted_items(self) -> tuple[np.ndarray, np.ndarray]:
        items = []
        weights = []
        for level, c in enumerate(self.compactors):
            if c.shape[0]:
                items.append(c)
                weights.append(np.full(c.shape[0], 2 ** level, dtype=np.float64))
        if not items:
            return np.zeros(0), np.zeros(0)
        it = np.concatenate(items)
        w = np.concatenate(weights)
        order = np.argsort(it, kind="stable")
        return it[order], w[order]

    def quantile(self, q) -> np.ndarray | float:
        scalar = np.isscalar(q)
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        if np.any((qs < 0) | (qs > 1)):
            raise ValueError("q must be in [0, 1]")
        items, w = self._weighted_items()
        if items.shape[0] == 0:
            out = np.full(qs.shape, np.nan)
            return float(out[0]) if scalar else out
        cum = np.cumsum(w)
        total = cum[-1]
        # smallest item whose cumulative weight covers q*total
        idx = np.searchsorted(cum, qs * total, side="left")
        idx = np.clip(idx, 0, items.shape[0] - 1)
        out = items[idx]
        out = np.where(qs <= 0, self.min, out)
        out = np.where(qs >= 1, self.max, out)
        return float(out[0]) if scalar else out

    def rank(self, x) -> np.ndarray | float:
        """Approximate normalized rank of x (fraction of mass < x)."""
        scalar = np.isscalar(x)
        xs = np.atleast_1d(np.asarray(x, dtype=np.float64))
        items, w = self._weighted_items()
        if items.shape[0] == 0:
            out = np.full(xs.shape, np.nan)
            return float(out[0]) if scalar else out
        cum = np.concatenate([[0.0], np.cumsum(w)])
        idx = np.searchsorted(items, xs, side="left")
        out = cum[idx] / cum[-1]
        return float(out[0]) if scalar else out

    # -- serialization -----------------------------------------------------------

    def to_bytes(self) -> bytes:
        levels = [np.sort(c) for c in self.compactors]  # canonical per level
        header = struct.pack("<BBHiQddQ", WIRE_VERSION, 0, self.k, len(levels),
                             self.count_additions & ((1 << 64) - 1),
                             self.min, self.max, self._coin & ((1 << 64) - 1))
        counts = struct.pack(f"<{len(levels)}i", *[c.shape[0] for c in levels])
        payload = b"".join(c.astype("<f8").tobytes() for c in levels)
        return WIRE_MAGIC + header + counts + payload

    @classmethod
    def from_bytes(cls, blob: bytes) -> "KllSketch":
        if blob[:2] != WIRE_MAGIC:
            raise ValueError("not a KLL blob")
        version, _pad, k, n_levels, count_additions, vmin, vmax, coin = (
            unpack("<BBHiQddQ", blob, 2, "KLL"))
        if version > WIRE_VERSION:
            raise ValueError(f"incompatible KLL wire version {version}")
        if not 0 < n_levels <= 64:
            raise ValueError(f"invalid KLL level count {n_levels}")
        off = 2 + struct.calcsize("<BBHiQddQ")
        counts = unpack(f"<{n_levels}i", blob, off, "KLL")
        off += 4 * n_levels
        if any(c < 0 for c in counts) or len(blob) - off != 8 * sum(counts):
            raise ValueError("KLL payload length mismatch")
        compactors = []
        for c in counts:
            compactors.append(read_array(blob, "<f8", c, off, "KLL")
                              .astype(np.float64))
            off += 8 * c
        return cls(k=k, compactors=compactors, count_additions=count_additions,
                   vmin=vmin, vmax=vmax, coin=coin)

    def __eq__(self, other: object) -> bool:
        if not isinstance(other, KllSketch):
            return NotImplemented
        if (self.k, self.count_additions, self.min, self.max) != (
                other.k, other.count_additions, other.min, other.max):
            return False
        a = [np.sort(c) for c in self.compactors]
        b = [np.sort(c) for c in other.compactors]
        if len(a) != len(b):
            return False
        return all(np.array_equal(x, y) for x, y in zip(a, b))

    __hash__ = None  # type: ignore[assignment]
