"""Count–Min sketch: mergeable frequency sketch (heavy hitters).

Semantics per Cormode & Muthukrishnan 2005 ("An improved data stream summary:
the count-min sketch and its applications"): a ``uint64[d, w]`` counter grid;
each element increments one counter per row, selected by d pairwise-independent
hashes; point query = min over rows. Guarantee: estimate >= true count always
(one-sided), and estimate <= true + eps*N with probability 1 - delta, for
eps = e/w, delta = e^-d, N = total additions.

Row hashes use the Kirsch–Mitzenmacher double-hashing stream
(g_i = h1 + i*h2 mod w) over the library's 64-bit Murmur3 element hash —
the same hash path as HLL/Bloom (SURVEY.md §2.6). Merge = cell-wise sum
(associative & commutative -> bit-identical under any merge order).
"""

from __future__ import annotations

import math
import struct

import numpy as np

from .bloom import _h2
from ._wire import read_array, unpack

WIRE_MAGIC = b"CM"
WIRE_VERSION = 1


def params_for(eps: float, delta: float) -> tuple[int, int]:
    """(width, depth) for overcount <= eps*N with prob 1-delta; width rounded
    up to a power of two (mask reduction)."""
    w = int(math.ceil(math.e / eps))
    w = 1 << (w - 1).bit_length()
    d = max(1, int(math.ceil(math.log(1.0 / delta))))
    return w, d


class CountMinSketch:
    """Mergeable count-min over 64-bit element hashes; ``width`` must be a
    power of two. Counters are uint64 (overflow-free at any realistic N)."""

    __slots__ = ("width", "depth", "table", "count_additions")

    def __init__(self, width: int = 1 << 12, depth: int = 5,
                 table: np.ndarray | None = None, count_additions: int = 0) -> None:
        if width < 2 or width & (width - 1):
            raise ValueError(f"width must be a power of two >= 2, got {width}")
        if not 1 <= depth <= 64:
            raise ValueError(f"depth must be in [1, 64], got {depth}")
        self.width = width
        self.depth = depth
        self.table = table if table is not None else np.zeros((depth, width), dtype=np.uint64)
        self.count_additions = count_additions

    @property
    def eps(self) -> float:
        return math.e / self.width

    @property
    def delta(self) -> float:
        return math.exp(-self.depth)

    def _columns(self, hashes: np.ndarray) -> np.ndarray:
        """(n, d) column index per row hash."""
        h1 = np.ascontiguousarray(hashes, dtype=np.uint64)
        h2 = _h2(h1)
        i = np.arange(self.depth, dtype=np.uint64)
        mask = np.uint64(self.width - 1)
        return (h1[:, None] + i[None, :] * h2[:, None]) & mask

    def add_hashes(self, hashes: np.ndarray, counts: np.ndarray | None = None) -> None:
        """Vectorized: one np.add.at per depth row (weights via ``counts``)."""
        n = int(np.asarray(hashes).shape[0])
        if counts is None:
            self.count_additions += n
        else:
            self.count_additions += int(np.asarray(counts, dtype=np.int64).sum())
        if n == 0:
            return
        cols = self._columns(hashes)
        w = np.uint64(1) if counts is None else np.ascontiguousarray(counts, dtype=np.uint64)
        for r in range(self.depth):
            np.add.at(self.table[r], cols[:, r].astype(np.int64), w)

    def estimate_hashes(self, hashes: np.ndarray) -> np.ndarray:
        """Vectorized point queries: min over depth rows (>= true count)."""
        h = np.asarray(hashes)
        if h.shape[0] == 0:
            return np.zeros(0, dtype=np.uint64)
        cols = self._columns(h)
        ests = np.empty((h.shape[0], self.depth), dtype=np.uint64)
        for r in range(self.depth):
            ests[:, r] = self.table[r, cols[:, r].astype(np.int64)]
        return ests.min(axis=1)

    def inner_product(self, other: "CountMinSketch") -> int:
        """Join-size estimate: min over rows of sum_j A[r,j]*B[r,j].

        Cormode–Muthukrishnan 2005 §4.2: for streams A, B with per-key counts
        a_k, b_k, the estimate is >= sum_k a_k*b_k always (all terms
        non-negative; colliding keys only add), and <= true + eps*N_A*N_B
        with probability 1-delta. Row sums use exact Python ints — a uint64
        dot product would silently wrap on adversarial streams.
        """
        if (other.width, other.depth) != (self.width, self.depth):
            raise ValueError("cannot inner-product count-min sketches with different (w, d)")
        best = None
        for r in range(self.depth):
            a = self.table[r]
            b = other.table[r]
            nz = np.flatnonzero((a != 0) & (b != 0))
            s = sum(int(a[j]) * int(b[j]) for j in nz.tolist())
            best = s if best is None else min(best, s)
        return int(best if best is not None else 0)

    def merge(self, other: "CountMinSketch") -> None:
        if (other.width, other.depth) != (self.width, self.depth):
            raise ValueError("cannot merge count-min sketches with different (w, d)")
        self.table += other.table
        self.count_additions += other.count_additions

    def to_bytes(self) -> bytes:
        return (WIRE_MAGIC + struct.pack("<BBiiQ", WIRE_VERSION, 0,
                                         self.width.bit_length() - 1, self.depth,
                                         self.count_additions & ((1 << 64) - 1))
                + self.table.astype("<u8").tobytes())

    @classmethod
    def from_bytes(cls, blob: bytes) -> "CountMinSketch":
        if blob[:2] != WIRE_MAGIC:
            raise ValueError("not a count-min blob")
        version, _pad, log_w, depth, count_additions = unpack(
            "<BBiiQ", blob, 2, "count-min")
        if version > WIRE_VERSION:
            raise ValueError(f"incompatible count-min wire version {version}")
        if not 0 <= log_w <= 30 or not 1 <= depth <= 64:
            raise ValueError(f"count-min parameters out of range: "
                             f"log_w={log_w} depth={depth}")
        width = 1 << log_w
        off = 2 + struct.calcsize("<BBiiQ")
        expected = width * depth * 8
        if len(blob) - off != expected:
            raise ValueError("count-min payload length mismatch")
        table = (read_array(blob, "<u8", width * depth, off, "count-min")
                 .astype(np.uint64).reshape(depth, width))
        return cls(width=width, depth=depth, table=table, count_additions=count_additions)

    def __eq__(self, other: object) -> bool:
        if not isinstance(other, CountMinSketch):
            return NotImplemented
        return (self.width == other.width and self.depth == other.depth
                and bool(np.array_equal(self.table, other.table))
                and self.count_additions == other.count_additions)

    __hash__ = None  # type: ignore[assignment]
