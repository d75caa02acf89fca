"""AMS sketch: mergeable second-frequency-moment (F2) estimator.

The reference library estimates F0 (distinct count); F2 = sum over keys of
count(key)^2 is its natural sibling — the self-join size, the standard
skew statistic (F2/N^2 is the collision probability a shuffle planner cares
about), and the moment the reference's own workload (join planning over
sketches) needs next. Semantics follow Alon–Matias–Szegedy 1996 ("The space
complexity of approximating the frequency moments") in the practical
Count-Sketch formulation (Charikar–Chen–Farach-Colton 2002, "Finding frequent
items in data streams"; Thorup–Zhang 2004 showed this "Fast-AMS" variant
keeps the AMS variance bound with one update per row): an ``int64[d, w]``
grid; each element adds sign_r(x) to one counter per row r; the row estimate
is the sum of squared counters; the sketch estimate is the median over rows.

Guarantees (Thorup–Zhang 2004, Theorem 1): each row estimate is unbiased with
Var <= 2*F2^2/w, so |row - F2| <= sqrt(2/w)*F2 is one standard error; the
median over d rows drives the failure probability down exponentially in d.

The column stream reuses the library's Kirsch–Mitzenmacher double-hash
(:func:`sketchlib.bloom._h2`) over the same 64-bit Murmur3 element hash as
HLL/Bloom/CMS (SURVEY.md §2.6); the sign stream is bit r of a third
finalizer pass, so the whole element->update pipeline stays a pure function
of the one element hash. Merge = cell-wise sum (linear sketch: associative,
commutative -> bit-identical under any merge order, and the merged sketch
IS the sketch of the concatenated streams).
"""

from __future__ import annotations

import struct

import numpy as np

from .bloom import _h2
from ._wire import read_array, unpack

WIRE_MAGIC = b"AM"
WIRE_VERSION = 1


def _h3(h1: np.ndarray) -> np.ndarray:
    """Third hash stream (sign bits): fmix64 of h1 xor a distinct constant —
    independent-looking bits from the same element hash, one bit per row."""
    k = (h1 ^ np.uint64(0xC2B2AE3D27D4EB4F)).astype(np.uint64)  # xxh64 prime2
    k = k ^ (k >> np.uint64(33))
    k = k * np.uint64(0xFF51AFD7ED558CCD)
    k = k ^ (k >> np.uint64(33))
    k = k * np.uint64(0xC4CEB9FE1A85EC53)
    k = k ^ (k >> np.uint64(33))
    return k


class AmsSketch:
    """Mergeable AMS/Count-Sketch F2 estimator over 64-bit element hashes.

    ``width`` must be a power of two (mask reduction); ``depth`` <= 64 rows
    (one sign bit per row from a single 64-bit sign hash). Counters are
    int64: |cell| <= N, and row estimates are computed in exact Python ints,
    so there is no overflow for any stream a single machine can hold.
    """

    __slots__ = ("width", "depth", "table", "count_additions")

    def __init__(self, width: int = 1 << 12, depth: int = 7,
                 table: np.ndarray | None = None, count_additions: int = 0) -> None:
        if width < 2 or width & (width - 1):
            raise ValueError(f"width must be a power of two >= 2, got {width}")
        if not 1 <= depth <= 64:
            raise ValueError(f"depth must be in [1, 64], got {depth}")
        self.width = width
        self.depth = depth
        self.table = table if table is not None else np.zeros((depth, width), dtype=np.int64)
        self.count_additions = count_additions

    def relative_std_error(self) -> float:
        """One-row standard error sqrt(2/w) relative to F2 (Thorup–Zhang)."""
        return float(np.sqrt(2.0 / self.width))

    def _columns_signs(self, hashes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(n, d) column index and (n, d) ±1 sign per row hash."""
        h1 = np.ascontiguousarray(hashes, dtype=np.uint64)
        h2 = _h2(h1)
        h3 = _h3(h1)
        i = np.arange(self.depth, dtype=np.uint64)
        mask = np.uint64(self.width - 1)
        cols = (h1[:, None] + i[None, :] * h2[:, None]) & mask
        signs = (((h3[:, None] >> i[None, :]) & np.uint64(1)).astype(np.int64) * 2 - 1)
        return cols, signs

    def add_hashes(self, hashes: np.ndarray, counts: np.ndarray | None = None) -> None:
        """Vectorized: one np.add.at per depth row (weights via ``counts``)."""
        n = int(np.asarray(hashes).shape[0])
        if counts is None:
            self.count_additions += n
        else:
            self.count_additions += int(np.asarray(counts, dtype=np.int64).sum())
        if n == 0:
            return
        cols, signs = self._columns_signs(hashes)
        if counts is not None:
            signs = signs * np.ascontiguousarray(counts, dtype=np.int64)[:, None]
        for r in range(self.depth):
            np.add.at(self.table[r], cols[:, r].astype(np.int64), signs[:, r])

    def estimate_hashes(self, hashes: np.ndarray) -> np.ndarray:
        """CountSketch point queries: per-key frequency estimates.

        Charikar–Chen–Farach-Colton 2002 §3 ("Finding frequent items in
        data streams"): the row-r estimate for key x is
        ``sign_r(x) * C[r, col_r(x)]`` — unbiased (colliding keys enter
        with independent random signs, so their expectation cancels) with
        ``Var <= F2 / width`` per row; the sketch estimate is the median
        over the ``depth`` rows, which concentrates the error to
        ``|est - true| <= sqrt(3 * F2 / width)`` with probability
        ``1 - 2^-Omega(depth)``.  Unlike count-min the estimate is
        two-sided (can under- OR over-count, and can be negative), but it
        is unbiased — the right choice when estimates are summed or
        compared across keys rather than used as one-sided bounds.

        Even ``depth`` takes the lower-middle sorted row (the same
        achievable-row-value convention as :meth:`estimate_f2`), keeping
        the result an exact int64 instead of a fabricated .5 average.
        """
        h = np.asarray(hashes)
        if h.shape[0] == 0:
            return np.zeros(0, dtype=np.int64)
        cols, signs = self._columns_signs(h)
        ests = np.empty((h.shape[0], self.depth), dtype=np.int64)
        for r in range(self.depth):
            ests[:, r] = self.table[r, cols[:, r].astype(np.int64)]
        ests *= signs
        ests.sort(axis=1)
        return ests[:, (self.depth - 1) // 2]

    def estimate_f2(self) -> int:
        """Median over rows of the sum of squared counters (>= 0 always).

        Row sums use exact Python ints (no int64 overflow for adversarial
        streams); the even-depth median takes the lower-middle row so the
        result is always an achievable row value, not a fabricated average.
        """
        rows = sorted(sum(int(v) * int(v) for v in row.tolist())
                      for row in self.table)
        return rows[(self.depth - 1) // 2]

    def merge(self, other: "AmsSketch") -> None:
        if (other.width, other.depth) != (self.width, self.depth):
            raise ValueError("cannot merge AMS sketches with different (w, d)")
        self.table += other.table
        self.count_additions += other.count_additions

    def to_bytes(self) -> bytes:
        return (WIRE_MAGIC + struct.pack("<BBiiQ", WIRE_VERSION, 0,
                                         self.width.bit_length() - 1, self.depth,
                                         self.count_additions & ((1 << 64) - 1))
                + self.table.astype("<i8").tobytes())

    @classmethod
    def from_bytes(cls, blob: bytes) -> "AmsSketch":
        if blob[:2] != WIRE_MAGIC:
            raise ValueError("not an AMS blob")
        version, _pad, log_w, depth, count_additions = unpack(
            "<BBiiQ", blob, 2, "AMS")
        if version > WIRE_VERSION:
            raise ValueError(f"incompatible AMS wire version {version}")
        if not 0 <= log_w <= 30 or not 1 <= depth <= 64:
            raise ValueError(f"AMS parameters out of range: log_w={log_w} "
                             f"depth={depth}")
        width = 1 << log_w
        off = 2 + struct.calcsize("<BBiiQ")
        if len(blob) - off != width * depth * 8:
            raise ValueError("AMS payload length mismatch")
        table = (read_array(blob, "<i8", width * depth, off, "AMS")
                 .astype(np.int64).reshape(depth, width))
        return cls(width=width, depth=depth, table=table, count_additions=count_additions)

    def __eq__(self, other: object) -> bool:
        if not isinstance(other, AmsSketch):
            return NotImplemented
        return (self.width == other.width and self.depth == other.depth
                and bool(np.array_equal(self.table, other.table))
                and self.count_additions == other.count_additions)

    __hash__ = None  # type: ignore[assignment]
