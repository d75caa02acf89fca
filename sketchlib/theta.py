"""Theta (KMV) sketch — distinct counting with first-class set algebra.

The reference repo (saguiitay/CardinalityEstimation) ships HLL only, whose
set algebra stops at union (``CardinalityEstimator.cs:615-685``): intersection
must go through inclusion-exclusion, where absolute errors of |A|, |B| and
|A∪B| all land on the (possibly tiny) intersection.  The theta sketch keeps a
uniform *sample* of the element-hash space — the k smallest 64-bit hashes —
so intersection and difference are computed directly on the retained samples
and the error scales with the RESULT's retained count, not with the input
sizes.  Public-knowledge sources: Beyer et al. "On Synopses for Distinct-Value
Estimation Under Multiset Operations" (KMV, SIGMOD'07) and the Theta-Sketch
Framework (Dasgupta, Lang, Rhodes, Thaler — the Apache DataSketches design);
this is an independent numpy implementation of the published algorithm.

Estimator: retained/θ  with θ (as a fraction of the 2^64 hash space) equal to
the (k+1)-th smallest hash after trimming — relative std error ≈ 1/sqrt(k-1)
for build/union; for intersection/difference the RSE is ≈ 1/sqrt(c) with c
the retained count of the *result* (each retained hash is a Bernoulli(θ)
witness of the result set).

Merges are associative and commutative bit-for-bit: the state is a sorted
unique uint64 array + θ, and (min θ, set-union, trim) is order-insensitive.
Below k distinct values the sketch is EXACT (θ = 1), mirroring the
reference's direct-count mode.
"""

from __future__ import annotations

import struct

import numpy as np
from ._wire import read_array, unpack

_MAX_THETA = np.uint64(0xFFFFFFFFFFFFFFFF)  # θ = 1.0 (exact mode)
_HASH_SPACE = float(1 << 64)
_MAGIC = b"TS1\x00"


class ThetaSketch:
    """KMV/theta sketch over 64-bit element hashes.

    Parameters
    ----------
    k : nominal number of retained hashes (sampling size). RSE ≈ 1/sqrt(k-1).
    """

    __slots__ = ("k", "theta", "hashes", "count_additions")

    def __init__(self, k: int = 4096) -> None:
        if k < 16:
            raise ValueError("k must be >= 16")
        self.k = int(k)
        self.theta = _MAX_THETA  # exclusive upper bound on retained hashes
        self.hashes = np.empty(0, dtype=np.uint64)  # sorted ascending, unique
        self.count_additions = 0

    # -- build ------------------------------------------------------------

    def add_hashes(self, hashes: np.ndarray) -> None:
        """Ingest a batch of element hashes (any order, duplicates fine)."""
        h = np.asarray(hashes, dtype=np.uint64)
        self.count_additions += int(h.shape[0])
        if h.shape[0] == 0:
            return
        h = h[h < self.theta]
        if h.shape[0] == 0:
            return
        self.hashes = np.union1d(self.hashes, h)  # sorted unique
        self._trim()

    def _trim(self) -> None:
        # keep the k smallest; θ becomes the (k+1)-th smallest (exclusive),
        # so every retained hash is < θ — the Theta-Sketch Framework invariant
        if self.hashes.shape[0] > self.k:
            self.theta = self.hashes[self.k]
            self.hashes = self.hashes[: self.k]

    # -- estimate ----------------------------------------------------------

    def _theta_frac(self) -> float:
        return 1.0 if self.theta == _MAX_THETA else float(self.theta) / _HASH_SPACE

    def count(self) -> int:
        """Distinct estimate: exact below k, retained/θ beyond."""
        n = int(self.hashes.shape[0])
        if self.theta == _MAX_THETA:
            return n
        return int(round(n / self._theta_frac()))

    def relative_std_error(self) -> float:
        """Published RSE for the build/union estimator (0 in exact mode)."""
        return 0.0 if self.theta == _MAX_THETA else 1.0 / np.sqrt(self.k - 1)

    # -- merge (union) -------------------------------------------------------

    def merge(self, other: "ThetaSketch") -> "ThetaSketch":
        """In-place union; associative & commutative bit-for-bit."""
        if self.k != other.k:
            raise ValueError(f"k mismatch: {self.k} != {other.k}")
        self.theta = min(self.theta, other.theta)
        merged = np.union1d(self.hashes, other.hashes)
        self.hashes = merged[merged < self.theta]
        self._trim()
        self.count_additions += other.count_additions
        return self

    def copy(self) -> "ThetaSketch":
        c = ThetaSketch(self.k)
        c.theta = self.theta
        c.hashes = self.hashes.copy()
        c.count_additions = self.count_additions
        return c

    # -- set algebra ---------------------------------------------------------

    def _common_view(self, other: "ThetaSketch") -> tuple[np.uint64, np.ndarray, np.ndarray]:
        theta = min(self.theta, other.theta)
        return (theta, self.hashes[self.hashes < theta],
                other.hashes[other.hashes < theta])

    def intersect_count(self, other: "ThetaSketch") -> tuple[int, int]:
        """(estimate of |A ∩ B|, retained witness count c).

        RSE ≈ 1/sqrt(c): each retained hash below the common θ is an
        independent Bernoulli(θ) witness of the intersection."""
        theta, a, b = self._common_view(other)
        c = int(np.intersect1d(a, b, assume_unique=True).shape[0])
        frac = 1.0 if theta == _MAX_THETA else float(theta) / _HASH_SPACE
        return int(round(c / frac)), c

    def a_not_b_count(self, other: "ThetaSketch") -> tuple[int, int]:
        """(estimate of |A \\ B|, retained witness count c)."""
        theta, a, b = self._common_view(other)
        c = int(np.setdiff1d(a, b, assume_unique=True).shape[0])
        frac = 1.0 if theta == _MAX_THETA else float(theta) / _HASH_SPACE
        return int(round(c / frac)), c

    def containment(self, other: "ThetaSketch") -> float:
        """Estimate of |A ∩ B| / |A| (how much of A is covered by B).

        Ratio of witness counts under the common θ — the θ scaling cancels,
        so this is the direct Bernoulli-fraction estimator (RSE ≈
        sqrt((1-C)/(C·c_a)) around containment C with c_a retained A
        witnesses); 0.0 for an empty A view.
        """
        _theta, a, b = self._common_view(other)
        if a.shape[0] == 0:
            return 0.0
        c = int(np.intersect1d(a, b, assume_unique=True).shape[0])
        return c / a.shape[0]

    def jaccard(self, other: "ThetaSketch") -> float:
        theta, a, b = self._common_view(other)
        u = int(np.union1d(a, b).shape[0])
        if u == 0:
            return 0.0
        c = int(np.intersect1d(a, b, assume_unique=True).shape[0])
        return c / u

    # -- serialization ---------------------------------------------------------

    def to_bytes(self) -> bytes:
        """Canonical little-endian wire format:
        magic 'TS1\\0' | u32 k | u64 theta | u32 n | n x u64 sorted hashes |
        u64 count_additions."""
        return (_MAGIC
                + struct.pack("<IQI", self.k, int(self.theta),
                              self.hashes.shape[0])
                + self.hashes.astype("<u8").tobytes()
                + struct.pack("<Q", self.count_additions & ((1 << 64) - 1)))

    @classmethod
    def from_bytes(cls, blob: bytes) -> "ThetaSketch":
        if blob[:4] != _MAGIC:
            raise ValueError("not a theta sketch blob")
        k, theta, n = unpack("<IQI", blob, 4, "theta")
        if not 16 <= k <= (1 << 26):
            raise ValueError(f"k out of range: {k}")
        if n > k:
            raise ValueError(f"retained count {n} exceeds k {k}")
        off = 4 + 16
        need = off + 8 * n + 8
        if len(blob) != need:
            raise ValueError(f"blob length {len(blob)} != expected {need}")
        sk = cls(k)
        sk.theta = np.uint64(theta)
        sk.hashes = read_array(blob, "<u8", n, off, "theta").astype(np.uint64)
        if n and not (bool(np.all(sk.hashes[1:] > sk.hashes[:-1]))
                      and sk.hashes[-1] < sk.theta):
            raise ValueError("hashes not sorted-unique below theta")
        (sk.count_additions,) = unpack("<Q", blob, off + 8 * n, "theta")
        return sk

    @classmethod
    def from_unique_hashes(cls, sorted_unique_hashes: np.ndarray, k: int = 4096,
                           count_additions: int = 0) -> "ThetaSketch":
        """Build from an already sorted-unique uint64 array (the shape the
        two-stage accumulator hands over) — a pure O(k) slice."""
        sk = cls(k)
        sk.hashes = np.asarray(sorted_unique_hashes, dtype=np.uint64)
        sk.count_additions = int(count_additions)
        sk._trim()
        return sk

    def state_tuple(self) -> tuple:
        return (self.k, int(self.theta), self.hashes.tobytes(),
                self.count_additions)

    def __eq__(self, other: object) -> bool:
        if not isinstance(other, ThetaSketch):
            return NotImplemented
        return self.state_tuple() == other.state_tuple()

    __hash__ = None  # type: ignore[assignment]
