"""Bloom filter: mergeable set-membership sketch.

The reference library has no Bloom filter; semantics follow the classic
construction (Bloom 1970) with the Kirsch–Mitzenmacher double-hashing scheme
(g_i(x) = h1 + i*h2 mod m, "Less Hashing, Same Performance", 2006), which
needs only the one 64-bit Murmur3 element hash the library already computes
(SURVEY.md §2.6). h2 is derived from h1 by a second finalizer pass, keeping
the whole element->bits pipeline a pure function of the Murmur3 hash (so
Bloom shares the HLL hash path and its golden tests).

Operator shape matches the north rule's build/merge/estimate/serialize
contract: merge = bit-wise OR (associative, commutative, idempotent ->
bit-identical under any merge order); estimate = fill-ratio cardinality
``-m/k * ln(1 - X/m)`` (Swamidass & Baldi 2007); false-positive rate
``(1 - e^{-kn/m})^k``, never false negatives.
"""

from __future__ import annotations

import math
import struct

import numpy as np
from ._wire import read_array, unpack

WIRE_MAGIC = b"BF"
WIRE_VERSION = 1

_GOLDEN64 = np.uint64(0x9E3779B97F4A7C15)


def _h2(h1: np.ndarray) -> np.ndarray:
    """Second hash stream derived from h1 (fmix64 of h1 xor golden ratio);
    forced odd so all k probe strides are distinct mod power-of-two m."""
    k = (h1 ^ _GOLDEN64).astype(np.uint64)
    k = k ^ (k >> np.uint64(33))
    k = k * np.uint64(0xFF51AFD7ED558CCD)
    k = k ^ (k >> np.uint64(33))
    k = k * np.uint64(0xC4CEB9FE1A85EC53)
    k = k ^ (k >> np.uint64(33))
    return k | np.uint64(1)


def optimal_params(expected_n: int, fpr: float) -> tuple[int, int]:
    """(m_bits, k) minimizing space for a target false-positive rate;
    m rounded up to a power of two so probe reduction is a mask, not a mod."""
    m = max(64, int(math.ceil(-expected_n * math.log(fpr) / (math.log(2) ** 2))))
    m = 1 << (m - 1).bit_length()
    k = max(1, round(m / expected_n * math.log(2))) if expected_n else 1
    return m, int(k)


class BloomFilter:
    """Mergeable Bloom filter over 64-bit element hashes.

    ``m_bits`` must be a power of two (mask reduction). State is a packed
    ``uint8[m_bits/8]`` bit array; all operations are vectorized numpy.
    """

    __slots__ = ("m_bits", "k", "bits", "count_additions")

    def __init__(self, m_bits: int = 1 << 20, k: int = 7,
                 bits: np.ndarray | None = None, count_additions: int = 0) -> None:
        if m_bits < 8 or m_bits & (m_bits - 1):
            raise ValueError(f"m_bits must be a power of two >= 8, got {m_bits}")
        if not 1 <= k <= 64:
            raise ValueError(f"k must be in [1, 64], got {k}")
        self.m_bits = m_bits
        self.k = k
        self.bits = bits if bits is not None else np.zeros(m_bits // 8, dtype=np.uint8)
        self.count_additions = count_additions

    def _positions(self, hashes: np.ndarray) -> np.ndarray:
        """(n, k) bit positions via double hashing."""
        h1 = np.ascontiguousarray(hashes, dtype=np.uint64)
        h2 = _h2(h1)
        i = np.arange(self.k, dtype=np.uint64)
        mask = np.uint64(self.m_bits - 1)
        return (h1[:, None] + i[None, :] * h2[:, None]) & mask

    def add_hashes(self, hashes: np.ndarray) -> None:
        self.count_additions += int(np.asarray(hashes).shape[0])
        if not np.asarray(hashes).shape[0]:
            return
        pos = self._positions(hashes).reshape(-1)
        np.bitwise_or.at(self.bits, (pos >> np.uint64(3)).astype(np.int64),
                         np.left_shift(np.uint8(1), (pos & np.uint64(7)).astype(np.uint8)))

    def contains_hashes(self, hashes: np.ndarray) -> np.ndarray:
        """Vectorized membership: True = probably present, False = definitely
        absent (no false negatives)."""
        h = np.asarray(hashes)
        if h.shape[0] == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(h)
        byte = self.bits[(pos >> np.uint64(3)).astype(np.int64)]
        bit = np.left_shift(np.uint8(1), (pos & np.uint64(7)).astype(np.uint8))
        return ((byte & bit) != 0).all(axis=1)

    def merge(self, other: "BloomFilter") -> None:
        if (other.m_bits, other.k) != (self.m_bits, self.k):
            raise ValueError("cannot merge Bloom filters with different (m, k)")
        np.bitwise_or(self.bits, other.bits, out=self.bits)
        self.count_additions += other.count_additions

    def fill_count(self) -> int:
        return int(np.unpackbits(self.bits).sum())

    def estimate_cardinality(self) -> int:
        """Swamidass–Baldi: n ~ -(m/k) ln(1 - X/m), X = set bits."""
        x = self.fill_count()
        if x == 0:
            return 0
        if x >= self.m_bits:
            return int(round(self.m_bits / self.k * math.log(self.m_bits)))  # saturated
        return int(round(-self.m_bits / self.k * math.log(1.0 - x / self.m_bits)))

    def fpr(self) -> float:
        """Current false-positive probability from the actual fill ratio."""
        return (self.fill_count() / self.m_bits) ** self.k

    def to_bytes(self) -> bytes:
        return (WIRE_MAGIC + struct.pack("<BBiiQ", WIRE_VERSION, 0, self.m_bits.bit_length() - 1,
                                         self.k, self.count_additions & ((1 << 64) - 1))
                + self.bits.tobytes())

    @classmethod
    def from_bytes(cls, blob: bytes) -> "BloomFilter":
        if blob[:2] != WIRE_MAGIC:
            raise ValueError("not a Bloom filter blob")
        version, _pad, log_m, k, count_additions = unpack(
            "<BBiiQ", blob, 2, "Bloom")
        if version > WIRE_VERSION:
            raise ValueError(f"incompatible Bloom wire version {version}")
        if not 3 <= log_m <= 40 or not 1 <= k <= 64:
            raise ValueError("invalid Bloom parameters")
        m_bits = 1 << log_m
        off = 2 + struct.calcsize("<BBiiQ")
        if len(blob) - off != m_bits // 8:
            raise ValueError("Bloom payload length mismatch")
        bits = read_array(blob, np.uint8, m_bits // 8, off, "Bloom").copy()
        return cls(m_bits=m_bits, k=k, bits=bits, count_additions=count_additions)

    def __eq__(self, other: object) -> bool:
        if not isinstance(other, BloomFilter):
            return NotImplemented
        return (self.m_bits == other.m_bits and self.k == other.k
                and bool(np.array_equal(self.bits, other.bits))
                and self.count_additions == other.count_additions)

    __hash__ = None  # type: ignore[assignment]
