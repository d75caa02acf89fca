"""HyperLogLog sketch with direct-count / sparse / dense lifecycle.

Semantics-identical re-implementation (batch-vectorized, numpy) of the
reference ``CardinalityEstimation.CardinalityEstimator`` (C#):

* three-mode lifecycle: exact direct counting up to 100 element hashes
  (``HllConstants.cs:42``), sparse registers until ``m//15 - 10`` non-zero
  entries (``CardinalityEstimator.cs:290``), then dense ``uint8[m]``;
* estimator: HLL raw estimate with alpha_m (``HllConstants.cs:85-98``),
  Heule et al. empirical bias correction for E <= 5m
  (``CardinalityEstimator.cs:578-581``), LinearCounting below the
  sub-algorithm-selection threshold (``HllConstants.cs:106-127``,
  ``CardinalityEstimator.cs:584-599``);
* register index = top p bits of the 64-bit hash; rank sigma = leading zeros
  within the low 64-p bits, plus one (``CardinalityEstimator.cs:768-769,
  801-814``);
* merge = register-wise max, with direct/sparse/dense mode reconciliation
  (``CardinalityEstimator.cs:615-685``);
* wire format v3.1 (``CardinalityEstimatorSerializer.cs:125-165``) with the
  deserialize-replay rule (``CardinalityEstimator.cs:297-307``), so blobs are
  interchangeable with the reference — with one strengthening: we write the
  direct-hash set and sparse registers in *sorted* order, making the
  serialization canonical (the C# HashSet/Dictionary iteration order is
  nondeterministic).  Canonical bytes back the bit-for-bit merge
  associativity/commutativity tests the north rule demands.

Representation note: registers are *always* kept as a dense ``uint8[m]``
in memory (16 KB at p=14) plus an ``is_sparse`` flag; "sparse" affects only
serialization layout and the promotion bookkeeping.  Because every inserted
rank is >= 1, the reference's sparse-dict entry count always equals the number
of non-zero registers, so mode transitions land at identical points.
"""

from __future__ import annotations

import math
import struct
from dataclasses import dataclass, field

import numpy as np

from . import _bias_tables
from .hashing import HASHES, murmur3_64_flat, to_flat_bytes

DIRECT_COUNTER_MAX_ELEMENTS = 100  # HllConstants.cs:42
WIRE_MAJOR = 3  # CardinalityEstimatorSerializer.cs:54
WIRE_MINOR = 1

_RAW_ESTIMATE = {p: np.asarray(v, dtype=np.float64) for p, v in _bias_tables.RAW_ESTIMATE.items()}
_BIAS_DATA = {p: np.asarray(v, dtype=np.float64) for p, v in _bias_tables.BIAS_DATA.items()}

_INV_POW2 = 2.0 ** -np.arange(65, dtype=np.float64)  # HllConstants.cs:56-78

# LinearCounting-vs-HLL selection thresholds (HllConstants.cs:106-127)
_THRESHOLD = {
    4: 10.0, 5: 20.0, 6: 40.0, 7: 80.0, 8: 220.0, 9: 400.0, 10: 900.0,
    11: 1800.0, 12: 3100.0, 13: 6500.0, 14: 11500.0, 15: 20000.0,
    16: 50000.0, 17: 120000.0, 18: 350000.0,
}


def alpha_m(m: int) -> float:
    """HLL alpha constant (HllConstants.cs:85-98)."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def correct_bias(value: float, p: int) -> float:
    """Bias-corrected estimate, clamped at zero (BiasCorrection.cs:112-172).

    Linear interpolation into the empirical tables; clamps to the first/last
    bias value outside the table range, exactly like the reference's
    binary-search + Last()/First() logic.
    """
    raw = _RAW_ESTIMATE[p]
    bias = _BIAS_DATA[p]
    i = int(np.searchsorted(raw, value, side="left"))
    if i < len(raw) and raw[i] == value:
        b = float(bias[i])
    elif i >= len(raw):
        b = float(bias[-1])
    elif i <= 0:
        b = float(bias[0])
    else:
        frac = (value - raw[i - 1]) / (raw[i] - raw[i - 1])
        b = float(bias[i - 1] + frac * (bias[i] - bias[i - 1]))
    return max(value - b, 0.0)


def get_sigma_batch(hashes: np.ndarray, bits_to_count: int) -> np.ndarray:
    """Vectorized rank: leading zeros of the low ``bits_to_count`` bits of each
    hash (within that bit width), plus one; hash==0 -> bits_to_count+1
    (CardinalityEstimator.cs:801-814)."""
    h = hashes.astype(np.uint64, copy=False)
    mask = np.uint64((1 << bits_to_count) - 1)
    x = h & mask
    # branchless bit_length via shift cascade (exact for uint64, unlike log2)
    bl = np.zeros(x.shape, dtype=np.int64)
    cur = x.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        t = cur >> np.uint64(shift)
        has = t > 0
        bl += shift * has
        cur = np.where(has, t, cur)
    bl += cur > 0  # bit_length; 0 for x == 0
    sigma = (bits_to_count + 1 - bl).astype(np.uint8)
    # x == 0 (including hash == 0): bl = 0 -> sigma = bits_to_count + 1 already
    return sigma


def get_sigma(hash_value: int, bits_to_count: int) -> int:
    return int(get_sigma_batch(np.asarray([hash_value], dtype=np.uint64), bits_to_count)[0])


@dataclass
class HllSketch:
    """Mergeable HLL sketch.  All batch inputs are ``np.uint64`` hash arrays —
    hashing and element encoding live in :mod:`sketchlib.hashing` /
    :mod:`sketchlib.encoding` so this class stays a pure register algebra."""

    p: int = 14
    use_direct_counting: bool = True
    registers: np.ndarray = field(default=None)  # type: ignore[assignment]
    direct: np.ndarray | None = None  # sorted unique uint64 hashes, or None
    is_sparse: bool = True
    count_additions: int = 0

    def __post_init__(self) -> None:
        if not 4 <= self.p <= 16:
            raise ValueError(f"p must be in [4, 16], got {self.p}")
        self.m = 1 << self.p
        self.bits_for_hll = 64 - self.p
        self.sparse_max_elements = max(0, self.m // 15 - 10)
        if self.registers is None:
            self.registers = np.zeros(self.m, dtype=np.uint8)
        if self.direct is None and self.use_direct_counting:
            self.direct = np.zeros(0, dtype=np.uint64)
        if self.sparse_max_elements <= 0:
            self.is_sparse = False

    # -- build ---------------------------------------------------------------

    def add_hashes(self, hashes: np.ndarray) -> None:
        """Batch insert of element hashes (vectorized AddElementHash,
        CardinalityEstimator.cs:755-788)."""
        h = np.ascontiguousarray(hashes, dtype=np.uint64)
        self.count_additions += int(h.shape[0])
        if h.shape[0] == 0:
            return
        if self.direct is not None:
            self.direct = np.union1d(self.direct, h)
            if self.direct.shape[0] > DIRECT_COUNTER_MAX_ELEMENTS:
                self.direct = None
        idx = (h >> np.uint64(self.bits_for_hll)).astype(np.int64)
        sigma = get_sigma_batch(h, self.bits_for_hll)
        np.maximum.at(self.registers, idx, sigma)
        self._maybe_promote()

    def add(self, *elements) -> None:
        """Convenience scalar/list add of raw byte strings (tests only; the
        Spark hot path hashes whole Arrow batches)."""
        vals = [e if isinstance(e, bytes) else str(e).encode("utf-8") for e in elements]
        flat, offsets = to_flat_bytes(vals)
        self.add_hashes(murmur3_64_flat(flat, offsets))

    def _maybe_promote(self) -> None:
        if self.is_sparse and int(np.count_nonzero(self.registers)) > self.sparse_max_elements:
            self.is_sparse = False

    # -- estimate ------------------------------------------------------------

    def count(self) -> int:
        """Estimate distinct count (CardinalityEstimator.cs:542-600)."""
        if self.direct is not None:
            return int(self.direct.shape[0])
        counts = np.bincount(self.registers, minlength=65)
        z_inverse = float(counts @ _INV_POW2[: counts.shape[0]])
        v = float(counts[0])
        m = float(self.m)
        e = alpha_m(self.m) * m * m / z_inverse
        if e <= 5.0 * m:
            e = correct_bias(e, self.p)
        if v > 0:
            h = m * math.log(m / v)
        else:
            h = e
        if h <= _THRESHOLD[self.p]:
            return _round_half_even(h)
        return _round_half_even(e)

    # -- merge ---------------------------------------------------------------

    def merge(self, other: "HllSketch") -> None:
        """In-place union merge (CardinalityEstimator.cs:615-685)."""
        if other.m != self.m:
            raise ValueError("cannot merge sketches with different precision")
        self.count_additions += other.count_additions
        np.maximum(self.registers, other.registers, out=self.registers)
        if self.is_sparse and other.is_sparse:
            self._maybe_promote()
        else:
            self.is_sparse = False
        if other.direct is not None:
            if self.direct is not None:
                self.direct = np.union1d(self.direct, other.direct)
                if self.direct.shape[0] > DIRECT_COUNTER_MAX_ELEMENTS:
                    self.direct = None
        else:
            self.direct = None

    def copy(self) -> "HllSketch":
        s = HllSketch(
            p=self.p,
            use_direct_counting=self.direct is not None,
            registers=self.registers.copy(),
            direct=None if self.direct is None else self.direct.copy(),
            is_sparse=self.is_sparse,
            count_additions=self.count_additions,
        )
        return s

    @staticmethod
    def merge_all(sketches) -> "HllSketch | None":
        """Fold-merge, null-safe (static Merge, CardinalityEstimator.cs:704-730)."""
        result = None
        for s in sketches:
            if s is None:
                continue
            if result is None:
                result = s.copy()
            else:
                result.merge(s)
        return result

    # -- serialization (wire format v3.1) --------------------------------------

    def to_bytes(self) -> bytes:
        """Canonical v3.1 blob (CardinalityEstimatorSerializer.cs:125-165):
        u16 major, u16 minor, i32 bitsPerIndex, u8 flags(isSparse<<1|isDirect),
        payload, u64 countAdditions — all little-endian; direct hashes and
        sparse entries written in ascending order (canonical)."""
        parts = [struct.pack("<HHiB", WIRE_MAJOR, WIRE_MINOR, self.p,
                             ((1 if self.is_sparse else 0) << 1) | (1 if self.direct is not None else 0))]
        if self.direct is not None:
            parts.append(struct.pack("<i", self.direct.shape[0]))
            parts.append(np.sort(self.direct).astype("<u8").tobytes())
        elif self.is_sparse:
            nz = np.nonzero(self.registers)[0]
            parts.append(struct.pack("<i", nz.shape[0]))
            entries = np.empty(nz.shape[0], dtype=[("idx", "<u2"), ("rank", "u1")])
            entries["idx"] = nz.astype(np.uint16)
            entries["rank"] = self.registers[nz]
            parts.append(entries.tobytes())
        else:
            parts.append(struct.pack("<i", self.m))
            parts.append(self.registers.astype(np.uint8).tobytes())
        parts.append(struct.pack("<Q", self.count_additions & ((1 << 64) - 1)))
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, blob: bytes) -> "HllSketch":
        """Parse a v2.x/v3.x blob with the reference's hardening checks
        (CardinalityEstimatorSerializer.cs:257-326) and the direct-count
        replay rule (CardinalityEstimator.cs:297-307)."""
        off = 0
        major, minor = struct.unpack_from("<HH", blob, off)
        off += 4
        if major > WIRE_MAJOR:
            raise ValueError(f"incompatible wire format version {major}.{minor}")
        if major == 2:
            off += 1  # v2 hash-function id byte; hash is caller-supplied here
        elif major < 2:
            pass  # v1: FNV-1a implied; format otherwise compatible
        (p,) = struct.unpack_from("<i", blob, off)
        off += 4
        if not 4 <= p <= 16:
            raise ValueError(f"invalid bitsPerIndex {p}")
        m = 1 << p
        (flags,) = struct.unpack_from("<B", blob, off)
        off += 1
        is_sparse = bool(flags & 2)
        is_direct = bool(flags & 1)

        direct = None
        registers = np.zeros(m, dtype=np.uint8)
        if is_direct:
            (n,) = struct.unpack_from("<i", blob, off)
            off += 4
            if not 0 <= n <= DIRECT_COUNTER_MAX_ELEMENTS:
                raise ValueError(f"invalid direct count {n}")
            direct = np.frombuffer(blob, dtype="<u8", count=n, offset=off).astype(np.uint64)
            off += 8 * n
        elif is_sparse:
            (n,) = struct.unpack_from("<i", blob, off)
            off += 4
            if not 0 <= n <= m:
                raise ValueError(f"invalid sparse count {n}")
            entries = np.frombuffer(blob, dtype=[("idx", "<u2"), ("rank", "u1")], count=n, offset=off)
            off += 3 * n
            idx = entries["idx"].astype(np.int64)
            if n and int(idx.max()) >= m:
                raise ValueError("sparse index out of range")
            np.maximum.at(registers, idx, entries["rank"])
        else:
            (n,) = struct.unpack_from("<i", blob, off)
            off += 4
            if n != m:
                raise ValueError(f"dense length {n} != m {m}")
            registers = np.frombuffer(blob, dtype=np.uint8, count=n, offset=off).copy()
            off += n
        count_additions = 0
        if (major, minor) >= (2, 1):
            (count_additions,) = struct.unpack_from("<Q", blob, off)
            off += 8

        sketch = cls(p=p, use_direct_counting=False, registers=registers,
                     direct=None, is_sparse=is_sparse, count_additions=0)
        sketch.count_additions = int(count_additions)
        if direct is not None:
            # replay rule: a direct-mode blob stores only the <=100 hashes;
            # registers are reconstructed by re-inserting them, starting from
            # a fresh sparse state (CardinalityEstimator.cs:297-307)
            sketch.registers = np.zeros(m, dtype=np.uint8)
            sketch.is_sparse = sketch.sparse_max_elements > 0
            sketch.direct = np.unique(direct)
            idx = (sketch.direct >> np.uint64(sketch.bits_for_hll)).astype(np.int64)
            sigma = get_sigma_batch(sketch.direct, sketch.bits_for_hll)
            np.maximum.at(sketch.registers, idx, sigma)
            sketch._maybe_promote()
        return sketch

    # -- equality / canonical state -------------------------------------------

    def state_tuple(self):
        return (
            self.p,
            self.is_sparse,
            None if self.direct is None else tuple(np.sort(self.direct).tolist()),
            self.registers.tobytes(),
            self.count_additions,
        )

    def __eq__(self, other: object) -> bool:  # type: ignore[override]
        if not isinstance(other, HllSketch):
            return NotImplemented
        return self.state_tuple() == other.state_tuple()


def _round_half_even(x: float) -> int:
    """C# Math.Round default = banker's rounding = Python round()."""
    return int(round(x))


def hll_from_values(values, p: int = 14, hash_name: str = "murmur3",
                    use_direct_counting: bool = True) -> HllSketch:
    """Build a sketch from an iterable of byte strings (test convenience)."""
    scalar, flat_fn = HASHES[hash_name]
    sketch = HllSketch(p=p, use_direct_counting=use_direct_counting)
    vals = [v if isinstance(v, bytes) else str(v).encode("utf-8") for v in values]
    flat, offsets = to_flat_bytes(vals)
    sketch.add_hashes(flat_fn(flat, offsets))
    return sketch
