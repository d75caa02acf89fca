"""DDSketch: fully-mergeable quantile sketch with RELATIVE-error guarantees
(Masson, Rim & Lee, "DDSketch: a fast and fully-mergeable quantile sketch
with relative-error guarantees", VLDB 2019).

Where KLL/t-digest bound the RANK error, DDSketch bounds the VALUE error:
``|q_est - q_true| <= alpha * q_true`` for every quantile — the guarantee
you want on long-tailed web-corpus distributions (document lengths, latency,
prices) where the p99 is orders of magnitude above the median and a rank
guarantee says nothing useful about its value.

Design (deliberately the *non-collapsing* variant):

* bucket of a positive value x is ``i = ceil(log(x) / log(gamma))`` with
  ``gamma = (1 + alpha) / (1 - alpha)``; every value in bucket i is within
  alpha of the representative ``2 * gamma^i / (gamma + 1)`` (the paper's
  midpoint estimator).
* state is a dict of non-empty buckets plus a zero-count and a mirrored
  negative store — merge is bucket-wise count addition, which is
  associative, commutative, and BIT-IDENTICAL under any partitioning or
  merge tree (the north rule's merge requirement).  The paper's collapsing
  variant trades that for a hard memory cap: which buckets get collapsed
  depends on arrival order, so two different partitionings of the same
  input can produce different bytes.  We keep exactness of the bucket
  histogram instead: the bucket count is bounded by the DATA RANGE, not the
  data size — ``log_gamma(max/min)`` buckets, e.g. alpha=0.01 over a
  12-decade positive range is <= 1368 buckets (~16 KB) no matter whether
  the input is 1 row or 10^12, so the blob stays executor-friendly at
  100 TB scale.  ``max_buckets`` is an overflow GUARD (raise, don't
  silently collapse) for adversarial ranges.

The closed-form bucket function is the whole correctness story: an external
engine (the DuckDB oracle, a future Scala port) reproduces the sketch's
quantile answers exactly from ``CEIL(LN(x) / LN(gamma))`` — no simulation
of insertion order required.  Compare t-digest, whose centroids depend on
input order.
"""

from __future__ import annotations

import math
import struct

import numpy as np
from ._wire import read_array, unpack

WIRE_MAGIC = b"DD"
WIRE_VERSION = 1

#: overflow guard: alpha=0.01 covers ~40 decades at this many buckets
DEFAULT_MAX_BUCKETS = 4096


class DDSketch:
    """Mergeable relative-error quantile sketch over float64 values.

    ``alpha`` is the relative accuracy: quantile estimates satisfy
    ``|est - true| <= alpha * |true|`` (values at or below
    ``min_positive`` in magnitude are indistinguishable from 0 and land in
    the zero bucket — the paper's floor on the bucket index).
    """

    __slots__ = ("alpha", "gamma", "min_positive", "max_buckets",
                 "pos", "neg", "zero_count", "count_additions",
                 "_log_gamma")

    def __init__(self, alpha: float = 0.01, min_positive: float = 1e-9,
                 max_buckets: int = DEFAULT_MAX_BUCKETS) -> None:
        if not 0.0 < alpha < 1.0:
            raise ValueError(f"alpha must be in (0, 1), got {alpha}")
        # the strict form rejects NaN too ("NaN <= 0.0" is False, so the old
        # "<= 0.0" guard let NaN through — including from the wire — yielding
        # a sketch that can never merge (NaN != NaN in the compat tuple))
        if not (min_positive > 0.0 and math.isfinite(min_positive)):
            raise ValueError("min_positive must be finite and > 0")
        self.alpha = float(alpha)
        self.gamma = (1.0 + alpha) / (1.0 - alpha)
        self._log_gamma = math.log(self.gamma)
        self.min_positive = float(min_positive)
        self.max_buckets = int(max_buckets)
        self.pos: dict[int, int] = {}
        self.neg: dict[int, int] = {}
        self.zero_count = 0
        self.count_additions = 0

    # -- build -----------------------------------------------------------------

    def _indices(self, magnitudes: np.ndarray) -> np.ndarray:
        """Bucket indices for strictly-positive magnitudes (vectorized;
        identical to ``ceil(log(x)/log(gamma))`` evaluated per value)."""
        return np.ceil(np.log(magnitudes) / self._log_gamma).astype(np.int64)

    def _bucket_cap_error(self) -> ValueError:
        return ValueError(
            f"DDSketch exceeded max_buckets={self.max_buckets}; the data "
            f"range spans more than alpha={self.alpha} resolves — raise "
            f"max_buckets or alpha")

    def add_values(self, values: np.ndarray) -> None:
        """Ingest a batch.  Validates the bucket cap BEFORE mutating any
        state: a raising add must leave the sketch exactly as it was (else
        count_additions disagrees with the bucket totals and the
        re-serialized blob fails its own consistency check)."""
        v = np.asarray(values, dtype=np.float64)
        # skip NaN *and* ±inf: log(inf) would otherwise overflow the int64
        # bucket index (np.ceil(inf).astype(int64) wraps to INT64_MIN) and
        # silently corrupt every quantile
        v = v[np.isfinite(v)]
        if v.shape[0] == 0:
            return
        mag = np.abs(v)
        tiny = mag <= self.min_positive
        p = v[(v > 0) & ~tiny]
        n = v[(v < 0) & ~tiny]
        staged = []
        for store, vals in ((self.pos, p), (self.neg, n)):
            if vals.shape[0] == 0:
                continue
            idx, counts = np.unique(self._indices(np.abs(vals)),
                                    return_counts=True)
            items = list(zip(idx.tolist(), counts.tolist()))
            grown = len(store) + sum(1 for i, _ in items if i not in store)
            if grown > self.max_buckets:
                raise self._bucket_cap_error()
            staged.append((store, items))
        for store, items in staged:
            for i, c in items:
                store[i] = store.get(i, 0) + c
        self.count_additions += int(v.shape[0])
        self.zero_count += int(np.count_nonzero(tiny))

    # -- merge -----------------------------------------------------------------

    def merge(self, other: "DDSketch") -> None:
        if (other.alpha, other.min_positive) != (self.alpha, self.min_positive):
            raise ValueError("cannot merge DDSketches with different "
                             "(alpha, min_positive)")
        # the permissive cap wins so merge order can't affect whether a
        # legal union of buckets is accepted; keep it in a local until every
        # check passes (no-partial-state rule — a raising merge must not
        # loosen the overflow guard)
        cap = max(self.max_buckets, other.max_buckets)
        for store, ostore in ((self.pos, other.pos), (self.neg, other.neg)):
            grown = len(store) + sum(1 for i in ostore if i not in store)
            if grown > cap:
                raise ValueError("merged DDSketch exceeded max_buckets")
        self.max_buckets = cap
        for store, ostore in ((self.pos, other.pos), (self.neg, other.neg)):
            for i, c in ostore.items():
                store[i] = store.get(i, 0) + c
        self.zero_count += other.zero_count
        self.count_additions += other.count_additions

    # -- estimate ----------------------------------------------------------------

    def _value_of(self, index: int) -> float:
        return 2.0 * self.gamma ** index / (self.gamma + 1.0)

    def quantile_index(self, q: float) -> tuple[str, int]:
        """(store, bucket_index) holding the q-quantile — the integer form
        of the answer, reproducible bit-for-bit by any engine implementing
        the same closed-form bucket function.  ``store`` is one of
        ``"neg"``/``"zero"``/``"pos"`` (index is 0 for the zero store).

        Rank rule (pin it so external oracles can reproduce it): with n
        total values the target is the 1-based rank ``floor(q*(n-1)) + 1``
        — the lower nearest-rank value — scanned from the most-negative
        bucket upward."""
        if not 0.0 <= q <= 1.0:
            raise ValueError("q must be in [0, 1]")
        n = self.count_additions
        if n == 0:
            raise ValueError("empty sketch has no quantiles")
        target = int(math.floor(q * (n - 1))) + 1
        cum = 0
        for i in sorted(self.neg, reverse=True):  # most negative first
            cum += self.neg[i]
            if cum >= target:
                return "neg", i
        cum += self.zero_count
        if cum >= target:
            return "zero", 0
        for i in sorted(self.pos):
            cum += self.pos[i]
            if cum >= target:
                return "pos", i
        raise AssertionError("rank target exceeded total count")  # unreachable

    def quantile(self, q) -> float | np.ndarray:
        scalar = np.isscalar(q)
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        if np.any((qs < 0.0) | (qs > 1.0)):
            raise ValueError("q must be in [0, 1]")
        if self.count_additions == 0:  # sibling-sketch convention (KLL/t-digest)
            out = np.full(qs.shape, np.nan)
            return float(out[0]) if scalar else out
        out = np.empty(qs.shape, dtype=np.float64)
        for j, qq in enumerate(qs):
            store, i = self.quantile_index(float(qq))
            if store == "zero":
                out[j] = 0.0
            elif store == "pos":
                out[j] = self._value_of(i)
            else:
                out[j] = -self._value_of(i)
        return float(out[0]) if scalar else out

    # -- serialization -----------------------------------------------------------

    def _packed(self, store: dict[int, int]) -> bytes:
        items = sorted(store.items())  # canonical: index order
        arr = np.array(items, dtype=np.int64).reshape(-1, 2)
        return arr.astype("<i8").tobytes()

    def to_bytes(self) -> bytes:
        # max_buckets rides in the blob: a deserialize-then-continue workflow
        # (checkpoint resume, cross-task merge) must inherit the cap the
        # sketch was built with, or a legitimately-large restored sketch
        # spuriously raises on its next add/merge
        header = struct.pack("<BBddQQiii", WIRE_VERSION, 0, self.alpha,
                             self.min_positive,
                             self.count_additions & ((1 << 64) - 1),
                             self.zero_count & ((1 << 64) - 1),
                             len(self.pos), len(self.neg), self.max_buckets)
        return WIRE_MAGIC + header + self._packed(self.pos) + self._packed(self.neg)

    @classmethod
    def from_bytes(cls, blob: bytes) -> "DDSketch":
        if blob[:2] != WIRE_MAGIC:
            raise ValueError("not a DDSketch blob")
        version, _pad, alpha, min_positive, count_additions, zero_count, \
            n_pos, n_neg, max_buckets = unpack("<BBddQQiii", blob, 2,
                                               "DDSketch")
        if version > WIRE_VERSION:
            raise ValueError(f"incompatible DDSketch wire version {version}")
        if n_pos < 0 or n_neg < 0:
            raise ValueError("negative DDSketch store size")
        if max_buckets < 1 or max(n_pos, n_neg) > max_buckets:
            raise ValueError("DDSketch store size exceeds its max_buckets")
        off = 2 + struct.calcsize("<BBddQQiii")
        if len(blob) - off != 16 * (n_pos + n_neg):
            raise ValueError("DDSketch payload length mismatch")
        sk = cls(alpha=alpha, min_positive=min_positive,
                 max_buckets=max_buckets)
        for store, count in ((sk.pos, n_pos), (sk.neg, n_neg)):
            arr = read_array(blob, "<i8", 2 * count, off, "DDSketch"
                             ).reshape(-1, 2)
            off += 16 * count
            if count and int(arr[:, 1].min()) <= 0:
                raise ValueError("non-positive DDSketch bucket count")
            store.update({int(i): int(c) for i, c in arr})
            if len(store) != count:
                raise ValueError("duplicate DDSketch bucket index")
        # bucket totals must reconcile with the header counters: a corrupted
        # count_additions would otherwise surface later as an impossible
        # quantile rank instead of a parse error
        if count_additions != zero_count + sum(sk.pos.values()) + sum(
                sk.neg.values()):
            raise ValueError("DDSketch counters inconsistent with buckets")
        sk.count_additions = count_additions
        sk.zero_count = zero_count
        return sk

    def __eq__(self, other: object) -> bool:
        if not isinstance(other, DDSketch):
            return NotImplemented
        return (self.alpha, self.min_positive, self.count_additions,
                self.zero_count, self.pos, self.neg) == (
            other.alpha, other.min_positive, other.count_additions,
            other.zero_count, other.pos, other.neg)

    __hash__ = None  # type: ignore[assignment]
