"""Checked wire parsing shared by every sketch family's ``from_bytes``.

The reference hardens deserialization with explicit length/version checks
(`CardinalityEstimation/CardinalityEstimatorSerializer.cs:257-326`); the
Python analogue has two extra traps these helpers close uniformly:

* ``struct.unpack_from`` raises ``struct.error`` (NOT a ``ValueError``
  subclass) on a truncated buffer — an executor deserializing a clipped
  shuffle blob would crash the task with an exception type callers don't
  guard for;
* ``np.frombuffer(count=-1)`` silently reads the whole remaining buffer, so
  a sign-flipped element count must be rejected before it reaches numpy.

Every family's ``from_bytes`` funnels through these, so the contract
"malformed blob => ValueError, never anything else" holds library-wide
(fuzzed in ``tests/test_wire_hardening.py``).
"""

from __future__ import annotations

import struct

import numpy as np


def unpack(fmt: str, blob: bytes, off: int, family: str) -> tuple:
    """``struct.unpack_from`` that reports truncation as ``ValueError``."""
    try:
        return struct.unpack_from(fmt, blob, off)
    except struct.error as exc:
        raise ValueError(f"truncated {family} blob: {exc}") from None


def read_array(blob: bytes, dtype, count: int, off: int,
               family: str) -> np.ndarray:
    """Bounds-checked ``np.frombuffer``: rejects negative counts (numpy
    treats -1 as "rest of buffer") and short buffers with ``ValueError``."""
    if count < 0:
        raise ValueError(f"negative element count in {family} blob: {count}")
    dt = np.dtype(dtype)
    need = off + dt.itemsize * count
    if len(blob) < need:
        raise ValueError(
            f"truncated {family} blob: need {need} bytes, have {len(blob)}")
    return np.frombuffer(blob, dtype=dt, count=count, offset=off)
