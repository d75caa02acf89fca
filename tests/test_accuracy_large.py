"""Large-cardinality statistical accuracy, mirroring the reference's
RunTest harness (Test/CardinalityEstimatorTests.cs:465-510): estimate within
maxAcceptedError = 10 x stdError of the true cardinality, stdError =
1.04/sqrt(2^b), across precisions and up to n = 10^7 (10^8 variant gated
behind SKETCHLIB_SLOW=1 to keep CI fast)."""

import os

import numpy as np
import pytest

from sketchlib.hll import HllSketch

_CHUNK = 1 << 20


def _sequential_u64(n: int) -> np.ndarray:
    """n 64-bit hashes drawn uniformly over the FULL 2^64 space (the top p bits
    index registers — a bounded draw would leave registers empty and break
    LinearCounting); collisions are negligible at n<=1e8."""
    rng = np.random.default_rng(99)
    return rng.integers(0, 2**64, size=n, dtype=np.uint64)


@pytest.mark.parametrize("p,n", [
    (4, 100_000),
    (12, 1_000_000),
    (14, 10_000_000),
    (16, 1_000_000),
])
def test_accuracy_large(p, n):
    sk = HllSketch(p=p)
    vals = _sequential_u64(n)
    true_n = np.unique(vals).shape[0]
    for i in range(0, n, _CHUNK):
        sk.add_hashes(vals[i:i + _CHUNK])
    std_err = 1.04 / (2 ** p) ** 0.5
    assert abs(sk.count() - true_n) / true_n <= 10 * std_err
    assert sk.count_additions == n


@pytest.mark.skipif(os.environ.get("SKETCHLIB_SLOW") != "1",
                    reason="10^8-element run; set SKETCHLIB_SLOW=1")
def test_accuracy_1e8_p14():
    sk = HllSketch(p=14)
    n = 100_000_000
    rng = np.random.default_rng(7)
    for _ in range(n // _CHUNK):
        sk.add_hashes(rng.integers(0, 2**64, size=_CHUNK, dtype=np.uint64))
    added = (n // _CHUNK) * _CHUNK
    # collisions negligible at 1e8 of 2^63
    assert abs(sk.count() - added) / added <= 10 * (1.04 / 2 ** 7)
