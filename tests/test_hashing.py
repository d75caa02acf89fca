"""Hash goldens from the reference test-suite + batch/scalar agreement.

Reference parity: Test/Hash/Murmur3Tests.cs:37-40, Test/Hash/Fnv1ATests.cs:38-40.
"""

import random

import numpy as np
import pytest

from sketchlib.hashing import (
    fnv1a_64,
    fnv1a_64_batch,
    murmur3_64,
    murmur3_64_batch,
    to_flat_bytes,
)


@pytest.mark.parametrize(
    "data,expected",
    [
        (b"", 0),
        (bytes([1, 2, 3, 4, 5]), 18344466521425217038),
        (bytes([255, 255, 255, 255]), 4889297221962843713),
    ],
)
def test_murmur3_goldens(data, expected):
    assert murmur3_64(data) == expected
    assert int(murmur3_64_batch([data])[0]) == expected


@pytest.mark.parametrize(
    "data,expected",
    [
        (b"", 14695981039346656037),
        (bytes([1, 2, 3, 4, 5]), 1109817072422714760),
        (bytes([255, 255, 255, 255]), 11047178588169845073),
    ],
)
def test_fnv1a_goldens(data, expected):
    assert fnv1a_64(data) == expected
    assert int(fnv1a_64_batch([data])[0]) == expected


def test_batch_matches_scalar_all_lengths():
    rng = random.Random(7)
    vals = [bytes(rng.randrange(256) for _ in range(n))
            for n in [0, 1, 7, 8, 9, 15, 16, 17, 23, 24, 31, 32, 33, 127, 128, 129, 1000]]
    vals += [rng.randbytes(rng.randrange(0, 300)) for _ in range(400)]
    got_m = murmur3_64_batch(vals)
    want_m = np.array([murmur3_64(v) for v in vals], dtype=np.uint64)
    np.testing.assert_array_equal(got_m, want_m)
    got_f = fnv1a_64_batch(vals)
    want_f = np.array([fnv1a_64(v) for v in vals], dtype=np.uint64)
    np.testing.assert_array_equal(got_f, want_f)


def test_batch_order_independent_of_length_sorting():
    vals = [b"a" * 100, b"b", b"c" * 50, b"", b"d" * 17]
    got = murmur3_64_batch(vals)
    for i, v in enumerate(vals):
        assert int(got[i]) == murmur3_64(v)


def test_to_flat_bytes_roundtrip():
    vals = [b"abc", b"", b"defgh"]
    flat, offsets = to_flat_bytes(vals)
    assert offsets.tolist() == [0, 3, 3, 8]
    assert bytes(flat.tobytes()) == b"abcdefgh"


def test_empty_batch():
    assert murmur3_64_batch([]).shape == (0,)
    assert fnv1a_64_batch([]).shape == (0,)
