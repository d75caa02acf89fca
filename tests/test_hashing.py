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


class TestXxh3_128:
    """XXH3-128 parity with the reference's default hash
    (CardinalityEstimator.cs:212: BitConverter.ToUInt64(XxHash128.Hash(x))).
    Goldens below were generated from the system libxxhash 0.8.1 (the
    upstream reference implementation); inputs reconstruct deterministically.
    """

    # (input or None, length, low64, high64); None -> pattern input below
    GOLDEN = [
        (b"", 0, 0x6001C324468D497F, 0x99AA06D3014798D8),
        (b"a", 1, 0xE6C632B61E964E1F, 0xA96FAF705AF16834),
        (b"ab", 2, 0xA873719C24D5735C, 0x89C65EBC828EEBAC),
        (b"abc", 3, 0x78AF5F94892F3950, 0x06B05AB6733A6185),
        (b"abcd", 4, 0x1BE79EECD1B1353D, 0x8D6B60383DFA90C2),
        (b"hello!", 6, 0x167E9D145D84F4BF, 0xA2D23F15EC80BA8A),
        (b"12345678", 8, 0x2B3F7D2855DC91FC, 0x155C340CCFFD12DC),
        (b"123456789", 9, 0xE9716427681D5860, 0x33119477EDE5DCD5),
        (b"0123456789abcdef", 16, 0x0BEFB4873DBE58F8, 0xCCBA8085A0434E9E),
        (b"https://example.com/path?q=1", 28, 0xAC2725E9EC96F751, 0x28C47CEA0628B27B),
        (None, 64, 0xAC7D730B79AE9428, 0x445CABAF9820E986),
        (None, 128, 0x7813452547AB9912, 0xFD990D088A9365AE),
        (None, 129, 0x23521396C7B8FD20, 0xBB7C9D33213620AB),
        (None, 200, 0x661514BE62296C9C, 0x833CF59A501AE2A8),
        (None, 240, 0xDC6070E1C666A217, 0x131D6BF413B4BEF2),
        (None, 241, 0xC9B6E99DE4449036, 0xBF2133F5B80F3682),
        (None, 1024, 0x4DD067F3FA10DF7E, 0x10C7DBECB6E1C688),
        (None, 1025, 0x1453E498EAEFA851, 0x59DB176102B749F5),
        (None, 1280, 0x4844B009E164352E, 0xD92AB3A1CB0542A7),
    ]

    @staticmethod
    def _pattern(length):
        if length in (64, 128):
            return b"x" * length
        if length in (129, 200, 240):
            return b"y" * length
        if length in (241, 1024, 1025):
            return b"z" * length
        return (bytes(range(256)) * 5)[:length]

    def test_golden_vectors(self):
        from sketchlib.xxh3 import xxh3_128_flat

        vals = [v if v is not None else self._pattern(ln)
                for v, ln, _, _ in self.GOLDEN]
        flat = np.frombuffer(b"".join(vals), dtype=np.uint8)
        offs = np.zeros(len(vals) + 1, dtype=np.int64)
        np.cumsum([len(v) for v in vals], out=offs[1:])
        lo, hi = xxh3_128_flat(flat, offs)
        for i, (_, ln, glo, ghi) in enumerate(self.GOLDEN):
            assert int(lo[i]) == glo and int(hi[i]) == ghi, (ln, hex(int(lo[i])), hex(int(hi[i])))

    def test_net_hash_is_byteswapped_high64(self):
        """BitConverter.ToUInt64 over the canonical big-endian digest reads
        the high64 byte-reversed."""
        from sketchlib.xxh3 import xxh128_net

        # empty: high64 = 0x99AA06D3014798D8 -> bswap = 0xD8984701D306AA99
        assert xxh128_net(b"") == 0xD8984701D306AA99

    def test_cross_check_against_libxxhash(self):
        """Bit-exact vs the system xxHash reference implementation across
        random lengths spanning every length class (skips if absent)."""
        import ctypes
        import random

        try:
            lib = ctypes.CDLL("libxxhash.so.0")
        except OSError:
            pytest.skip("libxxhash not available")

        class XXH128(ctypes.Structure):
            _fields_ = [("low64", ctypes.c_uint64), ("high64", ctypes.c_uint64)]

        lib.XXH3_128bits.restype = XXH128
        lib.XXH3_128bits.argtypes = [ctypes.c_char_p, ctypes.c_size_t]
        from sketchlib.xxh3 import xxh3_128_flat

        rng = random.Random(7)
        vals = [rng.randbytes(rng.choice([0, 1, 2, 3, 5, 8, 12, 16, 20, 40,
                                          100, 128, 129, 160, 240, 241, 300,
                                          1000, 1024, 2048, 4096]))
                for _ in range(400)]
        flat = np.frombuffer(b"".join(vals), dtype=np.uint8)
        offs = np.zeros(len(vals) + 1, dtype=np.int64)
        np.cumsum([len(v) for v in vals], out=offs[1:])
        lo, hi = xxh3_128_flat(flat, offs)
        for i, v in enumerate(vals):
            h = lib.XXH3_128bits(v, len(v))
            assert (int(lo[i]), int(hi[i])) == (h.low64, h.high64), len(v)

    def test_registered_in_hashes(self):
        from sketchlib.hashing import HASHES

        scalar, flat_fn = HASHES["xxhash128"]
        v = b"example element"
        flat = np.frombuffer(v, dtype=np.uint8)
        offs = np.array([0, len(v)], dtype=np.int64)
        assert scalar(v) == int(flat_fn(flat, offs)[0])
