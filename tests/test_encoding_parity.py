"""Pandas-path vs Arrow-path encoding/hash parity.

build_partials has two stage-1 implementations (mapInPandas and mapInArrow);
a hash mismatch between them would silently change sketches when specs or
Spark versions flip the path. Pin byte-level agreement per element type, and
pin the scalar encodings against the reference's Add overloads."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from sketchlib.encoding import arrow_flat_bytes, encode_scalar
from sketchlib.hashing import murmur3_64, murmur3_64_flat


def _hash_arrow(arr):
    flat, offsets = arrow_flat_bytes(arr)
    return murmur3_64_flat(flat, offsets)


def _hash_pandas(series):
    from sketchlib.spark.aggregate import hash_series

    return hash_series(series)


class TestPathParity:
    def test_string(self):
        vals = ["", "a", "héllo wörld", "日本語テキスト", "x" * 500]
        a = _hash_arrow(pa.array(vals, type=pa.string()))
        p = _hash_pandas(pd.Series(vals))
        assert np.array_equal(a, p)
        # and equals the scalar reference path
        for v, h in zip(vals, a.tolist()):
            assert murmur3_64(v.encode("utf-8")) == h

    def test_large_string(self):
        vals = ["alpha", "beta"]
        a = _hash_arrow(pa.array(vals, type=pa.large_string()))
        assert a.tolist() == [murmur3_64(v.encode()) for v in vals]

    def test_binary(self):
        vals = [b"", b"\x00\x01", b"\xff" * 33]
        a = _hash_arrow(pa.array(vals, type=pa.binary()))
        p = _hash_pandas(pd.Series(vals))
        assert np.array_equal(a, p)

    @pytest.mark.parametrize("pa_type,np_dtype", [
        (pa.int64(), np.int64), (pa.int32(), np.int32),
    ])
    def test_integers(self, pa_type, np_dtype):
        vals = [0, 1, -1 if not pa_type.equals(pa.uint64()) else 1, 2**30]
        a = _hash_arrow(pa.array(vals, type=pa_type))
        p = _hash_pandas(pd.Series(np.asarray(vals, dtype=np_dtype)))
        assert np.array_equal(a, p)

    def test_int_width_matters(self):
        """int32 and int64 encodings differ (4 vs 8 LE bytes), matching the
        reference's distinct Add(int)/Add(long) overloads."""
        a32 = _hash_arrow(pa.array([7], type=pa.int32()))
        a64 = _hash_arrow(pa.array([7], type=pa.int64()))
        assert a32[0] != a64[0]
        assert a32[0] == murmur3_64((7).to_bytes(4, "little"))
        assert a64[0] == murmur3_64((7).to_bytes(8, "little"))

    @pytest.mark.parametrize("pa_type,np_dtype", [
        (pa.float64(), np.float64), (pa.float32(), np.float32),
    ])
    def test_floats(self, pa_type, np_dtype):
        vals = [0.0, -1.5, 3.14159, float("inf")]
        a = _hash_arrow(pa.array(vals, type=pa_type))
        p = _hash_pandas(pd.Series(np.asarray(vals, dtype=np_dtype)))
        assert np.array_equal(a, p)
        assert a[1] == murmur3_64(np.asarray([-1.5], dtype=np_dtype).tobytes())

    def test_timestamp(self):
        ts = pd.Series([pd.Timestamp("2026-01-01 00:00:00"),
                        pd.Timestamp("2026-01-02 03:04:05.123456")])
        a = _hash_arrow(pa.array(ts, type=pa.timestamp("us")))
        p = _hash_pandas(pd.Series(ts))
        assert np.array_equal(a, p)

    def test_null_rejected(self):
        with pytest.raises(ValueError):
            arrow_flat_bytes(pa.array(["a", None]))

    def test_sliced_array_offsets(self):
        """Arrow arrays arriving as slices (non-zero offset) must hash the
        same values as unsliced arrays."""
        arr = pa.array(["aa", "bb", "cc", "dd"])
        assert np.array_equal(_hash_arrow(arr.slice(1, 2)),
                              _hash_arrow(pa.array(["bb", "cc"])))


class TestScalarEncodings:
    def test_reference_add_overload_encodings(self):
        assert encode_scalar("abc") == b"abc"
        assert encode_scalar(b"\x01") == b"\x01"
        assert encode_scalar(5) == (5).to_bytes(8, "little")
        assert encode_scalar(-5) == (-5).to_bytes(8, "little", signed=True)
        assert encode_scalar(1.5) == np.float64(1.5).tobytes()
        with pytest.raises(TypeError):
            encode_scalar(True)
