"""Adversarial wire hardening across every sketch family.

The reference hardens ``Deserialize`` against malformed payloads
(`CardinalityEstimation/CardinalityEstimatorSerializer.cs` length/version
checks); an executor-side blob in a 100 TB shuffle can arrive truncated or
bit-flipped (bad disk spill, manual checkpoint surgery), and the failure mode
must be a clean ``ValueError`` — never an IndexError/struct.error/segfault or,
worse, a silently-wrong sketch that crashes later in ``merge``.

Contract checked for EVERY family's ``from_bytes`` on mutated valid blobs:

* every prefix truncation either raises ``ValueError`` or yields a sketch
  whose re-serialization round-trips (a shorter blob that happens to parse
  must still be self-consistent);
* every single-byte flip likewise raises ``ValueError`` or yields a sketch
  that can serialize, re-parse, and answer its estimator without raising
  anything but ``ValueError``;
* no other exception type escapes.
"""

import struct

import numpy as np
import pytest

from sketchlib.ams import AmsSketch
from sketchlib.bloom import BloomFilter
from sketchlib.cms import CountMinSketch
from sketchlib.cuckoo import CuckooFilter
from sketchlib.ddsketch import DDSketch
from sketchlib.hashing import murmur3_64_flat, to_flat_bytes
from sketchlib.hll import HllSketch
from sketchlib.kll import KllSketch
from sketchlib.mg import MisraGriesSketch
from sketchlib.similarity.freqdir import FrequentDirections
from sketchlib.tdigest import TDigest
from sketchlib.theta import ThetaSketch


def _hashes(n: int = 500) -> np.ndarray:
    vals = [f"doc-{i}".encode() for i in range(n)]
    flat, off = to_flat_bytes(vals)
    return murmur3_64_flat(flat, off)


def _families():
    h = _hashes()
    doubles = np.linspace(0.5, 400.0, 500)

    hll = HllSketch(p=12)
    hll.add_hashes(h)

    bloom = BloomFilter(m_bits=1 << 12, k=5)
    bloom.add_hashes(h)

    cms = CountMinSketch(width=256, depth=4)
    cms.add_hashes(h)

    td = TDigest()
    td.add_values(doubles)

    kll = KllSketch(k=64)
    kll.add_values(doubles)

    dd = DDSketch(alpha=0.01)
    dd.add_values(doubles)

    theta = ThetaSketch(k=64)
    theta.add_hashes(h)

    mg = MisraGriesSketch(k=32)
    mg.add_hashes(h)

    ams = AmsSketch(width=256, depth=3)
    ams.add_hashes(h)

    fd = FrequentDirections(ell=4, d=8)
    fd.update(np.arange(80, dtype=np.float64).reshape(10, 8))

    cuckoo = CuckooFilter(n_buckets=1 << 10)
    cuckoo.add_hashes(h)

    return {
        "hll": hll, "bloom": bloom, "cms": cms, "tdigest": td, "kll": kll,
        "ddsketch": dd, "theta": theta, "mg": mg, "ams": ams, "freqdir": fd,
        "cuckoo": cuckoo,
    }


def _probe(cls, blob: bytes) -> None:
    """from_bytes must raise ValueError or produce a usable sketch."""
    try:
        sk = cls.from_bytes(blob)
    except ValueError:
        return
    # Parsed: the sketch must be internally consistent enough to
    # re-serialize and answer its cheapest estimator.
    try:
        again = sk.to_bytes()
        cls.from_bytes(again)
        for attr in ("count", "estimate_cardinality", "quantile",
                     "f2_estimate"):
            fn = getattr(sk, attr, None)
            if fn is not None:
                fn(0.5) if attr == "quantile" else fn()
                break
    except ValueError:
        return


@pytest.mark.parametrize("name", sorted(_families()))
def test_truncations_never_crash(name):
    sk = _families()[name]
    blob = sk.to_bytes()
    cls = type(sk)
    # every prefix (dense sweep under 64 bytes, stride above)
    cuts = list(range(0, min(len(blob), 64))) + list(range(64, len(blob), 7))
    for cut in cuts:
        _probe(cls, blob[:cut])


@pytest.mark.parametrize("name", sorted(_families()))
def test_byte_flips_never_crash(name):
    sk = _families()[name]
    blob = bytearray(sk.to_bytes())
    cls = type(sk)
    rng = np.random.default_rng(42)
    # all header bytes + a deterministic sample of the payload
    idxs = list(range(min(len(blob), 24)))
    if len(blob) > 24:
        idxs += sorted(rng.choice(np.arange(24, len(blob)), size=min(
            64, len(blob) - 24), replace=False).tolist())
    for i in idxs:
        for flip in (0xFF, 0x80, 0x01):
            mutated = bytes(blob[:i]) + bytes([blob[i] ^ flip]) + bytes(blob[i + 1:])
            _probe(cls, mutated)


@pytest.mark.parametrize("name", sorted(_families()))
def test_tail_garbage_rejected_or_roundtrips(name):
    """Appending bytes must not be silently *mis*parsed: families with a
    payload-length check raise; the rest must ignore the tail exactly."""
    sk = _families()[name]
    blob = sk.to_bytes()
    cls = type(sk)
    try:
        parsed = cls.from_bytes(blob + b"\x00\x00\x00\x00")
    except ValueError:
        return
    assert parsed.to_bytes() == blob


def test_struct_error_never_escapes():
    """Even a blob that is only a magic prefix must map struct.error to
    ValueError (struct.error subclasses Exception, not ValueError)."""
    for cls, magic in [(HllSketch, b"HL"), (MisraGriesSketch, b"FI")]:
        with pytest.raises(ValueError):
            cls.from_bytes(magic)
        assert not isinstance(struct.error, ValueError)


# ---------------------------------------------------------------------------
# media decoders: same contract as the sketch wire — a corrupt payload inside
# a 100 TB mapInPandas decode stage must raise ValueError (which the per-row
# skip logic catches), never struct.error / ZeroDivisionError / a giant
# header-claimed allocation.
# ---------------------------------------------------------------------------

def _media_payloads():
    import numpy as np
    from sketchlib.multimodal.media import (encode_bmp, encode_ppm,
                                            encode_wav, pack_fake_image,
                                            pack_fake_video)
    img = np.arange(60, dtype=np.uint8).reshape(5, 4, 3)
    samples = (np.linspace(-3000, 3000, 64).astype(np.int16).reshape(-1, 2))
    return {
        "ppm": encode_ppm(img),
        "bmp": encode_bmp(img),
        "wav": encode_wav(samples, 8000),
        "fake_image": pack_fake_image(4, 5, seed=7),
        "fake_video": pack_fake_video(4, 5, duration_ms=3000, seed=7),
    }


def _decode_any(name, payload):
    from sketchlib.multimodal.media import (decode_frame_stub, decode_image,
                                            decode_wav)
    if name == "wav":
        decode_wav(payload)
    elif name == "fake_video":
        decode_frame_stub(payload, 0)
    else:
        decode_image(payload)


@pytest.mark.parametrize("name", ["ppm", "bmp", "wav", "fake_image",
                                  "fake_video"])
def test_media_truncations_raise_valueerror(name):
    payload = _media_payloads()[name]
    _decode_any(name, payload)  # the intact payload decodes
    for cut in range(len(payload)):
        try:
            _decode_any(name, payload[:cut])
        except ValueError:
            pass  # the required failure mode


@pytest.mark.parametrize("name", ["ppm", "bmp", "wav", "fake_image",
                                  "fake_video"])
def test_media_byte_flips_raise_valueerror_and_stay_bounded(name):
    payload = _media_payloads()[name]
    for pos in range(min(len(payload), 64)):  # header region
        for flip in (0x01, 0x80, 0xFF):
            mutated = bytearray(payload)
            mutated[pos] ^= flip
            try:
                _decode_any(name, bytes(mutated))
            except ValueError:
                pass  # decoders must not allocate from implausible dims:
            # _check_dims caps header-claimed pixels, so reaching here
            # (successful decode of a flipped payload) is bounded work


def test_media_dimension_bounds():
    import struct as _s
    from sketchlib.multimodal.media import (_FAKE_MAGIC, decode_image_stub)
    huge = _FAKE_MAGIC + _s.pack("<iiq", 1 << 20, 1 << 20, 7)
    with pytest.raises(ValueError):
        decode_image_stub(huge)
    neg = _FAKE_MAGIC + _s.pack("<iiq", -3, 5, 7)
    with pytest.raises(ValueError):
        decode_image_stub(neg)
