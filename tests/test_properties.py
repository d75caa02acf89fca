"""Property-based invariants (hypothesis): for arbitrary element multisets
and arbitrary partitionings, distributed build+merge must equal single-shot
build bit-for-bit (HLL/Bloom/CMS), estimators must respect their one-sided /
bounded guarantees, and wire round-trips must be exact."""

import numpy as np
from hypothesis import example, given, settings, strategies as st

from sketchlib.bloom import BloomFilter
from sketchlib.cms import CountMinSketch
from sketchlib.hll import HllSketch
from sketchlib.kll import KllSketch
from sketchlib.tdigest import TDigest
from sketchlib.hashing import murmur3_64_flat, to_flat_bytes

SETTINGS = dict(max_examples=25, deadline=None)

elements = st.lists(st.binary(min_size=0, max_size=40), min_size=0, max_size=400)
cut_seed = st.integers(min_value=0, max_value=2**31 - 1)


def _hashes(vals):
    flat, off = to_flat_bytes(vals)
    return murmur3_64_flat(flat, off)


def _random_split(arr, seed, k=4):
    rng = np.random.default_rng(seed)
    assign = rng.integers(0, k, size=arr.shape[0])
    return [arr[assign == i] for i in range(k)]


@given(elements, cut_seed)
@settings(**SETTINGS)
def test_hll_merge_equals_single_bitforbit(vals, seed):
    h = _hashes(vals)
    single = HllSketch(p=12)
    single.add_hashes(h)
    parts = _random_split(h, seed)
    merged = None
    for p in parts:
        sk = HllSketch(p=12)
        sk.add_hashes(p)
        merged = sk if merged is None else (merged.merge(sk) or merged)
    # count_additions differs only by bookkeeping of empty parts: equalize
    merged.count_additions = single.count_additions
    assert merged.to_bytes() == single.to_bytes()


@given(elements)
@settings(**SETTINGS)
def test_hll_exact_below_100(vals):
    h = _hashes(vals)
    sk = HllSketch(p=14)
    sk.add_hashes(h)
    distinct = np.unique(h).shape[0]
    if distinct <= 100:
        assert sk.count() == distinct


@given(elements, cut_seed)
@settings(**SETTINGS)
def test_bloom_merge_equals_single(vals, seed):
    h = _hashes(vals)
    single = BloomFilter(m_bits=1 << 12, k=4)
    single.add_hashes(h)
    merged = BloomFilter(m_bits=1 << 12, k=4)
    for p in _random_split(h, seed):
        part = BloomFilter(m_bits=1 << 12, k=4)
        part.add_hashes(p)
        merged.merge(part)
    assert merged.bits.tobytes() == single.bits.tobytes()
    if h.shape[0]:
        assert single.contains_hashes(h).all()


@given(elements, cut_seed)
@settings(**SETTINGS)
def test_cms_merge_equals_single_and_one_sided(vals, seed):
    h = _hashes(vals)
    single = CountMinSketch(width=1 << 8, depth=3)
    single.add_hashes(h)
    merged = CountMinSketch(width=1 << 8, depth=3)
    for p in _random_split(h, seed):
        part = CountMinSketch(width=1 << 8, depth=3)
        part.add_hashes(p)
        merged.merge(part)
    assert merged == single
    if h.shape[0]:
        uniq, counts = np.unique(h, return_counts=True)
        est = single.estimate_hashes(uniq).astype(np.int64)
        assert (est >= counts).all()


floats = st.lists(st.floats(min_value=-1e9, max_value=1e9,
                            allow_nan=False, allow_infinity=False),
                  min_size=1, max_size=500)


@given(floats, cut_seed)
@settings(**SETTINGS)
def test_quantile_sketches_bounds_and_additivity(vals, seed):
    arr = np.asarray(vals, dtype=np.float64)
    for cls, kw in ((TDigest, {"delta": 100}), (KllSketch, {"k": 64})):
        single = cls(**kw)
        single.add_values(arr)
        merged = None
        for p in _random_split(arr, seed):
            part = cls(**kw)
            part.add_values(p)
            merged = part if merged is None else (merged.merge(part) or merged)
        assert merged.count_additions == single.count_additions == arr.shape[0]
        for q in (0.0, 0.25, 0.5, 0.9, 1.0):
            est = merged.quantile(q)
            assert arr.min() <= est <= arr.max()
        assert merged.quantile(0.0) == arr.min()
        assert merged.quantile(1.0) == arr.max()


@given(elements)
@settings(**SETTINGS)
def test_wire_roundtrips_exact(vals):
    h = _hashes(vals)
    for maker in (
        lambda: HllSketch(p=11),
        lambda: BloomFilter(m_bits=1 << 10, k=3),
        lambda: CountMinSketch(width=1 << 7, depth=2),
    ):
        sk = maker()
        sk.add_hashes(h)
        rt = type(sk).from_bytes(sk.to_bytes())
        assert rt == sk
        assert rt.to_bytes() == sk.to_bytes()


@given(elements, cut_seed)
@settings(**SETTINGS)
def test_theta_merge_equals_single_and_algebra(vals, seed):
    """Theta/KMV: distributed union equals single-shot build bit-for-bit;
    A∩A == A estimate; A minus A == 0; estimates exact below k."""
    from sketchlib.theta import ThetaSketch

    hashes = _hashes(vals)
    single = ThetaSketch(k=256)
    single.add_hashes(hashes)
    merged = ThetaSketch(k=256)
    for part in _random_split(hashes, seed):
        p = ThetaSketch(k=256)
        p.add_hashes(part)
        merged.merge(p)
    assert merged.to_bytes() == single.to_bytes()

    n_distinct = np.unique(hashes).shape[0]
    if n_distinct < 256:  # below k the KMV sample is the whole set
        assert single.count() == n_distinct
    inter_est, _c = single.intersect_count(merged)
    assert inter_est == single.count()
    anb_est, _c = single.a_not_b_count(merged)
    assert anb_est == 0


@settings(max_examples=200, deadline=None)
@given(
    sets=st.lists(st.frozensets(st.integers(0, 40), min_size=1, max_size=25),
                  min_size=2, max_size=12),
    t=st.floats(0.05, 1.0),
)
def test_prefix_filter_principle_lossless(sets, t):
    """The prefix-filtering math behind ``ngram_jaccard_pairs`` (kernel-level
    property, no Spark): ordering each set by (document frequency, element)
    and indexing only the first ``|S| - ceil(t|S|) + 1`` elements must
    surface EVERY pair with Jaccard >= t as a candidate — for arbitrary set
    families and thresholds."""
    import math
    from collections import Counter

    dfreq = Counter(e for s in sets for e in s)
    prefixes = []
    for s in sets:
        ordered = sorted(s, key=lambda e: (dfreq[e], e))
        plen = len(s) - math.ceil(t * len(s)) + 1
        prefixes.append(set(ordered[:plen]))
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            a, b = sets[i], sets[j]
            jac = len(a & b) / len(a | b)
            if jac >= t:
                assert prefixes[i] & prefixes[j], (
                    sorted(a), sorted(b), t, jac)
                # the length filter must not drop it either
                assert len(a) >= t * len(b) and len(b) >= t * len(a)


float_vals = st.lists(
    st.floats(min_value=-1e12, max_value=1e12,
              allow_nan=False, allow_infinity=False),
    min_size=0, max_size=300)


@given(float_vals, cut_seed)
@settings(**SETTINGS)
def test_ddsketch_merge_equals_single_bitforbit_and_relative_error(vals, seed):
    """DDSketch: any partitioning merges to the SAME BYTES as the one-shot
    build (closed-form buckets: no order dependence at all), and every
    quantile answer is within alpha of the lower-nearest-rank exact value
    (values below min_positive collapse to the zero bucket)."""
    from sketchlib.ddsketch import DDSketch

    arr = np.asarray(vals, dtype=np.float64)
    single = DDSketch(alpha=0.02)
    single.add_values(arr)
    merged = DDSketch(alpha=0.02)
    for part in _random_split(arr, seed):
        sk = DDSketch(alpha=0.02)
        sk.add_values(part)
        merged.merge(sk)
    assert merged == single
    assert merged.to_bytes() == single.to_bytes()
    rt = DDSketch.from_bytes(single.to_bytes())
    assert rt == single and rt.to_bytes() == single.to_bytes()
    if arr.size:
        s = np.sort(arr)
        for q in (0.0, 0.25, 0.5, 0.9, 1.0):
            true = float(s[int(np.floor(q * (arr.size - 1)))])
            est = single.quantile(q)
            if abs(true) <= single.min_positive:
                assert est == 0.0
            else:
                assert abs(est - true) <= 0.02 * abs(true) + 1e-12


@given(elements, cut_seed)
@settings(**SETTINGS)
def test_countsketch_point_queries_unbiased_shape_and_merge(vals, seed):
    """CountSketch point estimates: merged == single bit-for-bit (linear
    sketch), exact when the sketch is wide enough to be collision-free,
    and empty-query-safe — for arbitrary multisets and partitionings."""
    from sketchlib.ams import AmsSketch

    h = _hashes(vals)
    single = AmsSketch(width=1 << 12, depth=7)
    single.add_hashes(h)
    merged = None
    for p in _random_split(h, seed):
        sk = AmsSketch(width=1 << 12, depth=7)
        sk.add_hashes(p)
        if merged is None:
            merged = sk
        else:
            merged.merge(sk)
    merged.count_additions = single.count_additions
    assert merged.to_bytes() == single.to_bytes()
    uniq, counts = np.unique(h, return_counts=True)
    if uniq.shape[0]:
        est = single.estimate_hashes(uniq)
        # <=400 distinct keys in 4096 columns x 7 rows: the median row is
        # collision-free w.o.p.; allow the rare collision a 1-count slack
        assert (np.abs(est - counts) <= 1).all()
    assert single.estimate_hashes(np.zeros(0, dtype=np.uint64)).shape == (0,)


@given(elements, cut_seed)
@settings(**SETTINGS)
@example(
    vals=[b'\x0f',
     b'\x10',
     b'',
     b'',
     b'',
     b'',
     b'\x0c',
     b'\r',
     b'\x0e',
     b'',
     b'\x00',
     b'',
     b'\n',
     b'\x0b',
     b'',
     b'\x06',
     b'\x07',
     b'\x08',
     b'\t',
     b'',
     b'\x05',
     b'',
     b'\x02',
     b'\x03',
     b'\x04',
     b'',
     b'\x01'],
    seed=0,
).via('discovered failure')
def test_combo_spec_equals_dedicated_builds(vals, seed):
    """ComboSpec: for arbitrary multisets and partitionings, every
    family's sub-blob is bit-identical to a dedicated build of that
    family FOLLOWING THE SAME MERGE TREE (the combo adds nothing and
    loses nothing), and the combo wire round-trips exactly.

    For the merge-order-invariant families (Theta: set-union of the k
    smallest hashes; AMS: linear) the sub-blob must additionally equal a
    single-pass dedicated build.  Misra-Gries is deliberately excluded
    from that stronger claim: its retained key set depends on where the
    decrement steps fall (sketchlib/mg.py module docstring), so two
    different ingest partitionings may keep different zero-information
    keys — e.g. 18 distinct keys into k=16 split 4 ways keeps one extra
    count-1 key vs the single-pass build.  What MG does guarantee under
    ANY merge tree is the sandwich, asserted below."""
    from sketchlib.spark.specs import AmsSpec, ComboSpec, MgSpec, ThetaSpec

    subs = [ThetaSpec(k=256), AmsSpec(width=1 << 8, depth=3), MgSpec(k=16)]
    combo = ComboSpec(subs)
    h = _hashes(vals)
    parts = list(_random_split(h, seed))
    merged = None
    for p in parts:
        sks = combo.make()
        combo.ingest(sks, p)
        merged = sks if merged is None else combo.merge(merged, sks)
    blob = combo.to_bytes(merged)
    for i, (spec, sub_blob) in enumerate(zip(subs, combo.split_blob(blob))):
        # strict: dedicated build mirroring the combo's operation sequence
        mirror = None
        for p in parts:
            sk = spec.make()
            spec.ingest(sk, p)
            mirror = sk if mirror is None else spec.merge(mirror, sk)
        assert sub_blob == spec.to_bytes(mirror), spec.name
        if i < 2:  # Theta, AMS: also order/partitioning-invariant
            dedicated = spec.make()
            spec.ingest(dedicated, h)
            # merge bookkeeping (count_additions) may differ across empty
            # parts for Theta; compare through the family's own equality
            got = spec.from_bytes(sub_blob)
            want = spec.from_bytes(spec.to_bytes(dedicated))
            if hasattr(got, "count_additions"):
                got.count_additions = want.count_additions
            assert spec.to_bytes(got) == spec.to_bytes(want), spec.name
    # MG sandwich under this merge tree: never overcounts, undercount
    # bounded by total_decrement <= n/(k+1)
    mg = subs[2].from_bytes(combo.split_blob(blob)[2])
    uniq, counts = np.unique(h, return_counts=True)
    exact = dict(zip(uniq.tolist(), counts.tolist()))
    assert mg.total_decrement <= h.shape[0] // (16 + 1)
    for key, cnt in zip(mg.keys.tolist(), mg.counts.tolist()):
        assert cnt <= exact[key]
        assert exact[key] <= cnt + mg.total_decrement
    assert combo.to_bytes(combo.from_bytes(blob)) == blob


@given(elements, cut_seed)
@settings(**SETTINGS)
def test_cuckoo_distributed_merge_membership_and_delete(vals, seed):
    """For arbitrary multisets and arbitrary partitionings: the merged
    filter has no false negatives, stores between n_unique and
    DUP_CAP*n_unique fingerprints, and deleting every stored copy empties
    it (delete never removes another element's membership)."""
    from sketchlib.cuckoo import DUP_CAP, CuckooFilter

    h = _hashes(vals)
    uniq = np.unique(h)
    parts = _random_split(h, seed)
    merged = CuckooFilter(n_buckets=1 << 11)
    for p in parts:
        cf = CuckooFilter(n_buckets=1 << 11)
        cf.add_hashes(np.unique(p))  # stage-1 per-partition dedup
        merged.merge(cf)
    if uniq.shape[0] == 0:
        assert merged.size() == 0
        return
    assert merged.contains_hashes(uniq).all()
    assert uniq.shape[0] <= merged.size() <= DUP_CAP * uniq.shape[0]
    # drain every stored copy: each unique key has <= DUP_CAP copies
    for _ in range(DUP_CAP):
        if merged.size() == 0:
            break
        merged.delete_hashes(uniq)
    assert merged.size() == 0
    rt = CuckooFilter.from_bytes(merged.to_bytes())
    assert rt == merged
