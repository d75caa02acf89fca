"""Cuckoo filter: membership/deletion semantics, merge set-guarantees, wire
round-trips + hardening, the scalar eviction walk, and the Spark build/probe/
retract operators."""

import numpy as np
import pytest

from sketchlib.cuckoo import SLOTS, CuckooFilter, optimal_params
from sketchlib.hashing import murmur3_64_flat, to_flat_bytes


def _hashes(values):
    flat, off = to_flat_bytes([str(v).encode() for v in values])
    return murmur3_64_flat(flat, off)


class TestCuckooCore:
    def test_no_false_negatives(self):
        cf = CuckooFilter(n_buckets=optimal_params(20_000))
        h = _hashes(range(20_000))
        cf.add_hashes(h)
        assert cf.contains_hashes(h).all()
        assert cf.size() == np.unique(h).shape[0]

    def test_fpr_within_bound(self):
        cf = CuckooFilter(n_buckets=optimal_params(20_000))
        cf.add_hashes(_hashes(range(20_000)))
        probes = _hashes(range(100_000, 400_000))
        fp = cf.contains_hashes(probes).mean()
        # expected ~ 8*load/2^16; allow 3x for sampling noise
        assert fp <= 3 * cf.fpr() + 1e-4

    def test_delete_restores_absence(self):
        cf = CuckooFilter(n_buckets=optimal_params(10_000))
        h = _hashes(range(10_000))
        cf.add_hashes(h)
        gone, kept = h[::2], h[1::2]
        removed = cf.delete_hashes(gone)
        assert removed.all()
        assert cf.size() == kept.shape[0]
        # survivors: still zero false negatives
        assert cf.contains_hashes(kept).all()
        # deleted keys now miss at ~fpr, not at 100%
        assert cf.contains_hashes(gone).mean() <= 3 * cf.fpr() + 1e-3

    def test_delete_never_removes_other_elements(self):
        cf = CuckooFilter(n_buckets=1 << 10)
        h = _hashes(range(1000))
        cf.add_hashes(h)
        absent = _hashes(range(50_000, 51_000))
        removed = cf.delete_hashes(absent)
        # a miss may spuriously "remove" only on fingerprint collision —
        # and even then membership of real elements must survive
        assert removed.mean() < 0.05
        assert cf.contains_hashes(h).all()

    def test_duplicate_copies_capped(self):
        # duplicate inserts store at most DUP_CAP copies (closed-chain
        # saturation guard); membership survives, deletes count STORED
        # copies
        from sketchlib.cuckoo import DUP_CAP

        cf = CuckooFilter(n_buckets=1 << 8)
        one = _hashes(["dup"])
        for _ in range(6):
            cf.add_hashes(one)
        assert cf.size() == DUP_CAP
        assert cf.contains_hashes(one)[0]
        res = cf.delete_hashes(np.repeat(one, 6))
        assert res.sum() == DUP_CAP and cf.size() == 0
        assert not cf.contains_hashes(one)[0]

    def test_batch_delete_contention_same_bucket(self):
        # copies of the same key deleted in ONE batch: the per-bucket
        # retry loop must remove every stored copy, not just one
        from sketchlib.cuckoo import DUP_CAP

        cf = CuckooFilter(n_buckets=1 << 8)
        one = _hashes(["x"])
        cf.add_hashes(np.repeat(one, 5))
        assert cf.size() == DUP_CAP
        res = cf.delete_hashes(np.repeat(one, 5))
        assert res.sum() == DUP_CAP and cf.size() == 0

    def test_hot_key_distributed_merge(self):
        # N partial filters all holding the same hot keys (the shape a
        # repartitioned fact table produces): the merge must neither wedge
        # the eviction walk nor lose membership
        hot = _hashes(range(200))
        partials = []
        for _ in range(12):
            cf = CuckooFilter(n_buckets=1 << 10)
            cf.add_hashes(hot)
            partials.append(cf)
        m = CuckooFilter.from_bytes(partials[0].to_bytes())
        for f in partials[1:]:
            m.merge(f)
        assert m.contains_hashes(hot).all()
        from sketchlib.cuckoo import DUP_CAP
        assert m.size() <= DUP_CAP * 200

    def test_merge_set_semantics(self):
        parts = [_hashes(range(i * 4000, (i + 1) * 4000)) for i in range(4)]
        nb = optimal_params(16_000)
        filters = []
        for p in parts:
            cf = CuckooFilter(n_buckets=nb)
            cf.add_hashes(p)
            filters.append(cf)
        left = CuckooFilter.from_bytes(filters[0].to_bytes())
        for f in filters[1:]:
            left.merge(f)
        # right-assoc merge order
        right = CuckooFilter.from_bytes(filters[3].to_bytes())
        for f in filters[2::-1]:
            right.merge(f)
        allh = np.concatenate(parts)
        assert left.contains_hashes(allh).all()
        assert right.contains_hashes(allh).all()
        assert left.size() == right.size() == np.unique(allh).shape[0]

    def test_eviction_walk_high_load(self):
        # fill to ~93%: both-bucket-full rows exercise the scalar walk
        nb = 1 << 8
        n = int(nb * SLOTS * 0.93)
        cf = CuckooFilter(n_buckets=nb)
        h = _hashes(range(200_000))[:n]
        cf.add_hashes(h)
        assert cf.size() == n
        assert cf.contains_hashes(h).all()

    def test_over_capacity_raises_and_leaves_state(self):
        cf = CuckooFilter(n_buckets=8)
        h = _hashes(range(64))
        before_ok = _hashes(range(8))
        cf.add_hashes(before_ok)
        blob = cf.to_bytes()
        with pytest.raises(ValueError, match="over capacity"):
            cf.add_hashes(h)
        # all-or-nothing: failed insert did not mutate
        assert cf.to_bytes() == blob

    def test_wire_roundtrip_and_hardening(self):
        cf = CuckooFilter(n_buckets=1 << 9)
        cf.add_hashes(_hashes(range(500)))
        cf.delete_hashes(_hashes(range(0, 500, 3)))
        rt = CuckooFilter.from_bytes(cf.to_bytes())
        assert rt == cf
        assert rt.to_bytes() == cf.to_bytes()
        with pytest.raises(ValueError):
            CuckooFilter.from_bytes(b"XX" + b"\x00" * 32)
        with pytest.raises(ValueError):
            CuckooFilter.from_bytes(cf.to_bytes()[:-3])  # truncated payload
        with pytest.raises(ValueError):
            CuckooFilter(n_buckets=1000)  # not a power of two
        a, b = CuckooFilter(n_buckets=1 << 8), CuckooFilter(n_buckets=1 << 9)
        with pytest.raises(ValueError):
            a.merge(b)

    def test_optimal_params_sizing(self):
        nb = optimal_params(100_000)
        assert nb & (nb - 1) == 0
        assert 100_000 / (nb * SLOTS) <= 0.84
        with pytest.raises(ValueError):
            optimal_params(1000, load=0.99)


class TestCuckooSpark:
    def test_build_probe_retract(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from sketchlib.spark.membership import (cuckoo_build_bytes,
                                                cuckoo_delete_bytes,
                                                filter_might_contain)
        from sketchlib.spark.specs import CuckooSpec

        spec = CuckooSpec(n_buckets=1 << 14)
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        member = orders.select("o_custkey").distinct()
        blob = cuckoo_build_bytes(member, "o_custkey", spec=spec)
        customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
        kept = filter_might_contain(customer, "c_custkey", blob, spec=spec)
        with_orders = customer.join(
            orders, customer.c_custkey == orders.o_custkey, "left_semi")
        assert with_orders.exceptAll(kept.select(*with_orders.columns)).count() == 0

        # retract the odd custkeys; evens must still all pass (no false
        # negatives survive a retract)
        odd = member.filter(F.col("o_custkey") % 2 == 1)
        blob2 = cuckoo_delete_bytes(blob, odd, "o_custkey", spec=spec)
        even_members = with_orders.filter(F.col("c_custkey") % 2 == 0)
        kept2 = filter_might_contain(customer, "c_custkey", blob2, spec=spec)
        assert even_members.exceptAll(
            kept2.select(*even_members.columns)).count() == 0
        # most odd members now miss
        odd_members = with_orders.filter(F.col("c_custkey") % 2 == 1)
        n_odd = odd_members.count()
        odd_kept = odd_members.join(
            kept2.select("c_custkey"), "c_custkey", "left_semi").count()
        assert odd_kept <= max(5, 0.01 * n_odd)

    def test_partition_invariant_membership(self, spark, sf_dir):
        from sketchlib.spark.membership import cuckoo_build_bytes
        from sketchlib.spark.specs import CuckooSpec

        spec = CuckooSpec(n_buckets=1 << 14)
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        b1 = cuckoo_build_bytes(orders.repartition(1), "o_custkey", spec=spec)
        b7 = cuckoo_build_bytes(orders.repartition(7), "o_custkey", spec=spec)
        f1, f7 = CuckooFilter.from_bytes(b1), CuckooFilter.from_bytes(b7)
        import pandas as pd

        from sketchlib.spark.aggregate import hash_columns

        mem = spark.read.parquet(f"{sf_dir}/orders.parquet") \
            .select("o_custkey").distinct()
        keys = hash_columns(mem.toPandas(), ["o_custkey"], "murmur3")
        # byte layout AND copy count are merge-order dependent (stage-1
        # dedup is per-partition; cross-partition copies are DUP_CAPped) —
        # the membership SET is not
        from sketchlib.cuckoo import DUP_CAP
        assert f1.size() == keys.shape[0]
        assert keys.shape[0] <= f7.size() <= DUP_CAP * keys.shape[0]
        probes = _hashes(range(50_000))
        assert f1.contains_hashes(keys).all()
        assert f7.contains_hashes(keys).all()
        # false-positive sets may differ slot-wise but rates agree
        assert abs(f1.contains_hashes(probes).mean()
                   - f7.contains_hashes(probes).mean()) < 5e-3


class TestCuckooCounterAndSpec:
    def test_count_additions_rows_offered_semantics(self):
        """count_additions = rows offered minus stored copies removed,
        clamped at 0 — never negative under duplicate-heavy add/delete."""
        cf = CuckooFilter(n_buckets=1 << 8)
        h = _hashes([7])
        many = np.repeat(h, 10)          # 10 copies offered, DUP_CAP stored
        cf.add_hashes(many)
        assert cf.count_additions == 10  # lineage: rows ingested
        stored = cf.size()
        assert stored < 10               # cap dropped the rest
        # delete every stored copy (+ extra absent re-deletes)
        for _ in range(12):
            cf.delete_hashes(h)
        assert cf.count_additions == 10 - stored
        assert cf.count_additions >= 0
        # pathological: rebuilt filter with a caller-supplied low count
        cf2 = CuckooFilter(n_buckets=1 << 8)
        cf2.add_hashes(h)
        cf2.count_additions = 0
        cf2.delete_hashes(h)
        assert cf2.count_additions == 0  # clamped, not -1

    def test_cuckoo_spec_rejects_degenerate_expected_n(self):
        from sketchlib.spark.specs import CuckooSpec

        with pytest.raises(ValueError, match="expected_n"):
            CuckooSpec(expected_n=0)
        with pytest.raises(ValueError, match="expected_n"):
            CuckooSpec(expected_n=-5)
        assert CuckooSpec(expected_n=1).n_buckets >= 8


class TestPackingAndNullRetraction:
    def test_constructor_repacks_foreign_buckets(self):
        """A caller-supplied non-prefix-packed table must be repacked at
        construction — otherwise occ desyncs from slot positions and a
        later insert overwrites a live fingerprint (silent false
        negative).  sketchlib/cuckoo.py CuckooFilter.__init__."""
        import numpy as np

        from sketchlib.cuckoo import CuckooFilter

        b = np.zeros((8, 4), dtype=np.uint16)
        b[0, 3] = 77  # occupied slot beyond the packed prefix
        b[1, 1] = 5
        b[1, 3] = 9  # gap at slot 2
        cf = CuckooFilter(n_buckets=8, buckets=b)
        assert cf.buckets[0, 0] == 77 and cf.occ[0] == 1
        assert list(cf.buckets[1, :3]) == [5, 9, 0] or \
            list(cf.buckets[1, :2]) == [5, 9]
        assert cf.occ[1] == 2
        # packed prefix everywhere: no zero before a non-zero
        packed = cf.buckets
        assert not ((packed[:, :-1] == 0) & (packed[:, 1:] != 0)).any()

    def test_cuckoo_delete_bytes_ignores_null_keys(self, spark):
        """One NULL row in the withdrawal frame must not corrupt the
        delete: pre-fix it degraded the pandas key column to float64 so
        every key mis-hashed and the whole retraction silently no-oped
        (sketchlib/spark/membership.py cuckoo_delete_bytes)."""
        import pandas as pd

        from sketchlib.spark.aggregate import hash_columns
        from sketchlib.spark.membership import (cuckoo_build_bytes,
                                                cuckoo_delete_bytes)
        from sketchlib.spark.specs import CuckooSpec

        spec = CuckooSpec(expected_n=2000)
        base = spark.range(1000).withColumnRenamed("id", "k")
        blob = cuckoo_build_bytes(base, "k", spec=spec)
        wd = spark.range(10).withColumnRenamed("id", "k").unionByName(
            spark.sql("select cast(null as long) k"))
        out = cuckoo_delete_bytes(blob, wd, "k", spec=spec)
        cf = spec.from_bytes(out)
        h = hash_columns(
            pd.DataFrame({"k": pd.array(range(10), dtype="int64")}), ["k"])
        assert int(cf.contains_hashes(h).sum()) == 0
        rest = hash_columns(
            pd.DataFrame({"k": pd.array(range(10, 1000), dtype="int64")}),
            ["k"])
        assert bool(cf.contains_hashes(rest).all())
