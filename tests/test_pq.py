"""Product quantization: encode determinism / partition invariance, ADC
correctness against a numpy transcription, exact-rerank equivalence, k-means
codebook recall, and null handling."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sketchlib.similarity.pq import _encode_mat, adc_topk, pq_encode, train_codebooks


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _collect_codes(df, id_col="vec_id", code_col="pq_code"):
    return {r[id_col]: bytes(r[code_col]) if r[code_col] is not None else None
            for r in df.select(id_col, code_col).collect()}


class TestEncode:
    def test_partition_invariant_and_deterministic(self, emb):
        cb = train_codebooks(emb, m=8, ksub=16, sample_rows=400, seed=3)
        a = _collect_codes(pq_encode(emb.repartition(1), cb))
        b = _collect_codes(pq_encode(emb.repartition(7), cb))
        assert a == b and len(a) > 0
        assert all(v is not None and len(v) == 8 for v in a.values())

    def test_matches_numpy_transcription(self, emb):
        cb = train_codebooks(emb, m=8, ksub=16, sample_rows=400, seed=3)
        rows = emb.limit(50).collect()
        exact = _collect_codes(pq_encode(emb.limit(50), cb,
                                         exact_distances=True))
        blas = _collect_codes(pq_encode(emb.limit(50), cb))
        for r in rows:
            x = np.asarray(r["embedding"], dtype=np.float64)
            for j in range(8):
                sub = x[j * 8:(j + 1) * 8]
                d = ((cb[j] - sub[None, :]) ** 2).sum(axis=1)
                # exact kernel: bit-for-bit argmin parity
                assert exact[r["vec_id"]][j] == int(np.argmin(d))
                # BLAS kernel: chosen codeword must be (near-)optimal — it
                # may differ from argmin only at float-epsilon ties
                assert d[blas[r["vec_id"]][j]] <= d.min() + 1e-9

    def test_null_vector_null_code(self, spark):
        df = spark.createDataFrame(
            [(1, [float(i) for i in range(16)]), (2, None)],
            "vec_id long, embedding array<double>")
        cb = np.zeros((4, 2, 4))
        cb[:, 1, :] = 1.0
        codes = _collect_codes(pq_encode(df, cb))
        assert codes[2] is None and codes[1] is not None

    def test_validation(self, emb, spark):
        with pytest.raises(ValueError, match="not divisible"):
            train_codebooks(emb, m=7, ksub=4, sample_rows=100)
        with pytest.raises(ValueError, match="ksub"):
            train_codebooks(emb, m=8, ksub=1)
        with pytest.raises(ValueError, match="id_col"):
            train_codebooks(emb, m=8, ksub=4, method="first_ids")
        with pytest.raises(ValueError, match="unknown method"):
            train_codebooks(emb, m=8, ksub=4, method="median")

    def test_first_ids_codebook_is_smallest_id_slices(self, emb):
        cb = train_codebooks(emb, m=8, ksub=16, method="first_ids",
                             id_col="vec_id")
        rows = emb.orderBy("vec_id").limit(16).collect()
        mat = np.asarray([r["embedding"] for r in rows], dtype=np.float64)
        for j in range(8):
            assert np.array_equal(cb[j], mat[:, j * 8:(j + 1) * 8])


class TestAdc:
    def _queries(self, emb, ids=(0, 7, 21)):
        rows = emb.filter(F.col("vec_id").isin(list(ids))).collect()
        return [(r["vec_id"], list(r["embedding"])) for r in rows]

    def test_adc_matches_numpy(self, emb):
        cb = train_codebooks(emb, m=8, ksub=16, sample_rows=400, seed=3)
        enc = pq_encode(emb, cb)
        queries = self._queries(emb)
        got = adc_topk(enc, queries, cb, k=5).collect()
        codes = _collect_codes(enc)
        for qid, qv in queries:
            q = np.asarray(qv, dtype=np.float64)
            luts = np.stack([((cb[j] - q[j * 8:(j + 1) * 8][None, :]) ** 2)
                             .sum(axis=1) for j in range(8)])
            dists = {vid: sum(luts[j, c[j]] for j in range(8))
                     for vid, c in codes.items()}
            want = sorted(dists.items(), key=lambda kv: (kv[1], kv[0]))[:5]
            mine = sorted([(r["vec_id"], r["adc_dist"]) for r in got
                           if r["query_id"] == qid],
                          key=lambda kv: (kv[1], kv[0]))
            assert [w[0] for w in want] == [g[0] for g in mine]
            for (_, wv), (_, gv) in zip(want, mine):
                assert wv == pytest.approx(gv, rel=1e-12)

    def test_full_rerank_equals_exact_topk(self, emb):
        from sketchlib.similarity import cosine_topk

        n = emb.count()
        cb = train_codebooks(emb, m=8, ksub=16, sample_rows=400, seed=3)
        enc = pq_encode(emb, cb)
        queries = self._queries(emb)
        reranked = adc_topk(enc, queries, cb, k=5, rerank=n).collect()
        exact = cosine_topk(emb, queries, k=5).collect()
        key = lambda r: (r["query_id"], r["rnk"])
        assert sorted([(r["query_id"], r["vec_id"], r["rnk"])
                       for r in reranked]) == \
            sorted([(r["query_id"], r["vec_id"], r["rnk"]) for r in exact])

    def test_exhaustive_rerank_flag_equals_count_based(self, emb):
        """rerank=-1 (no table count needed) == rerank=n (explicit count):
        both must be the provably-exact top-k."""
        cb = train_codebooks(emb, m=8, ksub=16, sample_rows=400, seed=3)
        enc = pq_encode(emb, cb)
        queries = self._queries(emb)
        by_flag = adc_topk(enc, queries, cb, k=5, rerank=-1).collect()
        by_n = adc_topk(enc, queries, cb, k=5, rerank=emb.count()).collect()
        proj = lambda rows: sorted((r["query_id"], r["vec_id"], r["rnk"])
                                   for r in rows)
        assert proj(by_flag) == proj(by_n)
        import pytest as _pt
        with _pt.raises(ValueError, match="rerank"):
            adc_topk(enc, queries, cb, k=5, rerank=-2)

    def test_ivf_pq_probed_composition(self, emb):
        """The deployed IVFADC shape: probe the query's nearest clusters,
        ADC-score only rows in probed clusters (cluster_id filter on the
        code table), exact-rerank the candidates.  Probing must prune rows
        and still recover most of the exact top-10."""
        import numpy as np
        from sketchlib.similarity.ivf import ivf_assign, train_centroids

        cents = train_centroids(emb, n_clusters=8, sample_rows=500, seed=7)
        cb = train_codebooks(emb, m=16, ksub=64, sample_rows=500, seed=11)
        indexed = pq_encode(ivf_assign(emb, cents), cb)
        queries = self._queries(emb, ids=(0, 7, 21))
        cmat = cents / np.linalg.norm(cents, axis=1, keepdims=True)
        rows = emb.collect()
        ids = np.asarray([r["vec_id"] for r in rows])
        mat = np.asarray([r["embedding"] for r in rows], dtype=np.float64)
        hits = total = 0
        for qid, qv in queries:
            q = np.asarray(qv, dtype=np.float64)
            probed = np.argsort(-(cmat @ (q / np.linalg.norm(q))))[:4].tolist()
            pruned = indexed.filter(F.col("cluster_id").isin(probed))
            assert pruned.count() < len(rows)  # probing actually prunes
            got = {r["vec_id"] for r in
                   adc_topk(pruned, [(qid, qv)], cb, k=10, rerank=50,
                            rerank_df=emb).collect()}
            qn = q / np.linalg.norm(q)
            sims = (mat / np.linalg.norm(mat, axis=1, keepdims=True)) @ qn
            exact = set(ids[np.lexsort((ids, -sims))[:10]].tolist())
            hits += len(got & exact)
            total += len(exact)
        assert hits / total >= 0.5, hits / total

    def test_kmeans_recall_floor(self, emb):
        """Recall@10 of raw ADC (no rerank) against the exact L2 top-10 (the
        metric PQ approximates). Seeded -> the number is deterministic; pin
        a floor, not an exact value, so codebook-quality tweaks don't churn."""
        # synthetic near-random embeddings are PQ's worst case (no subspace
        # structure to exploit): 96 bits (16 subspaces x 6) lands ~0.64 here
        cb = train_codebooks(emb, m=16, ksub=64, sample_rows=500, seed=11)
        enc = pq_encode(emb, cb)
        queries = self._queries(emb, ids=(0, 7, 21, 100, 250))
        adc = adc_topk(enc, queries, cb, k=10).collect()
        rows = emb.collect()
        ids = np.asarray([r["vec_id"] for r in rows])
        mat = np.asarray([r["embedding"] for r in rows], dtype=np.float64)
        hits = total = 0
        for qid, qv in queries:
            d = ((mat - np.asarray(qv)[None, :]) ** 2).sum(axis=1)
            order = np.lexsort((ids, d))[:10]
            e = set(ids[order].tolist())
            a = {r["vec_id"] for r in adc if r["query_id"] == qid}
            hits += len(a & e)
            total += len(e)
        assert hits / total >= 0.5, hits / total
