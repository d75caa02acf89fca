"""Round-5 property tests: randomized parity/idempotence checks for the
range-bucketing WHEN-tree and the URL normalizer (the two round-5-touched
modules whose semantics are closed-form enough for a numpy/pure-Python
oracle)."""

import numpy as np
import pytest
from pyspark.sql import functions as F


class TestBucketExprSearchsortedParity:
    """bucket_expr's O(log B) WHEN-tree must equal numpy searchsorted-right
    on arbitrary ascending boundaries — including duplicate boundary values
    (empty buckets), ±inf boundaries, and NaN/null/boundary-equal probes."""

    def test_fuzz_parity_one_job(self, spark):
        from sketchlib.spark.ranges import bucket_expr

        rng = np.random.default_rng(20260820)
        n_trials, n_vals = 12, 257
        cases = []
        for t in range(n_trials):
            nb = int(rng.integers(1, 40))
            b = np.sort(rng.choice(
                np.concatenate([rng.normal(0, 100, nb * 2),
                                [-np.inf, np.inf, 0.0, 0.0]]),
                size=nb, replace=True))
            # probe mix: normals, exact boundary hits, specials
            v = rng.normal(0, 100, n_vals)
            v[: min(nb, n_vals)] = b[: min(nb, n_vals)]  # exact hits
            v[-4:] = [np.nan, np.inf, -np.inf, 0.0]
            cases.append((b, v))

        rows = [tuple(float(cases[t][1][i]) for t in range(n_trials))
                for i in range(n_vals)]
        # one None probe per column (append a row of nulls)
        df = spark.createDataFrame(
            rows + [tuple([None] * n_trials)],
            [f"v{t}" for t in range(n_trials)])
        out = df.select(*[
            bucket_expr(f"v{t}", cases[t][0].tolist()).alias(f"b{t}")
            for t in range(n_trials)]).collect()

        for t, (b, v) in enumerate(cases):
            got = [r[f"b{t}"] for r in out]
            exp = np.searchsorted(b, v, side="right").tolist()
            # NaN sorts after everything in Spark -> rightmost bucket;
            # np.searchsorted agrees (NaN compares greater), keep explicit
            exp[-4] = len(b)
            assert got[:-1] == exp, f"trial {t}: boundaries={b!r}"
            assert got[-1] == 0, f"trial {t}: NULL must map to bucket 0"

    def test_rejects_nan_boundary_and_descending(self, spark):
        from sketchlib.spark.ranges import bucket_expr

        with pytest.raises(ValueError, match="NaN"):
            bucket_expr("x", [0.0, np.nan])
        with pytest.raises(ValueError, match="ascending"):
            bucket_expr("x", [1.0, 0.0])


def _url_soup(rng, n):
    schemes = ["https", "http", "HTTPS", "ftp", ""]
    hosts = ["Example.COM", "www.example.com", "a.b.co", "h-1.example.org"]
    ports = ["", ":80", ":443", ":8080"]
    paths = ["", "/", "/a", "/a/b.html", "/a&b", "/a/", "/%7Euser"]
    queries = ["", "?", "?x=1", "?utm_source=x", "?x=1&utm_medium=m&y=2",
               "?utm_source=a&utm_source=b", "?a=1&&b=2", "?gclid=9&x="]
    frags = ["", "#", "#frag", "#a?utm_source=infrag"]
    soup = []
    for _ in range(n):
        s = schemes[rng.integers(len(schemes))]
        u = (f"{s}://" if s else "") + \
            hosts[rng.integers(len(hosts))] + \
            ports[rng.integers(len(ports))] + \
            paths[rng.integers(len(paths))] + \
            queries[rng.integers(len(queries))] + \
            frags[rng.integers(len(frags))]
        soup.append(u)
    soup += ["", "not a url", "example.com/a?utm_source=x", "://x",
             "https://", "https://h/?&&", "HTTP://WWW.EX.COM:80/P?x=1#f"]
    return soup


class TestNormalizeUrlProperties:
    def test_idempotent_on_url_soup(self, spark):
        """normalize(normalize(u)) == normalize(u): a dedup key function
        that moves under re-application splits keys between a pipeline
        that normalized once and one that normalized twice."""
        from sketchlib.text.urls import normalize_url

        soup = _url_soup(np.random.default_rng(7), 400)
        df = spark.createDataFrame([(u,) for u in soup], ["url"])
        rows = df.select(
            normalize_url(F.col("url")).alias("once")).select(
            F.col("once"),
            normalize_url(F.col("once")).alias("twice")).collect()
        bad = [(r["once"], r["twice"]) for r in rows
               if r["once"] != r["twice"]]
        assert not bad, f"non-idempotent on {len(bad)} inputs: {bad[:5]}"

    def test_strip_tracking_passthrough_when_clean(self, spark):
        """No tracking param and no dangling '?' -> byte-identical output
        (the ADVICE-mandated noop-on-clean contract)."""
        from sketchlib.text.urls import strip_tracking_params, \
            TRACKING_PARAMS

        soup = [u for u in _url_soup(np.random.default_rng(11), 400)
                if not any(p + "=" in u for p in TRACKING_PARAMS)
                and "?" not in u.replace("?#", "##")[u.find("?"):][:1]]
        # keep only urls with either no '?' at all or a non-empty query
        def clean(u):
            q = u.split("#", 1)[0]
            i = q.find("?")
            return i < 0 or i + 1 < len(q)
        soup = [u for u in soup if clean(u)]
        assert soup, "soup generator produced no clean urls"
        df = spark.createDataFrame([(u,) for u in soup], ["url"])
        rows = df.select("url", strip_tracking_params(F.col("url"))
                         .alias("out")).collect()
        bad = [(r["url"], r["out"]) for r in rows if r["url"] != r["out"]]
        assert not bad, f"clean urls modified: {bad[:5]}"


class TestDegenerateInputs:
    """Pin the degenerate-input contracts the round-5 probe batch verified:
    empty frames, all-null element columns, null-only groups, NaN/inf
    elements, and whitespace-only corpora must not throw (ANSI mode) and
    must follow the documented semantics."""

    def test_distinct_count_null_semantics(self, spark):
        from sketchlib.spark.aggregate import distinct_count

        # global agg over all-null and over empty input: one row, estimate 0
        nulls = spark.createDataFrame([(None,), (None,)], "x string")
        assert [r["estimate"] for r in distinct_count(nulls, "x").collect()] \
            == [0]
        empty = spark.createDataFrame([], "x string")
        assert [r["estimate"] for r in distinct_count(empty, "x").collect()] \
            == [0]
        # grouped: a null-only group yields NO row (documented sketch_agg
        # caveat — SQL would return ('a', 0)); non-null groups unaffected
        gdf = spark.createDataFrame([("a", None), ("a", None), ("b", "v")],
                                    "g string, x string")
        got = {r["g"]: r["estimate"]
               for r in distinct_count(gdf, "x", ["g"]).collect()}
        assert got == {"b": 1}

    def test_distinct_count_nan_inf_distinct(self, spark):
        from sketchlib.spark.aggregate import distinct_count

        ddf = spark.createDataFrame(
            [(float("nan"),), (float("inf"),), (1.0,)], "v double")
        assert distinct_count(ddf, "v").collect()[0]["estimate"] == 3

    def test_quantiles_all_null_and_empty(self, spark):
        from sketchlib.spark.quantiles import approx_quantiles

        for df in (spark.createDataFrame([], "v double"),
                   spark.createDataFrame([(None,), (None,)], "v double")):
            [row] = approx_quantiles(df, "v", [0.5]).collect()
            assert row["quantiles"] == [None]

    def test_whitespace_only_corpus_no_throw(self, spark):
        """VT/FF-bearing and whitespace-only docs through the text stack:
        nothing throws under ANSI mode, filters drop them cleanly."""
        from sketchlib.text.gopher import gopher_filter, with_gopher_stats
        from sketchlib.text.repetition import repetition_stats
        from sketchlib.text.boilerplate import remove_boilerplate
        from sketchlib.dedup.paragraphs import dedup_paragraphs

        docs = spark.createDataFrame(
            [(1, None), (2, ""), (3, "   "), (4, "\x0b\x0c")],
            "doc_id long, text string")
        assert gopher_filter(docs).count() == 0
        assert with_gopher_stats(docs).count() == 4
        # "per non-null-text document" (repetition.py docstring): null drops
        assert repetition_stats(docs).count() == 3
        assert remove_boilerplate(docs).count() == 4
        assert dedup_paragraphs(docs).count() == 0

    def test_packing_zero_null_token_hardening(self, spark):
        from sketchlib.packing import pack_sequences

        tok = spark.createDataFrame([(1, 0), (2, None), (3, 7), (4, -5)],
                                    "doc_id long, n_tokens long")
        with pytest.raises(Exception, match="negative n_tokens"):
            pack_sequences(tok, "n_tokens", 16).collect()
        ok = pack_sequences(tok.filter("n_tokens is null or n_tokens >= 0"),
                            "n_tokens", 16)
        assert ok.count() == 3


class TestFoldBlobsHypothesis:
    """Hypothesis sweep: the wire-level group fold (hll.fold_blobs) must be
    bit-identical to the sequential from_bytes/merge/to_bytes fold for ANY
    list of sketches, any p, any mix of modes — with shrinking, so a
    counterexample arrives minimal."""

    def test_fold_matches_sequential(self):
        import numpy as np
        from hypothesis import given, settings, strategies as st

        from sketchlib.hll import HllSketch, fold_blobs

        @st.composite
        def blob(draw):
            p = draw(st.shared(st.sampled_from([4, 7, 8, 11, 14]),
                               key="p"))
            n = draw(st.sampled_from([0, 1, 3, 50, 99, 101, 150, 1200]))
            seed = draw(st.integers(0, 2**31 - 1))
            sk = HllSketch(p=p)
            if n:
                rng = np.random.default_rng(seed)
                sk.add_hashes(rng.integers(0, 2**63, size=n, dtype=np.int64)
                              .astype(np.uint64))
            return sk.to_bytes()

        @settings(max_examples=60, deadline=None)
        @given(st.lists(blob(), min_size=1, max_size=6))
        def check(blobs):
            merged = None
            for b in blobs:
                sk = HllSketch.from_bytes(b)
                if merged is None:
                    merged = sk
                else:
                    merged.merge(sk)
            assert fold_blobs(blobs) == merged.to_bytes()

        check()
