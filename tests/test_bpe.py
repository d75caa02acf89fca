"""Byte-level BPE: trainer vs naive reference, encoder/trainer agreement,
UTF-8 roundtrip, Spark integration, SQL-replay parity (the gate's oracle)."""

import collections

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sketchlib.text.bpe import (
    MAX_WORD_TYPES,
    BpeModel,
    PRETOKEN_RE,
    sql_bpe_replay,
    train_bpe,
    train_merges_from_counts,
)


def _naive_train(word_counts, n_merges):
    """Straight-from-the-paper reference: dict loop, no numpy."""
    words = {w: list(w.encode()) for w, _ in word_counts}
    cnt = dict(word_counts)
    merges = []
    for step in range(n_merges):
        pc = collections.Counter()
        for w, seq in words.items():
            for i in range(len(seq) - 1):
                pc[(seq[i], seq[i + 1])] += cnt[w]
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        nid = 256 + step
        merges.append(best)
        for w, seq in words.items():
            out, i = [], 0
            while i < len(seq):
                if i < len(seq) - 1 and (seq[i], seq[i + 1]) == best:
                    out.append(nid)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            words[w] = out
    return merges, words


class TestTrainer:
    def test_matches_naive_reference(self):
        wc = [("hello", 10), ("help", 5), ("world", 7), ("hold", 3),
              ("aaaa", 2), ("日本語", 4)]
        for m in (0, 1, 5, 20, 60):
            got = train_merges_from_counts(wc, m)
            want, _ = _naive_train(wc, m)
            assert got == want, m

    def test_overlapping_pairs_counted_merge_nonoverlapping(self):
        # 'aaa' has TWO (a,a) pairs for counting but merges only once
        merges = train_merges_from_counts([("aaa", 1)], 1)
        assert merges == [(97, 97)]
        m = BpeModel(merges)
        assert m.encode_word("aaa") == [256, 97]
        assert m.encode_word("aaaa") == [256, 256]
        assert m.encode_word("aaaaa") == [256, 256, 97]

    def test_tie_break_smallest_pair(self):
        # 'ab' and 'ba' pairs both count 1 -> (97,98) < (98,97) wins
        merges = train_merges_from_counts([("ab", 1), ("ba", 1)], 1)
        assert merges[0] == (97, 98)

    def test_merge_count_exhaustion_stops_early(self):
        merges = train_merges_from_counts([("ab", 1)], 100)
        assert len(merges) == 1  # after (a,b) there are no pairs left

    def test_rejects_negative_n_merges(self):
        with pytest.raises(ValueError):
            train_merges_from_counts([("ab", 1)], -1)


class TestEncoder:
    def test_encoder_reproduces_training_state(self):
        """Encoding a training word with the learned merges must equal the
        word's final training-time sequence (the property the SQL oracle
        relies on)."""
        wc = [("the quick", 5), ("thermal", 3), ("theme", 7), ("quicker", 2)]
        merges, final = _naive_train(wc, 30)
        m = BpeModel(merges)
        for w, _ in wc:
            assert m.encode_word(w) == final[w], w

    def test_roundtrip_utf8(self):
        wc = [("héllo", 3), ("日本語テスト", 2), ("mixed étoile", 4)]
        m = BpeModel(train_merges_from_counts(wc, 16))
        for w, _ in wc:
            ids = m.encode_word(w)
            assert m.decode(ids) == w
            assert all(0 <= i < m.vocab_size for i in ids)

    def test_no_merges_is_raw_bytes(self):
        m = BpeModel([])
        assert m.encode_word("ab") == [97, 98]
        assert m.decode([97, 98]) == "ab"

    def test_json_roundtrip(self):
        m = BpeModel(train_merges_from_counts([("banana", 5)], 4))
        m2 = BpeModel.from_json(m.to_json())
        assert m2.merges == m.merges
        assert m2.encode_word("banana") == m.encode_word("banana")
        with pytest.raises(ValueError):
            BpeModel.from_json('{"v": 99, "merges": []}')

    @settings(max_examples=60, deadline=None)
    @given(st.lists(st.tuples(st.text(min_size=1, max_size=8),
                              st.integers(1, 20)),
                    min_size=1, max_size=8),
           st.integers(0, 24))
    def test_property_encode_equals_training_and_roundtrips(self, wc, m):
        wc = list({w: c for w, c in wc}.items())  # dedup words
        merges = train_merges_from_counts(wc, m)
        naive, final = _naive_train(wc, m)
        assert merges == naive
        model = BpeModel(merges)
        for w, _ in wc:
            ids = model.encode_word(w)
            assert ids == final[w]
            assert model.decode(ids) == w


class TestSpark:
    def test_train_and_encode_on_documents(self, spark, sf_dir):
        from sketchlib.text.bpe import encode_tokens, token_count_col
        from pyspark.sql import functions as F

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        model = train_bpe(docs, "text", n_merges=32)
        assert 0 < len(model.merges) <= 32
        out = encode_tokens(docs, "text", model).withColumn(
            "n", token_count_col(F.col("text"), model))
        rows = out.select("doc_id", "text", "token_ids", "n").limit(50).collect()
        for r in rows:
            assert r["n"] == len(r["token_ids"])
            # decode must reproduce the exact text (byte-level, lossless)
            assert model.decode(r["token_ids"]) == r["text"]

    def test_null_and_empty_text(self, spark):
        from sketchlib.text.bpe import encode_tokens, token_count_col
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [(0, "hello hello"), (1, None), (2, "")],
            "doc_id long, text string")
        model = BpeModel(train_merges_from_counts([("hello", 2)], 3))
        out = {r["doc_id"]: (r["token_ids"], r["n"]) for r in
               encode_tokens(df, "text", model)
               .withColumn("n", token_count_col(F.col("text"), model))
               .collect()}
        assert out[1] == (None, None)
        assert out[2] == ([], 0)
        assert len(out[0][0]) == out[0][1] > 0

    def test_type_cap_guard(self, spark):
        df = spark.range(200).selectExpr(
            "cast(id as string) || ' tok' || cast(id as string) as text")
        with pytest.raises(ValueError, match="max_word_types"):
            train_bpe(df, "text", n_merges=4, max_word_types=10)
        assert MAX_WORD_TYPES > 10

    def test_spark_matches_duckdb_replay(self, spark, sf_dir):
        """End-to-end parity: Spark train+encode vs the generated SQL
        oracle — exactly the comparison the driver gate runs."""
        import duckdb
        from sketchlib.text.bpe import token_ids_col
        from pyspark.sql import functions as F

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        model = train_bpe(docs, "text", n_merges=24)
        got = {r["doc_id"]: (r["tid"], r["n"]) for r in docs.select(
            "doc_id",
            F.array_join(token_ids_col(F.col("text"), model).cast(
                "array<string>"), " ").alias("tid"),
            F.size(token_ids_col(F.col("text"), model)).alias("n")).collect()}
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf_dir}/documents.parquet'")
        want = con.sql(sql_bpe_replay(24)).fetchall()
        assert len(want) == len(got)
        for doc_id, tid, n in want:
            assert got[doc_id] == (tid, n), doc_id


def test_pretoken_pattern_java_re2_parity(spark):
    """The pinned pattern must split identically under Java regex (Spark)
    and RE2 (DuckDB) on representative text, including contractions,
    numbers, punctuation, multi-space runs, and multibyte letters."""
    import duckdb
    from pyspark.sql import functions as F

    texts = ["It's  a 42-year test, isn't it?  héllo 日本語 world",
             "tabs\tand\nnewlines  trailing   ",
             "a'd b'll c're d've e'm f's g't",
             "¡puntuación! —em–dash… 3.14159 x_y-z",
             # vertical tab: Java \s matches it, RE2 \s does not — the
             # explicit _WS class must keep both engines identical here
             ".\x0b. a\x0bb \x0b\x0b tail\x0b",
             "mixed \t\x0b\f\r\n ws runs"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i long, t string")
    spark_split = {r["i"]: list(r["ws"]) for r in df.select(
        "i", F.regexp_extract_all(F.col("t"), F.lit(PRETOKEN_RE),
                                  F.lit(0)).alias("ws")).collect()}
    con = duckdb.connect()
    pat = PRETOKEN_RE.replace("'", "''")
    for i, t in enumerate(texts):
        duck = con.sql(
            f"SELECT regexp_extract_all(?, '{pat}')", params=[t]).fetchone()[0]
        assert spark_split[i] == duck, (i, spark_split[i], duck)
