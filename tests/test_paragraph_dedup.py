"""Paragraph-level exact dedup (sketchlib/dedup/paragraphs.py — the
Dolma/RefinedWeb recipe): Python re-derivation oracle, boilerplate
collapse, summary consistency, DuckDB SQL parity, real-corpus run."""

import pytest
from pyspark.sql import functions as F

from sketchlib.dedup.paragraphs import (
    dedup_paragraphs,
    explode_paragraphs,
    paragraph_dedup_summary,
)

BOILER = "Accept cookies to continue reading this site."
DOCS = [
    (0, f"Unique opening paragraph zero.\n\n{BOILER}\n\nUnique closer zero."),
    (1, f"{BOILER}\n\nUnique paragraph one."),
    (2, f"Unique paragraph two.\n\n{BOILER}"),
    (3, BOILER),                                # nothing survives
    (4, "Unique paragraph one."),               # dup of doc 1's second para
    (5, ""),                                    # no paragraphs
    (6, None),                                  # NULL text
    (7, "A\n\n\n\nB"),                          # blank block between A and B
]


def _py_dedup(docs, sep="\n\n"):
    """Independent re-derivation: first (id, pos) wins per paragraph."""
    seen = {}
    paras = []
    for doc_id, text in docs:
        if text is None:
            continue
        for pos, para in enumerate(text.split(sep)):
            if para.strip() == "":
                continue
            paras.append((doc_id, pos, para))
            seen.setdefault(para, (doc_id, pos))
    out = {}
    for doc_id, pos, para in paras:
        if seen[para] == (doc_id, pos):
            out.setdefault(doc_id, []).append((pos, para))
    return {d: sep.join(p for _, p in sorted(ps)) for d, ps in out.items()}


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


class TestParagraphDedup:
    def test_matches_python_rederivation(self, spark, docs_df):
        got = {r["doc_id"]: r["text"] for r in dedup_paragraphs(docs_df).collect()}
        assert got == _py_dedup(DOCS)

    def test_boilerplate_survives_only_in_first_doc(self, spark, docs_df):
        got = {r["doc_id"]: r["text"] for r in dedup_paragraphs(docs_df).collect()}
        assert BOILER in got[0]
        for d in (1, 2):
            assert BOILER not in got[d]
        assert 3 not in got          # all-duplicate doc drops out
        assert 4 not in got          # single para already seen in doc 1
        assert 5 not in got and 6 not in got
        assert got[7] == "A\n\nB"    # blank block removed, order kept

    def test_literal_sep_with_regex_metachars(self, spark):
        """sep is a LITERAL: '|' must not behave as an empty-alternation
        regex (which would split at every character boundary)."""
        docs = [(0, "alpha beta|gamma delta|alpha beta"),
                (1, "gamma delta|new one")]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {r["doc_id"]: r["text"]
               for r in dedup_paragraphs(df, sep="|").collect()}
        assert got == _py_dedup(docs, sep="|")
        assert got[0] == "alpha beta|gamma delta"

    def test_whitespace_only_blocks_dropped(self, spark):
        """A tab/newline-only block is not a paragraph: it must not be
        fingerprinted, deduped, or re-joined into the output (Spark trim
        strips only 0x20 — the filter is \\S-aware)."""
        docs = [(0, "Real paragraph.\n\n\t\n\nAnother real one.")]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        assert explode_paragraphs(df).count() == 2
        [row] = dedup_paragraphs(df).collect()
        assert row["text"] == "Real paragraph.\n\nAnother real one."

    def test_explode_positions(self, spark, docs_df):
        rows = explode_paragraphs(docs_df.where("doc_id = 0")).collect()
        assert [(r["pos"], r["para"]) for r in sorted(rows)] == [
            (0, "Unique opening paragraph zero."),
            (1, BOILER),
            (2, "Unique closer zero."),
        ]

    def test_summary_consistent_with_full_run(self, spark, docs_df):
        [s] = paragraph_dedup_summary(docs_df).collect()
        full = dedup_paragraphs(docs_df)
        assert s["n_docs_out"] == full.count()
        paras = explode_paragraphs(docs_df)
        assert s["n_paragraphs"] == paras.count()
        assert s["n_distinct_paragraphs"] == paras.select("para").distinct().count()

    def test_duckdb_sql_parity(self, spark, docs_df):
        """The gate's oracle SQL (paragraph text partitioning instead of
        the fingerprint — identical classes absent xxhash64 collisions)
        reproduces the rebuilt corpus exactly."""
        import duckdb

        con = duckdb.connect()
        con.register("documents", docs_df.toPandas())
        duck = con.sql("""
            WITH paras AS (
              SELECT doc_id,
                     UNNEST(regexp_split_to_array(text, '\n\n')) AS para,
                     UNNEST(range(1, len(regexp_split_to_array(text, '\n\n'))
                                  + 1)) AS pos
              FROM documents WHERE text IS NOT NULL),
            nonblank AS (SELECT * FROM paras WHERE trim(para) <> ''),
            ranked AS (
              SELECT doc_id, pos, para,
                     row_number() OVER (PARTITION BY para
                                        ORDER BY doc_id, pos) AS rn
              FROM nonblank)
            SELECT doc_id,
                   string_agg(para, chr(10) || chr(10) ORDER BY pos) AS text
            FROM ranked WHERE rn = 1 GROUP BY doc_id
        """).df()
        want = {int(r["doc_id"]): r["text"] for _, r in duck.iterrows()}
        got = {r["doc_id"]: r["text"] for r in dedup_paragraphs(docs_df).collect()}
        assert got == want

    def test_on_real_documents_table(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        [s] = paragraph_dedup_summary(docs).collect()
        assert 0 < s["n_distinct_paragraphs"] <= s["n_paragraphs"]
        assert 0 < s["n_docs_out"] <= docs.count()
        out = dedup_paragraphs(docs)
        assert out.count() == s["n_docs_out"]
        # rebuilt text never longer than the original
        joined = (docs.select("doc_id", F.length("text").alias("len_in"))
                  .join(out.select("doc_id", F.length("text").alias("len_out")),
                        "doc_id"))
        assert joined.where(F.col("len_out") > F.col("len_in")).count() == 0

    def test_idempotent(self, spark, docs_df):
        """dedup(dedup(x)) == dedup(x): survivors are first occurrences,
        so a second pass finds nothing new to drop."""
        once = dedup_paragraphs(docs_df)
        twice = dedup_paragraphs(once)
        a = {r["doc_id"]: r["text"] for r in once.collect()}
        b = {r["doc_id"]: r["text"] for r in twice.collect()}
        assert a == b
