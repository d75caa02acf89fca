"""End-to-end corpus-cleaning job: disjoint drop reasons, manifest
completeness, CLI entry (spark-submit shape)."""

import json

import pytest

from sketchlib.jobs.corpus_job import clean_corpus, main, summarize

GOOD = ("the quick brown fox jumps over the lazy dog and then the dog "
        "sleeps in the warm sun for a while before dinner is served")


def _docs(spark):
    near_a = GOOD + " extra tail one two three four five six seven eight"
    near_b = GOOD + " extra tail one two three four five six seven nine"
    rows = [
        (0, GOOD),                 # kept
        (1, GOOD),                 # exact dup of 0
        (2, "  " + GOOD + "  "),   # exact dup after normalization
        (3, near_a),               # kept (lower id of the near pair)
        (4, near_b),               # near dup of 3
        (5, "!!! ??? ###"),        # low quality
        (6, GOOD.replace("dog", "cat")),  # kept (distinct enough? verified)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_clean_corpus_reasons(spark):
    m = {r["doc_id"]: r for r in
         clean_corpus(_docs(spark), min_quality=3).collect()}
    assert len(m) == 7  # one manifest row per input doc
    assert m[0]["keep"] and m[0]["drop_reason"] is None
    assert m[1]["drop_reason"] == "exact_dup"
    assert m[2]["drop_reason"] == "exact_dup"
    assert m[3]["keep"]
    assert m[4]["drop_reason"] == "near_dup"
    assert m[5]["drop_reason"] == "low_quality"
    assert m[0]["pred_lang"] == "en"
    assert m[0]["n_bpe_tokens"] > 0


def test_summary_disjoint_counts(spark):
    docs = _docs(spark)
    manifest = clean_corpus(docs, min_quality=3)
    s = summarize(manifest, docs, "doc_id", "text")
    assert s["n_docs"] == 7
    assert (s["kept"] + s["dropped_exact_dup"] + s["dropped_near_dup"]
            + s["dropped_low_quality"]) == 7
    assert s["dropped_exact_dup"] == 2
    assert s["kept_distinct_fingerprints_hll"] == s["kept"]  # all distinct
    assert s["kept_bpe_tokens"] > 0


def test_cli_end_to_end(spark, tmp_path, capsys):
    src = str(tmp_path / "docs")
    out = str(tmp_path / "manifest")
    _docs(spark).write.parquet(src)
    rc = main(["--input", src, "--output", out, "--local-cpus", "4"])
    assert rc == 0
    s = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s["n_docs"] == 7 and s["kept"] >= 3
    kept = spark.read.parquet(out).filter("keep").count()
    assert kept == s["kept"]
