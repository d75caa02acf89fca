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


def test_clean_corpus_oph_kernel_same_manifest(spark):
    """The OPH signature kernel must reach the identical manifest: every
    decision is made on exact-verified pairs, so the kernel choice only
    affects candidate generation cost."""
    perm = sorted(map(tuple, clean_corpus(_docs(spark), min_quality=3)
                      .collect()))
    oph = sorted(map(tuple, clean_corpus(_docs(spark), min_quality=3,
                                         minhash_method="oph").collect()))
    assert perm == oph


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


def test_apply_mix_stage(spark):
    from sketchlib.jobs.corpus_job import apply_mix

    # sources: sA has 3x the kept mass of sB; equal targets cut sA
    rows = [(i, GOOD + f" filler {i}", "sA") for i in range(30)]
    rows += [(i + 30, GOOD.replace("dog", f"w{i}") + f" tail {i}", "sB")
             for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, src string")
    manifest = clean_corpus(docs, near_dup=False, min_quality=3)
    mixed = apply_mix(manifest, docs, {"sA": 0.5, "sB": 0.5},
                      source_col="src")
    m = {r["doc_id"]: r for r in mixed.collect()}
    assert len(m) == 40  # still one row per input doc
    # previously-dropped docs keep their original reason
    for r in mixed.filter("drop_reason = 'mixed_out'").collect():
        assert manifest.filter(f"doc_id = {r['doc_id']}").first()["keep"]
    # sB (rarest vs target) keeps everything; sA is cut toward parity
    kept_by_src = {s: sum(1 for d, r in m.items() if r["keep"]
                          and (d < 30) == (s == "sA")) for s in ("sA", "sB")}
    n_a_kept_before = manifest.filter("keep").join(
        docs.filter("src = 'sA'").select("doc_id"), "doc_id").count()
    n_b_kept_before = manifest.filter("keep").join(
        docs.filter("src = 'sB'").select("doc_id"), "doc_id").count()
    assert kept_by_src["sB"] == n_b_kept_before
    assert kept_by_src["sA"] < n_a_kept_before
    # disjoint accounting still holds through summarize
    s = summarize(mixed, docs, "doc_id", "text")
    assert (s["kept"] + s["dropped_exact_dup"] + s["dropped_near_dup"]
            + s["dropped_low_quality"] + s["dropped_mixed_out"]) == 40


def test_cli_with_mix_targets(spark, tmp_path, capsys):
    src = str(tmp_path / "docs_mix")
    out = str(tmp_path / "manifest_mix")
    rows = [(i, GOOD + f" filler {i}", "sA") for i in range(20)]
    rows += [(i + 20, GOOD.replace("dog", f"w{i}") + f" tail {i}", "sB")
             for i in range(5)]
    spark.createDataFrame(rows, "doc_id long, text string, src string") \
         .write.parquet(src)
    rc = main(["--input", src, "--output", out, "--local-cpus", "4",
               "--no-near-dup", "--source-col", "src",
               "--mix-targets", json.dumps({"sA": 0.5, "sB": 0.5})])
    assert rc == 0
    s = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s["dropped_mixed_out"] > 0
    assert s["n_docs"] == 25


def test_scrub_stages_blocklist_pii_lm(spark):
    # docs: 0 kept; 1 blocked (also an exact dup of 0 — blocked wins and
    # cannot claim survivorship); 2 exact dup of 0 (non-blocked survivor
    # logic: 0 is the lowest non-blocked id); 3 PII-heavy; 4 LM tail.
    # The tail doc needs DISTINCT rare tokens: a repeated gibberish token
    # becomes corpus-frequent and scores HIGH under a unigram LM.
    gib = " ".join(f"qzxv{chr(97 + i)}" for i in range(26))
    rows = [
        (0, GOOD, "https://ok.example.net/a"),
        (1, GOOD, "https://spam.bad.org/b"),
        (2, GOOD, "https://ok2.example.net/c"),
        (3, GOOD + " a@b.io c@d.io e@f.io", "https://ok.example.net/d"),
        (4, gib, "https://ok.example.net/e"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, url string")
    bl = spark.createDataFrame([("bad.org",)], "d string")
    # LM threshold: gibberish tokens are rare (only in doc 4) -> low mean
    # logp; GOOD tokens repeat across 4 docs -> high mean logp
    m = {r["doc_id"]: r for r in clean_corpus(
        docs, min_quality=3, near_dup=False, blocklist=bl,
        max_pii=2, min_mean_logp_milli=-4500, lm_vocab_size=100,
    ).collect()}
    assert len(m) == 5
    assert m[0]["keep"] and m[0]["drop_reason"] is None
    assert m[1]["drop_reason"] == "blocked_domain"
    assert m[2]["drop_reason"] == "exact_dup"
    assert m[3]["drop_reason"] == "pii_heavy"
    assert m[4]["drop_reason"] == "lm_tail"


def test_cli_scrub_flags(spark, tmp_path, capsys):
    src = str(tmp_path / "docs_scrub")
    blp = str(tmp_path / "blocklist")
    out = str(tmp_path / "manifest_scrub")
    rows = [(i, GOOD.replace("dog", f"w{i}"),
             "https://ok.example.net/" if i % 2 else "https://spam.bad.org/")
            for i in range(6)]
    spark.createDataFrame(rows, "doc_id long, text string, url string") \
         .write.parquet(src)
    spark.createDataFrame([("bad.org",)], "d string") \
         .write.parquet(blp + ".parquet")
    rc = main(["--input", src, "--output", out, "--local-cpus", "4",
               "--no-near-dup", "--blocklist", blp + ".parquet",
               "--max-pii", "5"])
    assert rc == 0
    s = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s["dropped_blocked_domain"] == 3
    assert s["kept"] == 3
    assert s["dropped_pii_heavy"] == 0


def test_blocklist_with_url_as_id(spark):
    """Regression: url doubling as BOTH id_col and url_col must survive the
    blocklist stage (it selected the column twice, then dropped the id)."""
    rows = [(f"https://{'bad' if i % 2 else 'ok'}.example.org/{i}",
             GOOD.replace("dog", f"w{i}")) for i in range(6)]
    docs = spark.createDataFrame(rows, "url string, text string")
    bl = spark.createDataFrame([("example.org",)], "d string")
    m = clean_corpus(docs, id_col="url", url_col="url", min_quality=2,
                     near_dup=False, blocklist=bl)
    rows_out = m.collect()
    assert len(rows_out) == 6
    assert all(r["drop_reason"] == "blocked_domain" for r in rows_out)


def test_persist_boundary_identical_manifest(spark):
    """persist_level only changes the execution shape (one materialized
    stage boundary instead of per-branch re-derivation) — the manifest
    must be row-identical, and the boundary must actually be cached."""
    docs = _docs(spark)
    lazy = {r["doc_id"]: r for r in
            clean_corpus(docs, min_quality=3).collect()}
    spark.catalog.clearCache()
    persisted = clean_corpus(docs, min_quality=3, persist_level="DISK_ONLY")
    got = {r["doc_id"]: r for r in persisted.collect()}
    assert got == lazy
    # the boundary is registered with the cache manager (InMemoryRelation
    # appears in the optimized plan of the manifest)
    plan = persisted._jdf.queryExecution().optimizedPlan().toString()
    assert "InMemoryRelation" in plan
    spark.catalog.clearCache()


def test_c4_rules_stage(spark):
    """--c4-rules drops pages failing the C4 page verdict as
    c4_filtered (after low_quality in precedence), map-only."""
    ok = ("First proper sentence with enough words to pass easily today.\n"
          "Second proper sentence also long enough to pass the filter.\n"
          "Third proper sentence completes the needed sentence count.")
    rows = [
        (0, ok),                                   # kept
        (1, ok + " {"),                            # brace page -> c4_filtered
        (2, "line with words but no terminal punctuation at all here"),
        (3, ok.replace("First", "Lorem ipsum First")),  # lorem page
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    m = {r["doc_id"]: r for r in clean_corpus(
        docs, min_quality=0, near_dup=False, c4_rules=True).collect()}
    assert m[0]["keep"] and m[0]["drop_reason"] is None
    assert m[1]["drop_reason"] == "c4_filtered"
    assert m[2]["drop_reason"] == "c4_filtered"   # zero kept sentences
    assert m[3]["drop_reason"] == "c4_filtered"
    # off by default: same docs all keep (no C4 flag, quality floor 0)
    m2 = {r["doc_id"]: r for r in clean_corpus(
        docs, min_quality=0, near_dup=False).collect()}
    assert all(m2[d]["keep"] for d in (0, 1, 2, 3))
