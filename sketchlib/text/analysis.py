"""Text statistics, quality scoring, language ID, fingerprinting.

Everything here returns a ``pyspark.sql.Column`` built from built-in
functions, so the work happens JVM-side inside whole-stage codegen — a
Python/pandas UDF would be 10-100x slower at 100 TB (SURVEY.md §4: the
"no per-row Python" rule). Each function has an ANSI-SQL equivalent used as
its DuckDB oracle in ``__spark_entry__``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# regex token pattern: letter runs | digit runs | single non-space symbol —
# a BPE-ish pre-tokenization (GPT-2 style splits letters/digits/punct)
BPE_PATTERN = r"\p{L}+|\p{N}+|[^\p{L}\p{N}\s]"

# small multilingual stopword lists for latin-script language ID + quality
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "was"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"],
    "es": ["el", "la", "los", "las", "es", "una", "para", "por", "con", "del"],
    "fr": ["le", "la", "les", "est", "une", "pour", "dans", "avec", "sur", "pas"],
}

# unicode script ranges (BMP, the high-coverage blocks)
_CJK = "一-鿿"
_KANA = "぀-ヿ"
_CYRILLIC = "Ѐ-ӿ"


def _count_matches(col: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(pattern), 0))


def ws_token_count(col: Column) -> Column:
    """Whitespace token count; 0 for empty/blank strings."""
    trimmed = F.trim(col)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+")))


def bpe_token_count(col: Column) -> Column:
    """BPE-ish pre-tokenizer count (letter runs / digit runs / symbols)."""
    return _count_matches(col, BPE_PATTERN)


def stopword_count(col: Column, lang: str = "en") -> Column:
    """Occurrences of the lang's stopwords among lowercase ws-tokens."""
    words = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    toks = F.split(F.lower(F.trim(col)), r"\s+")
    return F.size(F.filter(toks, lambda t: F.array_contains(words, t)))


def quality_stats(col: Column) -> list[Column]:
    """Integer quality components (integers so the DuckDB oracle can match
    exactly — no float formatting hazards): chars, ws tokens, bpe tokens,
    ASCII punctuation chars, alphabetic chars, en-stopword hits."""
    return [
        F.length(col).cast("long").alias("n_chars"),
        ws_token_count(col).cast("long").alias("n_ws_tokens"),
        bpe_token_count(col).cast("long").alias("n_bpe_tokens"),
        _count_matches(col, r"\p{Punct}").cast("long").alias("n_punct"),
        _count_matches(col, r"[A-Za-z]").cast("long").alias("n_alpha"),
        stopword_count(col, "en").cast("long").alias("n_stopwords_en"),
    ]


def quality_bucket(col: Column) -> Column:
    """0-10 heuristic quality bucket: rewards mid-length docs, word-like
    token mass, stopword presence; punctuation-heavy or tiny docs score low.
    Integer output (floor of 10*score) for oracle-exact comparison."""
    n_chars = F.length(col).cast("double")
    n_tok = ws_token_count(col).cast("double")
    n_alpha = _count_matches(col, r"[A-Za-z]").cast("double")
    n_punct = _count_matches(col, r"\p{Punct}").cast("double")
    n_stop = stopword_count(col, "en").cast("double")
    alpha_ratio = F.when(n_chars > 0, n_alpha / n_chars).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tok > 0, n_stop / n_tok).otherwise(F.lit(0.0))
    len_ok = F.when((n_tok >= 10) & (n_tok <= 2000), F.lit(1.0)).otherwise(F.lit(0.4))
    score = (0.4 * alpha_ratio + 0.3 * F.least(stop_ratio * 4, F.lit(1.0))
             + 0.3 * len_ok - 0.5 * punct_ratio)
    score = F.greatest(F.lit(0.0), F.least(score, F.lit(1.0)))
    return F.floor(score * 10).cast("int")


def _script_count(col: Column, char_range: str) -> Column:
    return _count_matches(col, f"[{char_range}]")


def lang_id(col: Column) -> Column:
    """n-gram/script heuristic language ID over {en,de,es,fr,zh,ja,ru,unknown}.

    Rules (deterministic, SQL-replicable):
    1. kana chars >= 2 -> ja; else CJK >= 2 -> zh; else cyrillic >= 2 -> ru
    2. otherwise argmax of per-lang stopword hit counts (en/de/es/fr), with
       fixed tie-break order en > de > es > fr; all-zero -> 'unknown'.
    """
    kana = _script_count(col, _KANA)
    cjk = _script_count(col, _CJK)
    cyr = _script_count(col, _CYRILLIC)
    hits = {lang: stopword_count(col, lang) for lang in ("en", "de", "es", "fr")}
    best = F.greatest(*hits.values())
    latin = (F.when(best <= 0, F.lit("unknown"))
             .when(hits["en"] == best, F.lit("en"))
             .when(hits["de"] == best, F.lit("de"))
             .when(hits["es"] == best, F.lit("es"))
             .otherwise(F.lit("fr")))
    return (F.when(kana >= 2, F.lit("ja"))
            .when(cjk >= 2, F.lit("zh"))
            .when(cyr >= 2, F.lit("ru"))
            .otherwise(latin))


def normalize_text(col: Column) -> Column:
    """Canonical text for fingerprinting/dedup: lowercase, whitespace
    collapsed to single spaces, trimmed."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def fingerprint_key(col: Column, n_hashes: int = 1) -> Column:
    """64-bit content fingerprint of the normalized text (xxhash64, JVM-side).

    Two docs share a fingerprint iff their normalized text matches (modulo a
    2^-64 collision) — the exact-dedup key. For the DuckDB oracle, grouping by
    ``normalize_text`` itself is the equivalent (hash values differ across
    engines; group *structure* is what's checked).
    """
    return F.xxhash64(normalize_text(col))


# --- SQL oracle fragments (DuckDB dialect), kept adjacent to the Spark defs
# so drift is caught in review. {c} is the column name.

SQL_WS_TOKENS = ("CASE WHEN length(trim({c})) = 0 THEN 0 "
                 "ELSE len(regexp_split_to_array(trim({c}), '\\s+')) END")
SQL_BPE_TOKENS = ("len(regexp_extract_all({c}, '\\p{{L}}+|\\p{{N}}+|[^\\p{{L}}\\p{{N}}\\s]'))")
SQL_PUNCT = "len(regexp_extract_all({c}, '[[:punct:]]'))"
SQL_ALPHA = "len(regexp_extract_all({c}, '[A-Za-z]'))"


def sql_stopword_count(c: str, lang: str = "en") -> str:
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return (f"len(list_filter(regexp_split_to_array(lower(trim({c})), '\\s+'), "
            f"t -> list_contains([{words}], t)))")


SQL_NORMALIZE = "trim(regexp_replace(lower({c}), '\\s+', ' ', 'g'))"
