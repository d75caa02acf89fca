"""Gopher-style repetition and quality heuristics (Rae et al. 2021,
"Scaling Language Models: ... Gopher", appendix A1.1 — the published
web-text filtering rules used by most LLM corpus pipelines since).

Everything is a pure JVM column expression (split / transform / filter /
aggregate inside whole-stage codegen — no Python, no shuffle): the stats are
per-row projections, so the filter composes with any scan at full scan
throughput and Catalyst prunes every other column.

To keep results engine-exact (and DuckDB-oracle-able bit-for-bit) the stat
columns are integer COUNTS — numerators and denominators — not ratios; the
keep/drop rule derives its ratios from those same integers, so the boolean
is reproducible across engines too (identical IEEE operands -> identical
comparison).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Gopher A1.1 thresholds (published values; word-count bounds relaxed per
#: caller via parameters)
MIN_WORDS = 50
MAX_WORDS = 100_000
MIN_MEAN_WORD_LEN = 3.0
MAX_MEAN_WORD_LEN = 10.0
MAX_SYMBOL_WORD_RATIO = 0.1
MAX_BULLET_LINE_FRAC = 0.9
MAX_ELLIPSIS_LINE_FRAC = 0.3
MIN_ALPHA_WORD_FRAC = 0.8
MAX_DUP_LINE_FRAC = 0.3


def _words(col: Column) -> Column:
    """Whitespace-run word split after a FULL-whitespace trim.  F.trim
    strips ASCII spaces only, so "\nhello\n" would split to
    ['', hello, ''] — phantom words that inflate n_words and dilute every
    per-word ratio on newline-wrapped web text; a blank doc is ZERO words
    (the old single phantom '' counted as one)."""
    cleaned = F.regexp_replace(col, r"^\s+|\s+$", "")
    return (F.when(cleaned == "", F.array().cast("array<string>"))
            .otherwise(F.split(cleaned, r"\s+")))


def _lines(col: Column) -> Column:
    return F.filter(F.split(col, r"\n"),
                    lambda ln: F.trim(ln) != F.lit(""))


#: the eight stat columns added by with_gopher_stats / dropped by
#: gopher_filter
STAT_COLS = ("n_words", "total_word_chars", "n_alpha_words", "n_symbols",
             "n_lines", "n_distinct_lines", "n_bullet_lines",
             "n_ellipsis_lines")


def with_gopher_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """``df`` plus the eight stat columns, with the word/line arrays
    let-bound in an intermediate projection so each is computed ONCE per
    row.  Prefer this over :func:`gopher_stats` on wide scans: Catalyst
    does not share the ``split`` subexpression across the eight stat
    expressions, so the inline form re-tokenizes the text several times
    (measured ~1.6x slower end-to-end on long documents).

    Raises if ``df`` already has a column named like a stat column —
    silently shadowing (and later dropping) a user column is worse than an
    error.  Internal temp names are uniquified against ``df.columns``."""
    clash = sorted(set(df.columns) & set(STAT_COLS))
    if clash:
        raise ValueError(
            f"input already has gopher stat column(s) {clash}; rename them "
            "before calling with_gopher_stats")
    w_name, ln_name = "__w", "__ln"
    while w_name in df.columns:
        w_name += "_"
    while ln_name in df.columns:
        ln_name += "_"
    col = F.col(text_col)
    base = df.select("*", _words(col).alias(w_name),
                     _lines(col).alias(ln_name))
    out = base.select("*", *_stats_from(F.col(w_name), F.col(ln_name), col))
    return out.drop(w_name, ln_name)


def gopher_stats(col: Column) -> list[Column]:
    """Integer count columns: n_words, total_word_chars, n_alpha_words,
    n_symbols (``#`` occurrences + ``...`` runs), n_lines,
    n_distinct_lines, n_bullet_lines, n_ellipsis_lines.  Inline form —
    see :func:`with_gopher_stats` for the let-bound fast path."""
    return _stats_from(_words(col), _lines(col), col)


def _stats_from(w: Column, ln: Column, col: Column) -> list[Column]:
    return [
        F.size(w).cast("long").alias("n_words"),
        F.aggregate(w, F.lit(0).cast("long"),
                    lambda acc, x: acc + F.length(x)).alias("total_word_chars"),
        F.size(F.filter(w, lambda x: x.rlike("[A-Za-z]")))
         .cast("long").alias("n_alpha_words"),
        (F.size(F.split(col, "#")) - 1
         + F.size(F.split(col, r"\.\.\.")) - 1
         + F.size(F.split(col, "\u2026")) - 1
         ).cast("long").alias("n_symbols"),
        F.size(ln).cast("long").alias("n_lines"),
        F.size(F.array_distinct(F.transform(ln, F.trim)))
         .cast("long").alias("n_distinct_lines"),
        F.size(F.filter(ln, lambda x: F.trim(x).rlike(r"^[-*•]")))
         .cast("long").alias("n_bullet_lines"),
        F.size(F.filter(ln, lambda x: F.trim(x)
                        .rlike("(\\.\\.\\.|\u2026)$")))
         .cast("long").alias("n_ellipsis_lines"),
    ]


def gopher_keep(min_words: int = MIN_WORDS, max_words: int = MAX_WORDS) -> Column:
    """Boolean keep decision over the :func:`gopher_stats` columns (apply
    after selecting them).  Ratios derive from the integer counts, so the
    decision reproduces bit-for-bit in any engine computing the same
    divisions."""
    if min_words < 1:
        # every ratio below divides by n_words, which is 0 for a blank
        # doc; the divisions sit BEHIND the n_words >= min_words conjunct
        # (And short-circuits in both codegen and interpreted eval), so a
        # positive floor is what keeps ANSI mode from DIVIDE_BY_ZERO
        raise ValueError("min_words must be >= 1")
    n_words = F.col("n_words")
    n_lines = F.col("n_lines")
    mean_wl = F.col("total_word_chars") / n_words
    # the divisions live inside CASE WHEN branches, not behind AND/OR
    # conjuncts: Catalyst splits and REORDERS filter conjuncts, so
    # boolean short-circuit order is not guaranteed and a 0-word (blank)
    # or 0-line doc would abort the job with DIVIDE_BY_ZERO under ANSI
    # mode — CaseWhen branches are genuinely conditional
    word_checks = (
        (n_words <= max_words)
        & (mean_wl >= MIN_MEAN_WORD_LEN) & (mean_wl <= MAX_MEAN_WORD_LEN)
        & (F.col("n_symbols") / n_words <= MAX_SYMBOL_WORD_RATIO)
        & (F.col("n_alpha_words") / n_words >= MIN_ALPHA_WORD_FRAC))
    line_checks = (
        (F.col("n_bullet_lines") / n_lines <= MAX_BULLET_LINE_FRAC)
        & (F.col("n_ellipsis_lines") / n_lines <= MAX_ELLIPSIS_LINE_FRAC)
        & ((n_lines - F.col("n_distinct_lines")) / n_lines
           <= MAX_DUP_LINE_FRAC))
    return (
        F.when(n_words >= F.lit(int(min_words)),
               word_checks
               & F.when(n_lines > 0, line_checks).otherwise(F.lit(True)))
        .otherwise(F.lit(False))
    ).alias("keep")


def gopher_filter(df: DataFrame, text_col: str = "text",
                  min_words: int = MIN_WORDS,
                  max_words: int = MAX_WORDS) -> DataFrame:
    """Rows of ``df`` passing the Gopher quality rules (original columns
    preserved; stats computed transiently)."""
    stats = with_gopher_stats(df, text_col)  # raises on stat-name clashes
    kept = stats.filter(gopher_keep(min_words, max_words))
    return kept.drop(*STAT_COLS)
