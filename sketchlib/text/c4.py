"""C4 cleaning rules (Raffel et al. 2020, "Exploring the Limits of Transfer
Learning with a Unified Text-to-Text Transformer", §2.2 — the filters that
produced the C4 corpus, the other canonical web-text rule set next to
Gopher's appendix A1.1).

Published rules implemented here, in the paper's order:

* line level — keep only lines that end in a terminal punctuation mark,
  contain at least ``MIN_LINE_WORDS`` (5) words, and do not contain the
  string ``javascript`` (case-insensitive; the released C4 code uses a
  substring test, not a word match);
* page level — drop pages with fewer than ``MIN_SENTENCES`` (3) sentences
  after line filtering, pages containing ``lorem ipsum``
  (case-insensitive), pages containing a curly bracket ``{``, and pages
  containing a word from the "List of Dirty, Naughty, Obscene or Otherwise
  Bad Words" (a small representative subset of the public list ships as
  the default; pass the full list for production).

The paper's fourth page rule — three-sentence-span deduplication — is a
corpus-global operator, not a per-row rule; :mod:`sketchlib.text.spandedup`
implements that family (Lee et al. 2022 exact substring spans).

Sentence counting: the released C4 pipeline counts sentences with an NLP
tokenizer; to stay a pure JVM expression (and DuckDB-oracle-able
bit-for-bit) this module counts terminal-punctuation marks ``[.!?]`` in the
kept text — the standard cheap proxy.  The count is exact integer
arithmetic, so the keep/drop boolean is reproducible across engines.

Everything is a whole-stage-codegen column expression: split / filter /
array_join / regexp per row, no Python, no shuffle — the filter composes
with any scan at scan throughput and Catalyst prunes unrelated columns
(same design as :mod:`sketchlib.text.gopher`).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: published C4 thresholds (Raffel et al. 2020 §2.2)
MIN_LINE_WORDS = 5
MIN_SENTENCES = 3

#: terminal punctuation accepted at end-of-line: period, exclamation,
#: question mark, straight or curly closing double quote (the paper says
#: "terminal punctuation mark (i.e. a period, exclamation mark, question
#: mark, or end quotation mark)").  Anchored with \z (absolute end), not $:
#: Java's $ also matches BEFORE a final line terminator while RE2's (the
#: DuckDB oracle engine) never does, so a stray trailing \r would make the
#: two engines disagree — \z means end-of-text in both.
_TERMINAL_RE = '[.!?"”]\\z'

#: line delimiter: \r?\n so CRLF corpora don't leave a carriage return on
#: every line (which would fail the terminal-punctuation rule); identical
#: RE2/Java semantics
_LINE_SPLIT_RE = r"\r?\n"

#: intra-line whitespace for word counting.  NOT \s: Java's \s includes
#: \x0B (vertical tab) while RE2's does not — this explicit class means
#: the same characters in both engines (\n can't occur inside a line)
_WORD_SPLIT_RE = "[ \\t\\x0B\\f\\r]+"

#: small representative subset of the public LDNOOBW English list the paper
#: cites; substitute the full list in production (`bad_words=` parameter)
DEFAULT_BAD_WORDS = ("porn", "xxx", "viagra", "cialis", "erotic")

#: stat columns added by with_c4_stats / consumed+dropped by c4_filter
STAT_COLS = ("c4_n_lines", "c4_n_kept_lines", "c4_n_sentences",
             "c4_has_lorem_ipsum", "c4_has_brace", "c4_has_bad_word",
             "c4_keep", "c4_text")


def _bad_word_pattern(bad_words: Sequence[str]) -> str:
    import re as _re

    if not bad_words:
        raise ValueError("bad_words must be non-empty (pass the full "
                         "LDNOOBW list in production)")
    return r"\b(" + "|".join(_re.escape(w.lower()) for w in bad_words) + r")\b"


def c4_line_keep(ln: Column) -> Column:
    """The per-line C4 predicate: terminal punctuation, >= 5 words, no
    'javascript'.  Word count = whitespace-split of the trimmed line (a
    blank line splits to one empty token and fails the >= 5 rule)."""
    return (F.rtrim(ln).rlike(_TERMINAL_RE)
            & (F.size(F.split(F.trim(ln), _WORD_SPLIT_RE)) >= MIN_LINE_WORDS)
            & ~F.contains(F.lower(ln), F.lit("javascript")))


def c4_kept_lines(col: Column) -> Column:
    """Array of lines surviving the line-level rules."""
    return F.filter(F.split(col, _LINE_SPLIT_RE), c4_line_keep)


def with_c4_stats(df: DataFrame, text_col: str = "text",
                  bad_words: Sequence[str] = DEFAULT_BAD_WORDS) -> DataFrame:
    """``df`` plus the C4 stat columns and the cleaned text.

    The kept-lines array is let-bound in an intermediate projection so the
    line filter runs ONCE per row (Catalyst does not share the subexpression
    across the dependent stats — same measured pitfall as gopher.py).

    Added columns: ``c4_n_lines`` / ``c4_n_kept_lines`` (ints),
    ``c4_n_sentences`` (terminal-punct count over kept text),
    ``c4_has_lorem_ipsum`` / ``c4_has_brace`` / ``c4_has_bad_word``
    (booleans on the ORIGINAL text — page-level rules are defined on the
    page), ``c4_keep`` (the page verdict), ``c4_text`` (kept lines joined
    with newlines).  NULL text yields c4_keep = false and c4_text = NULL.
    """
    clash = sorted(set(df.columns) & set(STAT_COLS))
    if clash:
        raise ValueError(f"input already has C4 stat column(s) {clash}; "
                         "rename them before calling with_c4_stats")
    kept_name = "__c4_kept"
    while kept_name in df.columns:
        kept_name += "_"
    col = F.col(text_col)
    base = df.select("*", c4_kept_lines(col).alias(kept_name))
    kept = F.col(kept_name)
    clean = F.array_join(kept, "\n")
    n_sent = F.size(F.split(clean, r"[.!?]")) - F.lit(1)
    lower = F.lower(col)
    has_lorem = F.contains(lower, F.lit("lorem ipsum"))
    has_brace = F.contains(col, F.lit("{"))
    has_bad = lower.rlike(_bad_word_pattern(bad_words))
    keep = F.coalesce(
        (n_sent >= MIN_SENTENCES) & ~has_lorem & ~has_brace & ~has_bad,
        F.lit(False))
    out = base.select(
        "*",
        F.size(F.split(col, _LINE_SPLIT_RE)).alias("c4_n_lines"),
        F.size(kept).alias("c4_n_kept_lines"),
        n_sent.alias("c4_n_sentences"),
        has_lorem.alias("c4_has_lorem_ipsum"),
        has_brace.alias("c4_has_brace"),
        has_bad.alias("c4_has_bad_word"),
        keep.alias("c4_keep"),
        clean.alias("c4_text"),
    )
    return out.drop(kept_name)


def c4_filter(df: DataFrame, text_col: str = "text",
              bad_words: Sequence[str] = DEFAULT_BAD_WORDS) -> DataFrame:
    """Rows passing every C4 page rule, with ``text_col`` replaced by the
    line-filtered text and the stat columns dropped — the corpus-cleaning
    composition point (same shape as ``gopher_filter``)."""
    out = with_c4_stats(df, text_col, bad_words)
    kept = out.where(F.col("c4_keep"))
    kept = kept.withColumn(text_col, F.col("c4_text"))
    return kept.drop(*STAT_COLS)


# ---------------------------------------------------------------------------
# ANSI-SQL (DuckDB) parity fragments for the oracle: same integer/boolean
# semantics as the column expressions above.  {c} is the text column.
# ---------------------------------------------------------------------------

SQL_KEPT_LINES = (
    "list_filter(regexp_split_to_array({c}, '\\r?\\n'), x -> "
    "regexp_matches(rtrim(x), '[.!?\"”]\\z') "
    "AND len(regexp_split_to_array(trim(x), '[ \\t\\x0B\\f\\r]+')) >= 5 "
    "AND NOT contains(lower(x), 'javascript'))"
)


def sql_c4_stats(c: str, bad_words: Sequence[str] = DEFAULT_BAD_WORDS) -> dict[str, str]:
    """DuckDB expression per stat column (over a let-bound kept-lines alias
    is up to the caller; these inline the kept-lines expression)."""
    kept = SQL_KEPT_LINES.format(c=c)
    # DuckDB array_to_string([]) is NULL where Spark array_join([]) is '';
    # re-null only for NULL input text
    clean = (f"CASE WHEN {c} IS NULL THEN NULL ELSE "
             f"COALESCE(array_to_string({kept}, chr(10)), '') END")
    n_sent = f"(len(regexp_split_to_array({clean}, '[.!?]')) - 1)"
    pat = _bad_word_pattern(bad_words)
    has_lorem = f"contains(lower({c}), 'lorem ipsum')"
    has_brace = f"contains({c}, '{{')"
    has_bad = f"regexp_matches(lower({c}), '{pat}')"
    return {
        "c4_n_lines": f"CAST(len(regexp_split_to_array({c}, '\\r?\\n')) AS BIGINT)",
        "c4_n_kept_lines": f"CAST(len({kept}) AS BIGINT)",
        "c4_n_sentences": f"CAST({n_sent} AS BIGINT)",
        "c4_has_lorem_ipsum": has_lorem,
        "c4_has_brace": has_brace,
        "c4_has_bad_word": has_bad,
        "c4_keep": (f"COALESCE({n_sent} >= 3 AND NOT {has_lorem} "
                    f"AND NOT {has_brace} AND NOT {has_bad}, FALSE)"),
        "c4_text": clean,
    }
