"""Text-analysis column expressions [EXT]: token counting, quality
scoring, language heuristics, fingerprinting. All pure Catalyst
expressions (JVM-side regex) — no Python in the hot path — and each has
an exact ANSI-SQL twin for the oracle gate.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation.
BPE_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"
STOPWORDS = ("the", "a", "of", "and", "to", "in")


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def ws_token_count(col: str | Column = "text") -> Column:
    """Whitespace token count."""
    return F.size(F.split(F.trim(_c(col)), " +"))


def bpe_token_count(col: str | Column = "text") -> Column:
    """BPE-ish token count via the pre-tokenizer regex."""
    return F.regexp_count(_c(col), F.lit(BPE_RE))


def type_count(col: str | Column = "text") -> Column:
    """Distinct whitespace-token count (vocabulary size of the doc)."""
    return F.size(F.array_distinct(F.split(F.trim(_c(col)), " +")))


def stopword_count(col: str | Column = "text") -> Column:
    words = F.split(F.trim(_c(col)), " +")
    return F.size(F.filter(words, lambda x: x.isin(*STOPWORDS)))


def avg_word_len(col: str | Column = "text") -> Column:
    c = _c(col)
    return F.length(F.regexp_replace(c, " ", "")).cast("double") / ws_token_count(c)


def stopword_ratio(col: str | Column = "text") -> Column:
    return stopword_count(col).cast("double") / ws_token_count(col)


def quality_score(col: str | Column = "text") -> Column:
    """Deterministic composite quality score in [0, 1]:
    token volume (capped) x type diversity x stopword presence."""
    c = _c(col)
    tok = ws_token_count(c)
    vol = F.least(tok.cast("double") / 100.0, F.lit(1.0))
    diversity = type_count(c).cast("double") / tok
    stop = F.least(stopword_ratio(c) * 10.0, F.lit(1.0))
    return vol * diversity * stop
