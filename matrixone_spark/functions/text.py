"""Text analysis functions for LLM-data pipelines — all JVM-side expressions.

Beyond the reference's own surface (north-star LLM-pipeline ops): language ID
heuristic, quality scoring, token counting, document fingerprinting. Designed
for 100 TB document tables: every function is a pure column expression
(split/regexp/aggregate) — no Python in the hot path.

Tokenizer parity note: the reference's default fulltext tokenizer lowercases
and splits on non-alphanumerics (pkg/fulltext/ tokenizer; jieba only for CJK).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


_TOKEN_SPLIT = r"[^a-z0-9]+"


def tokenize(col) -> Column:
    """lower + split on non-alphanumerics, drop empties (fulltext tokenizer
    parity, pkg/fulltext/)."""
    return F.filter(F.split(F.lower(_c(col)), _TOKEN_SPLIT), lambda t: t != "")


def token_count(col) -> Column:
    """Whitespace-ish token count (LLM pipeline token budgeting, cheap path)."""
    return F.size(tokenize(col))


def char_count(col) -> Column:
    return F.length(_c(col))


def avg_token_len(col) -> Column:
    toks = tokenize(col)
    return F.when(
        F.size(toks) > 0,
        F.aggregate(toks, F.lit(0.0), lambda acc, t: acc + F.length(t)) / F.size(toks),
    ).otherwise(F.lit(0.0))


def punct_ratio(col) -> Column:
    """Fraction of characters that are not alphanumeric/space."""
    s = _c(col)
    stripped = F.regexp_replace(s, r"[A-Za-z0-9 ]", "")
    return F.when(F.length(s) > 0, F.length(stripped) / F.length(s)).otherwise(0.0)


# Tiny per-language stopword signatures (deterministic heuristic; the driver
# data's langs: en es fr de zh with pseudo-words — signatures configurable).
DEFAULT_STOPWORDS: dict = {
    "en": ("the", "a", "of", "and", "is"),
    "es": ("el", "la", "de", "y", "es"),
    "fr": ("le", "la", "et", "un", "est"),
    "de": ("der", "die", "und", "ein", "ist"),
}


def stopword_ratio(col, stopwords: "tuple[str, ...]" = DEFAULT_STOPWORDS["en"]) -> Column:
    toks = tokenize(col)
    hits = F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
    return F.when(F.size(toks) > 0, hits / F.size(toks)).otherwise(0.0)


def lang_score(col, lang: str, stopwords: "dict | None" = None) -> Column:
    sw = (stopwords or DEFAULT_STOPWORDS)[lang]
    toks = tokenize(col)
    return F.size(F.filter(toks, lambda t: t.isin(*sw)))


def lang_guess(col, stopwords: "dict | None" = None) -> Column:
    """Argmax language by stopword hits; 'und' when no signature fires.
    Expressible identically in ANSI SQL (oracle-checkable)."""
    sw = stopwords or DEFAULT_STOPWORDS
    scores = [(lang, lang_score(col, lang, sw)) for lang in sorted(sw)]
    best = F.greatest(*[s for _, s in scores])
    expr = F.lit("und")
    # first language (alphabetical) wins ties — mirrored in the oracle SQL
    for lang, s in reversed(scores):
        expr = F.when((s == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def quality_score(col) -> Column:
    """Composite [0,1] quality heuristic: length band + low punct + word shape.
    (LLM-pipeline quality filter; deterministic, oracle-expressible.)"""
    n_tok = token_count(col)
    atl = avg_token_len(col)
    pr = punct_ratio(col)
    len_ok = F.when((n_tok >= 20) & (n_tok <= 1000), 1.0).otherwise(0.4)
    shape_ok = F.when((atl >= 3) & (atl <= 10), 1.0).otherwise(0.5)
    clean = 1.0 - F.least(pr * 5, F.lit(1.0))
    return F.round((len_ok + shape_ok + clean) / 3, 6)


def fingerprint(col) -> Column:
    """Order-insensitive content fingerprint: md5 over sorted distinct tokens
    (document fingerprinting for near-dup bucketing)."""
    return F.md5(F.array_join(F.array_sort(F.array_distinct(tokenize(col))), " "))
