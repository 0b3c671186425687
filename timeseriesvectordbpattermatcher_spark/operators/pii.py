"""PII detection + redaction for training-data curation.

The anonymization stage every large-corpus pipeline runs before training
(emails / phones / IP addresses / SSN-like ids / card-like numbers are
scrubbed to typed placeholder tokens). Like the rest of the text family
(``textstats.py``) every operator here is a pure Spark SQL expression —
``regexp_count`` / ``regexp_replace`` are codegen'd JVM regex scans, no
UDF, so the hot path is one narrow projection over the corpus: no
shuffle, nothing leaves the scan stage, and predicate pushdown/column
pruning are unaffected.

Patterns are deliberately restricted to the syntax subset shared by
Java's regex engine (Spark) and RE2 (DuckDB): character classes, bounded
repeats, non-capturing groups, ``\\b`` anchors — no backreferences, no
lookaround. Both engines use leftmost-first, non-overlapping scan
semantics, so the DuckDB oracle reproduces counts and redacted text
byte-for-byte (pinned in ``tests/test_pii.py``).

Counts are heuristic *signals* (a pattern family can in principle overlap
another's text span); redaction applies the patterns as an ordered chain
(most-specific first) so each kind sees the previous kind's placeholders,
never its raw text. NULL text propagates NULL, matching the engine-wide
null-tolerance convention.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (kind, pattern, placeholder) — ordered most-specific-first; redaction
# applies them in THIS order so e.g. card digits are gone before the
# phone pattern scans. The subset is RE2-safe (see module docstring).
PII_PATTERNS: list[tuple[str, str, str]] = [
    (
        "email",
        r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    (
        "ssn",
        r"\b\d{3}-\d{2}-\d{4}\b",
        "<SSN>",
    ),
    (
        "card",
        r"\b(?:\d{4}[ \-]){3}\d{4}\b",
        "<CARD>",
    ),
    (
        "ipv4",
        r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
        "<IP>",
    ),
    (
        "phone",
        r"(?:\+\d{1,3}[ .\-]?)?(?:\(\d{3}\)[ .\-]?|\d{3}[ .\-])\d{3}[ .\-]?\d{4}\b",
        "<PHONE>",
    ),
]

_KINDS = [k for k, _, _ in PII_PATTERNS]


def _patterns(kinds: list[str] | None) -> list[tuple[str, str, str]]:
    if kinds is None:
        return PII_PATTERNS
    unknown = sorted(set(kinds) - set(_KINDS))
    if unknown:
        raise ValueError(f"unknown PII kinds {unknown}; known: {_KINDS}")
    # preserve the canonical chain order regardless of caller order
    return [p for p in PII_PATTERNS if p[0] in set(kinds)]


def add_pii_signals(
    df: DataFrame, text_col: str = "text", kinds: list[str] | None = None
) -> DataFrame:
    """Append one ``pii_<kind>`` match-count column per kind plus a
    ``pii_total`` sum. Counts scan the ORIGINAL text independently per
    kind (non-overlapping leftmost matches within a kind; kinds may in
    principle overlap each other's spans — they are signals for
    filtering/auditing, not a partition of the text). NULL text yields
    NULL counts."""
    out = df
    total: Column | None = None
    for kind, pat, _ in _patterns(kinds):
        c = F.regexp_count(F.col(text_col), F.lit(pat))
        out = out.withColumn(f"pii_{kind}", c)
        total = c if total is None else total + c
    return out.withColumn("pii_total", total)


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    kinds: list[str] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Replace every PII match with its typed placeholder token
    (``<EMAIL>``, ``<SSN>``, ``<CARD>``, ``<IP>``, ``<PHONE>``), applying
    the patterns as an ordered chain over the running result. Writes to
    ``out_col`` (default: in place). Placeholders contain no digits or
    ``@``, so a later pattern can never match inside an earlier one's
    replacement. NULL text stays NULL."""
    expr: Column = F.col(text_col)
    for _, pat, token in _patterns(kinds):
        expr = F.regexp_replace(expr, pat, token)
    return df.withColumn(out_col or text_col, expr)


def pii_oracle_sql(
    table: str, text_col: str = "text", kinds: list[str] | None = None
) -> str:
    """Render the equivalent DuckDB SQL (counts + redacted text) for the
    same pattern chain — the engine-free oracle used by tests. DuckDB has
    no ``regexp_count``; ``len(regexp_extract_all(...))`` is the same
    non-overlapping leftmost scan."""
    pats = _patterns(kinds)
    count_cols = ", ".join(
        f"CASE WHEN {text_col} IS NULL THEN NULL ELSE "
        f"len(regexp_extract_all({text_col}, '{p}')) END AS pii_{k}"
        for k, p, _ in pats
    )
    red = text_col
    for _, p, tok in pats:
        red = f"regexp_replace({red}, '{p}', '{tok}', 'g')"
    return (
        f"SELECT *, {count_cols}, "
        + " + ".join(f"pii_{k}" for k, _, _ in pats)
        + f" AS pii_total, {red} AS redacted FROM {table}"
    )
