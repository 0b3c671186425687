"""Unicode text normalization for raw corpus intake.

Web text arrives with byte junk that poisons every downstream stage:
control characters break tokenizers, zero-width characters defeat exact
dedup (two visually-identical docs hash differently), exotic space
code points dodge whitespace tokenization, and decomposed accents (NFD)
make ``café`` != ``café``. This module is the fix-up stage that runs
BEFORE dedup/quality/langid, in two layers:

* :func:`clean_text` — the codegen'd layer: strip control characters
  (keeping ``\\n`` and ``\\t``), drop zero-width/invisible code points
  (ZWSP/ZWNJ/ZWJ/BOM/soft hyphen/word joiner), map every Unicode space
  separator to a plain space, normalize CRLF/CR to LF, and optionally
  collapse space runs. Pure ``regexp_replace`` chain — one narrow
  projection, no UDF, no shuffle — and DuckDB-exact (the oracle applies
  the same RE2-compatible patterns).

* :func:`nfc_text` — canonical composition (NFC, or NFKC for
  compatibility folding). The JVM SQL surface has no Unicode normalizer,
  so this is the documented Python-unavoidable path: one Arrow-batched
  ``pandas_udf`` over ``str.normalize`` (vectorized in pandas), applied
  ONLY to rows that actually need it when ``only_when_needed`` is set —
  at web scale the overwhelming majority of text is already NFC, and
  ``is_nfc_hint`` (a codegen'd prefilter for the code-point ranges NFC
  can change) lets the UDF see just the tail. Oracle: DuckDB's
  ``nfc_normalize`` recomputes NFC byte-for-byte.

Reference tie-in: the reference repo has no text intake (its corpus is
price series); this belongs to the training-data-pipeline family the
engine adds — see SURVEY.md §2.12 and ``scripts/corpus_job.py``
(``--normalize``).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

#: zero-width and invisible code points deleted outright: ZWSP, ZWNJ,
#: ZWJ, word joiner, BOM/ZWNBSP, soft hyphen, directional marks.
#: Spelled with ``\\x{hhhh}`` escapes — the one code-point syntax Java
#: regex (Spark) and RE2 (DuckDB) share — so the SAME pattern strings run
#: in both engines and the oracle cannot drift.
_INVISIBLE = (
    r"\x{200b}\x{200c}\x{200d}\x{2060}\x{feff}\x{00ad}\x{200e}\x{200f}"
)

#: every Unicode space-separator (Zs) plus line/para separators, mapped
#: to a plain space
_SPACES = (
    r"\x{00a0}\x{1680}\x{2000}-\x{200a}\x{202f}\x{205f}\x{3000}"
    r"\x{2028}\x{2029}"
)

# (pattern, replacement) chain shared verbatim by Spark (Java regex) and
# the DuckDB oracle (RE2): character classes and alternation only.
# Replacements are REAL characters, not escapes — ``\n`` in a replacement
# string means different things to Java's replaceAll (literal ``n``) and
# RE2 (empty), so escapes are only ever used inside patterns, where both
# engines agree.
_CLEAN_CHAIN: list[tuple[str, str]] = [
    (r"\r\n|\r", "\n"),                    # CRLF / bare CR -> LF
    (f"[{_INVISIBLE}]", ""),                 # invisible code points
    (f"[{_SPACES}]", " "),                   # exotic spaces -> plain
    # C0 controls except \t\n, plus DEL and the C1 block
    (r"[\x{0000}-\x{0008}\x{000b}-\x{001f}\x{007f}-\x{009f}]", ""),
]


def clean_text_col(col: Column) -> Column:
    """The :func:`clean_text` regex chain as a column expression."""
    out = col
    for pat, rep in _CLEAN_CHAIN:
        out = F.regexp_replace(out, pat, rep)
    return out


def clean_text(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    collapse_spaces: bool = False,
) -> DataFrame:
    """Strip control/invisible code points and normalize whitespace.

    Overwrites ``text_col`` in place unless ``out_col`` names a new
    column. ``collapse_spaces`` additionally squeezes runs of plain
    spaces to one (line structure — ``\\n`` — is always preserved, so
    C4/paragraph stages still see lines). NULL in, NULL out.
    """
    out = clean_text_col(F.col(text_col))
    if collapse_spaces:
        out = F.regexp_replace(out, " {2,}", " ")
    return df.withColumn(out_col or text_col, out)


def clean_text_oracle_sql(expr: str, collapse_spaces: bool = False) -> str:
    """DuckDB expression reproducing :func:`clean_text` byte-for-byte.

    Control characters in replacements are rendered as ``chr(n)``
    expressions (SQL string literals have no escape processing)."""
    out = expr
    for pat, rep in _CLEAN_CHAIN:
        rep_sql = (
            "'" + rep + "'"
            if rep.isprintable() or rep == ""
            else " || ".join(f"chr({ord(c)})" for c in rep)
        )
        out = f"regexp_replace({out}, '{pat}', {rep_sql}, 'g')"
    if collapse_spaces:
        out = f"regexp_replace({out}, ' {{2,}}', ' ', 'g')"
    return out


#: code points below this never change under NFC/NFKC composition with a
#: following combiner absent; ASCII-only text is always NFC. The hint is
#: deliberately one-sided: it may send already-normal text to the UDF,
#: never the reverse.
_ASCII_ONLY = r"^[\u0000-\u007f]*$"


def is_nfc_hint(col: Column) -> Column:
    """Codegen'd prefilter: True when the text is provably NFC-stable
    (currently: pure ASCII). One-sided — False only means "might need
    normalization", so routing False rows through the UDF is lossless.
    """
    return col.rlike(_ASCII_ONLY)


def nfc_text(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    form: str = "NFC",
    only_when_needed: bool = True,
) -> DataFrame:
    """Apply Unicode normalization ``form`` (NFC or NFKC) to ``text_col``.

    The normalizer itself is an Arrow-batched ``pandas_udf`` (the JVM SQL
    surface has no Unicode normalizer); with ``only_when_needed`` the
    codegen'd :func:`is_nfc_hint` prefilter keeps already-ASCII rows out
    of the Python path entirely, so at web scale the UDF sees only the
    non-ASCII tail. NULL in, NULL out.
    """
    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")

    @pandas_udf("string")
    def _norm(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(
            lambda t: unicodedata.normalize(form, t) if t is not None else None
        )

    t = F.col(text_col)
    normed = _norm(t)
    if only_when_needed:
        normed = F.when(t.isNull() | is_nfc_hint(t), t).otherwise(normed)
    return df.withColumn(out_col or text_col, normed)


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    form: str = "NFC",
    collapse_spaces: bool = False,
) -> DataFrame:
    """The full intake fix-up: :func:`clean_text` then :func:`nfc_text`,
    overwriting ``text_col`` (or writing ``out_col``). The clean layer
    runs first so the UDF's ASCII prefilter benefits from invisible-char
    removal."""
    target = out_col or text_col
    return nfc_text(
        clean_text(df, text_col, out_col=target,
                   collapse_spaces=collapse_spaces),
        target,
        form=form,
    )
