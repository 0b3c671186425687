"""HTML -> text extraction for raw crawl curation.

The stage before everything else in a web pipeline: crawl records arrive
as HTML; dedup/quality/langid want text. This is the deterministic
regex-pipeline flavor (script/style/comment removal, block tags to
newlines, tag strip, basic entity decode, whitespace collapse) — a
heuristic extractor, NOT a DOM parser: malformed nesting, CDATA, or
exotic entities degrade gracefully rather than exactly. For
boilerplate-aware extraction quality, compose with
``dedup.paragraph_dedup`` (CCNet does exactly this: regex-extract, then
kill repeated paragraphs corpus-wide).

Pure codegen'd ``regexp_replace``/``replace`` chain — one narrow
projection, no UDF, no shuffle. Patterns use inline ``(?is)`` flags and
non-greedy repeats only (shared by Java regex and RE2), so the DuckDB
oracle (``html_oracle_sql``) reproduces the extraction byte-for-byte.
NULL html propagates NULL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: tags whose boundaries imply a line break in the rendered text
BLOCK_TAGS = (
    "p|div|br|hr|h[1-6]|li|tr|td|th|table|ul|ol|dl|dt|dd|section|article|"
    "header|footer|nav|aside|blockquote|pre|form|figure|figcaption"
)

# (pattern, replacement) regex chain; all patterns are (?is)-flagged where
# needed and applied replace-all in both engines. One pattern per
# container tag (no backreference — RE2 has none).
_STRIP_CHAIN: list[tuple[str, str]] = [
    *[
        (rf"(?is)<{tag}[^>]*>.*?</{tag}\s*>", " ")
        for tag in ("script", "style", "noscript", "template")
    ],
    (r"(?s)<!--.*?-->", " "),
    (rf"(?i)</?({BLOCK_TAGS})(\s[^>]*)?/?>", "\n"),
    (r"(?s)<[^>]*>", " "),
]

#: literal entity decodes, applied AFTER tag removal; ``&amp;`` must come
#: last so ``&amp;lt;`` decodes once (to ``&lt;``), not twice
ENTITIES: list[tuple[str, str]] = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&amp;", "&"),
]

_WS_CHAIN: list[tuple[str, str]] = [
    (r"[ \t\r]+", " "),        # collapse horizontal whitespace
    (r" ?\n ?", "\n"),         # strip spaces hugging line breaks
    (r"\n{3,}", "\n\n"),       # at most one blank line
]


def extract_text_col(html_col: Column | str) -> Column:
    """The extraction chain as a single column expression."""
    t = F.col(html_col) if isinstance(html_col, str) else html_col
    for pat, rep in _STRIP_CHAIN:
        t = F.regexp_replace(t, pat, rep)
    for lit, rep in ENTITIES:
        t = F.replace(t, F.lit(lit), F.lit(rep))
    for pat, rep in _WS_CHAIN:
        t = F.regexp_replace(t, pat, rep)
    return F.btrim(t, F.lit(" \n\t\r"))


def extract_text(
    df: DataFrame, html_col: str = "html", out_col: str = "text"
) -> DataFrame:
    """Append ``out_col`` with the extracted plain text (see module
    docstring for semantics and limits)."""
    return df.withColumn(out_col, extract_text_col(html_col))


def html_oracle_sql(table: str, html_col: str = "html") -> str:
    """Render the identical chain as DuckDB SQL (the engine-free oracle).
    Every regexp_replace carries ``'g'`` to match Spark's replace-all."""
    # patterns go in PLAIN single-quoted strings (backslash is literal
    # there, exactly what the regex wants); replacements holding real
    # newlines go in e'..' escape strings
    t = html_col
    for pat, rep in _STRIP_CHAIN:
        r = rep.replace("\n", "\\n")
        t = f"regexp_replace({t}, '{pat}', e'{r}', 'g')"
    for lit, rep in ENTITIES:
        rp = rep.replace("'", "''")
        t = f"replace({t}, '{lit}', '{rp}')"
    for pat, rep in _WS_CHAIN:
        r = rep.replace("\n", "\\n")
        t = f"regexp_replace({t}, '{pat}', e'{r}', 'g')"
    return f"SELECT *, trim({t}, e' \\n\\t\\r') AS text FROM {table}"
