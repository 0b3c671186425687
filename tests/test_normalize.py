"""Unicode intake normalization vs DuckDB + ``unicodedata`` oracles.

``clean_text`` must match DuckDB byte-for-byte (the SAME ``\\x{hhhh}``
pattern strings run in both engines); ``nfc_text`` must match Python's
``unicodedata.normalize`` on every row, with the ASCII prefilter proven
lossless (prefiltered output == unconditional output).
"""

import unicodedata

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from timeseriesvectordbpattermatcher_spark.operators.normalize import (
    clean_text,
    clean_text_oracle_sql,
    is_nfc_hint,
    nfc_text,
    normalize_text,
)

ZOO = [
    "he​llo­world",  # ZWSP + soft hyphen deleted
    "line1\r\nline2\rline3",  # CRLF / bare CR -> LF
    "x y z　w",  # exotic spaces -> plain
    "para sep too",  # line/para separators -> plain space
    "ctrl\x00\x01ok\x7f\x9f.",  # C0/C1 controls + DEL deleted
    "tab\tkeep\nnewline keep",  # \t and \n survive
    "café composed",  # NFD -> NFC
    "﻿BOM start ‎‏ dir marks",
    "Ångstrom ﬁ ligature",  # NFC-changing + NFKC-only chars
    "plain ascii  double  space",
    "",
    None,
]


def _both(spark, texts, collapse=False):
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["text"]
        for r in clean_text(df, collapse_spaces=collapse).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    expr = clean_text_oracle_sql("text", collapse_spaces=collapse)
    want = dict(con.sql(f"SELECT doc_id, {expr} FROM t").fetchall())
    con.close()
    return got, want


def test_clean_text_zoo_matches_duckdb(spark):
    got, want = _both(spark, ZOO)
    assert got == want


def test_clean_text_collapse_matches_duckdb(spark):
    got, want = _both(spark, ZOO, collapse=True)
    assert got == want
    # collapse never touches newlines: line structure survives for C4
    assert got[1] == "line1\nline2\nline3"
    assert got[9] == "plain ascii double space"


def test_clean_text_semantics(spark):
    got, _ = _both(spark, ZOO)
    assert got[0] == "helloworld"
    assert got[2] == "x y z w"
    assert got[3] == "para sep too"
    assert got[4] == "ctrlok."
    assert got[5] == "tab\tkeep\nnewline keep"
    assert got[11] is None


# text with a bias toward the interesting code points
_special = st.sampled_from(
    "​‌‍⁠﻿­‎‏"
    "       　  "
    "\r\n\t\x00\x07\x0b\x1f\x7f\x80\x9f"
    "éÅﬁa Z."
)
_fuzz_text = st.lists(
    st.one_of(_special, st.characters(codec="utf-8")), max_size=40
).map("".join)


@settings(max_examples=30, deadline=None)
@given(st.lists(_fuzz_text, min_size=1, max_size=8))
def test_clean_text_fuzz_matches_duckdb(spark, texts):
    # DuckDB VARCHAR rejects lone surrogates / NUL-adjacent edge cases the
    # same way parquet does; keep the corpus valid-UTF8 (hypothesis
    # characters() already guarantees that).
    got, want = _both(spark, texts)
    assert got == want


def test_nfc_matches_unicodedata(spark):
    rows = [(i, t) for i, t in enumerate(ZOO)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for form in ("NFC", "NFKC"):
        got = {
            r["doc_id"]: r["text"] for r in nfc_text(df, form=form).collect()
        }
        want = {
            i: (unicodedata.normalize(form, t) if t is not None else None)
            for i, t in rows
        }
        assert got == want


def test_nfc_prefilter_lossless(spark):
    """only_when_needed must be a pure optimization: identical output."""
    rows = [(i, t) for i, t in enumerate(ZOO)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fast = nfc_text(df, only_when_needed=True).orderBy("doc_id").collect()
    slow = nfc_text(df, only_when_needed=False).orderBy("doc_id").collect()
    assert fast == slow


def test_is_nfc_hint_one_sided(spark):
    """The hint may only ever claim ASCII (always NFC-stable) rows."""
    from pyspark.sql import functions as F

    rows = [(i, t) for i, t in enumerate(ZOO) if t is not None]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    hinted = df.filter(is_nfc_hint(F.col("text"))).collect()
    for r in hinted:
        assert r["text"] == unicodedata.normalize("NFC", r["text"])
        assert r["text"].isascii()


def test_normalize_text_end_to_end(spark):
    df = spark.createDataFrame(
        [(0, "café​  x\r\ny")], "doc_id long, text string"
    )
    out = normalize_text(df, collapse_spaces=True).collect()[0]["text"]
    assert out == "café x\ny"


def test_nfc_bad_form_raises(spark):
    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        nfc_text(df, form="NFX")
