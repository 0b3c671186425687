"""PII detection/redaction vs an independent DuckDB regex oracle.

Parity here is strict: counts AND redacted text must match byte-for-byte,
on both a hand-planted corpus and a deterministic fuzz corpus drawn from a
PII-shaped alphabet (digits, dots, dashes, '@', parens) that hits pattern
boundaries far more often than uniform text would.
"""

import duckdb
import numpy as np
import pytest

from timeseriesvectordbpattermatcher_spark.operators.pii import (
    PII_PATTERNS,
    add_pii_signals,
    pii_oracle_sql,
    redact_pii,
)

PLANTED = [
    "reach me at alice.smith+spam@example.co.uk or bob@sub.domain.org today",
    "server 10.0.0.1 and 192.168.100.200 went down; ping 999.999.999.999",
    "call +1 555 123 4567 or (555) 123-4567 or 555-123-4567 now",
    "ssn 123-45-6789 leaked with card 4111 1111 1111 1111 oops",
    "contact 555-12-3456 at 10.0.0.1",  # ssn-shaped + ip in one line
    "v1.2.3.4 released",  # version string that IS an ipv4 match shape
    "no pii here, just words and numbers 12345 and 3.14159",
    "",
    None,
    "mixed: a@b.io, 8.8.8.8, +44 207 946 0958, 987-65-4320, end",
    "edge 1.2.3.4.5 chains and 1234-5678-9012-3456 dashed card",
    "tab\tand\nnewline 172.16.254.1 inside",
    "unicode über café — no matches",
    "double email a@b.cc c@d.ee back to back",
    "digits then phone 999555-123-4567 tail",
]


def _duck(rows):
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    return con


def _spark_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _compare(spark, rows):
    df = _spark_df(spark, rows)
    got = (
        redact_pii(add_pii_signals(df), out_col="redacted")
        .orderBy("doc_id")
        .toPandas()
    )
    con = _duck(rows)
    want = con.sql(pii_oracle_sql("t") + " ORDER BY doc_id").df()
    assert list(got.columns) == list(want.columns)
    for c in got.columns:
        a, b = got[c], want[c]
        bad = ~((a == b) | (a.isna() & b.isna()))
        assert not bad.any(), (c, got[bad][["doc_id", c]], want[bad][[c]])


def test_pii_planted_corpus_matches_duckdb(spark):
    _compare(spark, list(enumerate(PLANTED)))


def test_pii_fuzz_matches_duckdb(spark):
    # PII-shaped alphabet: heavy on digits/separators so random strings
    # constantly graze the pattern boundaries (partial IPs, 9- vs 10-digit
    # phones, emails without TLDs...)
    alphabet = list("0123456789.-@()+ abceio") + ["555-", ".com", "@x."]
    rng = np.random.default_rng(404)
    rows = []
    for i in range(300):
        n = int(rng.integers(0, 40))
        rows.append((i, "".join(rng.choice(alphabet) for _ in range(n))))
    _compare(spark, rows)


def test_redacted_text_has_zero_signals(spark):
    df = _spark_df(spark, list(enumerate(PLANTED)))
    red = redact_pii(df)
    again = add_pii_signals(red).toPandas()
    for kind, _, _ in PII_PATTERNS:
        col = again[f"pii_{kind}"]
        assert ((col == 0) | col.isna()).all(), (kind, again[col > 0])


def test_pii_kinds_subset_and_unknown(spark):
    df = _spark_df(spark, [(0, "a@b.io at 1.2.3.4")])
    out = add_pii_signals(df, kinds=["email"]).toPandas()
    assert "pii_email" in out.columns and "pii_ipv4" not in out.columns
    assert out.pii_total[0] == 1
    red = redact_pii(df, kinds=["ipv4"]).toPandas().text[0]
    assert red == "a@b.io at <IP>"
    with pytest.raises(ValueError, match="unknown PII kinds"):
        add_pii_signals(df, kinds=["email", "iban"])


def test_pii_plan_is_udf_free(spark):
    df = _spark_df(spark, [(0, "x")])
    plan = redact_pii(add_pii_signals(df))._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
