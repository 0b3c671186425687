"""URL canonicalization / dedup / domain filtering vs a DuckDB oracle.

Canonical form must match DuckDB byte-for-byte on a hand-planted zoo AND
a URL-shaped fuzz corpus; dedup and domain filtering are then checked
against plain-python recomputations over the oracle's canonical forms.
"""

import duckdb
import numpy as np
import pytest

from timeseriesvectordbpattermatcher_spark.operators.urls import (
    canonicalize_urls,
    filter_domains,
    host_of,
    url_canon_oracle_sql,
    url_dedup,
)

ZOO = [
    "https://www.Example.COM:443/Path/To/Page/?utm_source=x&a=1&utm_medium=y#frag",
    "http://example.com:80/",
    "http://example.com:8080/keep:port",
    "HTTPS://WWW.EXAMPLE.COM",
    "https://example.com/x/",
    "https://example.com/x",
    "https://example.com/?utm_source=a&utm_campaign=b&gclid=z",  # all params drop
    "https://example.com/?ref=nav&real=1&fbclid=q&msclkid=m",
    "https://example.com/a?b=1&&c=2",  # empty param survives
    "https://example.com/a?refresh=1",  # 'ref' must NOT eat 'refresh'
    "https://sub.www.example.com/",  # www only strips as the FIRST label
    "  https://example.com/trim  ",
    "ftp://Files.Example.com/Pub/",
    "https://example.com/page#?utm_source=tricky",  # '?' inside fragment
    "relative/path/only",
    "",
    None,
    "https://example.com/x/?a=1/",  # trailing slash in query value stays... it's string-final: strips
    "https://example.com:443",  # default port, no path
    "http://www.example.com:80?q=1",  # port before query
]


def _run_both(spark, urls):
    rows = [(i, u) for i, u in enumerate(urls)]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = canonicalize_urls(df).orderBy("doc_id").toPandas()
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, url VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = con.sql(url_canon_oracle_sql("t") + " ORDER BY doc_id").df()
    return got, want


def _assert_match(got, want):
    a, b = got.url_canon, want.url_canon
    bad = ~((a == b) | (a.isna() & b.isna()))
    assert not bad.any(), list(
        zip(got.url[bad], a[bad], b[bad])
    )


def test_url_canon_zoo_matches_duckdb(spark):
    got, want = _run_both(spark, ZOO)
    _assert_match(got, want)
    # spot-pin the semantics themselves (not just cross-engine agreement)
    by_url = dict(zip(got.url, got.url_canon))
    assert by_url[ZOO[0]] == "https://example.com/Path/To/Page/?a=1"
    assert by_url["http://example.com:80/"] == "http://example.com"
    assert by_url["http://example.com:8080/keep:port"] == "http://example.com:8080/keep:port"
    assert by_url["HTTPS://WWW.EXAMPLE.COM"] == "https://example.com"
    assert by_url["https://example.com/x/"] == by_url["https://example.com/x"]
    assert by_url["https://example.com/?utm_source=a&utm_campaign=b&gclid=z"] == "https://example.com"
    assert by_url["https://example.com/?ref=nav&real=1&fbclid=q&msclkid=m"] == "https://example.com/?real=1"
    assert by_url["https://example.com/a?refresh=1"] == "https://example.com/a?refresh=1"
    assert by_url["https://sub.www.example.com/"] == "https://sub.www.example.com"
    assert by_url["  https://example.com/trim  "] == "https://example.com/trim"
    assert by_url["https://example.com/page#?utm_source=tricky"] == "https://example.com/page"
    assert by_url["http://www.example.com:80?q=1"] == "http://example.com?q=1"


def test_url_canon_fuzz_matches_duckdb_and_is_idempotent(spark):
    frags = ["https://", "http://", "www.", "Example", ".com", ":80", ":443",
             "/", "a", "?", "&", "=", "utm_x", "ref", "#f", "B", "9", " "]
    rng = np.random.default_rng(77)
    urls = ["".join(rng.choice(frags) for _ in range(int(rng.integers(0, 12))))
            for _ in range(400)]
    got, want = _run_both(spark, urls)
    _assert_match(got, want)
    # idempotence: canonicalizing the canonical form is a no-op
    canon_urls = [u for u in got.url_canon if u is not None]
    got2, want2 = _run_both(spark, canon_urls)
    _assert_match(got2, want2)
    assert (got2.url_canon == got2.url).all(), got2[got2.url_canon != got2.url]


def test_url_dedup_keeps_first_per_canonical(spark):
    rows = [
        (1, "https://www.example.com/x/?utm_source=a"),
        (2, "https://example.com/x"),        # same canonical as 1 -> drops
        (3, "https://example.com/y"),
        (4, None),                            # null url passes through
        (0, "http://example.com/x"),          # different scheme: distinct
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = url_dedup(df).orderBy("doc_id").toPandas()
    assert out.doc_id.tolist() == [0, 1, 3, 4]
    assert list(out.columns) == ["doc_id", "url"]  # schema-stable


def test_filter_domains_list_and_df(spark):
    rows = [
        (1, "https://ads.example.com/banner"),
        (2, "https://example.com/page"),
        (3, "https://example.org/ok"),
        (4, "https://notexample.com/ok"),  # suffix must match at a label
        (5, None),
        (6, "no-scheme-here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    kept = filter_domains(df, ["Example.com"]).orderBy("doc_id").toPandas()
    assert kept.doc_id.tolist() == [3, 4, 5, 6]
    block = spark.createDataFrame([("example.com",)], "domain string")
    kept2 = filter_domains(df, block).orderBy("doc_id").toPandas()
    assert kept2.doc_id.tolist() == [3, 4, 5, 6]
    hits = filter_domains(df, ["example.com"], mode="keep").orderBy("doc_id").toPandas()
    assert hits.doc_id.tolist() == [1, 2]
    assert list(kept.columns) == list(kept2.columns) == ["doc_id", "url"]
    with pytest.raises(ValueError, match="drop|keep"):
        filter_domains(df, ["x"], mode="purge")


def test_host_of_and_plan_udf_free(spark):
    df = spark.createDataFrame(
        [(1, "https://a.b.c:9090/x"), (2, "nohost"), (3, None)],
        "doc_id long, url_canon string",
    )
    out = host_of(df).orderBy("doc_id").toPandas()
    assert out.host.tolist()[0] == "a.b.c"
    assert out.host.isna().tolist() == [False, True, True]
    plan = (
        canonicalize_urls(
            spark.createDataFrame([(1, "x")], "doc_id long, url string")
        )._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan
