"""HTML -> text extraction vs the DuckDB oracle (byte-for-byte), plus
semantic pins on a planted page zoo and a tag-shaped fuzz corpus."""

import duckdb
import numpy as np

from timeseriesvectordbpattermatcher_spark.operators.html import (
    extract_text,
    html_oracle_sql,
)

PAGE = """<!DOCTYPE html><html><head>
<title>Page Title</title>
<style>body { color: red; }</style>
<script type="text/javascript">var x = "<p>not text</p>";</script>
</head><body>
<!-- a comment with <div> inside -->
<h1>Heading One</h1>
<p>First paragraph with <b>bold</b> and <a href="/x?a=1&amp;b=2">a link</a>.</p>
<div class="c">Second block&nbsp;with entities: &lt;tag&gt; &quot;quoted&quot; &#39;q&#39;</div>
<ul><li>item one</li><li>item two</li></ul>
<table><tr><td>cell a</td><td>cell b</td></tr></table>
<br/><hr>
trailing text
</body></html>"""

ZOO = [
    PAGE,
    "no markup at all",
    "<p>unclosed paragraph",
    "<SCRIPT>UPPER.case()</SCRIPT>visible",
    "<script>nested <b>tags</b> and \n newlines</script>after",
    "a < b and c > d stay as math",
    "&amp;lt; decodes ONCE to &lt; not to <",
    "<div><div><div>deep</div></div></div>",
    "",
    None,
    "<noscript><img src='x'></noscript>ok",
    "<template><p>hidden</p></template>shown",
    "spaced   \t  runs\n\n\n\n\ncollapse",
]


def _both(spark, pages):
    rows = [(i, p) for i, p in enumerate(pages)]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    got = extract_text(df).orderBy("doc_id").toPandas()
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, html VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = con.sql(html_oracle_sql("t") + " ORDER BY doc_id").df()
    return got, want


def _assert_match(got, want):
    a, b = got.text, want.text
    bad = ~((a == b) | (a.isna() & b.isna()))
    assert not bad.any(), list(zip(got.html[bad], a[bad], b[bad]))


def test_zoo_matches_duckdb_and_semantics(spark):
    got, want = _both(spark, ZOO)
    _assert_match(got, want)
    by = dict(zip(got.doc_id, got.text))
    page = by[0]
    # script/style/comment content gone, visible text in block order
    assert "color: red" not in page and "not text" not in page
    assert "a comment" not in page
    for frag in ("Heading One", "item one", "item two", "cell a",
                 "trailing text", 'with entities: <tag> "quoted"'):
        assert frag in page, frag
    assert page.index("Heading One") < page.index("First paragraph")
    assert "\n\n\n" not in page  # blank-line cap
    assert by[3] == "visible" and by[4] == "after"
    # '&amp;lt;' -> '&lt;' (single decode); the bare '&lt;' -> '<'
    assert by[6] == "&lt; decodes ONCE to < not to <"
    assert by[8] == "" and by[9] is None
    assert by[10] == "ok" and by[11] == "shown"
    assert by[12] == "spaced runs\n\ncollapse"


def test_fuzz_matches_duckdb(spark):
    frags = ["<p>", "</p>", "<div ", ">", "<script>", "</script>", "text",
             "&amp;", "&lt;", "<!--", "-->", "<br/>", " ", "\n", "<",
             "word", "<b>", "</b>", "&nbsp;", "<li>"]
    rng = np.random.default_rng(31)
    pages = ["".join(rng.choice(frags) for _ in range(int(rng.integers(0, 20))))
             for _ in range(300)]
    got, want = _both(spark, pages)
    _assert_match(got, want)
    # no complete tags survive extraction — except ones the entity decode
    # legitimately creates ('&lt;b>' -> '<b>'), so scope to '&'-free input
    no_ent = got[~got.html.str.contains("&", na=False)]
    assert not no_ent.text.str.contains(r"<[a-z]+>", regex=True, na=False).any()


def test_plan_is_udf_free_and_composes(spark):
    df = spark.createDataFrame([(0, "<p>hello</p>")], "doc_id long, html string")
    out = extract_text(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    # composes with the text family downstream
    from timeseriesvectordbpattermatcher_spark.operators.textstats import (
        add_token_counts,
    )

    row = add_token_counts(out).collect()[0]
    assert row.text == "hello" and row.n_tokens_ws == 1
