"""URL canonicalization, host extraction, URL-level dedup, and domain
filtering — the stage a web-crawl curation pipeline runs BEFORE content
dedup (two crawls of the same page differ only in tracking params and
fragment; canonical-URL dedup removes them for the cost of a string
projection plus one digest-style shuffle, orders of magnitude cheaper
than MinHash on the bodies).

Everything is a pure codegen'd SQL expression chain — no UDF, no
driver-side parsing. Tracking-param removal deliberately avoids the
regex-surgery trap (lookahead + separator consumption diverge between
engines): the query string is split on ``&``, filtered with an anchored
per-param pattern, and rejoined — higher-order array functions both Spark
and DuckDB implement with identical semantics, so the DuckDB oracle
(``url_canon_oracle_sql``) reproduces the canonical form byte-for-byte
(``tests/test_urls.py``).

Canonicalization semantics (deterministic, idempotent):

1. trim surrounding whitespace
2. lowercase the scheme and authority (path/query case is preserved —
   paths are case-sensitive on most origins)
3. strip the fragment (``#...``)
4. drop leading ``www.`` labels (repeated, so ``www.www.x`` folds too)
5. drop default ports (``:80`` for http, ``:443`` for https)
6. remove tracking params (``utm_*``, ``gclid``, ``fbclid``, ``msclkid``,
   ``ref``), preserving the relative order of survivors; a query left
   empty — including a bare trailing ``?`` — disappears entirely
7. drop any string-final run of slashes, spaces, and bare ``?``
   (``https://a.com/x/`` == ``.../x``; the bare-host form
   ``https://a.com/`` likewise folds to no-slash). Only string-final —
   a slash before a non-empty query is part of the path and kept.

Idempotence (canonicalize twice == once) holds for every input including
non-URL garbage, and is fuzz-pinned in the tests.

NULL urls propagate NULL throughout, per the engine-wide convention.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: anchored match for one query param that should be dropped
TRACKING_PARAM_RE = r"^(utm_[^=&]*|gclid|fbclid|msclkid|ref)(=.*)?$"


def canonical_url_col(url: Column | str) -> Column:
    """The canonicalization chain as a single column expression."""
    u = F.trim(F.col(url) if isinstance(url, str) else url)
    # 2. lowercase the scheme://authority prefix, preserve the rest
    pre = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*", 0)
    u = F.concat(F.lower(pre), F.substr(u, F.length(pre) + 1))
    u = F.regexp_replace(u, r"#.*", "")                                # 3
    u = F.regexp_replace(u, r"^([a-z][a-z0-9+.\-]*://)(www\.)+", r"$1")  # 4
    u = F.regexp_replace(u, r"^(http://[^/:?#]+):80([/?].*)?$", r"$1$2")    # 5
    u = F.regexp_replace(u, r"^(https://[^/:?#]+):443([/?].*)?$", r"$1$2")  # 5
    # 6. split the query on '&', drop tracking params, rejoin
    base = F.substring_index(u, "?", 1)
    query = F.when(
        u.contains("?"), F.substr(u, F.length(base) + 2)
    ).otherwise(F.lit(""))
    kept = F.filter(
        F.split(query, "&"),
        lambda p: ~p.rlike(TRACKING_PARAM_RE),
    )
    rebuilt = (
        F.when(~u.contains("?"), u)
        .when(query == "", base)  # bare trailing '?': empty query drops
        .when(
            F.size(kept) > 0,
            F.concat(base, F.lit("?"), F.array_join(kept, "&")),
        )
        .otherwise(base)
    )
    return F.regexp_replace(rebuilt, r"[/ ?]+$", "")                   # 7


def canonicalize_urls(
    df: DataFrame, url_col: str = "url", out_col: str = "url_canon"
) -> DataFrame:
    """Append the canonical form of ``url_col`` (see module docstring)."""
    return df.withColumn(out_col, canonical_url_col(url_col))


def host_of(
    df: DataFrame, url_col: str = "url_canon", out_col: str = "host"
) -> DataFrame:
    """Extract the (already-lowercased) host, port excluded. Runs on the
    canonical column by default; NULL/relative urls yield NULL."""
    h = F.regexp_extract(F.col(url_col), r"^[a-z][a-z0-9+.\-]*://([^/:?#]+)", 1)
    return df.withColumn(out_col, F.when(h == "", None).otherwise(h))


def url_dedup(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Keep the smallest-``id_col`` row per canonical URL (the engine-wide
    keep-first convention). One shuffle on the canonical string — at crawl
    scale this is the cheap pre-filter before content dedup. Rows whose
    url is NULL pass through untouched; the canonical column is dropped
    from the output (derivable, and a schema-stable frame composes
    directly with exact_dedup)."""
    canon = canonicalize_urls(df, url_col, "_uc")
    w = Window.partitionBy("_uc").orderBy(id_col)
    kept = (
        canon.filter(F.col(url_col).isNotNull())
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_uc")
    )
    return df.filter(F.col(url_col).isNull()).unionByName(kept)


def filter_domains(
    df: DataFrame,
    blocklist: list[str] | DataFrame,
    url_col: str = "url",
    mode: str = "drop",
) -> DataFrame:
    """Drop (or keep, ``mode='keep'``) rows whose canonical host is in the
    blocklist, matching the host itself or any parent-domain suffix
    (``ads.example.com`` matches a listed ``example.com``). List input
    stays a literal predicate (pure expr, zero shuffle); DataFrame input
    (column ``domain``) is a broadcast join, so the corpus never shuffles
    either way. NULL/host-less urls are kept in drop mode (nothing to
    match) and dropped in keep mode."""
    if mode not in ("drop", "keep"):
        raise ValueError(f"mode must be drop|keep, got {mode!r}")
    hosted = host_of(canonicalize_urls(df, url_col, "_uc"), "_uc", "_host")
    if isinstance(blocklist, DataFrame):
        doms = F.broadcast(
            blocklist.select(F.lower(F.col("domain")).alias("_dom")).distinct()
        )
        joined = hosted.join(
            doms,
            (F.col("_host") == F.col("_dom"))
            | F.col("_host").endswith(F.concat(F.lit("."), F.col("_dom"))),
            "left",
        )
        hit = F.col("_dom").isNotNull()
        out = joined.filter(~hit if mode == "drop" else hit).drop("_dom")
    else:
        hit = F.lit(False)
        for d in [d.lower() for d in blocklist]:
            hit = hit | (F.col("_host") == d) | F.col("_host").endswith("." + d)
        hit = F.coalesce(hit, F.lit(False))
        out = hosted.filter(~hit if mode == "drop" else hit)
    return out.drop("_uc", "_host")


def url_canon_oracle_sql(table: str, url_col: str = "url") -> str:
    """Render the identical canonicalization chain as DuckDB SQL — the
    engine-free oracle. DuckDB's ``regexp_replace`` is first-match-only
    without the ``'g'`` flag; steps that are anchored single-match either
    way carry no flag, the rest carry ``'g'``. The query rebuild uses
    ``str_split`` + ``list_filter`` + ``array_to_string``, the same
    higher-order shape as the Spark side."""
    u = f"trim({url_col})"
    pre = rf"regexp_extract({u}, '^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*')"
    u = f"(lower({pre}) || substr({u}, length({pre}) + 1))"
    u = f"regexp_replace({u}, '#.*', '', 'g')"
    u = rf"regexp_replace({u}, '^([a-z][a-z0-9+.\-]*://)(www\.)+', '\1')"
    u = rf"regexp_replace({u}, '^(http://[^/:?#]+):80([/?].*)?$', '\1\2')"
    u = rf"regexp_replace({u}, '^(https://[^/:?#]+):443([/?].*)?$', '\1\2')"
    return f"""
WITH _pre AS (SELECT *, {u} AS _u FROM {table}),
_parts AS (
  SELECT *,
    CASE WHEN contains(_u, '?') THEN split_part(_u, '?', 1) ELSE _u END AS _base,
    CASE WHEN contains(_u, '?')
         THEN substr(_u, length(split_part(_u, '?', 1)) + 2) ELSE '' END AS _q
  FROM _pre),
_kept AS (
  SELECT *, list_filter(str_split(_q, '&'),
            p -> NOT regexp_matches(p, '{TRACKING_PARAM_RE}')) AS _keep
  FROM _parts)
SELECT * EXCLUDE (_u, _base, _q, _keep),
  regexp_replace(
    CASE WHEN NOT contains(_u, '?') THEN _u
         WHEN _q = '' THEN _base
         WHEN len(_keep) > 0 THEN _base || '?' || array_to_string(_keep, '&')
         ELSE _base END,
    '[/ ?]+$', '') AS url_canon
FROM _kept
"""
