"""Local stand-in for the driver's correctness gate: runs every
``__spark_entry__.queries()`` entry on Spark at sf0.01 and, where an
``oracle_sql()`` entry exists, the same query on DuckDB over the same
parquet tables; compares row count, column names, and an order-insensitive
value hash (columns sorted by name, rows sorted, floats rounded).

Usage: python scripts/check_contract.py [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    import hashlib

    return hashlib.md5(norm(df).to_csv(index=False).encode()).hexdigest()


def main() -> None:
    only = set(sys.argv[1:])

    import __spark_entry__ as e
    from timeseriesvectordbpattermatcher_spark.session import get_spark

    spark = get_spark(app_name="check_contract")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: spark error {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        if name not in oracles:
            # rows-only queries must produce rows — an empty frame would
            # pass every vacuous check and hide a regression (round-1 ADVICE)
            if len(sdf) == 0:
                print(f"FAIL {name}: rows-only query returned 0 rows")
                n_fail += 1
                continue
            # self-asserting *_ok boolean columns must be all-true
            ok_cols = [c for c in sdf.columns if c.endswith("_ok")]
            bad_flags = [
                c for c in ok_cols if not bool(sdf[c].fillna(False).all())
            ]
            if bad_flags:
                print(f"FAIL {name}: rows-only *_ok flags false: {bad_flags}")
                n_fail += 1
                continue
            flag_note = f", {len(ok_cols)} ok-flags true" if ok_cols else ""
            print(f"ok   {name}: rows-only ({len(sdf)} rows{flag_note}, {time.time()-t0:.1f}s)")
            n_pass += 1
            continue
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        problems = []
        if len(sdf) != len(ddf):
            problems.append(f"rows {len(sdf)} != {len(ddf)}")
        # case-SENSITIVE, mirroring the strictest the driver could be (note:
        # DuckDB actually PRESERVES unquoted alias case; quoting is merely a
        # belt-and-braces guarantee, not a requirement)
        if sorted(sdf.columns) != sorted(ddf.columns):
            problems.append(f"cols {sorted(sdf.columns)} != {sorted(ddf.columns)}")
        if not problems:
            if value_hash(sdf) != value_hash(ddf):
                problems.append("value-hash mismatch")
                a, b = norm(sdf), norm(ddf)
                diff = (a != b) & ~(a.isna() & b.isna())
                bad = diff.any(axis=1)
                if bad.any():
                    i = bad.idxmax()
                    print(f"  first diff row {i}:\n  spark {a.loc[i].to_dict()}\n  duck  {b.loc[i].to_dict()}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
