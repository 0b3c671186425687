"""Generate the committed golden fixtures backing the non-relational
contract queries (``__spark_entry__.GOLDEN_QUERIES``).

Each golden is the query's output at sf0.01 — the driver's correctness
scale factor — written as ONE parquet file so DuckDB's ``read_parquet``
can serve it as the oracle. These are REGRESSION pins: they freeze current
behavior so any semantic drift fails the driver's rows+schema+hash gate.
The independent correctness evidence for the same operators lives in
pytest (pandas-oracle cross-checks in tests/test_stops.py,
test_tradesim.py, test_dedup_textstats.py, test_matcher.py, ...).

Regenerate deliberately only: ``python scripts/make_goldens.py --force [name ...]``.
``matcher_golden_parity`` is served by the pre-existing
tests/golden/matches.parquet (written by tests/test_invariants.py) and is
never regenerated here.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
GOLDEN_DIR = os.path.join(REPO, "tests", "golden")


def main() -> None:
    import __spark_entry__ as e
    from timeseriesvectordbpattermatcher_spark.session import get_spark

    force = "--force" in sys.argv
    only = {a for a in sys.argv[1:] if not a.startswith("--")}
    spark = get_spark(app_name="make_goldens")
    qs = e.queries()
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name in e.GOLDEN_QUERIES:
        if name == "matcher_golden_parity":
            continue  # served by tests/golden/matches.parquet
        if only and name not in only:
            continue
        path = os.path.join(GOLDEN_DIR, f"{name}.parquet")
        if os.path.exists(path) and not force:
            print(f"skip {name} (exists)")
            continue
        pdf = qs[name](spark, SF_DIR).toPandas()
        pdf.to_parquet(path, index=False)
        print(f"wrote {name}: {len(pdf)} rows -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
