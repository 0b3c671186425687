"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Headline metric: rollup throughput in tokens/sec over a deterministic
synthetic ``seqs`` corpus (the north-star workload — raw->1m->1h->1d cascade
including per-row token stats), plus per-query wall seconds for the driver
tables at the given scale factor.

Usage: python bench.py            # one JSON line on stdout
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
       SPARK_GRAFT_CPUS   (default all cores)
       BENCH_SEQS_ROWS    (default 300000)
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_seqs = int(os.environ.get("BENCH_SEQS_ROWS", "300000"))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entrymod
    from timeseriesvectordbpattermatcher_spark.operators.rollup import (
        derive_event_ts,
        rollup_all_tiers,
    )
    from timeseriesvectordbpattermatcher_spark.session import get_spark
    from timeseriesvectordbpattermatcher_spark.sources.synth import synth_seqs

    spark = get_spark(app_name="bench")

    timings: dict[str, float] = {}

    # ---- headline: seqs rollup cascade throughput (tokens/sec) -----------
    seqs = derive_event_ts(synth_seqs(spark, n_seqs, seed=42))
    t0 = time.time()
    tiers = rollup_all_tiers(seqs)
    total_tokens = tiers["1d"].agg({"sum_n_tok": "sum"}).collect()[0][0]
    rollup_sec = time.time() - t0
    timings["seqs_rollup_cascade"] = round(rollup_sec, 3)
    tokens_per_sec = total_tokens / rollup_sec

    # ---- driver-table headline queries ------------------------------------
    qs = entrymod.queries()
    headline = [
        "rollup_1m",
        "rollup_1h_cascade",
        "rollup_1d_cascade",
        "gapfill_locf",
        "gapfill_linear",
        "sessionize",
        "pricing_summary",
        "asof_join",
        "ngram_jaccard",
        "minhash_lsh",
        "cosine_topk",
        "token_segmentation",
        "matcher_pipeline",
        "codec_roundtrip",
        "hs_patterns",
    ]
    for name in headline:
        t0 = time.time()
        n = qs[name](spark, sf_dir).count()
        timings[name] = round(time.time() - t0, 3)
        _ = n

    print(
        json.dumps(
            {
                "metric": "rollup_throughput_tokens_per_sec",
                "value": round(tokens_per_sec, 1),
                "unit": "tokens/sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "seqs_rows": n_seqs,
                "total_tokens": int(total_tokens),
                "cpus": os.environ.get("SPARK_GRAFT_CPUS", "all"),
            }
        )
    )


if __name__ == "__main__":
    main()
