"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Headline metric: rollup throughput in tokens/sec over a deterministic
synthetic ``seqs`` corpus (the north-star workload — raw->1m->1h->1d cascade
including per-row token stats), plus per-query wall seconds for the driver
tables at the given scale factor.

Usage: python bench.py            # one JSON line on stdout
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
       SPARK_GRAFT_CPUS   (default all cores)
       BENCH_SEQS_ROWS    (default 2000000)
"""

from __future__ import annotations

import json
import os
import sys
import time


def _cpu_calibration() -> float:
    """Single-core integer-loop throughput (M ops/s) measured in-process.

    The sandbox VM's sustained compute varies wildly between rounds
    (measured 10-21 M ops/s single-core across sessions; Spark throughput
    moves with it) — recording the calibration alongside each bench run
    lets round-over-round comparisons separate engine regressions from
    host-speed swings.
    """
    n = 20_000_000
    t0 = time.time()
    x = 0
    for i in range(n):
        x += i * i
    return round(n / (time.time() - t0) / 1e6, 1)


def _cpu_calibration_mc(procs: int = 8) -> float:
    """All-core variant: aggregate M ops/s across ``procs`` concurrent
    busy-loop processes.

    The single-core loop measures boost-clock frequency only; this VM's
    noisy-neighbor contention shows up as the RATIO between the two
    (round-3 measurement: two back-to-back bench runs differed 2x on
    sub-second queries while single-core calib moved <12%). Record both so
    round-over-round diffs can tell engine regressions from a busy box.
    """
    import multiprocessing as mp

    n = 20_000_000
    with mp.Pool(procs) as pool:
        # untimed warm-up absorbs pool fork/import cost, then time only the
        # second map — same protocol as scripts/scaling_bench.py host_rate,
        # so the two calibration numbers are comparable
        pool.map(_mc_loop, [n] * procs)
        t0 = time.time()
        pool.map(_mc_loop, [n] * procs)
        dt = time.time() - t0
    return round(procs * n / dt / 1e6, 1)


def _mc_loop(n: int) -> int:
    x = 0
    for i in range(n):
        x += i * i
    return x


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_seqs = int(os.environ.get("BENCH_SEQS_ROWS", "2000000"))
    sf = sf_dir.rstrip("/").split("sf")[-1]
    cpu_calib = _cpu_calibration()
    cpu_calib_mc = _cpu_calibration_mc()

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
    # Two honesty rules: (a) the corpus is WRITTEN ONCE and the timed job
    # scans parquet — otherwise the timing measures the synthetic token
    # generator, not the engine; (b) the final agg pulls the token-level
    # stats, otherwise Catalyst prunes the tok_* aggregates and the scan
    # never decodes a single token array.
    import tempfile

    from pyspark.sql import functions as F

    corpus = os.path.join(tempfile.gettempdir(), f"seqs_bench_{n_seqs}")
    if not os.path.exists(os.path.join(corpus, "_SUCCESS")):
        synth_seqs(spark, n_seqs, seed=42).write.mode("overwrite").parquet(corpus)
    seqs = derive_event_ts(spark.read.parquet(corpus))

    def cascade_once():
        # arrow_drop: the deployment default (scripts/rollup_job.py) — the
        # bench measures what ships. Same-session engine shootouts at
        # local[32]/2M rows measured arrow_drop 176.8M tok/s vs expr 91.8M
        # (an earlier degraded-host session at pinned local[8] had expr
        # 94.5M vs arrow_drop 85.8M — the HOF-vs-IPC balance moves with
        # delivered CPU, the engine matrix in BENCH/BASELINE.md keeps both)
        tiers = rollup_all_tiers(seqs, token_engine="arrow_drop")
        return tiers["1d"].agg(
            F.sum("sum_n_tok"), F.sum("tok_sum"), F.min("tok_min"), F.max("tok_max")
        ).collect()[0][0]

    # best-of-5 with one untimed warm-up: this sandbox VM has bursty
    # noisy-neighbor contention (identical runs measured 6-300 M tokens/s;
    # three same-code r3 runs spread 2.86-11.66 s on this query);
    # min-of-k is the standard antidote
    total_tokens = cascade_once()
    rollup_sec = None
    for _ in range(5):
        t0 = time.time()
        cascade_once()
        dt = time.time() - t0
        rollup_sec = dt if rollup_sec is None or dt < rollup_sec else rollup_sec
    timings["seqs_rollup_cascade"] = round(rollup_sec, 3)
    tokens_per_sec = total_tokens / rollup_sec

    # JVM-only decode floor, same window: decode every token array and sum
    # it with zero Python. The cascade is decode-bandwidth-bound (healthy
    # hosts measure it within ~12% of this floor — BENCH/BASELINE.md), so
    # the cascade/floor ratio separates "code got slower" from "the host's
    # delivered decode bandwidth collapsed this window".
    def floor_once():
        return seqs.agg(
            F.sum(F.size("tokens")),
            F.sum(F.aggregate("tokens", F.lit(0).cast("long"), lambda a, x: a + x)),
        ).collect()[0][0]

    floor_once()
    floor_sec = None
    for _ in range(3):
        t0 = time.time()
        floor_once()
        dt = time.time() - t0
        floor_sec = dt if floor_sec is None or dt < floor_sec else floor_sec

    # ---- quantile-histogram plane: 1m->1h->1d exact p50/p95/p99 ----------
    # same cached corpus as the cascade, so this times the histogram build
    # + two exact merges + the codegen'd quantile fold, not synth or IO
    from timeseriesvectordbpattermatcher_spark.operators.quantiles import (
        add_hist_quantiles,
        hist_1m,
        hist_cascade,
    )

    def hist_once():
        day = hist_cascade(hist_cascade(hist_1m(seqs), "1h"), "1d")
        return add_hist_quantiles(day).agg(
            F.sum("hist_n"), F.max("p99"), F.min("p50")
        ).collect()[0][0]

    hist_once()
    best = None
    for _ in range(3):
        t0 = time.time()
        hist_once()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    timings["hist_quantiles_1d"] = round(best, 3)

    # ---- ddsketch / cms / heartbeat planes: same cached corpus, same
    # 1m -> 1h -> 1d build+merge+read shape as the hist timing above
    from timeseriesvectordbpattermatcher_spark.operators.cms import (
        cms_all_tiers,
        cms_bucket,
        cms_cascade,
        cms_estimate,
    )
    from timeseriesvectordbpattermatcher_spark.operators.ddsketch import (
        dds_bucket,
        dds_cascade,
        dds_quantiles,
    )
    from timeseriesvectordbpattermatcher_spark.operators.stateagg import (
        heartbeat_bucket,
        heartbeat_cascade,
        heartbeat_read,
    )

    def dds_once():
        day = dds_cascade(dds_cascade(dds_bucket(seqs), "1h"), "1d")
        return dds_quantiles(day, qs={"p95": 0.95}).agg(
            F.sum("p95"), F.sum("dds_n")
        ).collect()[0][0]

    def cms_once():
        # fused build: one raw scan + one shuffle produces ALL tiers
        # (bit-exact vs cms_bucket + cms_cascade, parity-pinned); the 1m
        # and 1h sketches still materialize through the kernel — only the
        # day tier feeds the estimate read, mirroring the shipping shape
        # where the combined frame is written once partitioned by tier
        day = cms_all_tiers(seqs).filter(F.col("tier") == "1d")
        return day.select(
            *[cms_estimate("cms", t).alias(f"e{t}") for t in range(0, 160, 10)]
        ).agg(*[F.sum(f"e{t}") for t in range(0, 160, 10)]).collect()[0][0]

    def cms_unfused_once():
        day = cms_cascade(cms_cascade(cms_bucket(seqs), "1h"), "1d")
        return day.select(
            *[cms_estimate("cms", t).alias(f"e{t}") for t in range(0, 160, 10)]
        ).agg(*[F.sum(f"e{t}") for t in range(0, 160, 10)]).collect()[0][0]

    def hb_once():
        hb = seqs.select("source", "event_ts").distinct()
        day = heartbeat_cascade(
            heartbeat_cascade(heartbeat_bucket(hb, 120.0), "1h"), "1d"
        )
        return heartbeat_read(day, "1d").agg(
            F.sum("uptime"), F.sum("num_gaps")
        ).collect()[0][0]

    # ---- session-6 reads: stats2 plane + rolling p99 from tier maps
    from timeseriesvectordbpattermatcher_spark.operators.quantiles import (
        hist_rolling_quantiles,
    )
    from timeseriesvectordbpattermatcher_spark.operators.stats2d import (
        stats2_bucket,
        stats2_cascade,
        stats2_read,
    )

    def stats2_once():
        day = stats2_cascade(
            stats2_cascade(stats2_bucket(seqs), "1h"), "1d", from_tier="1h"
        )
        return stats2_read(day, accessors=("slope", "corr", "r2")).agg(
            F.sum("slope"), F.sum("corr"), F.sum("n")
        ).collect()[0][0]

    def rollq_once():
        # weekly p99 as of each day — the intended large-window rolling
        # read (cost scales with slots x window x value-domain, so the
        # coarser tier is the right source for wide windows)
        t1d = hist_cascade(hist_cascade(hist_1m(seqs), "1h"), "1d")
        return hist_rolling_quantiles(
            t1d, 7, "1d", qs={"p99": 0.99}, min_buckets=1
        ).agg(F.sum("p99"), F.sum("hist_n")).collect()[0][0]

    for qname, fn in (("dds_quantiles_1d", dds_once),
                      ("cms_tokenfreq_1d", cms_once),
                      ("cms_tokenfreq_1d_unfused", cms_unfused_once),
                      ("heartbeat_1d", hb_once),
                      ("stats2_plane_1d", stats2_once),
                      ("rolling_p99_7d", rollq_once)):
        fn()
        best = None
        for _ in range(3):
            t0 = time.time()
            fn()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        timings[qname] = round(best, 3)

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
        "minhash_dedup",
        "cosine_topk",
        "token_segmentation",
        "matcher_pipeline",
        "codec_roundtrip",
        "hs_patterns",
        "ta_indicators",
        "multi_stop",
    ]
    for name in headline:
        best = None
        for _ in range(3):  # best-of-3: see noisy-neighbor note above
            t0 = time.time()
            qs[name](spark, sf_dir).count()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        timings[name] = round(best, 3)

    # sf1 evidence block (scripts/sf1_bench.py, run separately per round —
    # ~3 min of 10x-scale runs don't belong in the per-round bench loop).
    # It carries its OWN calibration fields: the block was measured in a
    # different host window than this run.
    sf1_block = None
    sf1_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH", "sf1_latest.json"
    )
    if os.path.exists(sf1_path):
        with open(sf1_path) as fh:
            sf1_block = json.load(fh)

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
                "cpu_calib_mops": cpu_calib,
                "cpu_calib_mops_mc8": cpu_calib_mc,
                "jvm_decode_floor_sec": round(floor_sec, 3),
                "cascade_vs_floor": round(rollup_sec / floor_sec, 2),
                "sf1": sf1_block,
            }
        )
    )


if __name__ == "__main__":
    main()
