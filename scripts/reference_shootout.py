"""Single-node shootout: this engine vs a faithful pandas restatement of
the reference's execution model, on identical synthetic data.

The reference (jacky892/timeseriesVectorDBPatterMatcher) is a single-
threaded pandas program: per-ticker loops for normalization/segmentation
(/root/reference/katslib/opkatsDataUtil.py:233-238) and eager in-memory
groupbys. It publishes no benchmark numbers (BASELINE.md), so the honest
comparison is: same algorithm, same data, same feature kernel — reference-
style pandas loop vs this repo's Spark plan, one node, wall clock.

Workloads:
  A. E1 segmentation: ma-normalize (250-row MA) + 64/10 sliding windows +
     40-dim features over an OHLCV panel. pandas = per-ticker loop (the
     reference's structure, our numpy kernel for fairness);
     spark = ma_normalize + segment_series (applyInPandas).
  B. North-star rollup: (source, minute) count/sum/min/max over a seqs
     corpus + token-level stats. pandas = single groupby (token stats via
     a python loop over object arrays — exactly what pandas gives you);
     spark = rollup_1m (JVM higher-order funcs, one shuffle).

Writes a JSON line and appends a section to BENCH/BASELINE.md.

Usage: python scripts/reference_shootout.py [--tickers 40] [--days 1500]
       [--rows 1000000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BEGIN_MARK = "<!-- shootout:begin -->"
END_MARK = "<!-- shootout:end -->"


# ---------------------------------------------------------------------------
# pandas baselines (the reference's structure)
# ---------------------------------------------------------------------------


def pandas_segment(panel: pd.DataFrame, winsize: int = 64, step: int = 10) -> int:
    """Per-ticker loop: ma_normalized (opkatsDataUtil.py:147-155) then
    sliding windows + features (opkatsDataUtil.py:51-114,163-219)."""
    from timeseriesvectordbpattermatcher_spark.functions.features import features_40

    n_segments = 0
    for _, df in panel.groupby("series_id", sort=False):
        df = df.sort_values("ts").reset_index(drop=True)
        close_ma = df["close"].rolling(250).mean()
        vol_ma = df["volume"].rolling(250).mean()
        ndf = pd.DataFrame(
            {
                "ts": df["ts"],
                "open": df["open"] / close_ma,
                "close": df["close"] / close_ma,
                "volume": df["volume"] / vol_ma,
            }
        ).dropna()
        ndf = ndf.reset_index(drop=True)
        # forward-return labels + capped 'avg' oversampling
        # (opkatsDataUtil.py:60-114) — the cap SKIPS surplus 'avg' windows
        close = ndf["close"].to_numpy()
        fw = np.full(len(ndf), np.nan)
        if len(ndf) > 10:
            fw[:-10] = close[10:] / close[:-10] - 1.0
        wins = []
        n_drop = n_avg = 0
        for s in range(0, len(ndf), step):
            win = ndf.iloc[s : s + winsize]
            if len(win) != winsize:
                continue
            fw_last = fw[s + winsize - 1] if s + winsize - 1 < len(fw) else np.nan
            if not np.isnan(fw_last) and fw_last > 0.07:
                pass
            elif not np.isnan(fw_last) and fw_last < -0.05:
                n_drop += 1
            else:
                if n_avg >= 2 * n_drop:
                    continue
                n_avg += 1
            prices = np.column_stack([win["open"].to_numpy(), win["close"].to_numpy()]).ravel()
            times = np.repeat(win["ts"].to_numpy(), 2)
            seq = pd.DataFrame({"time": times, "price": prices}).drop_duplicates(
                keep="first"
            )["price"].to_numpy()
            wins.append(seq)
        by_len: dict[int, list[np.ndarray]] = {}
        for w in wins:
            by_len.setdefault(len(w), []).append(w)
        for length, group in by_len.items():
            if length < 2:
                continue
            feats = features_40(np.stack(group))
            n_segments += int((~np.isnan(feats).all(axis=1)).sum())
    return n_segments


def pandas_rollup(pdf: pd.DataFrame) -> int:
    """Single eager groupby + per-row python token stats (object arrays are
    all pandas offers for array<int> columns)."""
    tok_min = np.empty(len(pdf))
    tok_max = np.empty(len(pdf))
    tok_sum = np.empty(len(pdf), dtype=np.int64)
    for i, t in enumerate(pdf["tokens"].to_numpy()):
        a = np.asarray(t)
        tok_min[i] = a.min() if len(a) else np.nan
        tok_max[i] = a.max() if len(a) else np.nan
        tok_sum[i] = a.sum()
    g = pdf.assign(
        bucket_ts=pdf["event_ts"].dt.floor("min"),
        tok_min=tok_min,
        tok_max=tok_max,
        tok_sum=tok_sum,
    ).groupby(["source", "bucket_ts"])
    out = g.agg(
        cnt=("n_tok", "size"),
        sum_n_tok=("n_tok", "sum"),
        min_n_tok=("n_tok", "min"),
        max_n_tok=("n_tok", "max"),
        tok_min=("tok_min", "min"),
        tok_max=("tok_max", "max"),
        tok_sum=("tok_sum", "sum"),
    )
    return len(out)


# ---------------------------------------------------------------------------


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tickers", type=int, default=200)
    ap.add_argument("--days", type=int, default=2500)
    ap.add_argument("--rows", type=int, default=1_000_000)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from timeseriesvectordbpattermatcher_spark.operators.rollup import (
        derive_event_ts,
        rollup_1m,
    )
    from timeseriesvectordbpattermatcher_spark.operators.segmentation import (
        ma_normalize,
        segment_series,
    )
    from timeseriesvectordbpattermatcher_spark.session import get_spark
    from timeseriesvectordbpattermatcher_spark.sources.synth import (
        synth_ohlcv,
        synth_seqs,
    )

    spark = get_spark(app_name="shootout")

    # ---- workload A: segmentation --------------------------------------
    ohlcv = synth_ohlcv(spark, n_tickers=args.tickers, n_days=args.days)
    panel = ohlcv.toPandas()  # both sides start from in-memory/local data

    def best_of(k, fn):
        best, val = None, None
        for _ in range(k):
            t0 = time.time()
            val = fn()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        return best, val

    # symmetric protocol on BOTH sides — one untimed warm-up, then best-of-3
    # (this VM has bursty noisy-neighbor contention)
    pandas_segment(panel)  # warm (page cache / numpy)
    seg_pandas, n_pd = best_of(3, lambda: pandas_segment(panel))
    segment_series(ma_normalize(ohlcv)).count()  # warm (JVM + python workers)
    seg_spark, n_sp = best_of(3, lambda: segment_series(ma_normalize(ohlcv)).count())
    assert n_sp == n_pd, (n_sp, n_pd)

    # ---- workload B: rollup + token stats -------------------------------
    corpus = os.path.join("/tmp", f"seqs_shootout_{args.rows}")
    if not os.path.exists(os.path.join(corpus, "_SUCCESS")):
        synth_seqs(spark, args.rows, seed=42).write.mode("overwrite").parquet(corpus)
    seqs = derive_event_ts(spark.read.parquet(corpus))

    pdf = pd.read_parquet(corpus)
    pdf["event_ts"] = pd.to_datetime(
        pdf["doc_id"].str.split("_").str[1], format="%Y%m%d%H%M%S"
    )
    pandas_rollup(pdf)  # warm
    roll_pandas, n_buckets_pd = best_of(3, lambda: pandas_rollup(pdf))

    def spark_roll():
        return rollup_1m(seqs).agg(
            F.count("*"), F.sum("tok_sum"), F.min("tok_min"), F.max("tok_max")
        ).collect()[0][0]

    spark_roll()  # warm
    roll_spark, n_buckets_sp = best_of(3, spark_roll)
    assert n_buckets_sp == n_buckets_pd, (n_buckets_sp, n_buckets_pd)

    summary = {
        "segmentation": {
            "tickers": args.tickers,
            "days": args.days,
            "segments": n_pd,
            "pandas_sec": round(seg_pandas, 2),
            "spark_sec": round(seg_spark, 2),
            "speedup": round(seg_pandas / seg_spark, 2),
        },
        "rollup": {
            "rows": args.rows,
            "buckets": int(n_buckets_pd),
            "pandas_sec": round(roll_pandas, 2),
            "spark_sec": round(roll_spark, 2),
            "speedup": round(roll_pandas / roll_spark, 2),
        },
    }
    print(json.dumps(summary))

    md = f"""{BEGIN_MARK}
## Single-node shootout vs reference-style pandas

Same data, same algorithm, same feature kernel; pandas side mirrors the
reference's per-ticker loop / eager groupby structure (it publishes no
numbers of its own — BASELINE.md). One node, wall clock; both sides get
one untimed warm-up then best-of-3.

| workload | size | pandas (s) | this engine (s) | speedup |
|---|---|---|---|---|
| E1 segmentation (ma-norm + 64/10 windows + 40-dim features) | {args.tickers} series x {args.days} rows -> {n_pd} segments | {seg_pandas:.1f} | {seg_spark:.1f} | **{seg_pandas / seg_spark:.1f}x** |
| north-star 1m rollup + token stats | {args.rows:,} rows | {roll_pandas:.1f} | {roll_spark:.1f} | **{roll_pandas / roll_spark:.1f}x** |

Both sides produce identical segment/bucket counts (asserted in
scripts/reference_shootout.py).
{END_MARK}
"""
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(path) as fh:
        existing = fh.read()
    # replace ONLY the marker-delimited shootout section (sections appended
    # after it must survive re-runs)
    if BEGIN_MARK in existing and END_MARK in existing:
        pre = existing[: existing.index(BEGIN_MARK)]
        post = existing[existing.index(END_MARK) + len(END_MARK) :]
        existing = pre + md.strip("\n") + post
    else:
        existing = existing.rstrip("\n") + "\n" + md
    with open(path, "w") as fh:
        fh.write(existing)


if __name__ == "__main__":
    main()
