"""Sliding-window segmentation + per-segment feature embedding.

Re-expresses the reference's datapack build
(/root/reference/katslib/opkatsDataUtil.py:51-57 ``windows``, :60-114
``stock_df_oversampler``, :147-155 ``ma_normalized``, :163-219 feature
embedding) as a partition-parallel Spark pipeline:

- ``ma_normalize``       — Window expressions (JVM-side, codegen'd)
- ``segment_series``     — ``applyInPandas`` per series (the per-ticker loop
                           of the reference parallelizes across series; the
                           order-dependent 'avg' cap at :107-110 is sequential
                           only *within* one series, which grouped-map
                           preserves exactly)
- ``segment_tokens``     — ``mapInPandas`` over the seqs corpus (north-star
                           segmentation of token arrays; rows are independent
                           so this is embarrassingly parallel)

Reference quirks preserved deliberately (documented so fixtures can pin them):
- label/prefix swap: 'bigrise' windows get prefix ``dr_``, 'bigdrop' get
  ``ri_`` (:102,:105 — prefixes look inverted but that's what the code does);
- the 'avg' cap compares against ``len(bigdrop)*2`` (:107 counts ``bigdrop``
  twice — a reference bug we reproduce under ``cap_mode='reference'`` and fix
  under ``cap_mode='balanced'``);
- windows with any NaN in Open/Close/Volume, or shorter than ``winsize``,
  are skipped (:94-96);
- the embed series interleaves Open/Close per row (2 points/day, :176-183)
  then drops duplicate (time, price) pairs keep-first (:185).

Scale notes: segmentation shuffles once on the series key (or not at all for
token mode); feature extraction is one numpy batch per Arrow chunk. Token
arrays for 10^12 rows never leave their input partition.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.features import features_40

WINDOW_SIZE = 64
STEP = 10
MA_DAYS = 250
UP_THRESHOLD = 0.07
DOWN_THRESHOLD = 0.05
FORWARD_DAYS = 10

SEGMENT_SCHEMA = (
    "segment_id string, series_id string, label string, "
    "start_ts timestamp, end_ts timestamp, fw_ret double, features array<float>"
)

TOKEN_SEGMENT_SCHEMA = (
    "segment_id string, doc_id string, source string, "
    "start_idx int, end_idx int, features array<float>"
)


def ma_normalize(
    df: DataFrame,
    series_col: str = "series_id",
    ts_col: str = "ts",
    madays: int = MA_DAYS,
) -> DataFrame:
    """Long-MA normalization (reference ``ma_normalized``,
    /root/reference/katslib/opkatsDataUtil.py:147-155): Open and Close are
    divided by the ``madays``-row mean of Close, Volume by the mean of
    Volume; rows without a full window (pandas ``min_periods`` semantics +
    ``dropna``) are dropped.
    """
    w = Window.partitionBy(series_col).orderBy(ts_col).rowsBetween(-(madays - 1), 0)
    n_prev = F.count("close").over(w)
    close_ma = F.when(n_prev >= madays, F.avg("close").over(w))
    vol_ma = F.when(n_prev >= madays, F.avg("volume").over(w))
    return (
        df.withColumn("open", F.col("open") / close_ma)
        .withColumn("close_n", F.col("close") / close_ma)
        .withColumn("volume", F.col("volume") / vol_ma)
        .withColumn("close", F.col("close_n"))
        .drop("close_n")
        .na.drop(subset=["open", "close", "volume"])
    )


def _interleave_dedupe(win: pd.DataFrame) -> np.ndarray:
    """Open/Close interleaved (2 points per ts) with duplicate (time, price)
    pairs dropped keep-first — /root/reference/katslib/opkatsDataUtil.py:176-186."""
    prices = np.column_stack([win["open"].to_numpy(), win["close"].to_numpy()]).ravel()
    times = np.repeat(win["ts"].to_numpy(), 2)
    df = pd.DataFrame({"time": times, "price": prices})
    return df.drop_duplicates(keep="first")["price"].to_numpy(dtype=np.float64)


def _features_varlen(windows: list[np.ndarray]) -> list[np.ndarray | None]:
    """Batch the kernel over same-length groups (dedupe makes lengths vary)."""
    by_len: dict[int, list[int]] = {}
    for i, w in enumerate(windows):
        by_len.setdefault(len(w), []).append(i)
    out: list[np.ndarray | None] = [None] * len(windows)
    for length, idxs in by_len.items():
        if length < 2:
            continue
        feats = features_40(np.stack([windows[i] for i in idxs]))
        for j, i in enumerate(idxs):
            row = feats[j]
            out[i] = None if np.isnan(row).all() else row
    return out


def segment_series(
    df: DataFrame,
    series_col: str = "series_id",
    ts_col: str = "ts",
    winsize: int = WINDOW_SIZE,
    step: int = STEP,
    up_threshold: float = UP_THRESHOLD,
    down_threshold: float = DOWN_THRESHOLD,
    forward_days: int = FORWARD_DAYS,
    cap_mode: str = "reference",
) -> DataFrame:
    """Per-series sliding windows (size/step per reference defaults 64/10) with
    forward-return labels and 40-dim features.

    Output keys follow the reference id convention
    ``'{prefix}_{series}_{YYYYMMDD}_{YYYYMMDD}'``
    (/root/reference/katslib/opkatsDataUtil.py:98,102,105,110).
    """
    if cap_mode not in ("reference", "balanced"):
        raise ValueError(f"unknown cap_mode {cap_mode!r}")

    def per_series(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col).reset_index(drop=True)
        sid = pdf[series_col].iloc[0]
        close = pdf["close"].to_numpy(dtype=np.float64)
        # fw_ret = Close.pct_change(n).shift(-n): value at i is close[i+n]/close[i]-1
        fw = np.full(len(pdf), np.nan)
        if len(pdf) > forward_days:
            fw[:-forward_days] = close[forward_days:] / close[:-forward_days] - 1.0
        rows: list[dict] = []
        wins: list[np.ndarray] = []
        n_rise = n_drop = n_avg = 0
        for s in range(0, len(pdf), step):
            win = pdf.iloc[s : s + winsize]
            win = win.dropna(subset=["open", "close", "volume"])
            if len(win) != winsize:
                continue
            t0 = win[ts_col].iloc[0]
            t1 = win[ts_col].iloc[-1]
            key = f"{sid}_{t0.strftime('%Y%m%d')}_{t1.strftime('%Y%m%d')}"
            fw_last = fw[s + winsize - 1] if s + winsize - 1 < len(fw) else np.nan
            if not np.isnan(fw_last) and fw_last > up_threshold:
                label, prefix = "bigrise", "dr"  # reference swaps prefixes (:102)
                n_rise += 1
            elif not np.isnan(fw_last) and fw_last < -down_threshold:
                label, prefix = "bigdrop", "ri"  # (:105)
                n_drop += 1
            else:
                cap = 2 * n_drop if cap_mode == "reference" else n_rise + n_drop
                if n_avg >= cap:
                    continue
                label, prefix = "avg", "av"
                n_avg += 1
            rows.append(
                {
                    "segment_id": f"{prefix}_{key}",
                    "series_id": sid,
                    "label": label,
                    "start_ts": t0,
                    "end_ts": t1,
                    "fw_ret": None if np.isnan(fw_last) else float(fw_last),
                }
            )
            wins.append(_interleave_dedupe(win))
        feats = _features_varlen(wins)
        keep = [i for i, f_ in enumerate(feats) if f_ is not None]
        out = pd.DataFrame([rows[i] for i in keep])
        if out.empty:
            return pd.DataFrame(
                columns=[
                    "segment_id",
                    "series_id",
                    "label",
                    "start_ts",
                    "end_ts",
                    "fw_ret",
                    "features",
                ]
            )
        out["features"] = [feats[i].astype(np.float32) for i in keep]
        return out

    return df.groupBy(series_col).applyInPandas(per_series, schema=SEGMENT_SCHEMA)


def segment_tokens(
    seqs: DataFrame,
    winsize: int = WINDOW_SIZE,
    step: int = STEP,
    normalize: bool = True,
) -> DataFrame:
    """North-star token segmentation: windows of ``winsize`` every ``step``
    tokens within each row's array; per-window mean normalization (the token
    analog of the reference's long-MA normalization); 40-dim features.

    ``mapInPandas`` — no shuffle at all: each input partition segments its own
    rows, so the stage scales linearly with partition count.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            seg_rows: list[tuple] = []
            mats: list[np.ndarray] = []
            for doc_id, source, toks in zip(pdf["doc_id"], pdf["source"], pdf["tokens"]):
                arr = np.asarray(toks, dtype=np.float64)
                if len(arr) < winsize:
                    continue
                view = np.lib.stride_tricks.sliding_window_view(arr, winsize)[::step]
                for j, w in enumerate(view):
                    start = j * step
                    seg_rows.append((f"{doc_id}_{start:05d}_{start + winsize:05d}",
                                     doc_id, source, start, start + winsize))
                    mats.append(w)
            if not seg_rows:
                continue
            mat = np.stack(mats)
            if normalize:
                means = mat.mean(axis=1, keepdims=True)
                mat = np.divide(mat, means, out=mat.copy(), where=means != 0)
            feats = features_40(mat)
            good = np.where(~np.isnan(feats).all(axis=1))[0]
            if not len(good):
                # every window filtered (constant/degenerate docs): an empty
                # object column can't Arrow-convert to array<float> — skip
                # the batch instead of yielding an untyped empty frame
                continue
            out = pd.DataFrame(
                [seg_rows[i] for i in good],
                columns=["segment_id", "doc_id", "source", "start_idx", "end_idx"],
            )
            out["features"] = [feats[i] for i in good]
            yield out

    return seqs.select("doc_id", "source", "tokens").mapInPandas(
        op, schema=TOKEN_SEGMENT_SCHEMA
    )

