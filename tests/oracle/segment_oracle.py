"""Pure-pandas/numpy oracle for the segmentation + matcher + multimodal
contract queries — re-derived from the documented reference semantics
(/root/reference/katslib/opkatsDataUtil.py:51-219 windows/oversampler/
ma_normalized/embedding; /root/reference/opkatsPatternMatcherUtil.py:182-253
query/filter/sort), NOT from the engine. NO engine-operator imports: these
functions regenerate the golden fixtures the engine must then hash-match at
the driver gate, so an engine bug cannot ratify itself into the fixture.

Semantics re-implemented here (per-row / loop style, deliberately a
different code shape from the engine's batched kernels):

- 40-dim feature spec (``functions/features.py`` module docstring is the
  spec; layout pinned there: moments, quantiles, diffs, line fit, acf 1..8,
  7-bin histogram; constant/non-finite windows -> dropped);
- long-MA normalization: open/close divided by the 250-row trailing mean of
  close (full windows only), volume by the mean of volume, partial rows
  dropped (reference ``ma_normalized`` pandas ``rolling().mean().dropna()``);
- 64/10 sliding segmentation with forward-return labels, the reference's
  swapped ``dr_``/``ri_`` prefixes and its ``2*len(bigdrop)`` 'avg' cap
  (opkatsDataUtil.py:94-110), open/close interleave with keep-first
  (time, price) dedupe (:176-186);
- token segmentation: 64/10 windows inside each doc's token array,
  per-window mean normalization (untouched where the mean is 0), windows
  whose features are all-NaN dropped;
- matcher query path E2: cosine top-k (k=20) against float32-stored
  features, keep-first-per-parsed-series, historical-only (trailing id
  date <= query start), re-rank by (score desc, id asc), head 10
  (opkatsPatternMatcherUtil.py:182-252);
- multimodal fake decode: sha256(payload)[:8] seeds
  ``np.random.default_rng``; 16 float32 normals (the documented stub
  contract in ``operators/multimodal.py``).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

FEATURE_DIM = 40
WINSIZE = 64
STEP = 10
MA_DAYS = 250
UP_TH = 0.07
DOWN_TH = 0.05
FWD_DAYS = 10


# --------------------------------------------------------------------------
# 40-dim feature spec, one window at a time
# --------------------------------------------------------------------------


def features_40_one(w: np.ndarray) -> np.ndarray | None:
    """One window -> 40 float32 features, or None for a skipped window
    (shorter than 2, non-finite, or constant)."""
    x = np.asarray(w, dtype=np.float64)
    m = x.size
    if m < 2 or not np.isfinite(x).all():
        return None
    mean = x.mean()
    std = x.std()  # population
    if not std > 0:
        return None

    f = [0.0] * FEATURE_DIM
    mn, mx = x.min(), x.max()
    f[0], f[1], f[2], f[3] = mean, std, mn, mx
    f[4] = np.median(x)
    f[5] = np.quantile(x, 0.25)
    f[6] = np.quantile(x, 0.75)
    f[7] = mx - mn
    f[8], f[9], f[10] = x[0], x[-1], x[-1] - x[0]

    z = (x - mean) / std
    f[11] = (z**3).mean()
    f[12] = (z**4).mean() - 3.0
    f[13] = np.sqrt((x**2).mean())
    f[14] = np.abs(x).mean()

    d = np.diff(x)
    f[15] = d.mean()
    f[16] = d.std()
    f[17] = np.abs(d).mean()
    f[18] = np.abs(d).max()
    ds = np.sign(d)
    f[19] = (ds[1:] * ds[:-1] < 0).mean()
    zs = np.sign(x - mean)
    f[20] = (zs[1:] * zs[:-1] < 0).mean()
    f[21] = (x > mean).mean()

    t = np.arange(m, dtype=np.float64)
    t_mean = t.mean()
    t_var = ((t - t_mean) ** 2).sum()
    cov = ((x - mean) * (t - t_mean)).sum()
    slope = cov / t_var
    f[22] = slope
    f[23] = mean - slope * t_mean
    f[24] = cov / (np.sqrt(t_var) * std * np.sqrt(m))

    xc = x - mean
    denom = (xc**2).sum()
    for lag in range(1, 9):
        f[24 + lag] = (xc[lag:] * xc[:-lag]).sum() / denom if m > lag else 0.0

    span = mx - mn if mx - mn > 0 else 1.0
    idx = np.clip(((x - mn) / span * 7).astype(np.int64), 0, 6)
    for b in range(7):
        f[33 + b] = (idx == b).sum() / m

    # Kats contract tail: NaN features -> 0.0; any ±inf feature rejects the
    # whole window (functions/features.py module docstring / reference
    # opkatsDataUtil.py:212-215)
    arr = np.asarray(f, dtype=np.float64)
    if np.isinf(arr).any():
        return None
    return np.where(np.isnan(arr), 0.0, arr).astype(np.float32)


# --------------------------------------------------------------------------
# token segmentation (W11 north star)
# --------------------------------------------------------------------------


def oracle_token_segmentation(
    seqs_pdf: pd.DataFrame, winsize: int = WINSIZE, step: int = STEP
) -> pd.DataFrame:
    """(doc_id, source, tokens) rows -> kept segment boundary rows."""
    rows = []
    for doc_id, source, toks in zip(
        seqs_pdf["doc_id"], seqs_pdf["source"], seqs_pdf["tokens"]
    ):
        arr = np.asarray(toks, dtype=np.float64)
        for start in range(0, len(arr) - winsize + 1, step):
            w = arr[start : start + winsize]
            mean = w.mean()
            if mean != 0:
                w = w / mean
            if features_40_one(w) is None:
                continue
            rows.append(
                (
                    f"{doc_id}_{start:05d}_{start + winsize:05d}",
                    doc_id,
                    source,
                    start,
                    start + winsize,
                )
            )
    out = pd.DataFrame(
        rows, columns=["segment_id", "doc_id", "source", "start_idx", "end_idx"]
    )
    # match the engine's spark int type so the driver's schema compare holds
    return out.astype({"start_idx": np.int32, "end_idx": np.int32})


# --------------------------------------------------------------------------
# OHLCV segmentation (reference datapack build)
# --------------------------------------------------------------------------


def ma_normalize_pandas(ohlcv: pd.DataFrame, madays: int = MA_DAYS) -> pd.DataFrame:
    """open/close /= trailing-madays mean(close); volume /= mean(volume);
    rows without a full window dropped (reference ma_normalized)."""
    out = []
    for _, g in ohlcv.sort_values(["series_id", "ts"]).groupby("series_id", sort=False):
        g = g.reset_index(drop=True).copy()
        close_ma = g["close"].rolling(madays, min_periods=madays).mean()
        vol_ma = g["volume"].rolling(madays, min_periods=madays).mean()
        g["open"] = g["open"] / close_ma
        g["close"] = g["close"] / close_ma
        g["volume"] = g["volume"] / vol_ma
        g = g.dropna(subset=["open", "close", "volume"])
        out.append(g)
    return pd.concat(out, ignore_index=True)


def _interleave_dedupe_one(win: pd.DataFrame) -> np.ndarray:
    """Open/Close per ts (2 points/row), duplicate (time, price) pairs
    dropped keep-first — reference opkatsDataUtil.py:176-186."""
    seen: set[tuple] = set()
    prices: list[float] = []
    for ts, o, c in zip(win["ts"], win["open"], win["close"]):
        for p in (o, c):
            key = (ts, p)
            if key in seen:
                continue
            seen.add(key)
            prices.append(p)
    return np.asarray(prices, dtype=np.float64)


def segment_series_pandas(
    normalized: pd.DataFrame,
    winsize: int = WINSIZE,
    step: int = STEP,
    up_threshold: float = UP_TH,
    down_threshold: float = DOWN_TH,
    forward_days: int = FWD_DAYS,
) -> pd.DataFrame:
    """Sliding 64/10 windows with forward-return labels, the reference's
    prefix swap + 2*bigdrop 'avg' cap, and 40-dim features of the
    interleave-deduped price path (cap_mode='reference')."""
    rows = []
    for sid, g in normalized.sort_values(["series_id", "ts"]).groupby(
        "series_id", sort=False
    ):
        g = g.reset_index(drop=True)
        close = g["close"].to_numpy(dtype=np.float64)
        fw = np.full(len(g), np.nan)
        if len(g) > forward_days:
            fw[:-forward_days] = close[forward_days:] / close[:-forward_days] - 1.0
        n_rise = n_drop = n_avg = 0
        for s in range(0, len(g), step):
            win = g.iloc[s : s + winsize].dropna(subset=["open", "close", "volume"])
            if len(win) != winsize:
                continue
            t0, t1 = win["ts"].iloc[0], win["ts"].iloc[-1]
            key = f"{sid}_{t0.strftime('%Y%m%d')}_{t1.strftime('%Y%m%d')}"
            fw_last = fw[s + winsize - 1] if s + winsize - 1 < len(fw) else np.nan
            if not np.isnan(fw_last) and fw_last > up_threshold:
                label, prefix = "bigrise", "dr"
                n_rise += 1
            elif not np.isnan(fw_last) and fw_last < -down_threshold:
                label, prefix = "bigdrop", "ri"
                n_drop += 1
            else:
                if n_avg >= 2 * n_drop:
                    continue
                label, prefix = "avg", "av"
                n_avg += 1
            feats = features_40_one(_interleave_dedupe_one(win))
            if feats is None:
                continue
            rows.append(
                {
                    "segment_id": f"{prefix}_{key}",
                    "series_id": sid,
                    "label": label,
                    "start_ts": t0,
                    "end_ts": t1,
                    "fw_ret": None if np.isnan(fw_last) else float(fw_last),
                    "features": feats,
                }
            )
    return pd.DataFrame(rows)


# --------------------------------------------------------------------------
# matcher query path (E2)
# --------------------------------------------------------------------------


def _cosine(q: np.ndarray, r: np.ndarray) -> float:
    q = q.astype(np.float64)
    r = r.astype(np.float64)
    qn = float(np.sqrt((q * q).sum()))
    rn = float(np.sqrt((r * r).sum()))
    if qn > 0 and rn > 0:
        return float((q * r).sum() / (qn * rn))
    return 0.0


def _parse_series(segment_id: str) -> str:
    parts = segment_id.split("_")
    return parts[0] if len(parts) == 3 else parts[1]


def oracle_matcher_pipeline(
    ohlcv: pd.DataFrame,
    query_series: str = "TK00",
    k: int = 20,
    display_k: int = 10,
    round_digits: int = 6,
) -> pd.DataFrame:
    """Reference E2: embed the latest query window, cosine top-k over the
    whole segment corpus, keep-first per parsed series, historical-only,
    re-rank, head ``display_k`` — one row set per physical strategy tag
    (both strategies are exact, so the rows are identical)."""
    refs = segment_series_pandas(ma_normalize_pandas(ohlcv))
    qsegs = segment_series_pandas(
        ma_normalize_pandas(ohlcv[ohlcv["series_id"] == query_series])
    )
    qrow = qsegs.sort_values("end_ts").iloc[-1]
    q_feat = qrow["features"]
    query_id = qrow["segment_id"]
    query_start = pd.Timestamp(qrow["start_ts"]).date()

    scored = [
        (float(_cosine(q_feat, r["features"])), r["segment_id"])
        for _, r in refs.iterrows()
    ]
    scored.sort(key=lambda t: (-t[0], t[1]))
    topk = scored[:k]

    kept, seen_series = [], set()
    for score, seg_id in topk:  # already rank-ordered
        series = _parse_series(seg_id)
        if series in seen_series:
            continue
        seen_series.add(series)
        final_date = pd.to_datetime(seg_id.split("_")[-1], format="%Y%m%d").date()
        if final_date <= query_start:
            kept.append((score, seg_id))

    from . import round_half_up

    kept.sort(key=lambda t: (-t[0], t[1]))
    rows = []
    for rank, (score, seg_id) in enumerate(kept[:display_k], start=1):
        for strategy in ("bcast", "join"):
            rows.append(
                (strategy, query_id, rank, seg_id, round_half_up(score, round_digits))
            )
    out = pd.DataFrame(
        rows, columns=["strategy", "query_id", "rank", "segment_id", "score"]
    )
    return out.astype({"rank": np.int32})


# --------------------------------------------------------------------------
# multimodal fake decode
# --------------------------------------------------------------------------


def oracle_media_features(media_pdf: pd.DataFrame, round_digits: int = 6) -> pd.DataFrame:
    """Deterministic fake decode: sha256(payload)[:8] little-endian uint64
    seeds numpy's default_rng; 16 standard normals cast float32. Pins the
    first feature and the vector's L2 norm alongside dim/ok."""
    from . import round_half_up

    rows = []
    for media_id, modality, payload in zip(
        media_pdf["media_id"], media_pdf["modality"], media_pdf["payload"]
    ):
        digest = hashlib.sha256(bytes(payload)).digest()
        seed = int.from_bytes(digest[:8], "little")
        feat = np.random.default_rng(seed).normal(size=16).astype(np.float32)
        norm = float(np.sqrt((feat.astype(np.float64) ** 2).sum()))
        rows.append(
            (
                media_id,
                modality,
                int(feat.size),
                True,
                round_half_up(float(feat[0]), round_digits),
                round_half_up(norm, round_digits),
            )
        )
    out = pd.DataFrame(
        rows,
        columns=["media_id", "modality", "feat_dim", "decode_ok", "feat0", "feat_norm"],
    )
    return out.astype({"feat_dim": np.int32})
