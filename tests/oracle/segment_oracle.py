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


def _oracle_decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Independent RIFF/WAVE parse: walk the chunk list by hand (the engine
    uses stdlib ``wave``), pull fmt + data, normalize PCM to [-1, 1] mono."""
    import struct

    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, sz = payload[pos : pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + sz]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)  # chunks are word-aligned
    assert fmt is not None and data is not None
    tag, nch, rate, _, _, bits = fmt
    assert tag == 1, f"not PCM: {tag}"
    if bits == 8:
        x = (np.frombuffer(data, np.uint8).astype(np.float64) - 128.0) / 128.0
    elif bits == 16:
        x = np.frombuffer(data, "<i2").astype(np.float64) / 32768.0
    else:
        raise AssertionError(f"bits={bits}")
    if nch > 1:
        x = x[: (len(x) // nch) * nch].reshape(-1, nch).mean(axis=1)
    return x, rate


def _oracle_decode_ppm(payload: bytes) -> np.ndarray:
    """Independent P6 parse via a regex over the header (engine tokenizes
    byte-by-byte)."""
    import re

    m = re.match(
        rb"P6(?:\s|#[^\n]*\n)+(\d+)(?:\s|#[^\n]*\n)+(\d+)(?:\s|#[^\n]*\n)+(\d+)\s",
        payload,
    )
    assert m, "bad PPM header"
    w, h, maxval = (int(g) for g in m.groups())
    assert 0 < maxval < 256
    data = payload[m.end() : m.end() + w * h * 3]
    assert len(data) == w * h * 3
    return np.frombuffer(data, np.uint8).reshape(h, w, 3)


def _oracle_decode_bmp(payload: bytes) -> np.ndarray:
    """Independent 24bpp BI_RGB BMP parse."""
    import struct

    assert payload[:2] == b"BM"
    off = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    comp = struct.unpack_from("<I", payload, 30)[0]
    assert bpp == 24 and comp == 0
    bottom_up, h = h > 0, abs(h)
    stride = -(-(w * 3) // 4) * 4
    rows = [
        np.frombuffer(payload, np.uint8, count=w * 3, offset=off + r * stride)
        .reshape(w, 3)[:, ::-1]  # BGR -> RGB
        for r in range(h)
    ]
    img = np.stack(rows)
    return img[::-1] if bottom_up else img


def _oracle_audio_features(x: np.ndarray, rate: int) -> np.ndarray:
    """Re-derivation of the documented 16-dim audio spec (multimodal.py):
    [n, rate, mean, std, rms, peak, zcr, crest, 8 rfft-band log powers]."""
    n = len(x)
    rms = float(np.sqrt((x * x).mean()))
    peak = float(np.abs(x).max())
    sign = np.signbit(x)
    zcr = float((sign[1:] != sign[:-1]).sum()) / (n - 1) if n > 1 else 0.0
    power = np.abs(np.fft.rfft(x)) ** 2
    bands = [float(np.log10(b.sum() + 1e-12)) for b in np.array_split(power, 8)]
    out = np.array(
        [n, rate, float(x.mean()), float(x.std()), rms, peak, zcr,
         peak / rms if rms > 0 else 0.0, *bands]
    )
    return out.astype(np.float32)


def _oracle_image_features(img: np.ndarray) -> np.ndarray:
    """Re-derivation of the documented 16-dim image spec (multimodal.py):
    [w, h, w/h, RGB means, RGB stds, luma mean/std, luma quartiles,
    horizontal/vertical gradient energies]; luma = .299R+.587G+.114B."""
    h, w = img.shape[:2]
    ch = img.reshape(-1, 3).astype(np.float64)
    luma = ch @ np.array([0.299, 0.587, 0.114])
    l2 = luma.reshape(h, w)
    q = np.quantile(luma, [0.25, 0.5, 0.75])
    gx = float(np.abs(np.diff(l2, axis=1)).mean()) if w > 1 else 0.0
    gy = float(np.abs(np.diff(l2, axis=0)).mean()) if h > 1 else 0.0
    out = np.array(
        [w, h, w / h, *ch.mean(axis=0), *ch.std(axis=0),
         float(luma.mean()), float(luma.std()), *q, gx, gy]
    )
    return out.astype(np.float32)


def oracle_media_features(media_pdf: pd.DataFrame, round_digits: int = 6) -> pd.DataFrame:
    """Engine-free decode oracle. Real formats (WAV/PPM/BMP, recognized by
    independent parsers above) produce real features per the documented
    16-dim specs; anything else uses the fake-decode contract:
    sha256(payload)[:8] little-endian uint64 seeds numpy's default_rng,
    16 standard normals cast float32. Pins the first feature and the
    vector's L2 norm alongside dim/ok/decoder."""
    from . import round_half_up

    rows = []
    for media_id, modality, payload in zip(
        media_pdf["media_id"], media_pdf["modality"], media_pdf["payload"]
    ):
        p = bytes(payload)
        if len(p) >= 12 and p[:4] == b"RIFF" and p[8:12] == b"WAVE":
            feat, dec = _oracle_audio_features(*_oracle_decode_wav(p)), "wav"
        elif p[:2] == b"P6" and len(p) > 2 and p[2:3] in b" \t\n\r\x0b\x0c#":
            feat, dec = _oracle_image_features(_oracle_decode_ppm(p)), "ppm"
        elif p[:2] == b"BM" and len(p) >= 54:
            feat, dec = _oracle_image_features(_oracle_decode_bmp(p)), "bmp"
        else:
            digest = hashlib.sha256(p).digest()
            seed = int.from_bytes(digest[:8], "little")
            feat = np.random.default_rng(seed).normal(size=16).astype(np.float32)
            dec = "fake"
        norm = float(np.sqrt((feat.astype(np.float64) ** 2).sum()))
        rows.append(
            (
                media_id,
                modality,
                int(feat.size),
                True,
                dec,
                round_half_up(float(feat[0]), round_digits),
                round_half_up(norm, round_digits),
            )
        )
    out = pd.DataFrame(
        rows,
        columns=["media_id", "modality", "feat_dim", "decode_ok", "decoder",
                 "feat0", "feat_norm"],
    )
    return out.astype({"feat_dim": np.int32})
