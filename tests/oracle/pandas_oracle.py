"""Pandas/numpy oracles for the golden-pinned contract queries (no engine
imports — see package docstring). Each ``oracle_*`` function reproduces one
``__spark_entry__`` golden query's exact output frame from pandas inputs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_R = 6  # __spark_entry__._R rounding


# ---------------------------------------------------------------------------
# shared scalar kernels (documented numeric spec)
# ---------------------------------------------------------------------------


def ema_fold(x: np.ndarray, alpha: float) -> np.ndarray:
    """Documented EMA recursion: acc = acc + alpha*(x - acc), seeded at the
    first finite value; leading NaNs stay NaN, later NaNs hold the fold."""
    out = np.full(len(x), np.nan)
    acc = None
    for i, v in enumerate(x):
        if np.isnan(v):
            if acc is not None:
                out[i] = acc
            continue
        acc = float(v) if acc is None else acc + alpha * (float(v) - acc)
        out[i] = acc
    return out


def true_range(g: pd.DataFrame) -> pd.Series:
    pc = g["close"].shift()
    tr = pd.concat(
        [g["high"] - g["low"], (g["high"] - pc).abs(), (g["low"] - pc).abs()],
        axis=1,
    ).max(axis=1)
    if len(tr):
        tr.iloc[0] = g["high"].iloc[0] - g["low"].iloc[0]
    return tr


def atr_series(g: pd.DataFrame, n: int) -> pd.Series:
    return pd.Series(ema_fold(true_range(g).to_numpy(), 1.0 / n), index=g.index)


def psar_series(high: np.ndarray, low: np.ndarray,
                af_start: float = 0.02, af_step: float = 0.02,
                af_max: float = 0.2, return_trend: bool = False):
    """Wilder parabolic SAR (public algorithm; reference consumes
    pandas_ta.psar at /root/reference/datalib/taStopEstimater.py:93-103):
    seed trend by comparing the first two bars' midpoints, clamp the SAR to
    the prior two bars' extremes, reverse on penetration."""
    n = len(high)
    out = np.full(n, np.nan)
    if n < 2:
        return (out, np.zeros(n, dtype=bool)) if return_trend else out
    uptrend = high[1] + low[1] >= high[0] + low[0]
    sar = low[0] if uptrend else high[0]
    ep = high[0] if uptrend else low[0]
    af = af_start
    trend = np.zeros(n, dtype=bool)
    for i in range(1, n):
        sar = sar + af * (ep - sar)
        if uptrend:
            sar = min(sar, low[i - 1], low[i - 2] if i >= 2 else low[i - 1])
            if low[i] < sar:
                uptrend, sar, ep, af = False, ep, low[i], af_start
            elif high[i] > ep:
                ep, af = high[i], min(af + af_step, af_max)
        else:
            sar = max(sar, high[i - 1], high[i - 2] if i >= 2 else high[i - 1])
            if high[i] > sar:
                uptrend, sar, ep, af = True, ep, high[i], af_start
            elif low[i] < ep:
                ep, af = low[i], min(af + af_step, af_max)
        out[i] = sar
        trend[i] = uptrend
    if return_trend:
        return out, trend
    return out


def rolling_mean(s: pd.Series, n: int, min_periods: int | None = None) -> pd.Series:
    """Per-window fresh mean (mirrors a window-function re-evaluation rather
    than pandas' sliding add/subtract accumulator)."""
    mp = n if min_periods is None else min_periods
    vals = s.to_numpy(dtype=np.float64)
    out = np.full(len(vals), np.nan)
    for i in range(len(vals)):
        lo = max(0, i - n + 1)
        win = vals[lo:i + 1]
        if len(win) >= mp:
            out[i] = win.sum() / len(win)
    return pd.Series(out, index=s.index)


# ---------------------------------------------------------------------------
# W19 multi-stop (q_multi_stop) — /root/reference/datalib/taStopEstimater.py:233-280
# ---------------------------------------------------------------------------


def oracle_multi_stop(pdf: pd.DataFrame) -> pd.DataFrame:
    """Reference column set incl. quirks: sar_exit = PSAR - 0.5*ATR(14)
    (:90-103); atr_minus_exit = 50-bar close mean + 0.9*ATR (the "minus"
    helper ADDS, :161-172); atr_plus_exit = 20-bar mean + 3*ATR (:174-186);
    bb bands +/-1 sigma at 30 bars; chandelier = 30-bar high max -
    ATR(30), 3-bar smoothed; nday_low = rolling(30, min 5) close min shift 1;
    trail composite = max of (chand, sar, atr_minus); cross signals per the
    reference's get_signal_cross sign-change rule."""
    rows = []
    for sid, g in pdf.groupby("series_id"):
        g = g.sort_values("ts").reset_index(drop=True)
        atr = atr_series(g, 14)
        atr30 = atr_series(g, 30)
        # LONG-leg PSAR (pandas_ta PSARl, NaN in downtrends) — what the
        # reference's stop estimator consumes (taStopEstimater.py:97-98)
        sar_vals, up = psar_series(
            g["high"].to_numpy(), g["low"].to_numpy(), return_trend=True
        )
        psar = pd.Series(np.where(up, sar_vals, np.nan), index=g.index)
        ma30 = rolling_mean(g["close"], 30)
        # sample stddev over full 30-bar windows only
        sd = np.full(len(g), np.nan)
        cv = g["close"].to_numpy(dtype=np.float64)
        for i in range(29, len(g)):
            win = cv[i - 29:i + 1]
            sd[i] = win.std(ddof=1)
        sd30 = pd.Series(sd, index=g.index)
        ma50 = rolling_mean(g["close"], 50, min_periods=10)
        ma20 = rolling_mean(g["close"], 20, min_periods=10)
        nlow = g["close"].rolling(30, min_periods=5).min().shift(1)
        chand = (
            (g["high"].rolling(30, min_periods=1).max() - atr30)
            .rolling(3, min_periods=1)
            .mean()
        )
        sar_exit = psar - 0.5 * atr
        atr_minus = ma50 + 0.9 * atr
        atr_plus = ma20 + 3.0 * atr
        trail = pd.concat([chand, sar_exit, atr_minus], axis=1).max(axis=1)

        def cross(a: pd.Series, b: pd.Series) -> pd.Series:
            d = a - b
            dp = d.shift()
            sig = pd.Series(0.0, index=g.index)
            m = (d * dp) < 0
            sig[m] = np.sign(d[m])
            return sig

        out = pd.DataFrame(
            {
                "series_id": sid,
                "ts": g["ts"],
                "psar": psar.round(_R),
                "atr": atr.round(_R),
                "bbu1": (ma30 + sd30).round(_R),
                "bbl1": (ma30 - sd30).round(_R),
                "chand_exit": chand.round(_R),
                "sar_exit": sar_exit.round(_R),
                "atr_minus_exit": atr_minus.round(_R),
                "atr_plus_exit": atr_plus.round(_R),
                "nday_low_exit": nlow.round(_R),
                "trail_long_exit": trail.round(_R),
                "profit_exit_sig": cross(g["close"], atr_plus),
                "trail_exit_sig": cross(trail, g["close"]),
            }
        )
        rows.append(out)
    return pd.concat(rows, ignore_index=True)


# ---------------------------------------------------------------------------
# X14 trade sim + D12 equity + A2 performance (q_trade_sim)
# /root/reference/datalib/patternTraderUtil.py:737-872
# ---------------------------------------------------------------------------


def reference_trade_loop(pdf: pd.DataFrame, entry_ts, share_cnt=100.0,
                         wstop_step=0.1, trail_stop=0.05):
    """Literal transcription of get_sell_into_strength_return (:737-836):
    per-bar snapshot at loop top, 4-stage win ladder (stage<3 check), elif
    trailing stop, break on stop-loss or flat. Returns (trades, equity)."""
    sub = pdf[pdf["ts"] >= entry_ts].sort_values("ts")
    if sub.empty:
        return [], []
    entry_price = float(sub["close"].iloc[0])
    pos = share_cnt
    pos_cost = entry_price * pos
    q = share_cnt / 4
    wstop = wstop_step
    loss_stop = -trail_stop
    stage = 0
    peak_ret = 0.0
    peak_dd = 0.0
    realized = 0.0
    trades, equity = [], []

    def emit(ts, price, ret, size, stop_type, pos_now):
        return {
            "entry_ts": entry_ts, "exit_ts": ts, "entry_price": entry_price,
            "exit_price": float(price), "trade_stage": stage,
            "trade_size": float(size), "stop_type": stop_type,
            "pct_gain_from_entry": float(ret),
            "gain": float(price - entry_price), "peak_ret": peak_ret,
            "peak_drawdown": peak_dd, "after_pos": float(pos_now - size),
            "commission": float(price) * 0.0001,
            "days_in_trade": int((ts - entry_ts).days),
        }

    for _, row in sub.iterrows():
        price = float(row["close"])
        ret = (price - entry_price) / entry_price
        peak_ret = max(ret, peak_ret)
        retrace = peak_ret - ret
        peak_dd = max(peak_dd, retrace)
        unrealized = ret * pos * entry_price
        equity.append(
            {
                "entry_ts": entry_ts, "ts": row["ts"], "unit_ret": float(ret),
                "wstop": float(wstop), "peak_ret": float(peak_ret),
                "retrace": float(retrace), "pos": float(pos),
                "remain_pos_value": float(pos * price),
                "trail_stop": float(trail_stop), "trade_stage": int(stage),
                "unrealized_gain": float(unrealized),
                "realized_gain": float(realized),
                "total_gain": float(unrealized + realized),
                "total_gain_pct": float((unrealized + realized) / pos_cost),
            }
        )
        if ret < loss_stop:
            trades.append(emit(row["ts"], price, ret, pos, "stop_loss", pos))
            pos = 0.0
            break
        if ret > wstop and stage < 3:
            stage += 1
            wstop += wstop_step
            trades.append(emit(row["ts"], price, ret, q, "win", pos))
            realized += q * (price - entry_price)
            pos -= q
        elif retrace > trail_stop:
            trades.append(emit(row["ts"], price, ret, pos, "trail_stop", pos))
            pos = 0.0
        if pos == 0:
            break
    return trades, equity


def oracle_trade_sim(ohlcv_pdf: pd.DataFrame, entries: list[tuple]) -> pd.DataFrame:
    """q_trade_sim output: trades + per-entry equity aggregates (bar count,
    final total-gain pct, max retrace) + the A2 performance roll-up incl.
    the dead-pos_cost quirk (pct_gain_ref = net / 0.01, :843-849)."""
    frames = []
    for sid, entry_ts in entries:
        g = ohlcv_pdf[ohlcv_pdf["series_id"] == sid]
        trades, equity = reference_trade_loop(g, pd.Timestamp(entry_ts))
        if not trades:
            continue
        t = pd.DataFrame(trades)
        t.insert(0, "series_id", sid)
        eq = pd.DataFrame(equity)
        t["equity_bars"] = len(eq)
        t["final_total_gain_pct"] = round(
            float(eq.sort_values("ts")["total_gain_pct"].iloc[-1]), _R
        )
        t["max_retrace"] = round(float(eq["retrace"].max()), _R)
        total_gain = float((t["gain"] * t["trade_size"]).sum())
        commission = float(t["commission"].sum())
        first = t.sort_values(["exit_ts", "trade_stage"]).iloc[0]
        start_pos = float(first["trade_size"] + first["after_pos"])
        net = total_gain - commission
        t["perf_total_gain"] = round(total_gain, _R)
        t["perf_pct_gain"] = round(net / (start_pos * float(first["entry_price"])), _R)
        t["perf_pct_gain_ref"] = round(net / 0.01, _R)
        t["trade_cnt"] = len(t)
        frames.append(t)
    return pd.concat(frames, ignore_index=True)


# ---------------------------------------------------------------------------
# X8 VCP (q_vcp_patterns) — /root/reference/datalib/extremaPatternLooper.py:205-272
# ---------------------------------------------------------------------------


def oracle_vcp_patterns(extrema: pd.DataFrame, span_min_days: int = 50) -> pd.DataFrame:
    """find_vcp_up_patterns + check_low_vol_breakup, per the reference: scan
    8-windows of maxima; need >=4 maxima and >=3 minima inside [start, end];
    each (max -> next min) range (high-low)/low must not exceed 1.1x the
    running max range seeded 0.04; final max's close breaks all prior highs.
    Windows under span_min_days are skipped. Includes the final window
    (documented deviation noted in operators/patterns.py module docstring)."""
    rows = []
    for sid, g in extrema.groupby("series_id"):
        g = g.sort_values("ts").reset_index(drop=True)
        maxp = g[g["minmax_type"] == "max"].reset_index(drop=True)
        minp = g[g["minmax_type"] == "min"].reset_index(drop=True)
        size = 8
        for i in range(size, len(maxp)):
            win = maxp.iloc[i - size:i]
            sd, ed = win["ts"].iloc[0], win["ts"].iloc[-1]
            if (ed - sd).days < span_min_days:
                continue
            sub_max = maxp[(maxp["ts"] >= sd) & (maxp["ts"] <= ed)]
            sub_min = minp[(minp["ts"] >= sd) & (minp["ts"] <= ed)]
            if len(sub_max) < 4 or len(sub_min) < 3:
                continue
            diffs = [0.04]
            ok = True
            for _, mp in sub_max.iloc[:-1].iterrows():
                nxt = sub_min[sub_min["ts"] >= mp["ts"]]
                if len(nxt) == 0:
                    ok = False
                    break
                d = (mp["high"] - nxt["low"].iloc[0]) / nxt["low"].iloc[0]
                # mirror the engine: non-finite ratio (degenerate bar)
                # rejects the window instead of slipping past NaN > x
                if not np.isfinite(d) or d > max(diffs) * 1.1:
                    ok = False
                    break
                diffs.append(d)
            if ok and sub_max["close"].iloc[-1] > sub_max["high"].iloc[:-1].max():
                rows.append((sid, "vcp_up", sd, ed, 1))
    return pd.DataFrame(
        rows, columns=["series_id", "pattern", "start_ts", "end_ts", "bullbear"]
    )


# ---------------------------------------------------------------------------
# X12 pattern screener (q_pattern_screener)
# /root/reference/datalib/extremaPatternLooper.py + extremaPatternUtil.py:340-366
# ---------------------------------------------------------------------------


def _pct_close(a, b, tol):
    return abs(a - b) <= tol * (a + b) / 2


def event_bars(events: pd.DataFrame) -> pd.DataFrame:
    """Hourly OHLC bars per event_type from the events table (mirrors the
    contract helper _event_bars: open/close by (ts, event_id) order,
    volume = sum of |value|)."""
    ev = events.copy()
    ev["h"] = ev["ts"].dt.floor("h")
    ev = ev.sort_values(["event_type", "h", "ts", "event_id"])
    g = ev.groupby(["event_type", "h"])
    bars = g.agg(
        open=("value", "first"),
        high=("value", "max"),
        low=("value", "min"),
        close=("value", "last"),
    ).reset_index()
    vol = g["value"].apply(lambda s: s.abs().sum()).reset_index(name="volume")
    bars = bars.merge(vol, on=["event_type", "h"])
    return bars.rename(columns={"event_type": "series_id", "h": "ts"})


def local_extrema_px(bars: pd.DataFrame, order: int = 5) -> pd.DataFrame:
    """W9/W10 per the reference (argrelextrema greater_equal/less_equal over
    +/-order, clipped; maxima win the merged tag) with px = high on maxima,
    low on minima."""
    out = []
    for sid, g in bars.groupby("series_id"):
        g = g.sort_values("ts").reset_index(drop=True)
        hi, lo = g["high"].to_numpy(), g["low"].to_numpy()
        n = len(g)
        for i in range(n):
            a, b = max(0, i - order), min(n, i + order + 1)
            if hi[i] == hi[a:b].max():
                typ = "max"
            elif lo[i] == lo[a:b].min():
                typ = "min"
            else:
                continue
            px = hi[i] if typ == "max" else lo[i]
            out.append((sid, g["ts"].iloc[i], typ, float(px)))
    return pd.DataFrame(out, columns=["series_id", "ts", "minmax_type", "px"])


def _emit_rows(g, k, name, cond_fn, span_days, bullbear, type_filter=None):
    rows = []
    gg = g if type_filter is None else g[g["minmax_type"] == type_filter]
    gg = gg.sort_values("ts").reset_index(drop=True)
    for i in range(k - 1, len(gg)):
        win = gg.iloc[i - k + 1:i + 1]
        t0, t1 = win["ts"].iloc[0], win["ts"].iloc[-1]
        if (t1 - t0) > pd.Timedelta(days=span_days):
            continue
        if cond_fn(win):
            rows.append((name, t0, t1, bullbear))
    return rows


def all_patterns_pandas(extrema: pd.DataFrame) -> pd.DataFrame:
    """The seven lag-tuple families (X1-X7 + X3) per the reference
    predicates (extremaPatternLooper.py:9-201), evaluated at every window
    end (the engine's documented include-final-window deviation)."""
    out = []
    for sid, g in extrema.groupby("series_id"):
        g = g.sort_values("ts").reset_index(drop=True)

        def ihs(win):
            a, b, c, d, e = win["px"].tolist()
            return (
                a < b and c < a and c < e and c < d and e < d
                and _pct_close(b, d, 0.02)
                and abs(b - c) >= 0.03 * (b + c) / 2
                and win["minmax_type"].iloc[2] == "min"
            )

        def hs(win):
            a, b, c, d, e = win["px"].tolist()
            return (
                a > b and c > a and c > e and c > d and e > d and d < b
                and win["minmax_type"].iloc[2] == "max"
                and abs(b - c) >= 0.03 * (b + c) / 2
                and not (abs(a - b) <= 0.02 * (b + d) / 2)
                and not (abs(d - e) <= 0.02 * e)
            )

        def asc4(win):
            v = win["px"].tolist()
            return v[0] < v[1] < v[2] < v[3]

        def desc4_tol(win):
            v = win["px"].tolist()
            return v[0] > v[1] > v[2] > v[3] and _pct_close(v[1], v[2], 0.02)

        def hhl7(win):
            if win["minmax_type"].iloc[-1] != "min":
                return False
            hv = win[win["minmax_type"] == "max"]["px"].tolist()
            lv = win[win["minmax_type"] == "min"]["px"].tolist()
            if len(hv) < 3 or len(lv) < 3 or abs(len(hv) - len(lv)) > 2:
                return False
            for seq in (hv, lv):
                for x, y in zip(seq, seq[1:]):
                    if not (x < y <= x * 1.10):
                        return False
            return True

        out += [(sid,) + r for r in _emit_rows(g, 5, "ihs", ihs, 150, 1)]
        out += [(sid,) + r for r in _emit_rows(g, 5, "hs", hs, 150, -1)]
        out += [
            (sid,) + r
            for r in _emit_rows(g, 4, "higher_low", asc4, 100, 1, "min")
        ]
        out += [
            (sid,) + r
            for r in _emit_rows(g, 4, "higher_high", asc4, 100, 1, "max")
        ]
        out += [
            (sid,) + r
            for r in _emit_rows(g, 4, "lower_high", desc4_tol, 100, -1, "max")
        ]
        out += [
            (sid,) + r
            for r in _emit_rows(g, 4, "lower_low", desc4_tol, 100, -1, "min")
        ]
        out += [
            (sid,) + r
            for r in _emit_rows(g, 7, "higher_high_low", hhl7, 100, 1)
        ]
    return pd.DataFrame(
        out, columns=["series_id", "pattern", "start_ts", "end_ts", "bullbear"]
    )


def remove_overlaps(pats: pd.DataFrame) -> pd.DataFrame:
    """U4 kept-frontier prune per (series, pattern)
    (extremaPatternUtil.py:340-366): scan in (start, end) order, keep an
    interval iff it starts at/after the end of the last KEPT interval."""
    keep_frames = []
    for _, g in pats.groupby(["series_id", "pattern"]):
        g = g.sort_values(["start_ts", "end_ts"]).reset_index(drop=True)
        keep, frontier = [], None
        for i, row in g.iterrows():
            if frontier is None or row["start_ts"] >= frontier:
                keep.append(i)
                frontier = row["end_ts"]
        keep_frames.append(g.loc[keep])
    if not keep_frames:
        return pats.iloc[0:0]
    return pd.concat(keep_frames, ignore_index=True)


def oracle_pattern_screener(events: pd.DataFrame) -> pd.DataFrame:
    bars = event_bars(events)
    ex = local_extrema_px(bars, order=5)
    pats = all_patterns_pandas(ex)
    return remove_overlaps(pats)


# ---------------------------------------------------------------------------
# X13 box detection (q_box_detection) — /root/reference/datalib/extremaPlotter.py
# ---------------------------------------------------------------------------

_UB_N2 = [10, 15]
_UB_N1 = [15, 20, 25, 30]
_LB_N1 = [10, 15, 20, 25, 30]


def oracle_box_detection(pdf: pd.DataFrame, delta_th: float = 0.03) -> pd.DataFrame:
    """Bands ub{n}/lb{n} = Low.rolling(n).max()/min() (+1-shifted u1b/l1b,
    extremaPlotter.py:560-574), ATR(25) RMA; detection loops over
    (n2 in [10,15]) x (n1 > n2): score += 0.1001 per near upper hit /
    0.1000001 per near lower hit (:36-77); near counts reflect only the
    LAST n2 (reference resets per outer iteration — quirk); recent_max/min
    = band of the last matching combo in loop order; tightness guard
    atr <= band_width and band_width/close <= 10%."""
    rows = []
    for sid, g in pdf.groupby("series_id"):
        g = g.sort_values("ts").reset_index(drop=True)
        bands = {}
        for n in [10, 15, 20, 25, 30]:
            bands[f"ub{n}"] = g["low"].rolling(n).max()
            bands[f"lb{n}"] = g["low"].rolling(n).min()
            bands[f"u1b{n}"] = bands[f"ub{n}"].shift(1)
            bands[f"l1b{n}"] = bands[f"lb{n}"].shift(1)
        atr = atr_series(g, 25)
        ub_combos = [(n2, n1) for n2 in _UB_N2 for n1 in _UB_N1 if n1 > n2]
        lb_combos = [(n2, n1) for n2 in _UB_N2 for n1 in _LB_N1 if n1 > n2]
        for i in range(len(g)):
            score = 0.0
            recent_max = np.nan
            recent_min = np.nan
            for n2, n1 in ub_combos:
                s, L = bands[f"ub{n2}"].iloc[i], bands[f"u1b{n1}"].iloc[i]
                if not (np.isnan(s) or np.isnan(L)) and s >= L:
                    if abs(s - L) / L < delta_th:
                        score += 0.1001
                    recent_max = s
            for n2, n1 in lb_combos:
                s, L = bands[f"lb{n2}"].iloc[i], bands[f"l1b{n1}"].iloc[i]
                if not (np.isnan(s) or np.isnan(L)) and s <= L:
                    if abs(s - L) / L < delta_th:
                        score += 0.1000001
                    recent_min = s
            last_n2 = _UB_N2[-1]
            ub_near = sum(
                1
                for n1 in _UB_N1
                if n1 > last_n2
                and not np.isnan(bands[f"ub{last_n2}"].iloc[i])
                and not np.isnan(bands[f"u1b{n1}"].iloc[i])
                and bands[f"ub{last_n2}"].iloc[i] >= bands[f"u1b{n1}"].iloc[i]
                and abs(bands[f"ub{last_n2}"].iloc[i] - bands[f"u1b{n1}"].iloc[i])
                / bands[f"u1b{n1}"].iloc[i]
                < delta_th
            )
            lb_near = sum(
                1
                for n1 in _LB_N1
                if n1 > last_n2
                and not np.isnan(bands[f"lb{last_n2}"].iloc[i])
                and not np.isnan(bands[f"l1b{n1}"].iloc[i])
                and bands[f"lb{last_n2}"].iloc[i] <= bands[f"l1b{n1}"].iloc[i]
                and abs(bands[f"lb{last_n2}"].iloc[i] - bands[f"l1b{n1}"].iloc[i])
                / bands[f"l1b{n1}"].iloc[i]
                < delta_th
            )
            if np.isnan(recent_max) or np.isnan(recent_min):
                continue
            bw = recent_max - recent_min
            tight = atr.iloc[i] <= bw and bw / g["close"].iloc[i] <= 0.1
            if ub_near > 0 and lb_near > 0 and tight:
                rows.append(
                    (sid, g["ts"].iloc[i], recent_max, recent_min, score,
                     ub_near, lb_near, atr.iloc[i])
                )
    return pd.DataFrame(
        rows,
        columns=["series_id", "ts", "box_ub", "box_lb", "box_score",
                 "ub_near_cnt", "lb_near_cnt", "atr"],
    )


# ---------------------------------------------------------------------------
# X15 trend range (q_trend_range) — /root/reference/datalib/patternReviewUtil.py:388-463
# ---------------------------------------------------------------------------


def _trend_range_one(g: pd.DataFrame, anchor: pd.Timestamp, span_days: int):
    """Reference slice + idxmin/idxmax (first-occurrence ties)."""
    td = pd.Timedelta(days=span_days)
    sub = g[(g["ts"] >= anchor - td) & (g["ts"] <= anchor + td)]
    pre = sub[sub["ts"] <= anchor]
    post = sub[sub["ts"] >= anchor]
    if pre.empty or post.empty:
        return None
    idmin = pre.loc[pre["close"].idxmin(), "ts"]
    idmax = post.loc[post["close"].idxmax(), "ts"]
    pmin = float(g.loc[g["ts"] == idmin, "close"].iloc[0])
    pmax = float(g.loc[g["ts"] == idmax, "close"].iloc[0])
    if idmax > idmin:
        return ("up", idmin, idmax, pmin, pmax, pmax / pmin - 1)
    return ("down", idmax, idmin, pmax, pmin, pmin / pmax - 1)


def oracle_trend_range_extended(
    ohlcv: pd.DataFrame, anchors: list[tuple],
    start_days: int = 20, max_days: int = 150, step: int = 7,
) -> pd.DataFrame:
    """Grow the span until pct_chg stops improving (:442-463); return each
    anchor's last still-improving span (the engine's declarative grid
    restatement of the reference's sequential loop)."""
    rows = []
    for sid, anchor in anchors:
        g = ohlcv[ohlcv["series_id"] == sid].sort_values("ts").reset_index(drop=True)
        anchor = pd.Timestamp(anchor)
        best = None
        prev = None
        for span in range(start_days, max_days, step):
            cur = _trend_range_one(g, anchor, span)
            if cur is None:
                break
            if prev is not None:
                worse = (
                    prev[5] >= cur[5] if prev[0] == "up" else prev[5] <= cur[5]
                )
                if worse:
                    break
            best = (span, cur)
            prev = cur
        if best is not None:
            span, (trend, t0, t1, p0, p1, pct) = best
            rows.append((sid, anchor, span, trend, t0, t1, p0, p1, pct))
    return pd.DataFrame(
        rows,
        columns=["series_id", "anchor_ts", "span_days", "trend", "trendstart",
                 "trendend", "startprice", "endprice", "pct_chg"],
    )


# ---------------------------------------------------------------------------
# X9/X10 divergence screener (q_divergence)
# /root/reference/datalib/extremaPatternUtil.py:400-470 + extremaPatternLooper.py:275-355
# ---------------------------------------------------------------------------


def _indicators_pandas(g: pd.DataFrame) -> pd.DataFrame:
    """The six-indicator block per the documented numeric specs
    (operators/indicators.py docstrings cite the reference block): OBV,
    AD, MFI(14), MACD(12,26,9), RSI(14) Wilder, ADOSC(3,10)."""
    g = g.sort_values("ts").reset_index(drop=True)
    c, h, l, v = g["close"], g["high"], g["low"], g["volume"]
    step = np.sign(c.diff()) * v
    g["obv"] = step.fillna(0.0).cumsum()
    mfm = np.where(h > l, ((c - l) - (h - c)) / (h - l), 0.0)
    g["ad"] = pd.Series(mfm * v).cumsum()
    tp = (h + l + c) / 3
    dtp = tp.diff()
    flow = tp * v
    pos = flow.where(dtp > 0, 0.0).to_numpy()
    neg = flow.where(dtp < 0, 0.0).to_numpy()
    mfi = np.full(len(g), np.nan)
    for i in range(14, len(g)):
        ps, ns = pos[i - 13:i + 1].sum(), neg[i - 13:i + 1].sum()
        mfi[i] = 100.0 * ps / (ps + ns) if ps + ns > 0 else 50.0
    g["mfi"] = mfi
    cv = c.to_numpy(dtype=np.float64)
    macd = ema_fold(cv, 2.0 / 13) - ema_fold(cv, 2.0 / 27)
    g["macd"] = macd
    # RSI per the documented fold
    rsi = np.full(len(g), np.nan)
    if len(g) >= 2:
        diff = np.diff(cv)
        gains = np.where(diff > 0, diff, 0.0)
        losses = np.where(diff < 0, -diff, 0.0)
        gf = ema_fold(gains, 1.0 / 14)
        lf = ema_fold(losses, 1.0 / 14)
        for i in range(14, len(g)):
            denom = gf[i - 1] + lf[i - 1]
            rsi[i] = 100.0 * gf[i - 1] / denom if denom > 0 else 50.0
    g["rsi"] = rsi
    adv = g["ad"].to_numpy(dtype=np.float64)
    g["adosc"] = ema_fold(adv, 2.0 / 4) - ema_fold(adv, 2.0 / 11)
    return g


def _column_extrema_pandas(g: pd.DataFrame, col: str, smoothing=3, order=3):
    """Smoothed-column extrema: rolling(smoothing).mean() over EXISTING rows
    (null until the window is full), then value == min/max over +/-order
    existing rows; max wins ties; NaN-smoothed rows excluded."""
    gg = g.dropna(subset=[col]).sort_values("ts").reset_index(drop=True)
    vals = gg[col].to_numpy(dtype=np.float64)
    n = len(vals)
    sm = np.full(n, np.nan)
    for i in range(smoothing - 1, n):
        sm[i] = vals[i - smoothing + 1:i + 1].sum() / smoothing
    out = []
    for i in range(n):
        if np.isnan(sm[i]):
            continue
        a, b = max(0, i - order), min(n, i + order + 1)
        win = sm[a:b]
        win = win[~np.isnan(win)]
        if sm[i] == win.max():
            typ = "max"
        elif sm[i] == win.min():
            typ = "min"
        else:
            continue
        out.append((gg["ts"].iloc[i], typ, float(vals[i])))
    return pd.DataFrame(out, columns=["ts", "minmax_type", "px"])


def _monotone(vals, direction):
    prev = vals[0]
    for v in vals[1:]:
        if (direction == "up" and v <= prev) or (direction == "down" and v >= prev):
            return False
        prev = v
    return True


def _div_scan(main, aux, name, ex_cond, bull, main_size=5, span_days=100):
    rows = []
    main = main.sort_values("ts").reset_index(drop=True)
    aux = aux.sort_values("ts").reset_index(drop=True)
    up_ex, down_ex = ex_cond.split(",")
    for i in range(main_size, len(main) + 1):  # reference includes the final window
        win = main.iloc[i - main_size:i]
        sd, ed = win["ts"].iloc[0], win["ts"].iloc[-1]
        if (ed - sd).days > span_days:
            continue
        mv = win["px"].tolist()
        av = aux[(aux["ts"] >= sd) & (aux["ts"] <= ed)]["px"].tolist()
        if len(mv) < 3 or len(av) < 3:
            continue
        if _monotone(mv, up_ex) and _monotone(av, down_ex):
            rows.append((name, sd, ed, bull))
    return rows


def oracle_divergence(ohlcv: pd.DataFrame) -> pd.DataFrame:
    """The full screener grid with the engine's documented per-side fix
    (operators/patterns.py divergence_screener docstring): bull scans price
    minima vs rising aux minima ('down,up'), bear scans price maxima vs
    falling aux maxima ('up,down'), across the six indicators."""
    rows = []
    for sid, g in ohlcv.groupby("series_id"):
        ind = _indicators_pandas(g)
        price_ex = _column_extrema_pandas(ind, "close")
        main_min = price_ex[price_ex["minmax_type"] == "min"]
        main_max = price_ex[price_ex["minmax_type"] == "max"]
        for col in ("obv", "macd", "rsi", "ad", "adosc", "mfi"):
            aux_ex = _column_extrema_pandas(ind, col)
            rows += [
                (sid,) + r
                for r in _div_scan(
                    main_min, aux_ex[aux_ex["minmax_type"] == "min"],
                    f"{col}_bull_div", "down,up", 1,
                )
            ]
            rows += [
                (sid,) + r
                for r in _div_scan(
                    main_max, aux_ex[aux_ex["minmax_type"] == "max"],
                    f"{col}_bear_div", "up,down", -1,
                )
            ]
    return pd.DataFrame(
        rows, columns=["series_id", "pattern", "start_ts", "end_ts", "bullbear"]
    )
