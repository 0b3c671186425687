"""W18 candlestick pattern matching + rank resolution — FULL ranked set.

The reference delegates kernels to pandas_ta's ``cdl_pattern()`` (TA-Lib
port) and resolves multi-matches with a static rank table
(/root/reference/datalib/boxCandlePatternUtil.py:4-132 rank dict, :135-227
resolver). pandas_ta/TA-Lib are not in this sandbox, so every pattern named
by the rank table has a kernel re-implemented here as a documented SQL
boolean expression (geometry re-derived from public TA-Lib docs; thresholds
simplified where TA-Lib uses its tunable "candle settings" averages —
context-dependent kernels use a documented close-vs-5-bars-back trend
proxy). The resolver preserves the reference contract exactly:

- 0 matches        -> pattern 'NO_PATTERN', match_count 0
- 1 match          -> '<NAME>_Bull'/'_Bear' by score sign, count 1
- multiple matches -> match_count = n, pattern_score = sum of scores,
  best pattern = min rank per the reference table (:210-214; CANDLE_RANKINGS
  below is the reference's FULL table; names absent from it -> 20, matching
  its default at :207).

Single source of truth: ``KERNELS`` maps each pattern to (bull_sql,
bear_sql) condition strings over a fixed helper-column vocabulary
(o{k}/h{k}/l{k}/c{k} lags for k=0..4 plus derived body/range/shadow/boolean
helpers). The SAME strings drive (a) the Spark plan — ``F.expr`` over
window-lagged helper columns, one partition pass, whole-stage codegen —
and (b) :func:`candle_oracle_sql`, which renders an equivalent standalone
ANSI-SQL query for an independent engine (DuckDB) to evaluate. Summary
columns (match count, score sum, pattern list, min-rank best) are likewise
rendered once from the spec for both engines; ``concat_ws``/``least``
skip NULLs identically in Spark and DuckDB/Postgres semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# the reference's FULL static rank table, talib-style keys
# (/root/reference/datalib/boxCandlePatternUtil.py:5-128; its get_candle_rankings
# re-keys to 'CDL_<name>' for pandas_ta — we keep the talib-style originals
# since our kernel columns use them)
CANDLE_RANKINGS = {
    "CDL3LINESTRIKE_Bull": 1, "CDL3LINESTRIKE_Bear": 2,
    "CDL3BLACKCROWS_Bull": 3, "CDL3BLACKCROWS_Bear": 3,
    "CDLEVENINGSTAR_Bull": 4, "CDLEVENINGSTAR_Bear": 4,
    "CDLTASUKIGAP_Bull": 5, "CDLTASUKIGAP_Bear": 5,
    "CDLINVERTEDHAMMER_Bull": 6, "CDLINVERTEDHAMMER_Bear": 6,
    "CDLMATCHINGLOW_Bull": 7, "CDLMATCHINGLOW_Bear": 7,
    "CDLABANDONEDBABY_Bull": 8, "CDLABANDONEDBABY_Bear": 8,
    "CDLBREAKAWAY_Bull": 10, "CDLBREAKAWAY_Bear": 10,
    "CDLMORNINGSTAR_Bull": 12, "CDLMORNINGSTAR_Bear": 12,
    "CDLPIERCING_Bull": 13, "CDLPIERCING_Bear": 13,
    "CDLSTICKSANDWICH_Bull": 14, "CDLSTICKSANDWICH_Bear": 14,
    "CDLTHRUSTING_Bull": 15, "CDLTHRUSTING_Bear": 15,
    "CDLINNECK_Bull": 17, "CDLINNECK_Bear": 17,
    "CDLSTALLEDPATTERN_Bear": 20, "CDLSTALLEDPATTERN_Bull": 20,
    "CDLLONGLINE_Bull": 20, "CDLLONGLINE_Bear": 20,
    "CDLSHORTLINE_Bull": 20, "CDLSHORTLINE_Bear": 20,
    "CDL3INSIDE_Bull": 20, "CDL3INSIDE_Bear": 56,
    "CDLCOUNTERATTACK_Bull": 20, "CDLCOUNTERATTACK_Bear": 20,
    "CDLHOMINGPIGEON_Bull": 21, "CDLHOMINGPIGEON_Bear": 21,
    "CDLDARKCLOUDCOVER_Bull": 22, "CDLDARKCLOUDCOVER_Bear": 22,
    "CDLIDENTICAL3CROWS_Bull": 24, "CDLIDENTICAL3CROWS_Bear": 24,
    "CDLMORNINGDOJISTAR_Bull": 25, "CDLMORNINGDOJISTAR_Bear": 25,
    "CDLXSIDEGAP3METHODS_Bull": 27, "CDLXSIDEGAP3METHODS_Bear": 26,
    "CDLTRISTAR_Bull": 28, "CDLTRISTAR_Bear": 76,
    "CDLGAPSIDESIDEWHITE_Bull": 46, "CDLGAPSIDESIDEWHITE_Bear": 29,
    "CDLEVENINGDOJISTAR_Bull": 30, "CDLEVENINGDOJISTAR_Bear": 30,
    "CDL3WHITESOLDIERS_Bull": 32, "CDL3WHITESOLDIERS_Bear": 32,
    "CDLONNECK_Bull": 33, "CDLONNECK_Bear": 33,
    "CDL3OUTSIDE_Bull": 34, "CDL3OUTSIDE_Bear": 39,
    "CDLRICKSHAWMAN_Bull": 35, "CDLRICKSHAWMAN_Bear": 35,
    "CDLSEPARATINGLINES_Bull": 36, "CDLSEPARATINGLINES_Bear": 40,
    "CDLLONGLEGGEDDOJI_Bull": 37, "CDLLONGLEGGEDDOJI_Bear": 37,
    "CDLHARAMI_Bull": 38, "CDLHARAMI_Bear": 72,
    "CDLLADDERBOTTOM_Bull": 41, "CDLLADDERBOTTOM_Bear": 41,
    "CDLCLOSINGMARUBOZU_Bull": 70, "CDLCLOSINGMARUBOZU_Bear": 43,
    "CDLTAKURI_Bull": 47, "CDLTAKURI_Bear": 47,
    "CDLDOJISTAR_Bull": 49, "CDLDOJISTAR_Bear": 51,
    "CDLHARAMICROSS_Bull": 50, "CDLHARAMICROSS_Bear": 80,
    "CDLADVANCEBLOCK_Bull": 54, "CDLADVANCEBLOCK_Bear": 54,
    "CDLSHOOTINGSTAR_Bull": 55, "CDLSHOOTINGSTAR_Bear": 55,
    "CDLMARUBOZU_Bull": 71, "CDLMARUBOZU_Bear": 57,
    "CDLUNIQUE3RIVER_Bull": 60, "CDLUNIQUE3RIVER_Bear": 60,
    "CDL2CROWS_Bull": 61, "CDL2CROWS_Bear": 61,
    "CDLBELTHOLD_Bull": 62, "CDLBELTHOLD_Bear": 63,
    "CDLHAMMER_Bull": 65, "CDLHAMMER_Bear": 65,
    "CDLHIGHWAVE_Bull": 67, "CDLHIGHWAVE_Bear": 67,
    "CDLSPINNINGTOP_Bull": 69, "CDLSPINNINGTOP_Bear": 73,
    "CDLUPSIDEGAP2CROWS_Bull": 74, "CDLUPSIDEGAP2CROWS_Bear": 74,
    "CDLGRAVESTONEDOJI_Bull": 77, "CDLGRAVESTONEDOJI_Bear": 77,
    "CDLHIKKAKEMOD_Bull": 82, "CDLHIKKAKEMOD_Bear": 81,
    "CDLHIKKAKE_Bull": 85, "CDLHIKKAKE_Bear": 83,
    "CDLENGULFING_Bull": 84, "CDLENGULFING_Bear": 91,
    "CDLMATHOLD_Bull": 86, "CDLMATHOLD_Bear": 86,
    "CDLHANGINGMAN_Bull": 87, "CDLHANGINGMAN_Bear": 87,
    "CDLRISEFALL3METHODS_Bull": 94, "CDLRISEFALL3METHODS_Bear": 89,
    "CDLKICKING_Bull": 96, "CDLKICKINGBYLENGTH_Bull": 96,
    "CDLKICKING_Bear": 102, "CDLKICKINGBYLENGTH_Bear": 102,
    "CDLDRAGONFLYDOJI_Bull": 98, "CDLDRAGONFLYDOJI_Bear": 98,
    "CDLCONCEALBABYSWALL_Bull": 101, "CDLCONCEALBABYSWALL_Bear": 101,
    "CDL3STARSINSOUTH_Bull": 103, "CDL3STARSINSOUTH_Bear": 103,
    "CDLDOJI_Bull": 104, "CDLDOJI_Bear": 104,
}
DEFAULT_RANK = 20

MAX_LAG = 5  # c5x for the trend proxy; OHLC lags go to 4 (5-bar patterns)


def _derived_helpers() -> tuple[dict[str, str], dict[str, str]]:
    """Two layers of derived helper expressions over the base lag columns
    o{k}/h{k}/l{k}/c{k} (k=0..4), c5x and avgbody10. Engine-portable SQL."""
    d1: dict[str, str] = {}
    for k in range(5):
        d1[f"body{k}"] = f"abs(c{k} - o{k})"
        d1[f"rng{k}"] = f"h{k} - l{k}"
        d1[f"ush{k}"] = f"h{k} - greatest(o{k}, c{k})"
        d1[f"dsh{k}"] = f"least(o{k}, c{k}) - l{k}"
        d1[f"bt{k}"] = f"greatest(o{k}, c{k})"   # real-body top
        d1[f"bb{k}"] = f"least(o{k}, c{k})"      # real-body bottom
        d1[f"mid{k}"] = f"(o{k} + c{k}) / 2"
        d1[f"bull{k}"] = f"c{k} > o{k}"
        d1[f"bear{k}"] = f"c{k} < o{k}"
    # documented trend proxy (talib consults a short-SMA context; we compare
    # the previous close against the close 5 bars back)
    d1["uptrend"] = "c1 > c5x"
    d2 = {f"doji{k}": f"rng{k} > 0 AND body{k} <= 0.1 * rng{k}" for k in range(5)}
    return d1, d2


# name -> (bull condition SQL | None, bear condition SQL | None).
# Every base name in CANDLE_RANKINGS has an entry (pinned by tests).
KERNELS: dict[str, tuple[str | None, str | None]] = {
    # ---- single-bar geometry ------------------------------------------------
    "CDLDOJI": ("rng0 > 0 AND body0 <= 0.1 * rng0", None),
    "CDLHAMMER": (
        "rng0 > 0 AND dsh0 >= 2 * body0 AND ush0 <= 0.25 * body0 AND body0 > 0",
        None,
    ),
    "CDLINVERTEDHAMMER": (
        "rng0 > 0 AND ush0 >= 2 * body0 AND dsh0 <= 0.25 * body0 AND body0 > 0",
        None,
    ),
    "CDLENGULFING": (
        "bull0 AND bear1 AND c0 >= o1 AND o0 <= c1 AND body0 > body1",
        "bear0 AND bull1 AND o0 >= c1 AND c0 <= o1 AND body0 > body1",
    ),
    "CDLHARAMI": (
        "bull0 AND bear1 AND o0 > c1 AND c0 < o1",
        "bear0 AND bull1 AND o0 < c1 AND c0 > o1",
    ),
    "CDLMARUBOZU": (
        "bull0 AND rng0 > 0 AND body0 >= 0.95 * rng0",
        "bear0 AND rng0 > 0 AND body0 >= 0.95 * rng0",
    ),
    "CDL3WHITESOLDIERS": (
        "bull0 AND bull1 AND bull2 AND c0 > c1 AND c1 > c2 AND o0 > o1 "
        "AND o0 < c1 AND o1 > o2 AND o1 < c2",
        None,
    ),
    "CDL3BLACKCROWS": (
        None,
        "bear0 AND bear1 AND bear2 AND c0 < c1 AND c1 < c2 AND o0 < o1 "
        "AND o0 > c1 AND o1 < o2 AND o1 > c2",
    ),
    "CDLMORNINGSTAR": (
        "bear2 AND body2 > 0 AND body1 < 0.3 * body2 AND bt1 < c2 "
        "AND bull0 AND c0 > mid2",
        None,
    ),
    "CDLEVENINGSTAR": (
        None,
        "bull2 AND body2 > 0 AND body1 < 0.3 * body2 AND bb1 > c2 "
        "AND bear0 AND c0 < mid2",
    ),
    "CDL3LINESTRIKE": (
        "bear3 AND bear2 AND bear1 AND c3 > c2 AND c2 > c1 "
        "AND bull0 AND o0 < c1 AND c0 > o3",
        "bull3 AND bull2 AND bull1 AND c3 < c2 AND c2 < c1 "
        "AND bear0 AND o0 > c1 AND c0 < o3",
    ),
    "CDLPIERCING": (
        "bear1 AND bull0 AND o0 < l1 AND c0 > mid1 AND c0 < o1", None,
    ),
    "CDLDARKCLOUDCOVER": (
        None, "bull1 AND bear0 AND o0 > h1 AND c0 < mid1 AND c0 > o1",
    ),
    "CDLHANGINGMAN": (
        None,
        "uptrend AND rng0 > 0 AND dsh0 >= 2 * body0 AND ush0 <= 0.25 * body0 "
        "AND body0 > 0",
    ),
    "CDLSHOOTINGSTAR": (
        None,
        "uptrend AND rng0 > 0 AND ush0 >= 2 * body0 AND dsh0 <= 0.25 * body0 "
        "AND body0 > 0",
    ),
    "CDLSPINNINGTOP": (
        "bull0 AND rng0 > 0 AND ush0 > body0 AND dsh0 > body0",
        "bear0 AND rng0 > 0 AND ush0 > body0 AND dsh0 > body0",
    ),
    "CDLHIGHWAVE": (
        "bull0 AND rng0 > 0 AND ush0 >= 3 * body0 AND dsh0 >= 3 * body0",
        "bear0 AND rng0 > 0 AND ush0 >= 3 * body0 AND dsh0 >= 3 * body0",
    ),
    "CDLBELTHOLD": (
        "bull0 AND rng0 > 0 AND body0 >= 0.5 * rng0 AND dsh0 <= 0.05 * rng0",
        "bear0 AND rng0 > 0 AND body0 >= 0.5 * rng0 AND ush0 <= 0.05 * rng0",
    ),
    "CDLCLOSINGMARUBOZU": (
        "bull0 AND rng0 > 0 AND ush0 <= 0.05 * rng0 AND dsh0 > 0.05 * rng0 "
        "AND body0 >= 0.5 * rng0",
        "bear0 AND rng0 > 0 AND dsh0 <= 0.05 * rng0 AND ush0 > 0.05 * rng0 "
        "AND body0 >= 0.5 * rng0",
    ),
    "CDLDRAGONFLYDOJI": ("doji0 AND dsh0 >= 0.4 * rng0 AND ush0 <= 0.1 * rng0", None),
    "CDLGRAVESTONEDOJI": (None, "doji0 AND ush0 >= 0.4 * rng0 AND dsh0 <= 0.1 * rng0"),
    "CDLLONGLEGGEDDOJI": ("doji0 AND ush0 >= 0.4 * rng0 AND dsh0 >= 0.4 * rng0", None),
    "CDLTAKURI": ("doji0 AND dsh0 >= 0.6 * rng0 AND ush0 <= 0.1 * rng0", None),
    "CDLMATCHINGLOW": ("bear1 AND bear0 AND abs(c0 - c1) <= 0.001 * abs(c1)", None),
    "CDLHOMINGPIGEON": (
        "bear1 AND bear0 AND o0 < o1 AND c0 > c1 AND body0 < body1", None,
    ),
    "CDL3INSIDE": (
        "bear2 AND bull1 AND o1 > c2 AND c1 < o2 AND bull0 AND c0 > o2",
        "bull2 AND bear1 AND o1 < c2 AND c1 > o2 AND bear0 AND c0 < o2",
    ),
    "CDLLONGLINE": (
        "bull0 AND avgbody10 IS NOT NULL AND body0 >= 2 * avgbody10",
        "bear0 AND avgbody10 IS NOT NULL AND body0 >= 2 * avgbody10",
    ),
    "CDLSHORTLINE": (
        "bull0 AND avgbody10 IS NOT NULL AND body0 <= 0.5 * avgbody10 AND body0 > 0",
        "bear0 AND avgbody10 IS NOT NULL AND body0 <= 0.5 * avgbody10 AND body0 > 0",
    ),
    # ---- round-3 additions: the remaining ranked names ----------------------
    # upside/downside Tasuki gap: gap in trend direction, third bar retraces
    # into (but does not close) the gap
    "CDLTASUKIGAP": (
        "bull2 AND bull1 AND bb1 > bt2 AND bear0 AND o0 > o1 AND o0 < c1 "
        "AND c0 < o1 AND c0 > bt2",
        "bear2 AND bear1 AND bt1 < bb2 AND bull0 AND o0 < o1 AND o0 > c1 "
        "AND c0 > o1 AND c0 < bb2",
    ),
    # doji island gapping beyond BOTH neighbours' full ranges
    "CDLABANDONEDBABY": (
        "bear2 AND body2 > 0 AND doji1 AND h1 < l2 AND bull0 AND l0 > h1",
        "bull2 AND body2 > 0 AND doji1 AND l1 > h2 AND bear0 AND h0 < l1",
    ),
    # 5-bar: long candle, same-color gap, two drifting bars, reversal closing
    # inside the opening gap
    "CDLBREAKAWAY": (
        "bear4 AND bear3 AND bt3 < bb4 AND c2 < c3 AND bear1 AND c1 < c2 "
        "AND bull0 AND c0 > bt3 AND c0 < bb4",
        "bull4 AND bull3 AND bb3 > bt4 AND c2 > c3 AND bull1 AND c1 > c2 "
        "AND bear0 AND c0 < bb3 AND c0 > bt4",
    ),
    # two blacks with (nearly) equal closes sandwiching a white trading above
    "CDLSTICKSANDWICH": (
        "bear2 AND bull1 AND bb1 > c2 AND bear0 AND abs(c0 - c2) <= 0.001 * abs(c2)",
        None,
    ),
    # black then white opening below prior low, closing into but under the
    # prior midpoint (bearish continuation)
    "CDLTHRUSTING": (
        None, "bear1 AND bull0 AND o0 < l1 AND c0 > c1 AND c0 < mid1",
    ),
    # in-neck: white closes marginally above prior close
    "CDLINNECK": (
        None,
        "bear1 AND bull0 AND o0 < l1 AND c0 >= c1 AND c0 <= c1 + 0.1 * body1",
    ),
    # on-neck: white closes at the prior LOW
    "CDLONNECK": (
        None, "bear1 AND bull0 AND o0 < l1 AND abs(c0 - l1) <= 0.001 * abs(l1)",
    ),
    # three whites, third stalls (small body riding the second's upper end)
    "CDLSTALLEDPATTERN": (
        None,
        "bull2 AND bull1 AND bull0 AND c1 > c2 AND c0 > c1 "
        "AND body0 <= 0.3 * body1 AND o0 >= bt1 - 0.2 * body1",
    ),
    # long opposite candles meeting at (nearly) the same close
    "CDLCOUNTERATTACK": (
        "bear1 AND bull0 AND avgbody10 IS NOT NULL AND body1 > avgbody10 "
        "AND body0 > avgbody10 AND abs(c0 - c1) <= 0.001 * abs(c1)",
        "bull1 AND bear0 AND avgbody10 IS NOT NULL AND body1 > avgbody10 "
        "AND body0 > avgbody10 AND abs(c0 - c1) <= 0.001 * abs(c1)",
    ),
    # three falling blacks, each opening at the prior close
    "CDLIDENTICAL3CROWS": (
        None,
        "bear2 AND bear1 AND bear0 AND c1 < c2 AND c0 < c1 "
        "AND abs(o1 - c2) <= 0.001 * abs(c2) AND abs(o0 - c1) <= 0.001 * abs(c1)",
    ),
    # morning/evening star with a doji middle
    "CDLMORNINGDOJISTAR": (
        "bear2 AND body2 > 0 AND doji1 AND bt1 < c2 AND bull0 AND c0 > mid2",
        None,
    ),
    "CDLEVENINGDOJISTAR": (
        None,
        "bull2 AND body2 > 0 AND doji1 AND bb1 > c2 AND bear0 AND c0 < mid2",
    ),
    # up/downside gap three methods: third bar CLOSES the gap (ends within
    # the first body)
    "CDLXSIDEGAP3METHODS": (
        "bull2 AND bull1 AND bb1 > bt2 AND bear0 AND o0 > bb1 AND o0 < bt1 "
        "AND c0 < bt2 AND c0 > bb2",
        "bear2 AND bear1 AND bt1 < bb2 AND bull0 AND o0 < bt1 AND o0 > bb1 "
        "AND c0 > bb2 AND c0 < bt2",
    ),
    # three dojis, middle body gapping below (bottom) / above (top) both
    "CDLTRISTAR": (
        "doji2 AND doji1 AND doji0 AND bt1 < bb2 AND bt1 < bb0",
        "doji2 AND doji1 AND doji0 AND bb1 > bt2 AND bb1 > bt0",
    ),
    # side-by-side whites gapping up (bullish) / down (bearish continuation)
    "CDLGAPSIDESIDEWHITE": (
        "bull1 AND bull0 AND bb1 > bt2 AND bb0 > bt2 AND abs(o0 - o1) <= 0.01 * abs(o1)",
        "bull1 AND bull0 AND bt1 < bb2 AND bt0 < bb2 AND abs(o0 - o1) <= 0.01 * abs(o1)",
    ),
    # engulfing (outside) bar + confirming third close beyond it
    "CDL3OUTSIDE": (
        "bull1 AND bear2 AND c1 >= o2 AND o1 <= c2 AND body1 > body2 "
        "AND bull0 AND c0 > c1",
        "bear1 AND bull2 AND o1 >= c2 AND c1 <= o2 AND body1 > body2 "
        "AND bear0 AND c0 < c1",
    ),
    # long-legged doji with the body near the range midpoint
    "CDLRICKSHAWMAN": (
        "doji0 AND ush0 >= 0.4 * rng0 AND dsh0 >= 0.4 * rng0 "
        "AND abs((bt0 + bb0) / 2 - (h0 + l0) / 2) <= 0.1 * rng0",
        None,
    ),
    # opposite-color belt-hold pair opening at the same price (continuation)
    "CDLSEPARATINGLINES": (
        "bear1 AND bull0 AND rng0 > 0 AND abs(o0 - o1) <= 0.001 * abs(o1) "
        "AND dsh0 <= 0.05 * rng0",
        "bull1 AND bear0 AND rng0 > 0 AND abs(o0 - o1) <= 0.001 * abs(o1) "
        "AND ush0 <= 0.05 * rng0",
    ),
    # 5-bar ladder bottom: three stair-stepped blacks, black with clear upper
    # shadow, white opening above the prior body
    "CDLLADDERBOTTOM": (
        "bear4 AND bear3 AND bear2 AND o3 < o4 AND c3 < c4 AND o2 < o3 "
        "AND c2 < c3 AND bear1 AND ush1 >= 0.5 * body1 AND bull0 AND o0 > o1",
        None,
    ),
    # doji gapping away from a long candle in trend direction
    "CDLDOJISTAR": (
        "bear1 AND avgbody10 IS NOT NULL AND body1 > avgbody10 AND doji0 AND bt0 < c1",
        "bull1 AND avgbody10 IS NOT NULL AND body1 > avgbody10 AND doji0 AND bb0 > c1",
    ),
    # harami whose second bar is a doji (body strictly inside prior body)
    "CDLHARAMICROSS": (
        "bear1 AND doji0 AND bb0 > c1 AND bt0 < o1",
        "bull1 AND doji0 AND bb0 > o1 AND bt0 < c1",
    ),
    # three advancing whites with shrinking bodies (weakening advance)
    "CDLADVANCEBLOCK": (
        None,
        "bull2 AND bull1 AND bull0 AND c1 > c2 AND c0 > c1 AND o1 > o2 "
        "AND o1 < c2 AND o0 > o1 AND o0 < c1 AND body1 < body2 AND body0 < body1",
    ),
    # unique three river bottom
    "CDLUNIQUE3RIVER": (
        "bear2 AND bear1 AND bt1 < bt2 AND c1 > c2 AND l1 < l2 AND bull0 "
        "AND body0 < body1 AND o0 < c1",
        None,
    ),
    # two crows: white, gapping black, black closing into the white body
    "CDL2CROWS": (
        None,
        "bull2 AND bear1 AND bb1 > c2 AND bear0 AND o0 < o1 AND o0 > c1 "
        "AND c0 < c2 AND c0 > o2",
    ),
    # upside gap two crows: third black engulfs the second, still above the
    # first close
    "CDLUPSIDEGAP2CROWS": (
        None,
        "bull2 AND bear1 AND bb1 > c2 AND bear0 AND o0 > o1 AND c0 < c1 AND c0 > c2",
    ),
    # hikkake: inside bar then a fake breakout against the eventual signal
    "CDLHIKKAKE": (
        "h1 < h2 AND l1 > l2 AND h0 < h1 AND l0 < l1",
        "h1 < h2 AND l1 > l2 AND h0 > h1 AND l0 > l1",
    ),
    # modified hikkake: inside bar also closes near the fake-out extreme
    "CDLHIKKAKEMOD": (
        "h1 < h2 AND l1 > l2 AND rng1 > 0 AND c1 <= l1 + 0.25 * rng1 "
        "AND h0 < h1 AND l0 < l1",
        "h1 < h2 AND l1 > l2 AND rng1 > 0 AND c1 >= h1 - 0.25 * rng1 "
        "AND h0 > h1 AND l0 > l1",
    ),
    # mat hold: long white, three small falling bars holding above its open,
    # white breakout over their highs
    "CDLMATHOLD": (
        "bull4 AND bear3 AND bear2 AND bear1 AND c2 < c3 AND c1 < c2 "
        "AND least(l3, l2, l1) > o4 AND bull0 AND c0 > greatest(h3, h2, h1) "
        "AND c0 > c4",
        None,
    ),
    # rising/falling three methods: three counter-trend bars contained in the
    # first long bar's range, fifth closes beyond the first
    "CDLRISEFALL3METHODS": (
        "bull4 AND bear3 AND bear2 AND bear1 AND c2 < c3 AND c1 < c2 "
        "AND least(l3, l2, l1) >= l4 AND greatest(h3, h2, h1) <= h4 "
        "AND bull0 AND c0 > c4",
        "bear4 AND bull3 AND bull2 AND bull1 AND c2 > c3 AND c1 > c2 "
        "AND least(l3, l2, l1) >= l4 AND greatest(h3, h2, h1) <= h4 "
        "AND bear0 AND c0 < c4",
    ),
    # marubozu pair separated by a full gap
    "CDLKICKING": (
        "bear1 AND rng1 > 0 AND body1 >= 0.95 * rng1 AND bull0 AND rng0 > 0 "
        "AND body0 >= 0.95 * rng0 AND l0 > h1",
        "bull1 AND rng1 > 0 AND body1 >= 0.95 * rng1 AND bear0 AND rng0 > 0 "
        "AND body0 >= 0.95 * rng0 AND h0 < l1",
    ),
    # kicking where the SECOND marubozu is at least as long (length decides)
    "CDLKICKINGBYLENGTH": (
        "bear1 AND rng1 > 0 AND body1 >= 0.95 * rng1 AND bull0 AND rng0 > 0 "
        "AND body0 >= 0.95 * rng0 AND l0 > h1 AND body0 >= body1",
        "bull1 AND rng1 > 0 AND body1 >= 0.95 * rng1 AND bear0 AND rng0 > 0 "
        "AND body0 >= 0.95 * rng0 AND h0 < l1 AND body0 >= body1",
    ),
    # concealing baby swallow: two black marubozu, gapping black with an
    # upper shadow piercing the prior body, black fully engulfing it
    "CDLCONCEALBABYSWALL": (
        "bear3 AND rng3 > 0 AND body3 >= 0.9 * rng3 AND bear2 AND rng2 > 0 "
        "AND body2 >= 0.9 * rng2 AND c2 < c3 AND bear1 AND bt1 < c2 AND h1 > c2 "
        "AND bear0 AND o0 > h1 AND c0 < l1",
        None,
    ),
    # three stars in the south: shrinking blacks with rising lows
    "CDL3STARSINSOUTH": (
        "bear2 AND body2 > 0 AND dsh2 >= 0.5 * body2 AND bear1 "
        "AND body1 < body2 AND l1 > l2 AND h1 < h2 AND bear0 "
        "AND body0 < body1 AND l0 >= l1 AND h0 <= h1",
        None,
    ),
}


def _rank(name: str, side: str) -> int:
    return CANDLE_RANKINGS.get(f"{name}_{side}", DEFAULT_RANK)


def kernel_score_sql(name: str) -> str:
    """TA-Lib-style ±100 score CASE for one kernel (engine-portable)."""
    bull, bear = KERNELS[name]
    parts = []
    if bull:
        parts.append(f"WHEN {bull} THEN 100")
    if bear:
        parts.append(f"WHEN {bear} THEN -100")
    return "CASE " + " ".join(parts) + " ELSE 0 END"


def summary_sqls() -> dict[str, str]:
    """Resolver columns over the kernel score columns (engine-portable).

    best_pattern uses zero-padded '{rank:03d}|{pattern}' tags so a plain
    string ``least`` (NULL-skipping in both Spark and DuckDB) reproduces the
    (rank asc, name asc) tie-break of the reference's min-rank resolution;
    ``concat_ws`` likewise skips NULLs in both engines."""
    names = list(KERNELS)
    cnt = " + ".join(f"(CASE WHEN {n} <> 0 THEN 1 ELSE 0 END)" for n in names)
    total = " + ".join(names)
    pat_args = ", ".join(
        f"CASE WHEN {n} > 0 THEN '{n}_Bull' WHEN {n} < 0 THEN '{n}_Bear' END"
        for n in names
    )
    tag_args = ", ".join(
        f"CASE WHEN {n} > 0 THEN '{_rank(n, 'Bull'):03d}|{n}_Bull' "
        f"WHEN {n} < 0 THEN '{_rank(n, 'Bear'):03d}|{n}_Bear' END"
        for n in names
    )
    return {
        "candlestick_match_count": f"({cnt})",
        "candlestick_pattern_score": f"({total})",
        "candlestick_pattern": (
            f"CASE WHEN ({cnt}) = 0 THEN 'NO_PATTERN' "
            f"ELSE concat_ws(',', {pat_args}) END"
        ),
        "best_pattern": f"substr(least({tag_args}), 5)",
    }


def _with_helpers(df: DataFrame, series_col: str, ts_col: str) -> DataFrame:
    """Append the base lag columns + derived helper columns (one window)."""
    w = Window.partitionBy(series_col).orderBy(ts_col)
    lags = []
    for k in range(5):
        for src in ("open", "high", "low", "close"):
            name = f"{src[0]}{k}"
            lags.append(
                (F.col(src) if k == 0 else F.lag(src, k).over(w)).alias(name)
            )
    lags.append(F.lag("close", MAX_LAG).over(w).alias("c5x"))
    lags.append(
        F.avg(F.abs(F.col("close") - F.col("open")))
        .over(w.rowsBetween(-10, -1))
        .alias("avgbody10")
    )
    d1, d2 = _derived_helpers()
    base = df.select("*", *lags)
    base = base.select("*", *[F.expr(s).alias(n) for n, s in d1.items()])
    return base.select("*", *[F.expr(s).alias(n) for n, s in d2.items()])


def candle_patterns(
    df: DataFrame, series_col: str = "series_id", ts_col: str = "ts"
) -> DataFrame:
    """Per row: every kernel score column + the resolved summary columns
    (candlestick_pattern, match_count, pattern_score, best_pattern).
    One window pass per series; every expression stays in codegen."""
    in_cols = list(df.columns)
    helped = _with_helpers(df, series_col, ts_col)
    scored = helped.select(
        "*", *[F.expr(kernel_score_sql(n)).alias(n) for n in KERNELS]
    )
    out = scored.select(
        *in_cols,
        *list(KERNELS),
        *[F.expr(s).alias(n) for n, s in summary_sqls().items()],
    )
    return out


def candle_oracle_sql(
    bars_sql: str, series_col: str = "series_id", ts_col: str = "ts"
) -> str:
    """Standalone ANSI-SQL equivalent of :func:`candle_patterns` for an
    independent engine (DuckDB runs it as the driver oracle): the same
    KERNELS/summary expression text over the same helper vocabulary, with
    the lag/window helpers rendered as plain SQL window functions.

    Independence caveat: because both engines evaluate the SAME kernel
    condition strings, this cross-check validates the window/lag plumbing,
    helper derivations, and the two engines' expression semantics — NOT the
    geometry of each kernel (an inverted comparison would render identically
    into both). Geometry is independently pinned per pattern by the
    hand-constructed bar fixtures in tests/test_candles.py and
    tests/test_candle_geometry.py (every kernel has a bar sequence built
    from its textbook definition, not from the spec strings; completeness
    asserted by test_all_kernels_have_a_geometry_fixture)."""
    base_cols = []
    for k in range(5):
        for src in ("open", "high", "low", "close"):
            name = f"{src[0]}{k}"
            base_cols.append(
                f"{src} AS {name}" if k == 0 else f"lag({src}, {k}) OVER w AS {name}"
            )
    base_cols.append(f"lag(close, {MAX_LAG}) OVER w AS c5x")
    base_cols.append(
        f"avg(abs(close - open)) OVER (PARTITION BY {series_col} ORDER BY {ts_col} "
        "ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING) AS avgbody10"
    )
    d1, d2 = _derived_helpers()
    d1_cols = ", ".join(f"({s}) AS {n}" for n, s in d1.items())
    d2_cols = ", ".join(f"({s}) AS {n}" for n, s in d2.items())
    k_cols = ", ".join(f"{kernel_score_sql(n)} AS \"{n}\"" for n in KERNELS)
    s_cols = ", ".join(f"{s} AS {n}" for n, s in summary_sqls().items())
    kernel_names = ", ".join(f'"{n}"' for n in KERNELS)
    return f"""
WITH bars AS ({bars_sql}),
base AS (
  SELECT {series_col}, {ts_col}, {', '.join(base_cols)}
  FROM bars WINDOW w AS (PARTITION BY {series_col} ORDER BY {ts_col})),
d1 AS (SELECT *, {d1_cols} FROM base),
d2 AS (SELECT *, {d2_cols} FROM d1),
k AS (SELECT {series_col}, {ts_col}, {k_cols} FROM d2)
SELECT {series_col}, {ts_col}, {kernel_names}, {s_cols} FROM k
"""


def candle_score_by_rule(
    ohlcv: DataFrame,
    rules: list[str] = ("1 day", "3 days", "5 days"),
    last_n: int = 3,
    series_col: str = "series_id",
    ts_col: str = "ts",
) -> DataFrame:
    """A5 (/root/reference/datalib/boxCandlePatternUtil.py:232-256): per
    resample rule, sum the last-3 bars' pattern scores; overall = sum/100."""
    from .windows import resample_ohlcv

    parts = []
    for rule in rules:
        bars = ohlcv if rule == "1 day" else resample_ohlcv(
            ohlcv, rule, series_col=series_col, ts_col=ts_col
        ).withColumnRenamed("bucket_ts", ts_col)
        scored = candle_patterns(bars, series_col=series_col, ts_col=ts_col)
        w = Window.partitionBy(series_col).orderBy(F.desc(ts_col))
        last = (
            scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= last_n)
            .groupBy(series_col)
            .agg(F.sum("candlestick_pattern_score").alias("rule_score"))
            .withColumn("rule", F.lit(rule))
        )
        parts.append(last)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.groupBy(series_col).agg(
        (F.sum("rule_score") / 100.0).alias("candle_score"),
        F.count("*").alias("n_rules"),
    )
