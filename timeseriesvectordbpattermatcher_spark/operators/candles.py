"""W18 candlestick pattern matching + rank resolution.

The reference delegates kernels to pandas_ta's ``cdl_pattern()`` (TA-Lib
port) and resolves multi-matches with a static rank table
(/root/reference/datalib/boxCandlePatternUtil.py:4-132 rank dict, :135-227
resolver). pandas_ta/TA-Lib are not in this sandbox, so the kernels are
re-implemented as documented pure Spark expressions emitting TA-Lib-style
±100 scores; the resolver preserves the reference contract exactly:

- 0 matches        -> pattern 'NO_PATTERN', match_count 0
- 1 match          -> '<NAME>_Bull'/'_Bear' by score sign, count 1
- multiple matches -> match_count = n, pattern_score = sum of scores,
  best pattern = min rank per the reference table (:210-214; CANDLE_RANKINGS
  below is the reference's FULL table; names absent from it -> 20, matching
  its default at :207). 26 kernels implemented as documented lag-based
  expressions (geometry re-derived from public TA-Lib docs — talib itself
  is not in this sandbox; context-dependent kernels use a documented
  close-vs-5-bars-back trend proxy).

One window pass per series: every kernel is lag-based, whole-stage codegen.
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


def _kernels(series_col: str, ts_col: str) -> dict[str, F.Column]:
    w = Window.partitionBy(series_col).orderBy(ts_col)
    o, h, l, c = F.col("open"), F.col("high"), F.col("low"), F.col("close")
    o1, c1 = F.lag("open").over(w), F.lag("close").over(w)
    h1, l1 = F.lag("high").over(w), F.lag("low").over(w)
    o2, c2 = F.lag("open", 2).over(w), F.lag("close", 2).over(w)
    o3, c3 = F.lag("open", 3).over(w), F.lag("close", 3).over(w)
    body = F.abs(c - o)
    rng = h - l
    up_shadow = h - F.greatest(o, c)
    dn_shadow = F.least(o, c) - l
    bull = c > o
    bear = c < o
    bull1, bear1 = c1 > o1, c1 < o1
    bull2, bear2 = c2 > o2, c2 < o2
    bull3, bear3 = c3 > o3, c3 < o3
    body1 = F.abs(c1 - o1)
    body2 = F.abs(c2 - o2)
    mid1 = (o1 + c1) / 2
    # doji helpers (body within 10% of range; "long" shadow >= 40% of range)
    is_doji = (rng > 0) & (body <= 0.1 * rng)
    long_up = up_shadow >= 0.4 * rng
    long_dn = dn_shadow >= 0.4 * rng
    # trend proxies for context-dependent kernels (talib tracks a short SMA
    # trend; documented simplification: previous close vs close 5 rows back)
    c5 = F.lag("close", 5).over(w)
    uptrend = c1 > c5
    # long/short line reference: mean body of the prior 10 bars
    avg_body10 = F.avg(F.abs(F.col("close") - F.col("open"))).over(
        w.rowsBetween(-10, -1)
    )

    def score(cond_bull, cond_bear=None):
        e = F.when(cond_bull, F.lit(100))
        if cond_bear is not None:
            e = e.when(cond_bear, F.lit(-100))
        return e.otherwise(F.lit(0))

    return {
        # body within 10% of the range
        "CDLDOJI": score((rng > 0) & (body <= 0.1 * rng)),
        # long lower shadow, small body near the top
        "CDLHAMMER": score(
            (rng > 0) & (dn_shadow >= 2 * body) & (up_shadow <= 0.25 * body) & (body > 0)
        ),
        "CDLINVERTEDHAMMER": score(
            (rng > 0) & (up_shadow >= 2 * body) & (dn_shadow <= 0.25 * body) & (body > 0)
        ),
        # current body engulfs previous opposite body
        "CDLENGULFING": score(
            bull & bear1 & (c >= o1) & (o <= c1) & (body > body1),
            bear & bull1 & (o >= c1) & (c <= o1) & (body > body1),
        ),
        # current body inside previous body
        "CDLHARAMI": score(
            bull & bear1 & (o > c1) & (c < o1),
            bear & bull1 & (o < c1) & (c > o1),
        ),
        # nearly shadow-less
        "CDLMARUBOZU": score(
            bull & (rng > 0) & (body >= 0.95 * rng),
            bear & (rng > 0) & (body >= 0.95 * rng),
        ),
        "CDL3WHITESOLDIERS": score(
            bull & bull1 & bull2 & (c > c1) & (c1 > c2) & (o > o1) & (o < c1) & (o1 > o2) & (o1 < c2)
        ),
        "CDL3BLACKCROWS": score(
            F.lit(False),
            bear & bear1 & bear2 & (c < c1) & (c1 < c2) & (o < o1) & (o > c1) & (o1 < o2) & (o1 > c2),
        ),
        # big bear, small middle body below it, bull closing above 1st midpoint
        "CDLMORNINGSTAR": score(
            bear2 & (body2 > 0) & (body1 < 0.3 * body2) & (F.greatest(o1, c1) < c2)
            & bull & (c > (o2 + c2) / 2)
        ),
        "CDLEVENINGSTAR": score(
            F.lit(False),
            bull2 & (body2 > 0) & (body1 < 0.3 * body2) & (F.least(o1, c1) > c2)
            & bear & (c < (o2 + c2) / 2),
        ),
        # --- round-2 additions toward the reference's full ranked set ---
        # three same-color bars then a 4th opposite bar engulfing the run
        "CDL3LINESTRIKE": score(
            bear3 & bear2 & bear1 & (c3 > c2) & (c2 > c1)
            & bull & (o < c1) & (c > o3),
            bull3 & bull2 & bull1 & (c3 < c2) & (c2 < c1)
            & bear & (o > c1) & (c < o3),
        ),
        # bear then bull opening below prior low, closing above prior midpoint
        # but below prior open
        "CDLPIERCING": score(
            bear1 & bull & (o < l1) & (c > mid1) & (c < o1)
        ),
        # bull then bear opening above prior high, closing below prior midpoint
        # but above prior open
        "CDLDARKCLOUDCOVER": score(
            F.lit(False),
            bull1 & bear & (o > h1) & (c < mid1) & (c > o1),
        ),
        # hammer/inverted-hammer shape in trend context
        "CDLHANGINGMAN": score(
            F.lit(False),
            uptrend & (rng > 0) & (dn_shadow >= 2 * body)
            & (up_shadow <= 0.25 * body) & (body > 0),
        ),
        "CDLSHOOTINGSTAR": score(
            F.lit(False),
            uptrend & (rng > 0) & (up_shadow >= 2 * body)
            & (dn_shadow <= 0.25 * body) & (body > 0),
        ),
        # small body, both shadows longer than the body
        "CDLSPINNINGTOP": score(
            bull & (rng > 0) & (up_shadow > body) & (dn_shadow > body),
            bear & (rng > 0) & (up_shadow > body) & (dn_shadow > body),
        ),
        # tiny body with very long shadows on both sides
        "CDLHIGHWAVE": score(
            bull & (rng > 0) & (up_shadow >= 3 * body) & (dn_shadow >= 3 * body),
            bear & (rng > 0) & (up_shadow >= 3 * body) & (dn_shadow >= 3 * body),
        ),
        # long body opening at the extreme (<=5% shadow on the open side)
        "CDLBELTHOLD": score(
            bull & (rng > 0) & (body >= 0.5 * rng) & (dn_shadow <= 0.05 * rng),
            bear & (rng > 0) & (body >= 0.5 * rng) & (up_shadow <= 0.05 * rng),
        ),
        # no shadow on the CLOSE side only (full marubozu excluded by >)
        "CDLCLOSINGMARUBOZU": score(
            bull & (rng > 0) & (up_shadow <= 0.05 * rng) & (dn_shadow > 0.05 * rng)
            & (body >= 0.5 * rng),
            bear & (rng > 0) & (dn_shadow <= 0.05 * rng) & (up_shadow > 0.05 * rng)
            & (body >= 0.5 * rng),
        ),
        # doji variants by shadow geometry
        "CDLDRAGONFLYDOJI": score(is_doji & long_dn & (up_shadow <= 0.1 * rng)),
        "CDLGRAVESTONEDOJI": score(
            F.lit(False), is_doji & long_up & (dn_shadow <= 0.1 * rng)
        ),
        "CDLLONGLEGGEDDOJI": score(
            is_doji & long_up & long_dn, F.lit(False)
        ),
        # takuri: dragonfly with an extreme lower shadow (>= 60% of range)
        "CDLTAKURI": score(
            is_doji & (dn_shadow >= 0.6 * rng) & (up_shadow <= 0.1 * rng)
        ),
        # two bears closing at (nearly) the same level
        "CDLMATCHINGLOW": score(
            bear1 & bear & (F.abs(c - c1) <= 0.001 * F.abs(c1))
        ),
        # bear then smaller bear inside the prior body
        "CDLHOMINGPIGEON": score(
            bear1 & bear & (o < o1) & (c > c1) & (body < body1)
        ),
        # harami then a 3rd bar confirming beyond the 1st bar's close
        "CDL3INSIDE": score(
            bear2 & bull1 & (o1 > c2) & (c1 < o2) & bull & (c > o2),
            bull2 & bear1 & (o1 < c2) & (c1 > o2) & bear & (c < o2),
        ),
        # body longer/shorter than the 10-bar mean body
        "CDLLONGLINE": score(
            bull & (body >= 2 * avg_body10) & avg_body10.isNotNull(),
            bear & (body >= 2 * avg_body10) & avg_body10.isNotNull(),
        ),
        "CDLSHORTLINE": score(
            bull & (body <= 0.5 * avg_body10) & (body > 0) & avg_body10.isNotNull(),
            bear & (body <= 0.5 * avg_body10) & (body > 0) & avg_body10.isNotNull(),
        ),
    }


def candle_patterns(
    df: DataFrame, series_col: str = "series_id", ts_col: str = "ts"
) -> DataFrame:
    """Per row: every kernel score column + the resolved summary columns
    (candlestick_pattern, match_count, pattern_score, best_pattern)."""
    kernels = _kernels(series_col, ts_col)
    out = df
    for name, expr in kernels.items():
        out = out.withColumn(name, expr)

    structs = F.array(
        *[
            F.struct(
                F.col(name).alias("score"),
                F.lit(name).alias("name"),
                F.lit(CANDLE_RANKINGS.get(f"{name}_Bull", DEFAULT_RANK)).alias("rank_bull"),
                F.lit(CANDLE_RANKINGS.get(f"{name}_Bear", DEFAULT_RANK)).alias("rank_bear"),
            )
            for name in kernels
        ]
    )
    hits = F.filter(structs, lambda s: s.getField("score") != 0)
    tagged = F.transform(
        hits,
        lambda s: F.struct(
            F.when(s.getField("score") > 0, s.getField("rank_bull"))
            .otherwise(s.getField("rank_bear"))
            .alias("rank"),
            F.concat(
                s.getField("name"),
                F.when(s.getField("score") > 0, F.lit("_Bull")).otherwise(F.lit("_Bear")),
            ).alias("pattern"),
            s.getField("score").alias("score"),
        ),
    )
    n = F.size(hits)
    total = F.aggregate(tagged, F.lit(0), lambda a, s: a + s.getField("score"))
    best = F.array_min(tagged)  # struct compare: min rank, ties by name
    out = (
        out.withColumn("candlestick_match_count", n)
        .withColumn("candlestick_pattern_score", total)
        .withColumn(
            "candlestick_pattern",
            F.when(n == 0, F.lit("NO_PATTERN")).otherwise(
                F.concat_ws(",", F.transform(tagged, lambda s: s.getField("pattern")))
            ),
        )
        .withColumn("best_pattern", F.when(n > 0, best.getField("pattern")))
    )
    return out


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
