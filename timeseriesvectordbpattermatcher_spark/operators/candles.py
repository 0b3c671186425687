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
  best pattern = min rank per the reference table (:210-214; ranks below
  are the reference's values for the kernels we implement; unknown -> 20,
  matching its default at :207).

One window pass per series: every kernel is lag-based, whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# reference rank values (/root/reference/datalib/boxCandlePatternUtil.py:5-128)
CANDLE_RANKINGS = {
    "CDL3BLACKCROWS_Bear": 3,
    "CDLEVENINGSTAR_Bear": 4,
    "CDLINVERTEDHAMMER_Bull": 6,
    "CDLMORNINGSTAR_Bull": 12,
    "CDL3WHITESOLDIERS_Bull": 32,
    "CDLENGULFING_Bull": 84,
    "CDLENGULFING_Bear": 91,
    "CDLHARAMI_Bull": 20,
    "CDLHARAMI_Bear": 20,
    "CDLMARUBOZU_Bull": 20,
    "CDLMARUBOZU_Bear": 20,
    "CDLDOJI_Bull": 20,
    "CDLDOJI_Bear": 20,
    "CDLHAMMER_Bull": 20,
}
DEFAULT_RANK = 20


def _kernels(series_col: str, ts_col: str) -> dict[str, F.Column]:
    w = Window.partitionBy(series_col).orderBy(ts_col)
    o, h, l, c = F.col("open"), F.col("high"), F.col("low"), F.col("close")
    o1, c1 = F.lag("open").over(w), F.lag("close").over(w)
    o2, c2 = F.lag("open", 2).over(w), F.lag("close", 2).over(w)
    body = F.abs(c - o)
    rng = h - l
    up_shadow = h - F.greatest(o, c)
    dn_shadow = F.least(o, c) - l
    bull = c > o
    bear = c < o
    bull1, bear1 = c1 > o1, c1 < o1
    bull2, bear2 = c2 > o2, c2 < o2
    body1 = F.abs(c1 - o1)
    body2 = F.abs(c2 - o2)

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
