"""Deterministic synthetic ``seqs`` corpus (BASELINE.json input_hint shape).

seqs(doc_id string, tokens array<int32>, n_tok int32, source string)

The time axis is encoded in ``doc_id`` as ``'{source}_{yyyyMMddHHmmss}_{seq:08d}'``,
mirroring the reference's window-id convention
``'{prefix}_{ticker}_{YYYYMMDD}_{YYYYMMDD}'``
(/root/reference/katslib/opkatsDataUtil.py:98) and its parse-back
(/root/reference/opkatsPatternMatcherUtil.py:57-60,198-207).

Everything is a Spark expression over ``spark.range`` — no driver-side data,
no Python in the row path — so the same generator produces the 2k-row unit
fixture and a 10^9-row bench corpus with identical per-row values (the row
value depends only on its ``id``, never on partitioning). Randomness comes
from ``xxhash64`` mixed with a caller seed: deterministic, repartition-proof.

Design choices (pinned by FIXTURES.md F1):
- ``source`` is skewed: web ~70%, code ~15%, books ~10%, wiki ~5% — exercises
  the salted-skew path of the rollup.
- ``n_tok`` is log-uniform in [1, 2048]; rows with id % 1000 == 0 / == 1 pin
  the exact boundaries 1 / 2048.
- event times advance 3 s per row with a 10-minute hole injected every 400
  rows (whole missing minutes per source → gap-fill fixtures).
- ``tokens[i] = xxhash64(seed, id, i) mod 50257`` — vocab-sized int32s.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

VOCAB_SIZE = 50_257
MAX_N_TOK = 2_048
BASE_TS = "2024-01-01 00:00:00"

_SOURCES = [("web", 70), ("code", 85), ("books", 95), ("wiki", 100)]


def synth_seqs(
    spark: SparkSession,
    n_rows: int,
    seed: int = 42,
    partitions: int | None = None,
    with_tokens: bool = True,
) -> DataFrame:
    """Generate ``n_rows`` deterministic sequences.

    ``with_tokens=False`` keeps only (doc_id, n_tok, source, event-time) —
    enough for rollup benchmarks where materializing token arrays would just
    measure the generator.
    """
    df = spark.range(0, n_rows, 1, partitions or spark.sparkContext.defaultParallelism)

    u_src = F.pmod(F.xxhash64(F.lit(seed), F.lit("src"), F.col("id")), F.lit(100))
    src = (
        F.when(u_src < _SOURCES[0][1], _SOURCES[0][0])
        .when(u_src < _SOURCES[1][1], _SOURCES[1][0])
        .when(u_src < _SOURCES[2][1], _SOURCES[2][0])
        .otherwise(_SOURCES[3][0])
    )

    # log-uniform n_tok in [1, MAX_N_TOK]; exact boundary pins at id%1000 in {0,1}
    u = (
        F.pmod(F.xxhash64(F.lit(seed), F.lit("ntok"), F.col("id")), F.lit(1_000_000))
        / F.lit(1_000_000.0)
    )
    ntok_draw = F.floor(F.exp(u * F.log(F.lit(float(MAX_N_TOK))))).cast("int")
    n_tok = (
        F.when(F.pmod(F.col("id"), F.lit(1000)) == 0, F.lit(1))
        .when(F.pmod(F.col("id"), F.lit(1000)) == 1, F.lit(MAX_N_TOK))
        .otherwise(F.least(F.greatest(ntok_draw, F.lit(1)), F.lit(MAX_N_TOK)))
        .cast("int")
    )

    # 3 s per row + a 600 s hole every 400 rows → whole missing minutes
    sec_off = F.col("id") * 3 + F.floor(F.col("id") / 400) * 600
    event_ts = F.to_timestamp(F.lit(BASE_TS)) + F.make_interval(secs=sec_off.cast("double"))

    df = (
        df.withColumn("source", src)
        .withColumn("n_tok", n_tok)
        .withColumn("event_ts", event_ts)
        .withColumn(
            "doc_id",
            F.concat_ws(
                "_",
                F.col("source"),
                F.date_format("event_ts", "yyyyMMddHHmmss"),
                # format_string pads to AT LEAST 8 digits; lpad TRUNCATES
                # past 8, which would alias seq fields at id >= 10^8
                F.format_string("%08d", F.col("id")),
            ),
        )
    )

    if with_tokens:
        # tokens[i] = xxhash64(seed, id, i) mod VOCAB — JVM-side, codegen'd
        df = df.withColumn(
            "tokens",
            F.transform(
                F.sequence(F.lit(0), F.col("n_tok") - 1),
                lambda i: F.pmod(
                    F.xxhash64(F.lit(seed), F.lit("tok"), F.col("id"), i), F.lit(VOCAB_SIZE)
                ).cast("int"),
            ),
        )
        cols = ["doc_id", "tokens", "n_tok", "source"]
    else:
        cols = ["doc_id", "n_tok", "source"]
    return df.select(*cols)


def synth_ohlcv(
    spark: SparkSession,
    n_tickers: int = 8,
    n_days: int = 1500,
    seed: int = 42,
) -> DataFrame:
    """Reference-shaped OHLCV fixture (FIXTURES.md F2): seeded geometric
    random walk per ticker, daily rows, high >= max(open, close) >=
    min(open, close) >= low. Includes one constant-price ticker (must be
    skipped by the feature kernel per
    /root/reference/katslib/opkatsDataUtil.py:208-209) and one short ticker
    (<64 rows -> zero windows per :96).

    Driver-side generation is fine here: this fixture exists for
    matcher-parity goldens, not for scale (the scale input is ``synth_seqs``).
    """
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(seed)
    frames = []
    for t in range(n_tickers):
        name = f"TK{t:02d}"
        if t == n_tickers - 1:  # short ticker
            days = 40
        else:
            days = n_days
        dates = pd.date_range("2018-01-02", periods=days, freq="B")
        if t == n_tickers - 2:  # constant-price ticker
            close = np.full(days, 50.0)
            open_ = close.copy()
            vol = np.full(days, 1e6)
        else:
            steps = rng.normal(loc=0.0003, scale=0.02, size=days)
            close = 100.0 * np.exp(np.cumsum(steps))
            open_ = close * (1 + rng.normal(0, 0.005, size=days))
            vol = np.exp(rng.normal(13, 0.5, size=days))
        hi = np.maximum(open_, close) * (1 + np.abs(rng.normal(0, 0.004, size=days)))
        lo = np.minimum(open_, close) * (1 - np.abs(rng.normal(0, 0.004, size=days)))
        frames.append(
            pd.DataFrame(
                {
                    "series_id": name,
                    "ts": dates,
                    "open": open_,
                    "high": hi,
                    "low": lo,
                    "close": close,
                    "volume": vol,
                }
            )
        )
    pdf = pd.concat(frames, ignore_index=True)
    return spark.createDataFrame(pdf)
