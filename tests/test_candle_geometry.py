"""Per-kernel geometry fixtures for every ranked candlestick pattern.

Each fixture is a hand-constructed (open, high, low, close) bar sequence
derived from the pattern's TEXTBOOK definition (the public TA-Lib docs the
kernels cite), NOT from the kernel condition strings — so these tests are
the independent geometry check the shared-spec DuckDB oracle cannot provide
(see candles.candle_oracle_sql's independence caveat). Together with
tests/test_candles.py this covers all 61 kernels; the completeness assert
at the bottom pins that no kernel is left without a positive fixture.

All fixtures ride ONE DataFrame (distinct series_id per fixture) and one
candle_patterns() pass, so the module costs a single Spark job.
"""

from __future__ import annotations

import datetime as dt

import pytest

from timeseriesvectordbpattermatcher_spark.operators.candles import KERNELS, candle_patterns

# kernel -> list of (side, rows, idx): the bar at `idx` must score +100
# (bull) / -100 (bear) for that kernel. Rows are (open, high, low, close).
_UP6 = [(99.0 + i, 100.6 + i, 98.5 + i, 100.0 + i) for i in range(6)]  # closes 100..105

FIXTURES: dict[str, list[tuple[str, list[tuple[float, float, float, float]], int]]] = {
    "CDL2CROWS": [
        ("Bear", [(100, 111, 99, 110), (115, 116, 112, 113), (114, 114.5, 105, 106)], 2),
    ],
    "CDL3BLACKCROWS": [
        ("Bear", [(110, 110.5, 104, 105), (108, 108.5, 100.5, 101), (104, 104.5, 97.5, 98)], 2),
    ],
    "CDL3INSIDE": [
        ("Bull", [(110, 110.5, 99.5, 100), (101, 108.5, 100.5, 108), (108, 112, 107, 111)], 2),
        ("Bear", [(100, 110.5, 99.5, 110), (109, 109.5, 101.5, 102), (102, 102.5, 97, 98)], 2),
    ],
    "CDL3OUTSIDE": [
        ("Bull", [(105, 106, 99, 100), (99, 108, 98, 107), (107, 110, 106, 109)], 2),
        ("Bear", [(100, 106, 99, 105), (106, 107, 97, 98), (98, 98.5, 94, 95)], 2),
    ],
    "CDL3STARSINSOUTH": [
        ("Bull", [(110, 110.5, 100, 104), (107, 107.5, 101, 103), (105, 105.5, 102, 103.5)], 2),
    ],
    "CDLADVANCEBLOCK": [
        ("Bear", [(100, 106.5, 99.5, 106), (102, 107, 101.5, 106.5), (104, 107.5, 103.5, 107)], 2),
    ],
    "CDLBELTHOLD": [
        ("Bull", [(100, 108, 100, 106)], 0),
        ("Bear", [(106, 106, 98, 100)], 0),
    ],
    "CDLBREAKAWAY": [
        ("Bull", [(120, 120.5, 109.5, 110), (107, 107.5, 104.5, 105),
                  (104.5, 105, 103, 103.5), (103, 103.5, 101.5, 102),
                  (102, 109, 101.5, 108.5)], 4),
        ("Bear", [(100, 110.5, 99.5, 110), (113, 115.5, 112.5, 115),
                  (115, 116.5, 114.5, 116), (116, 117.5, 115.5, 117),
                  (117, 117.5, 111.5, 112)], 4),
    ],
    "CDLCLOSINGMARUBOZU": [
        ("Bull", [(100, 108, 98, 108)], 0),
        ("Bear", [(108, 110, 100, 100)], 0),
    ],
    "CDLCONCEALBABYSWALL": [
        ("Bull", [(110, 110, 104, 104), (103, 103, 98, 98),
                  (96, 99, 93, 94), (100, 100.5, 92, 92.5)], 3),
    ],
    "CDLCOUNTERATTACK": [
        ("Bull", [(100, 101, 99, 100.5), (110, 110.5, 103.5, 104),
                  (98, 104.5, 97.5, 104.0)], 2),
        ("Bear", [(100, 101, 99, 100.5), (100, 106.5, 99.5, 106),
                  (112, 112.5, 105.5, 106.0)], 2),
    ],
    "CDLDOJISTAR": [
        ("Bull", [(100, 101, 99, 100.5), (110, 110.5, 101.5, 102),
                  (99, 100, 98, 99.05)], 2),
        ("Bear", [(100, 101, 99, 100.5), (100, 108.5, 99.5, 108),
                  (110, 111, 109, 110.05)], 2),
    ],
    "CDLEVENINGDOJISTAR": [
        ("Bear", [(100, 110.5, 99.5, 110), (111, 112, 110.8, 111.05),
                  (110, 110.5, 103, 104)], 2),
    ],
    "CDLEVENINGSTAR": [
        ("Bear", [(100, 110.5, 99.5, 110), (111, 113, 110.8, 112),
                  (111, 111.5, 102, 103)], 2),
    ],
    "CDLGAPSIDESIDEWHITE": [
        ("Bull", [(100, 101, 95, 96), (103, 106, 102.5, 105),
                  (103.5, 106.5, 103, 105.5)], 2),
        ("Bear", [(100, 101, 90, 92), (85, 88.5, 84.5, 88),
                  (85.2, 88.8, 84.8, 88.2)], 2),
    ],
    "CDLHAMMER": [("Bull", [(100, 101.1, 95, 101)], 0)],
    "CDLHANGINGMAN": [("Bear", _UP6 + [(106, 106.1, 102, 105.5)], 6)],
    "CDLHARAMI": [
        ("Bull", [(110, 111, 99, 100), (102, 107.5, 101.5, 107)], 1),
        ("Bear", [(100, 111, 99, 110), (108, 108.5, 102.5, 103)], 1),
    ],
    "CDLHARAMICROSS": [
        ("Bull", [(110, 111, 99, 100), (104, 105, 103, 104.05)], 1),
        ("Bear", [(100, 111, 99, 110), (104, 105, 103, 104.05)], 1),
    ],
    "CDLHIGHWAVE": [
        ("Bull", [(100, 104, 96.5, 100.5)], 0),
        ("Bear", [(100.5, 104, 96.5, 100)], 0),
    ],
    "CDLHIKKAKE": [
        ("Bull", [(100, 110, 90, 105), (100, 105, 95, 102), (96, 104, 93, 94)], 2),
        ("Bear", [(100, 110, 90, 105), (100, 105, 95, 102), (106, 108, 96, 107)], 2),
    ],
    "CDLHIKKAKEMOD": [
        ("Bull", [(100, 110, 90, 105), (104, 105, 95, 96), (96, 104, 93, 94)], 2),
        ("Bear", [(100, 110, 90, 105), (96, 105, 95, 104), (106, 108, 96, 107)], 2),
    ],
    "CDLHOMINGPIGEON": [
        ("Bull", [(110, 111, 99, 100), (108, 108.5, 101.5, 102)], 1),
    ],
    "CDLINNECK": [
        ("Bear", [(110, 111, 100, 101), (98, 101.8, 97.5, 101.5)], 1),
    ],
    "CDLINVERTEDHAMMER": [("Bull", [(100, 105, 99.9, 101)], 0)],
    "CDLLADDERBOTTOM": [
        ("Bull", [(110, 110.5, 104.5, 105), (108, 108.5, 101.5, 102),
                  (105, 105.5, 98.5, 99), (98, 100, 95.5, 96),
                  (99, 103, 98.5, 102.5)], 4),
    ],
    "CDLLONGLEGGEDDOJI": [("Bull", [(100, 104, 96, 100.2)], 0)],
    "CDLMATCHINGLOW": [
        ("Bull", [(110, 110.5, 99.5, 100), (105, 105.5, 99.5, 100.05)], 1),
    ],
    "CDLMORNINGDOJISTAR": [
        ("Bull", [(110, 110.5, 99.5, 100), (98, 99, 97, 98.05),
                  (99, 107, 98.5, 106.5)], 2),
    ],
    "CDLSEPARATINGLINES": [
        ("Bull", [(110, 110.5, 103.5, 104), (110, 118, 110, 117)], 1),
        ("Bear", [(104, 110.5, 103.5, 110), (104, 104, 96, 97)], 1),
    ],
    "CDLSHOOTINGSTAR": [("Bear", _UP6 + [(106, 111, 105.9, 107)], 6)],
    "CDLSPINNINGTOP": [
        ("Bull", [(100, 103, 97.5, 101)], 0),
        ("Bear", [(101, 103, 97.5, 100)], 0),
    ],
    "CDLSTALLEDPATTERN": [
        ("Bear", [(100, 105.5, 99.5, 105), (104, 110.5, 103.5, 110),
                  (109.5, 111, 109, 110.5)], 2),
    ],
    "CDLSTICKSANDWICH": [
        ("Bull", [(105, 105.5, 99.5, 100), (102, 108, 101.5, 107.5),
                  (106, 106.5, 99.8, 100.05)], 2),
    ],
    "CDLTHRUSTING": [
        ("Bear", [(110, 111, 100, 101), (98, 104, 97.5, 103.5)], 1),
    ],
    "CDLUNIQUE3RIVER": [
        ("Bull", [(110, 110.5, 102, 103), (108, 108.5, 100, 104),
                  (101, 103.5, 100.5, 103)], 2),
    ],
    "CDLUPSIDEGAP2CROWS": [
        ("Bear", [(100, 110.5, 99.5, 110), (115, 115.5, 112.5, 113),
                  (116, 116.5, 110.8, 111)], 2),
    ],
}


@pytest.fixture(scope="module")
def scored_rows(spark):
    """Run candle_patterns once over every fixture (distinct series each)."""
    data = []
    for name, cases in FIXTURES.items():
        for side, rows, _idx in cases:
            sid = f"{name}_{side}"
            for i, (o, h, l, c) in enumerate(rows):
                data.append(
                    (sid, dt.datetime(2024, 1, 1) + dt.timedelta(days=i),
                     float(o), float(h), float(l), float(c), 1000.0)
                )
    df = spark.createDataFrame(
        data, "series_id string, ts timestamp, open double, high double, "
        "low double, close double, volume double"
    )
    out = candle_patterns(df).collect()
    by_series: dict[str, list] = {}
    for r in out:
        by_series.setdefault(r["series_id"], []).append(r)
    for rows_ in by_series.values():
        rows_.sort(key=lambda r: r["ts"])
    return by_series


_ALL_CASES = [
    (name, side, idx)
    for name, cases in FIXTURES.items()
    for side, _rows, idx in cases
]


@pytest.mark.parametrize("name,side,idx", _ALL_CASES,
                         ids=[f"{n}_{s}" for n, s, _ in _ALL_CASES])
def test_kernel_fires_on_textbook_geometry(scored_rows, name, side, idx):
    row = scored_rows[f"{name}_{side}"][idx]
    expected = 100 if side == "Bull" else -100
    assert row[name] == expected, (
        f"{name} {side}: expected {expected} at bar {idx}, got {row[name]}"
    )


def test_all_kernels_have_a_geometry_fixture():
    """Every kernel has a positive fixture here or a named test in
    tests/test_candles.py (the two modules together cover the full set)."""
    import re

    covered = set(FIXTURES)
    src = open(__file__.replace("test_candle_geometry", "test_candles")).read()
    covered |= set(re.findall(r"CDL[A-Z0-9]+", src))
    missing = set(KERNELS) - covered
    assert not missing, sorted(missing)
