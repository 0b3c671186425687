"""The committed golden fixtures for the oracle-backed contract queries must
equal a fresh recomputation from the pure-pandas reference-semantics oracle
(tests/oracle/pandas_oracle.py) — the CI regen gate from VERDICT r2 item 1:
a golden can no longer drift from the implementation that claims to produce
it, and the producing implementation is not the engine under test."""

from __future__ import annotations

import os

import pandas as pd
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def _assert_equal(golden: pd.DataFrame, fresh: pd.DataFrame):
    assert sorted(golden.columns) == sorted(fresh.columns)
    cols = sorted(golden.columns)
    g = golden[cols].sort_values(cols).reset_index(drop=True)
    f = fresh[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, f, check_dtype=False)


@pytest.mark.parametrize(
    "name",
    [
        "multi_stop", "vcp_patterns", "trade_sim", "divergence",
        "pattern_screener", "box_detection", "trend_range",
    ],
)
def test_golden_matches_pandas_oracle(spark, name):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "make_goldens",
        os.path.join(os.path.dirname(__file__), "..", "scripts", "make_goldens.py"),
    )
    mg = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mg)
    golden = pd.read_parquet(os.path.join(GOLDEN_DIR, f"{name}.parquet"))
    fresh = mg._oracle_frame(name, spark)
    _assert_equal(golden, fresh)
