from __future__ import annotations

import pytest

from timeseriesvectordbpattermatcher_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tsvdbpm_tests", cpus=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def seqs_2k(spark):
    from timeseriesvectordbpattermatcher_spark.sources.synth import synth_seqs

    df = synth_seqs(spark, 2000, seed=42).cache()
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    yield con
    con.close()


def assert_df_equal(spark_df, duck_rel, sort_cols, rtol=1e-9):
    """Compare a Spark DataFrame against a DuckDB relation, order-insensitive."""
    import pandas as pd

    left = spark_df.toPandas().sort_values(sort_cols).reset_index(drop=True)
    right = duck_rel.df().sort_values(sort_cols).reset_index(drop=True)
    left = left[sorted(left.columns)]
    right = right[sorted(right.columns)]
    assert list(left.columns) == list(right.columns), (left.columns, right.columns)
    pd.testing.assert_frame_equal(left, right, check_dtype=False, rtol=rtol, atol=1e-12)
