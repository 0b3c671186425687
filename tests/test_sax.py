"""SAX symbolic representation (operators/sax.py).

Oracles:
- word parity: DuckDB recomputes frames -> PAA -> z-norm -> breakpoint
  CASE -> string_agg word from the same rows with the same moment
  formulas (sum/sumsq), via window functions — a different engine and a
  different plan shape;
- breakpoint table: each alphabet's cuts are symmetric, ascending, and
  split N(0,1) into equal-mass regions within the published 2-decimal
  rounding;
- structural: tumbling vs sliding frame counts, completeness filter,
  constant-frame convention, motif ranks, candidate-pair bucket algebra.
"""

from __future__ import annotations

import math

import pandas as pd
import pyspark.sql.functions as F
import pytest

from timeseriesvectordbpattermatcher_spark.operators.rollup import (
    derive_event_ts,
    rollup_1m,
)
from timeseriesvectordbpattermatcher_spark.operators.sax import (
    SAX_BREAKPOINTS,
    sax_candidate_pairs,
    sax_motifs,
    sax_symbol,
    sax_words,
)

FRAME, WORD, ALPHA = 16, 4, 4


@pytest.fixture(scope="module")
def series(spark, seqs_2k):
    """Per-(source, minute) avg_n_tok — the natural SAX input tier."""
    df = (
        rollup_1m(derive_event_ts(seqs_2k))
        .select("source", "bucket_ts", "avg_n_tok")
        .cache()
    )
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def words(series):
    w = sax_words(series, FRAME, WORD, ALPHA).cache()
    w.count()
    yield w
    w.unpersist()


def _duck_words(duck, pdf, frame, word, alphabet, stride=None):
    stride = stride or frame
    cuts = SAX_BREAKPOINTS[alphabet]
    seg_len = frame // word
    mid = chr(ord("a") + len(cuts) // 2)
    z = "((p.paa - f.frame_mean) / f.frame_std)"
    sym = "CASE "
    for i, c in enumerate(cuts):
        sym += f"WHEN {z} < {c!r} THEN '{chr(ord('a') + i)}' "
    sym += f"ELSE '{chr(ord('a') + len(cuts))}' END"
    duck.register("sax_raw", pdf)
    return duck.sql(f"""
        WITH pos AS (
          SELECT source, bucket_ts, CAST(avg_n_tok AS DOUBLE) AS val,
                 row_number() OVER (PARTITION BY source ORDER BY bucket_ts) - 1 AS i
          FROM sax_raw
          WHERE bucket_ts IS NOT NULL AND avg_n_tok IS NOT NULL
        ), member AS (
          SELECT p.source, p.bucket_ts, p.val, p.i, k.frame_id,
                 CAST(floor((p.i - k.frame_id * {stride}) / {seg_len}) AS INT) AS seg
          FROM pos p, LATERAL (
            SELECT unnest(generate_series(
              CAST(greatest(0, ceil((p.i - {frame} + 1.0) / {stride})) AS BIGINT),
              CAST(floor(p.i / {stride}) AS BIGINT))) AS frame_id
          ) k
        ), paa AS (
          SELECT source, frame_id, seg, avg(val) AS paa,
                 sum(val) AS s, sum(val*val) AS ss, count(*) AS n,
                 min(bucket_ts) AS seg_ts
          FROM member GROUP BY 1, 2, 3
        ), frames AS (
          SELECT source, frame_id, sum(n) AS cnt,
                 sum(s)/sum(n) AS frame_mean,
                 sqrt(greatest(0.0, sum(ss)/sum(n) - pow(sum(s)/sum(n), 2))) AS frame_std,
                 min(seg_ts) AS frame_start_ts
          FROM paa GROUP BY 1, 2
        )
        SELECT f.source, f.frame_id, f.frame_start_ts, f.frame_mean,
               f.frame_std,
               string_agg(
                 CASE WHEN f.frame_std > 0.0 THEN {sym} ELSE '{mid}' END,
                 '' ORDER BY p.seg) AS word
        FROM frames f JOIN paa p USING (source, frame_id)
        WHERE f.cnt = {frame}
        GROUP BY 1, 2, 3, 4, 5
        ORDER BY 1, 2
    """).df()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    out = df.sort_values(["source", "frame_id"]).reset_index(drop=True)
    out = out[["source", "frame_id", "frame_start_ts", "frame_mean",
               "frame_std", "word"]]
    return out.astype({"frame_id": "int64"})


def test_words_match_duckdb_oracle(words, series, duck):
    got = _norm(words.toPandas())
    want = _norm(_duck_words(duck, series.toPandas(), FRAME, WORD, ALPHA))
    assert len(got) > 10, "fixture produced too few frames to be meaningful"
    pd.testing.assert_frame_equal(
        got, want, check_exact=False, rtol=1e-12, atol=1e-12
    )


def test_sliding_words_match_duckdb_oracle(series, duck):
    stride = FRAME // 4
    got = _norm(sax_words(series, FRAME, WORD, ALPHA, stride=stride).toPandas())
    want = _norm(
        _duck_words(duck, series.toPandas(), FRAME, WORD, ALPHA, stride=stride)
    )
    assert len(got) > len(_norm(_duck_words(
        duck, series.toPandas(), FRAME, WORD, ALPHA)))  # overlap -> more frames
    pd.testing.assert_frame_equal(
        got, want, check_exact=False, rtol=1e-12, atol=1e-12
    )


def test_breakpoints_published_table():
    for a, cuts in SAX_BREAKPOINTS.items():
        assert len(cuts) == a - 1
        assert cuts == sorted(cuts)
        # symmetric about 0 within published rounding
        assert all(
            math.isclose(lo, -hi, abs_tol=1e-9)
            for lo, hi in zip(cuts, reversed(cuts))
        )
        # equal-mass within the 2-decimal published rounding: |Phi(c) - i/a|
        # small for every cut
        for i, c in enumerate(cuts, start=1):
            phi = 0.5 * (1.0 + math.erf(c / math.sqrt(2.0)))
            assert abs(phi - i / a) < 0.005, (a, c, phi)


def test_symbol_expr_edges(spark):
    df = spark.createDataFrame(
        [(-9.0,), (-0.43,), (-0.4299,), (0.0,), (0.43,), (9.0,), (None,)],
        "z double",
    )
    got = [r[0] for r in df.select(sax_symbol(F.col("z"), 3)).collect()]
    # cuts [-0.43, 0.43]: z < -0.43 -> a; -0.43 <= z < 0.43 -> b; else c
    assert got == ["a", "b", "b", "b", "c", "c", None]


def test_constant_frame_gets_middle_word(spark):
    pdf = pd.DataFrame(
        {
            "source": ["s"] * FRAME,
            "bucket_ts": pd.date_range("2024-01-01", periods=FRAME, freq="min"),
            "avg_n_tok": [7.0] * FRAME,
        }
    )
    df = spark.createDataFrame(pdf)
    out = sax_words(df, FRAME, WORD, ALPHA).collect()
    assert len(out) == 1
    mid = chr(ord("a") + (ALPHA - 1) // 2)
    assert out[0]["word"] == mid * WORD
    assert out[0]["frame_std"] == 0.0


def test_partial_tail_frame_dropped(spark):
    n = FRAME + 3  # one full frame + a partial tail
    pdf = pd.DataFrame(
        {
            "source": ["s"] * n,
            "bucket_ts": pd.date_range("2024-01-01", periods=n, freq="min"),
            "avg_n_tok": [float(i % 5) for i in range(n)],
        }
    )
    out = sax_words(spark.createDataFrame(pdf), FRAME, WORD, ALPHA).collect()
    assert [r["frame_id"] for r in out] == [0]


def test_validation():
    import pyspark.sql  # noqa: F401 - errors must raise before any plan

    with pytest.raises(ValueError):
        sax_symbol(F.lit(0.0), 2)
    for bad in ((7, 4, 4, None), (16, 5, 4, None), (16, 4, 4, 3)):
        frame, word, alpha, stride = bad
        with pytest.raises(ValueError):
            sax_words(None, frame, word, alpha, stride=stride)  # type: ignore[arg-type]


def test_motifs_rank_and_floor(words, duck):
    m = sax_motifs(words, top_k=3, min_count=2).toPandas()
    duck.register("sax_words_t", words.toPandas())
    want = duck.sql("""
        SELECT * FROM (
          SELECT source, word, count(*) AS n_frames,
                 dense_rank() OVER (PARTITION BY source ORDER BY count(*) DESC) AS rank
          FROM sax_words_t GROUP BY 1, 2
        ) WHERE rank <= 3 AND n_frames >= 2
    """).df()
    got = m[["source", "word", "n_frames", "rank"]].sort_values(
        ["source", "word"]).reset_index(drop=True)
    want = want.sort_values(["source", "word"]).reset_index(drop=True)
    for col, d in want.dtypes.items():
        got[col] = got[col].astype(d)
    pd.testing.assert_frame_equal(got, want, check_exact=True)


def test_candidate_pairs_bucket_algebra(words, duck):
    pairs = sax_candidate_pairs(words).toPandas()
    duck.register("sax_words_t", words.toPandas())
    want_n = duck.sql("""
        SELECT coalesce(sum(n * (n - 1) / 2), 0) FROM (
          SELECT source, word, count(*) AS n FROM sax_words_t GROUP BY 1, 2
        )
    """).fetchone()[0]
    assert len(pairs) == want_n
    assert (pairs["frame_a"] < pairs["frame_b"]).all()
    # every pair shares its word by construction: spot-check via join back
    w = words.toPandas()[["source", "frame_id", "word"]]
    m = pairs.merge(
        w.rename(columns={"frame_id": "frame_a", "word": "wa"}),
        on=["source", "frame_a"],
    ).merge(
        w.rename(columns={"frame_id": "frame_b", "word": "wb"}),
        on=["source", "frame_b"],
    )
    assert (m["word"] == m["wa"]).all() and (m["word"] == m["wb"]).all()


def test_candidate_pairs_max_bucket_drops_hot_words(spark):
    n = FRAME * 6
    pdf = pd.DataFrame(
        {
            "source": ["s"] * n,
            "bucket_ts": pd.date_range("2024-01-01", periods=n, freq="min"),
            "avg_n_tok": [5.0] * n,  # constant -> one degenerate hot word
        }
    )
    w = sax_words(spark.createDataFrame(pdf), FRAME, WORD, ALPHA)
    assert sax_candidate_pairs(w).count() == 6 * 5 // 2
    assert sax_candidate_pairs(w, max_bucket=5).count() == 0


def test_plan_no_join_in_words(words):
    plan = words._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
