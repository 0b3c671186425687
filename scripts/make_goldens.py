"""Generate the committed golden fixtures backing the non-relational
contract queries (``__spark_entry__.GOLDEN_QUERIES``).

Two classes of golden (VERDICT r2 item 1):

- **Oracle-backed** (``ORACLE_GOLDENS``): regenerated from the pure-pandas
  reference-semantics oracles in ``tests/oracle/pandas_oracle.py`` — an
  implementation independent of the Spark engine. The engine must then
  hash-match these at the driver's correctness gate, so a bug in the engine
  CANNOT be frozen into the fixture. Inputs (synth fixtures / driver
  parquet) are shared; semantics are not.
- **Engine-pinned**: none left. Round 3 moved every golden into the
  oracle-backed class: tests/oracle/{xxh64_pure,dedup_oracle}.py
  re-derive the minhash/simhash hash + banding + closure semantics
  engine-free; tests/oracle/segment_oracle.py re-derives the 40-dim
  feature spec, 64/10 segmentation, the E2 matcher query path, and the
  multimodal fake-decode contract; tests/oracle/codec_oracle.py
  re-implements the Gorilla XOR/DoD layouts with an independent
  bit-packer; tests/oracle/ann_oracle.py re-derives the hyperplane LSH
  and IVF quantizer from their published definitions.

Usage:
  python scripts/make_goldens.py --force [name ...]   # regenerate
  python scripts/make_goldens.py --check              # fail if any golden
                                                      # drifts from its
                                                      # regenerated form
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
GOLDEN_DIR = os.path.join(REPO, "tests", "golden")

ORACLE_GOLDENS = {
    "multi_stop", "vcp_patterns", "trade_sim", "divergence",
    "pattern_screener", "box_detection", "trend_range",
    # dedup goldens: tests/oracle/dedup_oracle.py re-derives the full
    # minhash/simhash semantics on a standalone pure-python XXH64
    # (tests/oracle/xxh64_pure.py, parity-pinned against F.xxhash64 itself)
    "minhash_dedup", "simhash_pairs",
    # segmentation/matcher/multimodal goldens: tests/oracle/segment_oracle.py
    # re-derives the 40-dim feature spec per-row, the 64/10 segmentation
    # (incl. the reference's prefix swap + 2*bigdrop cap), the E2 matcher
    # query path, and the fake-decode contract — zero engine-operator imports
    "token_segmentation", "matcher_pipeline", "media_features",
    # codec golden: tests/oracle/codec_oracle.py re-implements the Gorilla
    # XOR + DoD layouts from the published algorithm with an independent
    # bit-packing mechanism and pins the exact compressed byte counts
    "codec_roundtrip",
    # ANN golden: tests/oracle/ann_oracle.py re-derives the hyperplane LSH
    # and IVF quantizer from their published definitions + documented seeds
    "ann_recall",
}


def _oracle_frame(name: str, spark):
    """Compute one oracle-backed golden from tests/oracle (pandas only).
    Inputs come from the same deterministic fixtures the contract query
    uses; the SEMANTICS run in the oracle, never the engine."""
    import datetime as dt

    import pandas as pd

    from tests.oracle import pandas_oracle as po
    from timeseriesvectordbpattermatcher_spark.sources.synth import synth_ohlcv

    def ohlcv_pdf(n_tickers, n_days, seed=42):
        return (
            synth_ohlcv(spark, n_tickers=n_tickers, n_days=n_days, seed=seed)
            .toPandas()
            .sort_values(["series_id", "ts"])
            .reset_index(drop=True)
        )

    if name == "multi_stop":
        return po.oracle_multi_stop(ohlcv_pdf(3, 400))
    if name == "trade_sim":
        entries = [
            ("TK00", dt.datetime(2019, 3, 4)),
            ("TK01", dt.datetime(2019, 6, 3)),
            ("TK02", dt.datetime(2019, 9, 2)),
        ]
        return po.oracle_trade_sim(ohlcv_pdf(4, 500), entries)
    if name == "divergence":
        return po.oracle_divergence(ohlcv_pdf(4, 400, seed=17))
    if name == "box_detection":
        return po.oracle_box_detection(ohlcv_pdf(4, 700))
    if name == "trend_range":
        anchors = [("TK00", dt.datetime(2019, 6, 3)), ("TK01", dt.datetime(2019, 9, 2))]
        return po.oracle_trend_range_extended(ohlcv_pdf(3, 600), anchors)
    if name == "vcp_patterns":
        import __spark_entry__ as e

        fixture = pd.DataFrame(
            e.vcp_fixture_rows(),
            columns=["series_id", "ts", "open", "high", "low", "close", "minmax_type"],
        )
        return po.oracle_vcp_patterns(fixture)
    if name == "pattern_screener":
        events = pd.read_parquet(os.path.join(SF_DIR, "events.parquet"))
        return po.oracle_pattern_screener(events)
    if name == "token_segmentation":
        from tests.oracle import segment_oracle as so
        from timeseriesvectordbpattermatcher_spark.sources.synth import synth_seqs

        seqs = synth_seqs(spark, 2000, seed=42).select(
            "doc_id", "source", "tokens"
        ).toPandas()
        return so.oracle_token_segmentation(seqs)
    if name == "matcher_pipeline":
        from tests.oracle import segment_oracle as so

        return so.oracle_matcher_pipeline(ohlcv_pdf(6, 900))
    if name == "media_features":
        from tests.oracle import segment_oracle as so
        from timeseriesvectordbpattermatcher_spark.operators.multimodal import (
            synth_media,
            synth_real_media,
        )

        # inputs shared with the query (opaque fakes + real WAV/PPM/BMP
        # payloads); DECODE semantics re-derived independently in the oracle
        media = pd.concat(
            [
                synth_media(spark, n_rows=64, seed=42).toPandas(),
                synth_real_media(spark, n_rows=24, seed=7).toPandas(),
            ],
            ignore_index=True,
        )
        return so.oracle_media_features(media)
    if name == "ann_recall":
        from tests.oracle import ann_oracle as ao
        from tests.oracle import segment_oracle as so

        emb = pd.read_parquet(os.path.join(SF_DIR, "embeddings.parquet"))
        base = ao.oracle_ann_recall(emb)
        base["query_id"] = base["query_id"].astype(str)
        # lsh_e2: the matcher-tier recall SLA — E2 segment features (pandas
        # re-derivation), the matcher's k=20 and lsh_topk defaults
        segs = so.segment_series_pandas(so.ma_normalize_pandas(ohlcv_pdf(60, 900)))
        e2 = ao.oracle_lsh_recall(
            segs[["segment_id", "features"]], "segment_id", "features"
        )
        assert len(e2) == 5 and bool(e2["recall_ok"].all()), (
            "matcher lsh-tier recall SLA (>=0.9 at k=20) failed:\n" + str(e2)
        )
        return pd.concat([base, e2], ignore_index=True)
    if name == "codec_roundtrip":
        from pyspark.sql import functions as F

        from tests.oracle import codec_oracle as co

        # shared input: the same 1m rollup rows the contract query encodes
        # (plain aggregate — the operator under test is the codec itself)
        r1m = (
            spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
            .groupBy(
                F.col("event_type").alias("source"),
                F.date_trunc("minute", "ts").alias("bucket_ts"),
            )
            .agg(F.avg("value").alias("avg_value"))
        )
        return co.oracle_codec_roundtrip(r1m.toPandas())
    if name in ("minhash_dedup", "simhash_pairs"):
        import numpy as np

        from tests.oracle import dedup_oracle as do

        dpdf = pd.read_parquet(os.path.join(SF_DIR, "documents.parquet"))
        docs = [(str(d), t) for d, t in zip(dpdf["doc_id"], dpdf["text"])]
        if name == "minhash_dedup":
            return pd.DataFrame(
                {"doc_id": do.minhash_dedup_survivors(docs, threshold=0.4)}
            )
        pairs = do.simhash_pairs(docs, max_hamming=3, bands=4)
        return pd.DataFrame(
            {
                "doc_a": [a for a, _, _ in pairs],
                "doc_b": [b for _, b, _ in pairs],
                "hamming": np.array([h for _, _, h in pairs], dtype=np.int32),
            }
        )
    raise KeyError(name)


def _frames_equal(a, b) -> bool:
    import pandas as pd

    if sorted(a.columns) != sorted(b.columns):
        return False
    cols = sorted(a.columns)
    a = a[cols].sort_values(cols).reset_index(drop=True)
    b = b[cols].sort_values(cols).reset_index(drop=True)
    try:
        pd.testing.assert_frame_equal(a, b, check_dtype=False)
        return True
    except AssertionError:
        return False


def main() -> None:
    import pandas as pd

    import __spark_entry__ as e
    from timeseriesvectordbpattermatcher_spark.session import get_spark

    force = "--force" in sys.argv
    check = "--check" in sys.argv
    only = {a for a in sys.argv[1:] if not a.startswith("--")}
    spark = get_spark(app_name="make_goldens")
    qs = e.queries()
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    drifted = []
    for name in e.GOLDEN_QUERIES:
        if only and name not in only:
            continue
        path = os.path.join(GOLDEN_DIR, f"{name}.parquet")
        if name in ORACLE_GOLDENS:
            pdf = _oracle_frame(name, spark)
            src = "oracle"
        else:
            pdf = qs[name](spark, SF_DIR).toPandas()
            src = "engine-pin"
        if check:
            # check mode NEVER writes: a missing golden is a failure (a name
            # added to GOLDEN_QUERIES without a committed fixture), not an
            # invitation to pin the current unvetted output.
            if not os.path.exists(path):
                drifted.append(name)
                print(f"MISSING {name} ({src})")
            elif not _frames_equal(pd.read_parquet(path), pdf):
                drifted.append(name)
                print(f"DRIFT {name} ({src})")
            else:
                print(f"ok    {name} ({src})")
            continue
        if os.path.exists(path) and not force:
            print(f"skip {name} (exists; --force to regenerate)")
            continue
        pdf.to_parquet(path, index=False)
        print(f"wrote {name} ({src}): {len(pdf)} rows -> {path}")
    spark.stop()
    if drifted:
        print(f"FAILED: {len(drifted)} golden(s) drifted: {drifted}")
        sys.exit(1)


if __name__ == "__main__":
    main()
