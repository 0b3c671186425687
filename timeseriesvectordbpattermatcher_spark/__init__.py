"""PySpark-native time-series rollup + downsample + retention engine.

From-scratch re-expression of the capabilities of
``jacky892/timeseriesVectorDBPatterMatcher`` (studied read-only at
``/root/reference/``) on idiomatic Spark: DataFrame/SQL plans optimized by
Catalyst, Arrow-vectorized pandas UDFs for the kernels Spark lacks, and an
Iceberg-style snapshot/commit-log table layer for resumable, audited writes.

Layout
------
``sources``    synthetic ``seqs`` generator, testdata loaders, commit-log tables
``operators``  rollups, gap-fill, segmentation, matcher, dedup, text stats,
               similarity search, pattern/window ops, retention
``functions``  scalar/array kernels: 40-dim feature spec, Gorilla/delta-delta codecs
``plans``      audit (lineage + metrics) and checkpoint/resume
``streaming``  Structured Streaming variants of the rollup
"""

__version__ = "0.1.0"
