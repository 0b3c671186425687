"""SparkSession factory tuned for this engine.

Local-mode defaults mirror what we'd set on a real cluster: AQE on (runtime
coalesce + skew-join splitting), Arrow transport for every pandas-batch UDF,
shuffle partitions sized to cores (not the 200 default), UTC session time.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "tsvdbpm_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` (driver contract) or all cores.
    On a real cluster the same confs apply; only ``master`` changes —
    submission is ``spark-submit --py-files engine.zip job.py``.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    if shuffle_partitions is None:
        shuffle_partitions = max(int(cpus), 4)

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # INT96 (the legacy default) carries no parquet footer min/max, which
        # blinds SnapshotTable's manifest-stats file skipping on timestamp
        # columns; TIMESTAMP_MICROS is also what Arrow/DuckDB read natively
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 100k rows/batch: the Arrow-bound paths (token-stat mapInArrow,
        # minhash signature kernel, segmentation mapInPandas) pay a fixed
        # per-batch Python/IPC cost, so 10k-row batches left ~1.5x on the
        # table (A/B at sf0.1: cascade 4.55s@10k -> 2.97s@100k, minhash
        # 2.60 -> 2.04, token_segmentation 0.71 -> 0.55; codec/matcher
        # flat). Memory: a seqs batch is ~1.1 KB/row -> ~110 MB in flight
        # per worker — fine for multi-GB executors; jobs over wide binary
        # payloads (multimodal) should lower this per session
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "100000")
        # keep the local heap MODEST: measured on the sandbox VM, a 48g
        # heap made the token-decode cascade 25x slower than a 12g one
        # (235s vs ~9s pinned to 8 cores — huge G1 heaps on this host
        # page-fault/collect pathologically). On a real cluster executor
        # memory is set at submit time; SPARK_DRIVER_MEM still overrides.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "12g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
