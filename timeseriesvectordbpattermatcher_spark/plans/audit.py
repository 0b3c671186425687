"""Per-partition lineage + metrics audit table.

North-star requirement ("writes per-partition lineage + metrics to an
Iceberg audit table"); the reference's analog is its SQLite JSON doc store
(/root/reference/datalib/sqliteDocStoreUtil.py:5-50 — rows of JSON with
generated columns). Here each engine run appends one row per written
partition: run id, stage, partition key, rows/bytes, wall-clock, snapshot
version — an append-only parquet table queryable with plain SQL
(``get_json_object`` on ``extra`` covers the dynamic fields, mirroring the
reference's ``json_extract`` generated columns).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

AUDIT_SCHEMA = (
    "run_id string, stage string, partition_key string, rows bigint, "
    "bytes bigint, wall_ms double, snapshot_version int, committed_at double, "
    "extra string"
)


class AuditLog:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def append(
        self,
        spark: SparkSession,
        run_id: str,
        stage: str,
        partition_rows: dict[str, int],
        partition_bytes: dict[str, int] | None = None,
        wall_ms: float = 0.0,
        snapshot_version: int = 0,
        extra: dict | None = None,
    ) -> None:
        now = time.time()
        rows = [
            (
                run_id,
                stage,
                pk,
                int(n),
                int((partition_bytes or {}).get(pk, 0)),
                float(wall_ms),
                int(snapshot_version),
                now,
                json.dumps(extra or {}),
            )
            for pk, n in partition_rows.items()
        ]
        if not rows:
            return
        df = spark.createDataFrame(rows, AUDIT_SCHEMA)
        df.coalesce(1).write.mode("append").parquet(
            os.path.join(self.root, f"batch={uuid.uuid4().hex[:12]}")
        )

    def read(self, spark: SparkSession) -> DataFrame | None:
        batches = [
            os.path.join(self.root, d) for d in os.listdir(self.root) if d.startswith("batch=")
        ]
        if not batches:
            return None
        return spark.read.parquet(*batches)
