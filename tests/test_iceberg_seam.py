"""The SnapshotTable -> Iceberg migration seam stays complete.

docs/iceberg_migration.md maps every public SnapshotTable capability (and
the retention helpers built on it) to its Iceberg DDL/procedure. This
contract test introspects the ACTUAL public surface and fails when a new
feature lands without a mapped row — so the production swap remains a
mechanical sink change, enforced by construction rather than by memory.
"""

from __future__ import annotations

import inspect
import os

DOC = os.path.join(os.path.dirname(__file__), "..", "docs", "iceberg_migration.md")


def _doc_text() -> str:
    with open(DOC) as f:
        return f.read()


def test_every_public_method_is_mapped():
    from timeseriesvectordbpattermatcher_spark.sources.snapshot_table import (
        SnapshotTable,
    )

    doc = _doc_text()
    missing = []
    for name, member in inspect.getmembers(SnapshotTable):
        if name.startswith("_") or not callable(member):
            continue
        if f"`{name}(" not in doc and f"`{name}`" not in doc and f"`{name})" not in doc:
            missing.append(name)
    assert not missing, (
        f"SnapshotTable methods without an Iceberg mapping in "
        f"docs/iceberg_migration.md: {missing} — add a row to the feature "
        "table (or an explicit 'does NOT port' entry)"
    )


def test_overwrite_kwargs_are_mapped():
    """Each overwrite_partitions keyword that changes commit semantics
    needs its own mapping row (file sizing, clustering, stats, metadata,
    drops all map to DIFFERENT Iceberg mechanisms)."""
    from timeseriesvectordbpattermatcher_spark.sources.snapshot_table import (
        SnapshotTable,
    )

    doc = _doc_text()
    sig = inspect.signature(SnapshotTable.overwrite_partitions)
    skip = {"self", "df", "partition_cols", "run_id"}  # core call shape
    missing = [
        p for p in sig.parameters
        if p not in skip and f"{p}=" not in doc and f"`{p}`" not in doc
    ]
    assert not missing, (
        f"overwrite_partitions kwargs unmapped in docs/iceberg_migration.md: "
        f"{missing}"
    )


def test_retention_helpers_are_mapped():
    import timeseriesvectordbpattermatcher_spark.operators.retention as ret

    doc = _doc_text()
    helpers = [
        n for n, m in inspect.getmembers(ret, inspect.isfunction)
        if not n.startswith("_") and m.__module__ == ret.__name__
    ]
    missing = [n for n in helpers if n not in doc]
    assert not missing, (
        f"retention helpers unmapped in docs/iceberg_migration.md: {missing}"
    )


def test_snapshot_accessors_are_mapped():
    """Snapshot dataclass read accessors that a consumer would port."""
    doc = _doc_text()
    for feature in ("changed_partitions", "VERSION AS OF", "metadata table",
                    "MERGE INTO", "rollback_to_snapshot", "expire_snapshots",
                    "rewrite_data_files", "remove_orphan_files",
                    "stream_batch_id"):
        assert feature in doc, f"seam doc lost its {feature!r} mapping"
