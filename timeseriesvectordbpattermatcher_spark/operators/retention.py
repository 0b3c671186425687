"""Retention policy: expire fine-grained partitions past their tier horizon.

North-star "retention engine" piece. Semantics: once a (source, day)
partition at a finer tier is older than that tier's horizon *and* its
coarser tier has already absorbed it (upstream_version checkpoint), the
fine partition is dropped from the snapshot — queries fall back to the
coarser tier. Data files become unreferenced (snapshot GC cleans them);
the drop itself is one atomic commit, never a file mutation.

The reference has no retention concept (it memoizes files forever,
/root/reference/commonUtil.py:166-170); this is the piece that makes a
10^12-row corpus storable: raw is transient, 1m lives days, 1h lives
months, 1d lives forever (defaults below are policy, not mechanism).
"""

from __future__ import annotations

import datetime as dt

from ..sources.snapshot_table import SnapshotTable

DEFAULT_HORIZON_DAYS = {"1m": 7, "1h": 90, "1d": None}  # None = keep forever


def expire_partitions(
    table: SnapshotTable,
    horizon_days: int | None,
    as_of: dt.date,
    run_id: str | None = None,
) -> list[str]:
    """Drop partitions whose day component is older than ``as_of - horizon``.

    Partition keys are '{source}/{YYYY-MM-DD}' (RollupJob layout). Returns
    the dropped keys. No-op when horizon is None.
    """
    if horizon_days is None:
        return []
    cutoff = (as_of - dt.timedelta(days=horizon_days)).isoformat()
    snap = table.current_snapshot()
    if snap is None:
        return []
    doomed = sorted(pk for pk in snap.partitions if pk.split("/")[1] < cutoff)
    if doomed:
        table.drop_partitions(doomed, run_id=run_id)
    return doomed


def vacuum(table: SnapshotTable) -> int:
    """GC: physically delete data files no snapshot's current version
    references. Returns the number of files removed. Safe to run any time —
    the live snapshot's files are never touched."""
    import os

    snap = table.current_snapshot()
    live: set[str] = set()
    if snap:
        for p in snap.partitions.values():
            live.update(p["files"])
    removed = 0
    data_root = os.path.join(table.root, "data")
    if not os.path.isdir(data_root):
        return 0
    for dirpath, _dirnames, filenames in os.walk(data_root):
        for f in filenames:
            full = os.path.join(dirpath, f)
            rel = os.path.relpath(full, table.root)
            if f.endswith(".parquet") and rel not in live:
                os.remove(full)
                removed += 1
    return removed
