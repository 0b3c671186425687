"""Retention policy: expire fine-grained partitions past their tier horizon.

North-star "retention engine" piece. Semantics: once a (source, day)
partition at a finer tier is older than that tier's horizon *and* its
coarser tier has already absorbed it (``absorbed_through``), the fine
partition is dropped from the snapshot — queries fall back to the coarser
tier. Data files become unreferenced (snapshot GC cleans them); the drop
itself is one atomic commit, never a file mutation.

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
    absorbed_through: dt.date | None = None,
) -> list[str]:
    """Drop partitions whose day component is older than ``as_of - horizon``
    AND at or before ``absorbed_through`` (the coarser tier's committed
    watermark day).

    Age alone is NOT a safe drop condition: a run that commits fine-tier
    partitions and crashes before the coarser cascade would otherwise lose
    that data permanently — dropped keys leave no tombstone, so the rerun's
    changed-partition diff never re-aggregates them. Callers that truly
    have no coarser tier (or accept the loss) pass
    ``absorbed_through=None`` explicitly; RollupJob passes each tier's
    upstream committed watermark.

    Partition keys are '{source}/{YYYY-MM-DD}' (RollupJob layout). Returns
    the dropped keys. No-op when horizon is None.
    """
    if horizon_days is None:
        return []
    cutoff = (as_of - dt.timedelta(days=horizon_days)).isoformat()
    if absorbed_through is not None:
        cutoff = min(cutoff, (absorbed_through + dt.timedelta(days=1)).isoformat())
    snap = table.current_snapshot()
    if snap is None:
        return []
    doomed = sorted(pk for pk in snap.partitions if pk.rsplit("/", 1)[1] < cutoff)
    if doomed:
        table.drop_partitions(doomed, run_id=run_id)
    return doomed


def vacuum(table: SnapshotTable, min_age_secs: float = 24 * 3600) -> int:
    """GC: physically delete data files no snapshot's current version
    references AND older than ``min_age_secs``. Returns the number of files
    removed.

    The age guard makes concurrent runs safe: an in-flight
    ``overwrite_partitions`` writes its data files BEFORE publishing the
    manifest, so a zero-age vacuum racing it would delete the files a
    just-published snapshot references. Files younger than the guard are
    left for the next cycle; pass ``min_age_secs=0`` only when no writer
    can be live.
    """
    import os
    import time

    snap = table.current_snapshot()
    live: set[str] = set()
    if snap:
        for p in snap.partitions.values():
            live.update(p["files"])
    removed = 0
    now = time.time()
    data_root = os.path.join(table.root, "data")
    if not os.path.isdir(data_root):
        return 0
    for dirpath, _dirnames, filenames in os.walk(data_root):
        for f in filenames:
            full = os.path.join(dirpath, f)
            rel = os.path.relpath(full, table.root)
            if (
                f.endswith(".parquet")
                and rel not in live
                and now - os.path.getmtime(full) >= min_age_secs
            ):
                os.remove(full)
                removed += 1
    return removed
