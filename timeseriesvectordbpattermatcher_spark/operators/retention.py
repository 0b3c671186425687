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


class _Unguarded:
    """Explicit opt-out sentinel for ``absorbed_through`` — see
    :func:`expire_partitions`. Singleton; truthy identity only."""

    def __repr__(self) -> str:  # pragma: no cover - repr cosmetics
        return "UNGUARDED"


#: Pass as ``absorbed_through`` to expire on age alone (no coarser-tier
#: absorption guard). Deliberately loud: age-only expiry permanently loses
#: any fine partition the coarser cascade hasn't committed yet.
UNGUARDED = _Unguarded()


def expire_partitions(
    table: SnapshotTable,
    horizon_days: int | None,
    as_of: dt.date,
    run_id: str | None = None,
    *,
    absorbed_through: dt.date | _Unguarded,
) -> list[str]:
    """Drop partitions whose day component is older than ``as_of - horizon``
    AND at or before ``absorbed_through`` (the coarser tier's committed
    watermark day).

    Age alone is NOT a safe drop condition: a run that commits fine-tier
    partitions and crashes before the coarser cascade would otherwise lose
    that data permanently — dropped keys leave no tombstone, so the rerun's
    changed-partition diff never re-aggregates them. ``absorbed_through``
    is therefore keyword-REQUIRED with no default: callers that truly have
    no coarser tier (or accept the loss) must opt out deliberately by
    passing the module-level :data:`UNGUARDED` sentinel; RollupJob passes
    each tier's upstream committed watermark.

    Partition keys are '{source}/{YYYY-MM-DD}' (RollupJob layout). Returns
    the dropped keys. No-op when horizon is None.
    """
    if horizon_days is None:
        return []
    cutoff = (as_of - dt.timedelta(days=horizon_days)).isoformat()
    if absorbed_through is not UNGUARDED:
        if not isinstance(absorbed_through, dt.date):
            raise TypeError(
                "absorbed_through must be a date (the coarser tier's committed "
                "watermark day) or the explicit retention.UNGUARDED sentinel"
            )
        cutoff = min(cutoff, (absorbed_through + dt.timedelta(days=1)).isoformat())
    snap = table.current_snapshot()
    if snap is None:
        return []
    doomed = sorted(pk for pk in snap.partitions if pk.rsplit("/", 1)[1] < cutoff)
    if doomed:
        table.drop_partitions(doomed, run_id=run_id)
    return doomed


def compact_partitions(
    table: SnapshotTable,
    spark,
    partition_cols: list[str],
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files: int = 2,
    run_id: str | None = None,
) -> dict:
    """Bin-pack partitions fragmented into more files than their size needs
    (Iceberg ``rewrite_data_files`` analogue).

    Fragmentation sources: salted fat-partition writes
    (``overwrite_partitions(target_file_rows=...)``) leave their fanout
    behind after the partition stops being hot, and (pk, salt) shuffle
    collisions can land a key's rows in more tasks than bin-packing wants.
    A partition is rewritten when it has ``>= min_files`` files AND more
    files than ``ceil(bytes / target_file_bytes)``. The rewrite reads ONLY
    the doomed partitions (manifest-pruned scan), re-derives the key from
    ``partition_cols``, and commits through the normal atomic snapshot path
    with a per-call row budget derived from the doomed set's own observed
    rows/byte ratio — so compacted files land near ``target_file_bytes``
    without a second sizing pass. Replaced files become unreferenced;
    :func:`vacuum` reclaims them. Untouched partitions keep their files and
    version, so downstream snapshot-incremental consumers
    (``changed_partitions``) only see the rewritten keys.

    Returns ``{"compacted": [keys], "files_before": n, "files_after": m,
    "rows": r}`` (zeros/empty when nothing qualifies).
    """
    snap = table.current_snapshot()
    if snap is None:
        return {"compacted": [], "files_before": 0, "files_after": 0, "rows": 0}
    doomed: list[str] = []
    files_before = 0
    tot_rows = 0
    tot_bytes = 0
    for pk, p in snap.partitions.items():
        nfiles = len(p["files"])
        needed = max(1, -(-p.get("bytes", 0) // target_file_bytes))
        if nfiles >= min_files and nfiles > needed:
            doomed.append(pk)
            files_before += nfiles
            tot_rows += p.get("rows", 0)
            tot_bytes += max(p.get("bytes", 0), 1)
    if not doomed:
        return {"compacted": [], "files_before": 0, "files_after": 0, "rows": 0}
    doomed.sort()
    df = table.read_partitions(spark, doomed)
    # rows-per-target-file from the doomed set's own ratio; parquet encodes
    # denser than the in-flight rows, so this only errs toward fewer files
    target_rows = max(1, int(target_file_bytes * tot_rows / tot_bytes))
    new_snap = table.overwrite_partitions(
        df,
        partition_cols,
        run_id=run_id,
        target_file_rows=target_rows,
        meta=dict(snap.meta or {}, last_compaction=sorted(doomed)),
    )
    files_after = sum(
        len(new_snap.partitions[pk]["files"]) for pk in doomed if pk in new_snap.partitions
    )
    return {
        "compacted": doomed,
        "files_before": files_before,
        "files_after": files_after,
        "rows": tot_rows,
    }


def vacuum(
    table: SnapshotTable, min_age_secs: float = 24 * 3600, keep_versions: int = 1
) -> int:
    """GC: physically delete data files referenced by none of the newest
    ``keep_versions`` snapshots AND older than ``min_age_secs``. Returns the
    number of files removed.

    ``keep_versions`` is the time-travel retention contract: a pinned
    ``table.read(spark, version=v)`` stays reproducible as long as ``v`` is
    within the newest ``keep_versions`` manifests at every vacuum since.
    The default (1) preserves only the current snapshot — the pre-time-travel
    behavior.

    The age guard makes concurrent runs safe: an in-flight
    ``overwrite_partitions`` writes its data files BEFORE publishing the
    manifest, so a zero-age vacuum racing it would delete the files a
    just-published snapshot references. Files younger than the guard are
    left for the next cycle; pass ``min_age_secs=0`` only when no writer
    can be live.

    Concurrency note: a file can vanish between ``os.walk`` listing it and
    the ``getmtime``/``remove`` pair (a concurrent vacuum, or a writer
    cleaning its own temp files) — those raise ``OSError`` and are simply
    skipped; the next cycle reconciles. The mtime guard assumes files are
    CREATED by the table's own writers; files restored/copied in with
    preserved old mtimes defeat it — don't hand-copy data files into a live
    table's ``data/`` directory.
    """
    import os
    import time

    if keep_versions < 1:
        raise ValueError(f"keep_versions must be >= 1, got {keep_versions}")
    live: set[str] = set()
    for v in table._versions()[-keep_versions:]:
        snap = table.snapshot(v)
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
            if f.endswith(".parquet") and rel not in live:
                try:
                    if now - os.path.getmtime(full) >= min_age_secs:
                        os.remove(full)
                        removed += 1
                except OSError:
                    # raced by a concurrent vacuum/writer: file already gone
                    # (or transiently unreadable) — skip, next cycle retries
                    continue
    return removed


def fold_stream_batches(
    table: SnapshotTable,
    spark,
    every: int = 100,
    keep_last: int = 1,
    batch_col: str = "_batch",
    run_id: str | None = None,
) -> dict:
    """Fold the per-micro-batch partitions a streaming sink accumulates
    (``curation_stream.curation_sink`` writes one ``_batch=<id>`` partition
    per commit) into coarse ``every``-sized buckets — the cross-partition
    companion to :func:`compact_partitions`, which bin-packs files WITHIN a
    partition and so cannot help when the fragmentation is thousands of
    one-file partitions.

    Batches are rebucketed to ``(id // every) * every``; the newest
    ``keep_last`` batch partitions are left alone (the stream's replay
    guard makes re-commits of finished batches no-ops, so folding even hot
    batches is safe — keeping the tail is just cheaper than rewriting it
    every maintenance run). The rewrite reads only the doomed partitions
    (manifest-pruned) and publishes adds + drops in ONE snapshot via
    ``overwrite_partitions(drop_keys=...)`` — no version ever shows a row
    twice. Replaced files become unreferenced; :func:`vacuum` reclaims
    them. Meta (incl. the stream's ``stream_batch_id`` guard) and
    watermark carry over untouched. Snapshot-incremental consumers
    (``changed_partitions``) observe the fold as the doomed keys vanishing
    and a fold-bucket key (re)appearing at the new version — a consumer
    tracking per-key state should treat a disappeared key as merged, not
    deleted (row content is unchanged, pinned in the tests).

    Returns ``{"folded": [keys], "partitions_before": n,
    "partitions_after": m, "rows": r}``.
    """
    from pyspark.sql import functions as F

    snap = table.current_snapshot()
    if snap is None:
        return {"folded": [], "partitions_before": 0, "partitions_after": 0, "rows": 0}
    batch_keys = sorted(
        (k for k in snap.partitions if k.isdigit()), key=int
    )
    doomed = batch_keys[: max(0, len(batch_keys) - keep_last)]
    # a fold bucket containing exactly one already-folded partition is a
    # no-op rewrite — skip buckets that are already a single partition at
    # their fold representative
    doomed = [
        k for k in doomed
        if not (int(k) % every == 0 and sum(
            1 for j in batch_keys if int(j) // every == int(k) // every
        ) == 1)
    ]
    if len(doomed) < 2:
        return {
            "folded": [],
            "partitions_before": len(snap.partitions),
            "partitions_after": len(snap.partitions),
            "rows": 0,
        }
    src = table.read_partitions(spark, doomed)
    folded = src.withColumn(
        batch_col,
        (F.col(batch_col) / F.lit(every)).cast("long") * F.lit(every),
    )
    new_snap = table.overwrite_partitions(
        folded,
        [batch_col],
        run_id=run_id or f"fold_{doomed[0]}_{doomed[-1]}",
        drop_keys=doomed,
    )
    return {
        "folded": doomed,
        "partitions_before": len(snap.partitions),
        "partitions_after": len(new_snap.partitions),
        "rows": src.count(),
    }
