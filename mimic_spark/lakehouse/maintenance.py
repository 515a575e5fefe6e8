"""Table maintenance: snapshot expiry, small-file compaction, tombstone GC.

The reference ends its pipeline with cleanup + VACUUM
(scripts/cleanup_duckdb.py:70-94); the Iceberg-world equivalents are
expire_snapshots / rewrite_data_files / delete-orphan-files maintenance
actions, implemented here for the native snapshot format:

- expire_snapshots: drop old snapshot JSONs, delete data files no surviving
  snapshot references (time travel window shrinks; readers of kept snapshots
  unaffected — commits are immutable).
- compact: rewrite every bucket to a single file (copy-on-write merges leave
  one file per touched bucket per commit; a long stream accretes many), and
  optionally GC delete-tombstones whose LSN is at-or-below the stream's
  low-watermark (no late event can still arrive under it — the same
  reasoning as streaming state eviction by watermark).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from mimic_spark.lakehouse.table import CommitConflict, SnapshotTable


def referenced_paths(table: SnapshotTable, versions: list[int]) -> set[str]:
    out: set[str] = set()
    for v in versions:
        for fe in table.snapshot(v).files:
            out.add(fe["path"])
    return out


def _drop_empty_commit_dirs(table: SnapshotTable, older_than_s: float = 3600.0) -> None:
    """Remove commit directories holding no parquet (markers like _SUCCESS
    only).  Age-guarded: a parquet-less directory younger than the cutoff
    may be an in-flight writer still staging under _temporary/."""
    import time

    cutoff = time.time() - older_than_s
    data_dir = os.path.join(table.path, "data")
    if not os.path.isdir(data_dir):
        return
    for commit_dir in sorted(os.listdir(data_dir)):
        cpath = os.path.join(data_dir, commit_dir)
        has_parquet = any(
            fn.endswith(".parquet")
            for _r, _d, fns in os.walk(cpath)
            for fn in fns
        )
        try:
            old_enough = os.path.getmtime(cpath) <= cutoff
        except FileNotFoundError:
            continue
        if not has_parquet and old_enough:
            shutil.rmtree(cpath, ignore_errors=True)


def expire_snapshots(table: SnapshotTable, keep_last: int = 2) -> dict:
    """Delete snapshots older than the newest keep_last, plus data files only
    the expired snapshots referenced.

    Deliberately touches ONLY files referenced by some expired snapshot (the
    Iceberg expire-snapshots contract): a file on disk referenced by NO
    snapshot at all may belong to an in-flight writer that has not committed
    yet — deleting it here would corrupt that writer's commit.  Those true
    orphans (crashed writers) are remove_orphan_files' job, which carries an
    age guard for exactly that race.

    TAGGED versions (SnapshotTable.tag, the Iceberg tag role) are always
    retained, along with their data files, regardless of keep_last.

    The latest PUBLISHED snapshot (current_version: newest without the
    ``wap.staged`` marker) is likewise always retained: while a WAP batch
    is staged at the head, positional keep_last would otherwise expire the
    published snapshot underneath it — every default reader, change-feed
    poll, and wap.abort resolves current_version, and for an
    overwrite-mode stage the published data files would be deleted
    outright, making the pre-stage state unrecoverable.  Only the commit
    path guards against writing over a staged head; expiry is pure file
    ops, so the protection must live here."""
    existing = table.versions()
    tagged = set(table.tags().values())
    published: set[int] = set()
    try:
        published.add(table.current_version())
    except FileNotFoundError:
        # every retained snapshot is WAP-staged (stage-from-empty table):
        # nothing published to protect
        pass
    keep = sorted(
        set(existing[-keep_last:] if keep_last > 0 else [])
        | (tagged & set(existing))
        | published
    )
    expired = [v for v in existing if v not in keep]
    live = referenced_paths(table, keep)
    doomed = referenced_paths(table, expired) - live

    removed_files = 0
    for rel in sorted(doomed):
        full = os.path.join(table.path, rel)
        if os.path.exists(full):
            os.remove(full)
            removed_files += 1
    _drop_empty_commit_dirs(table)

    removed_snaps = 0
    for v in expired:
        p = os.path.join(table.path, "_log", f"v{v:012d}.json")
        if os.path.exists(p):
            os.remove(p)
            removed_snaps += 1
    return {
        "expired_snapshots": removed_snaps,
        "removed_data_files": removed_files,
        "kept_versions": keep,
    }


def remove_orphan_files(table: SnapshotTable, older_than_s: float = 3600.0) -> dict:
    """Delete data files referenced by NO live snapshot (Iceberg's
    remove-orphan-files action).

    Orphans come from crashed writers: write_data_files lands a uuid'd
    commit directory BEFORE the atomic snapshot commit, so a writer that
    dies in between leaks the whole directory — no snapshot ever references
    it, so expire_snapshots never touches it.  The ``older_than_s`` age
    guard (mtime) is the correctness condition: a file younger than the
    cutoff may belong to an in-flight writer whose commit is about to
    happen, so it is left alone (same contract as Iceberg's
    ``older_than`` / ``retainLast`` guard)."""
    import time

    live = referenced_paths(table, table.versions())
    cutoff = time.time() - older_than_s
    removed = 0
    data_dir = os.path.join(table.path, "data")
    if os.path.isdir(data_dir):
        for root, _dirs, files in os.walk(data_dir):
            for fn in files:
                if not fn.endswith(".parquet"):
                    continue
                full = os.path.join(root, fn)
                rel = os.path.relpath(full, table.path)
                if rel in live:
                    continue
                try:
                    if os.path.getmtime(full) <= cutoff:
                        os.remove(full)
                        removed += 1
                except FileNotFoundError:
                    pass  # racing writer finished/cleaned; nothing to do
    _drop_empty_commit_dirs(table)
    return {"removed_orphan_files": removed}


def compact(
    table: SnapshotTable,
    gc_tombstones_below: int | None = None,
    sort_within_buckets: bool = True,
    sort_cols: list[str] | None = None,
) -> dict:
    """Rewrite the table to one file per bucket; optionally drop tombstones
    whose _lsn <= gc_tombstones_below (safe once the low-watermark passed).

    sort_within_buckets: cluster rows inside each bucket file so parquet
    row-group min/max stats prune scans (the Iceberg sort-order role).
    sort_cols picks the clustering (default: the key columns, serving
    point lookups).  An event table that is mostly read by time window
    should compact with ``sort_cols=["ts"]``: after compaction each bucket
    is ONE file (file-level ts pruning can't help), but ts-clustered row
    groups let the pushed ts filter of `read_time_range` skip row groups
    inside that file — the same stats, one level down."""
    base = table.snapshot()
    df = table.read(version=base.version)
    dropped = 0
    if gc_tombstones_below is not None and "_deleted" in df.columns:
        before = df.count()
        df = df.filter(
            ~(
                F.coalesce(F.col("_deleted"), F.lit(False))
                & (F.col("_lsn") <= gc_tombstones_below)
            )
        )
        dropped = before - df.count()
    # write_data_files repartitions by bucket => exactly one task/file each
    new_files = table.write_data_files(
        df,
        base.version + 1,
        sort_cols=(
            (sort_cols or table.key_cols) if sort_within_buckets else None
        ),
    )
    for fe in new_files:
        fe["schema_id"] = base.schema_id
    snap = table.commit(
        base=base,
        op="compact",
        files=new_files,
        props_update={"compacted_at_version": base.version},
    )
    return {
        "version": snap.version,
        "files_before": len(base.files),
        "files_after": len(new_files),
        "tombstones_dropped": int(dropped),
    }


def rebucket(table: SnapshotTable, new_n_buckets: int) -> dict:
    """Grow (or shrink) the table's bucket count — the scale-up path when a
    table outlives its original layout (Iceberg partition-spec evolution).

    Rewrites all data under the new hashing; the count change rides the
    snapshot commit itself (n_buckets is a snapshot prop, resolved per
    version like schemas), so the swap is atomic: a crash or CommitConflict
    before the commit leaves only orphan data files and NO meta change
    anywhere — readers and time-travel of pre-rebucket versions keep
    hashing with each version's own count."""
    base = table.snapshot()
    df = table.read(version=base.version)
    old_n = table.n_buckets

    new_files = table.write_data_files(
        df, base.version + 1, sort_cols=table.key_cols, n_buckets=int(new_n_buckets)
    )
    for fe in new_files:
        fe["schema_id"] = base.schema_id
    snap = table.commit(
        base=base,
        op="rebucket",
        files=new_files,
        props_update={"n_buckets": int(new_n_buckets)},
    )
    return {
        "version": snap.version,
        "old_n_buckets": old_n,
        "new_n_buckets": int(new_n_buckets),
        "files": len(new_files),
    }


# hard pacing bound for one auto-grow trigger: 3 doublings = 8x in a single
# cadence is already a drastic layout change; anything asking for more in one
# step is a misconfigured threshold or delta-inflated row counts, not growth
MAX_DOUBLINGS_PER_TRIGGER = 3


def maybe_rebucket(
    table: SnapshotTable,
    max_rows_per_bucket: int | None = None,
    auto: bool | None = None,
) -> dict:
    """Growth AND shrink trigger for bucket-count evolution (r6 verdict
    Next #7; shrink branch r7 verdict Next #6): ``n_buckets`` is static per
    table while a long-lived stream grows it — or a heavy-delete table
    (GDPR purges, retention) collapses under it — so rows-per-bucket, and
    with it per-bucket rewrite cost, file sizes, and read planning
    granularity, drifts without bound in either direction.  Mirrors
    ``operators/sizing.py``'s data-driven posture for the storage layout.

    Policy rides table props (so it is versioned state, like everything):
    - ``rebucket.max_rows_per_bucket``: opt-in threshold; absent = off.
    - ``rebucket.auto``: "true" -> GROW online when the threshold is
      crossed (doubling until rows/bucket <= threshold/2, headroom so the
      trigger doesn't refire next batch); otherwise a
      ``rebucket.recommended`` prop is committed once per distinct
      recommendation and surfaced by the audit's bucket_layout check.
    - ``rebucket.max_n_buckets`` / per-call growth is ALSO hard-capped at
      ``MAX_DOUBLINGS_PER_TRIGGER`` doublings (r7 ADVICE low): a
      misconfigured threshold, or physical MoR delta rows inflating
      ``total_rows`` with obsolete versions, must not trigger a synchronous
      O(table) rewrite to a huge bucket count inside the apply cadence.
      When the cap clips the target, the result carries ``capped`` and the
      uncapped ``target_n`` so the clip is observable; the next cadence
      resumes from the new count (growth stays monotone, just paced).
    - SHRINK fires when rows/bucket falls below threshold/8 and is
      recommend-ONLY unless ``rebucket.auto_shrink`` is "true" (never auto
      by default — a shrink is a full O(table) rewrite purely for layout
      hygiene, and footer row counts over-count live rows under MoR, so
      the operator should GC/compact first and opt in).  The recommended
      count halves until rows/bucket clears threshold/2, floored at
      ``rebucket.min_n_buckets`` (default 16).

    Cost when idle: one snapshot read, pure driver-side arithmetic over
    footer row counts (no Spark job).  Row counts include still-live MoR
    delta rows — intentionally: physical rows are what reads and rewrites
    pay for, and the apply cadence runs this right after incremental
    compaction anyway.  Args override the props for direct invocation.
    Recommend-only commits are advisory: on a ``CommitConflict`` with a
    concurrent writer they are dropped, not retried — the recommendation
    re-derives on the next cadence (r7 ADVICE low)."""
    snap = table.snapshot()
    props = snap.props
    if max_rows_per_bucket is None:
        v = props.get("rebucket.max_rows_per_bucket")
        if v is None:
            return {"checked": False}
        max_rows_per_bucket = int(v)
    if auto is None:
        auto = str(props.get("rebucket.auto", "")).lower() in ("true", "1")
    rows = [f.get("rows") for f in snap.files]
    if any(r is None for r in rows):
        # legacy entries without footer stats: can't size safely
        return {"checked": False, "reason": "missing file row stats"}
    total = sum(int(r) for r in rows)
    n = table._n_buckets_from(props)
    out = {
        "checked": True,
        "total_rows": total,
        "n_buckets": n,
        "max_rows_per_bucket": max_rows_per_bucket,
        "triggered": total > max_rows_per_bucket * n,
    }
    headroom = max(max_rows_per_bucket // 2, 1)

    def _recommend(new_n: int) -> None:
        if int(props.get("rebucket.recommended") or 0) == new_n:
            return
        try:
            table.commit(
                base=snap,
                op="rebucket-recommend",
                files=snap.files,
                props_update={"rebucket.recommended": new_n},
            )
        except CommitConflict:
            # advisory only: a concurrent writer (or WAP-staged head) won —
            # don't fail their stream batch over a recommendation that the
            # next cadence re-derives from fresh footer stats anyway
            pass

    if out["triggered"]:
        target_n = n
        while total > headroom * target_n:
            target_n *= 2
        new_n = min(target_n, n << MAX_DOUBLINGS_PER_TRIGGER)
        cap_prop = props.get("rebucket.max_n_buckets")
        if cap_prop is not None:
            new_n = min(new_n, max(int(cap_prop), n))
        out["target_n"] = target_n
        out["capped"] = new_n < target_n
        if new_n <= n:
            # max_n_buckets already reached: nothing to grow, stay put
            return {**out, "applied": False, "recommended": None}
        if auto:
            info = rebucket(table, new_n)
            return {**out, "applied": True, **info}
        _recommend(new_n)
        return {**out, "applied": False, "recommended": new_n}

    # shrink branch: live rows collapsed well under the layout's sizing
    min_n = int(props.get("rebucket.min_n_buckets") or 16)
    if n > min_n and total * 8 < max_rows_per_bucket * n:
        new_n = n
        # halve while even the halved layout stays under the grow headroom
        # (so a shrink never immediately re-triggers growth)
        while new_n > min_n and total <= headroom * (new_n // 2):
            new_n //= 2
        new_n = max(new_n, min_n)
        if new_n < n:
            out["shrink"] = True
            auto_shrink = str(props.get("rebucket.auto_shrink", "")).lower() in (
                "true",
                "1",
            )
            if auto_shrink:
                info = rebucket(table, new_n)
                return {**out, "applied": True, **info}
            _recommend(new_n)
            return {**out, "applied": False, "recommended": new_n}
    return out


def compact_incremental(
    table: SnapshotTable,
    min_files: int = 4,
    min_delta_ratio: float = 0.25,
    gc_tombstones_below: int | None = None,
    sort_cols: list[str] | None = None,
) -> dict:
    """Bucket-level incremental compaction (the Hudi compaction-strategy /
    Iceberg binpack rewrite role): rewrite ONLY buckets whose delta backlog
    justifies it, leaving clean buckets' files untouched in the new
    snapshot.

    Why not `compact` on a cadence: a full rewrite is O(table) every time,
    so a 10^10-event stream compacting every k batches does
    O(batches/k * table) total churn.  Under hot-key skew (the salted
    conv_id distribution) most delta rows land in few buckets: rewriting
    just those makes the amortized compaction cost O(delta / min_delta_ratio)
    — proportional to what the stream actually wrote, not to table size.

    Selection is COMPONENT-aligned: grouped delta files (bucket_grp/n_grps
    entries, see ``SnapshotTable.write_data_files(group_files=)``) span many
    buckets, so buckets are first merged into disjoint components (union-
    find over each file's covered bucket set) — every file then falls fully
    inside or fully outside a rewrite, which is what keeps the kept-files
    computation exact.  With a uniform group layout the components are just
    the G groups; with per-bucket files they are single buckets (the
    original behavior).

    A component qualifies when it has >1 file AND (its per-bucket read
    amplification — the max number of files covering any ONE bucket in the
    component — >= ``min_files``, OR its delta rows >= ``min_delta_ratio``
    x its base rows, all from footer stats — no scan).  Read amplification
    is the quantity min_files always bounded: for per-bucket files it
    equals the bucket's file count (the original semantics), while a
    grouped delta file adds 1 to every bucket it covers.  Cost: one
    bucket-pruned read + one write over the selected buckets; commit is
    atomic as always.  Tombstones at-or-below ``gc_tombstones_below`` are
    dropped in the rewritten buckets only (the rest keep theirs until
    selected later — GC is monotone, never missed, because a bucket holding
    a tombstone has >1 file until some compaction takes it)."""
    from mimic_spark.lakehouse.table import file_is_grouped

    base = table.snapshot()
    nb = table._n_buckets_from(base.props)

    def covered(fe: dict) -> list[int]:
        if not file_is_grouped(fe):
            return [int(fe["bucket"])]
        g, G = int(fe["bucket_grp"]), int(fe["n_grps"])
        return [b for b in range(nb) if b % G == g]

    # union-find over buckets: one component per set of buckets whose files
    # overlap transitively
    parent = list(range(nb))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    file_cover = [covered(fe) for fe in base.files]
    for cov in file_cover:
        for b in cov[1:]:
            parent[find(b)] = find(cov[0])
    comp_files: dict[int, list[dict]] = {}
    for fe, cov in zip(base.files, file_cover):
        comp_files.setdefault(find(cov[0]), []).append(fe)
    comp_buckets: dict[int, list[int]] = {}
    for b in range(nb):
        comp_buckets.setdefault(find(b), []).append(b)

    selected: list[int] = []
    for root, fes in sorted(comp_files.items()):
        if len(fes) <= 1:
            continue
        delta_rows = sum(
            int(f.get("rows") or 0) for f in fes if f.get("delta")
        )
        base_rows = sum(
            int(f.get("rows") or 0) for f in fes if not f.get("delta")
        )
        # per-bucket read amplification: files covering each bucket
        bucketed_at: dict[int, int] = {}
        grp_counts: dict[tuple[int, int], int] = {}
        for f in fes:
            if file_is_grouped(f):
                key = (int(f["bucket_grp"]), int(f["n_grps"]))
                grp_counts[key] = grp_counts.get(key, 0) + 1
            else:
                b = int(f["bucket"])
                bucketed_at[b] = bucketed_at.get(b, 0) + 1
        amp = max(
            bucketed_at.get(b, 0)
            + sum(c for (g, G), c in grp_counts.items() if b % G == g)
            for b in comp_buckets[root]
        )
        if amp >= min_files or delta_rows >= min_delta_ratio * max(
            base_rows, 1
        ):
            selected.extend(comp_buckets[root])
    selected.sort()
    if not selected:
        return {
            "version": base.version,
            "buckets_rewritten": 0,
            "files_before": len(base.files),
            "files_after": len(base.files),
            "tombstones_dropped": 0,
            "rows_rewritten": 0,
        }
    df = table.read(version=base.version, buckets=selected)
    dropped = 0
    if gc_tombstones_below is not None and "_deleted" in df.columns:
        before = df.count()
        df = df.filter(
            ~(
                F.coalesce(F.col("_deleted"), F.lit(False))
                & (F.col("_lsn") <= gc_tombstones_below)
            )
        )
        dropped = before - df.count()
    new_files = table.write_data_files(
        df, base.version + 1, sort_cols=sort_cols or table.key_cols
    )
    for fe in new_files:
        fe["schema_id"] = base.schema_id
    from mimic_spark.lakehouse.table import file_matches_buckets

    sel = set(selected)
    # component-aligned selection => every file is fully in or fully out
    kept = [f for f in base.files if not file_matches_buckets(f, sel)]
    snap = table.commit(
        base=base,
        op="compact-incremental",
        files=kept + new_files,
        props_update={"compacted_at_version": base.version},
    )
    return {
        "version": snap.version,
        "buckets_rewritten": len(selected),
        "files_before": len(base.files),
        "files_after": len(kept) + len(new_files),
        "tombstones_dropped": int(dropped),
        "rows_rewritten": sum(int(f.get("rows") or 0) for f in new_files),
    }
