"""Write-audit-publish: stage commits invisibly, audit, then publish.

The Iceberg WAP workflow (``spark.wap.id`` stage-commit -> audit ->
cherry-pick publish; reference role: MIMIC's staged->QA->CDM promotion,
e.g. etl checks run between staging loads and the published CDM tables).
A batch writer stages data files under a normal snapshot commit that
carries a ``wap.staged`` marker; default readers (``SnapshotTable.read``)
and change-feed consumers resolve to the latest UNMARKED snapshot, so
unaudited data is invisible everywhere downstream.  An audit reads the
staged snapshot by explicit version; ``publish`` is then a METADATA-ONLY
commit (no data rewritten — the staged files are simply re-referenced
without the marker), and ``abort`` is a metadata-only restore of the
published state (the staged files become unreferenced orphans for
``maintenance.remove_orphan_files``).

Scale posture: stage/publish/abort cost one manifest commit each; the
audit is the only scan and it reads exactly the staged snapshot.  The
linear optimistic-commit log gives single-table WAP for free: the staged
snapshot IS the next version, and the commit() guard refuses non-WAP
commits on top of it, so a staged batch can never be buried or silently
inherited.  One staged batch (of any number of stacked stage commits
under the SAME wap_id) is in flight at a time — the Iceberg cherry-pick
restriction, enforced here at stage time.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import DataFrame

from mimic_spark.lakehouse.table import WAP_STAGED_PROP, Snapshot, SnapshotTable


class StagedAuditError(Exception):
    """The audit rejected a staged batch; it remains staged (abort or fix)."""


def stage(
    table: SnapshotTable,
    df: DataFrame,
    wap_id: str,
    mode: str = "append",
) -> Snapshot:
    """Stage ``df`` under ``wap_id`` — written and committed, but invisible
    to default readers until :func:`publish`.

    mode 'append' adds to the (to-be-published) table state; 'overwrite'
    stages a full replacement.  Multiple stage calls with the SAME wap_id
    stack into one logical batch (multi-chunk loads audit and publish as a
    unit); a different wap_id while one is staged raises."""
    if not wap_id:
        raise ValueError("wap_id must be a non-empty string")
    base = table.snapshot()
    in_flight = base.props.get(WAP_STAGED_PROP)
    if in_flight is not None and in_flight != wap_id:
        raise RuntimeError(
            f"{table.path}: wap batch {in_flight!r} is already staged; "
            f"publish or abort it before staging {wap_id!r}"
        )
    if mode == "append":
        return table.append(
            df, op="wap-stage-append", props_update={WAP_STAGED_PROP: wap_id}
        )
    if mode == "overwrite":
        return table.overwrite(
            df, op="wap-stage-overwrite", props_update={WAP_STAGED_PROP: wap_id}
        )
    raise ValueError(f"mode must be 'append' or 'overwrite', got {mode!r}")


def staged_version(table: SnapshotTable, wap_id: str) -> int | None:
    """Latest version staged under ``wap_id``, or None if nothing staged.
    This is the version an audit reads (``table.read(version=...)``)."""
    snap = table.snapshot()
    if snap.props.get(WAP_STAGED_PROP) == wap_id:
        return snap.version
    return None


def publish(
    table: SnapshotTable,
    wap_id: str,
    audit: Callable[[DataFrame], Any] | None = None,
    op: str = "wap-publish",
) -> Snapshot:
    """Audit (optionally) and publish the staged batch ``wap_id``.

    ``audit`` receives the staged snapshot's DataFrame; a raise (e.g. the
    streaming audit's AuditError) leaves the batch STAGED — fix and retry,
    or :func:`abort`.  On success the publish commit re-references the
    staged files without the marker: metadata-only, atomic, and the
    change-feed sees the staged files as new exactly once, at publish
    version — never before."""
    v = staged_version(table, wap_id)
    if v is None:
        raise RuntimeError(
            f"{table.path}: no staged wap batch {wap_id!r} at the head "
            f"(already published/aborted, or never staged)"
        )
    staged = table.snapshot(v)
    if audit is not None:
        try:
            audit(table.read(version=v))
        except Exception as e:
            raise StagedAuditError(
                f"audit rejected staged wap batch {wap_id!r} "
                f"(v{v} of {table.path}): {e}"
            ) from e
    return table.commit(
        base=staged,
        op=op,
        files=staged.files,
        props_update={WAP_STAGED_PROP: None, "wap.published": wap_id},
    )


def abort(table: SnapshotTable, wap_id: str) -> Snapshot:
    """Discard the staged batch ``wap_id``: metadata-only restore of the
    latest published snapshot (files AND schema — a staged schema evolution
    rolls back too).  The staged data files become orphans; reclaim with
    ``maintenance.remove_orphan_files``."""
    v = staged_version(table, wap_id)
    if v is None:
        raise RuntimeError(
            f"{table.path}: no staged wap batch {wap_id!r} to abort"
        )
    published = table.snapshot(table.current_version())
    return table.commit(
        base=table.snapshot(v),
        op="wap-abort",
        files=published.files,
        schema=published.schema,
        props_update={WAP_STAGED_PROP: None, "wap.aborted": wap_id},
    )
