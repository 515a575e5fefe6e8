"""Snapshot diff: the engine emits CDC as well as consuming it.

Round-trip law: applying diff(v1 -> latest) onto a copy of the table pinned
at v1 reproduces the latest published state exactly.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from mimic_spark.lakehouse.diff import snapshot_diff
from mimic_spark.lakehouse.merge import merge_into
from mimic_spark.lakehouse.table import SnapshotTable
from mimic_spark.sources.changelog import ChangelogSpec, write_changelog_chunks
from mimic_spark.streaming.apply import TranscriptCdc, run_batched

SPEC = ChangelogSpec(n_events=3000, n_convs=60, n_chunks=4)


def _published(table: SnapshotTable, version=None):
    df = table.read(version=version).filter(
        ~F.coalesce(F.col("_deleted"), F.lit(False))
    )
    cols = [c for c in df.columns if c not in ("_lsn", "_deleted")]
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_diff_roundtrip(spark, tmp_table_dir):
    chunks = write_changelog_chunks(
        spark, SPEC, os.path.join(tmp_table_dir, "changelog")
    )
    cdc = TranscriptCdc(spark, os.path.join(tmp_table_dir, "transcripts"))
    run_batched(spark, cdc, chunks[:2])
    v_mid = cdc.table.latest_version()
    run_batched(spark, cdc, chunks)
    v_end = cdc.table.latest_version()

    changes = snapshot_diff(cdc.table, v_mid, v_end)
    ops = {r["op"] for r in changes.select("op").distinct().collect()}
    assert "insert" in ops and "update" in ops and "delete" in ops

    # materialize a copy of the table at v_mid, apply the emitted changes
    copy_path = os.path.join(tmp_table_dir, "copy")
    mid_df = cdc.table.read(version=v_mid)
    copy = SnapshotTable.create(
        spark,
        copy_path,
        mid_df.schema,
        cdc.table.key_cols,
        n_buckets=8,
    )
    copy.append(mid_df)
    merge_into(copy, changes, batch_id=0)

    assert _published(copy) == _published(cdc.table, version=v_end)


def test_diff_of_identical_versions_is_empty(spark, tmp_table_dir):
    chunks = write_changelog_chunks(
        spark, SPEC, os.path.join(tmp_table_dir, "changelog")
    )
    cdc = TranscriptCdc(spark, os.path.join(tmp_table_dir, "transcripts"))
    run_batched(spark, cdc, chunks)
    v = cdc.table.latest_version()
    assert snapshot_diff(cdc.table, v, v).count() == 0


def test_diff_and_changes_between_agree(spark, tmp_table_dir):
    """Correctness triangle: the state-diff view of change (snapshot_diff,
    full-outer key join) and the file-diff view (read_changes_between, new
    data files resolved) must describe the same transition — every key
    snapshot_diff reports changed appears in the incremental read with the
    same final payload/tombstone, and applying EITHER onto v_from yields
    v_to."""
    import os

    from mimic_spark.lakehouse.diff import snapshot_diff
    from mimic_spark.sources.changelog import ChangelogSpec, write_changelog_chunks
    from mimic_spark.streaming.apply import TranscriptCdc, run_batched
    from pyspark.sql import functions as F

    spec = ChangelogSpec(n_events=2500, n_convs=50, n_chunks=4)
    chunks = write_changelog_chunks(
        spark, spec, os.path.join(tmp_table_dir, "cl")
    )
    cdc = TranscriptCdc(
        spark, os.path.join(tmp_table_dir, "t"), n_buckets=4,
        mode="mor", compact_every=0,
    )
    run_batched(spark, cdc, chunks[:2])
    v_from = cdc.table.latest_version()
    run_batched(spark, cdc, chunks)
    v_to = cdc.table.latest_version()
    t = cdc.table

    d = snapshot_diff(t, v_from, v_to)
    diff_rows = {
        (r["conv_id"], r["turn_idx"]): (r["op"], r["text"])
        for r in d.collect()
    }
    inc = t.read_changes_between(v_from, v_to)
    inc_rows = {
        (r["conv_id"], r["turn_idx"]): (
            "delete" if r["_deleted"] else "upsert", r["text"]
        )
        for r in inc.collect()
    }
    # every state-diff change is visible in the incremental read with the
    # same final value (the incremental read may ALSO carry no-op rewrites
    # of keys whose value didn't change — e.g. same-value re-delivery — so
    # subset, not equality, is the invariant)
    assert set(diff_rows) <= set(inc_rows)
    for k, (op, text) in diff_rows.items():
        iop, itext = inc_rows[k]
        if op == "delete":
            assert iop == "delete", k
        else:
            assert iop == "upsert" and itext == text, k
    assert diff_rows  # the window actually changed something
