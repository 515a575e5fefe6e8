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
