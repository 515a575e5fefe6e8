"""Failure-injection recovery: lost ledger writes, racing committers."""

from __future__ import annotations

import os

from mimic_spark.lakehouse.table import SnapshotTable
from mimic_spark.sources.changelog import ChangelogSpec, write_changelog_chunks
from mimic_spark.streaming.apply import TranscriptCdc, run_batched

SPEC = ChangelogSpec(n_events=2000, n_convs=50, n_chunks=3)


def test_ledger_backfill_after_lost_append(spark, tmp_table_dir):
    """Crash between the data commit and the ledger append: on replay the
    merge skips (marker is atomic with data) and the ledger row is backfilled
    with recovered=True — the documented healing path."""
    chunks = write_changelog_chunks(
        spark, SPEC, os.path.join(tmp_table_dir, "changelog")
    )
    table = os.path.join(tmp_table_dir, "transcripts")
    cdc = TranscriptCdc(spark, table)
    run_batched(spark, cdc, chunks)
    rows_before = cdc.read_published().count()

    # simulate the crash retroactively: wipe the ledger table entirely
    # (data commits + markers survive; only the side ledger is lost)
    import shutil

    shutil.rmtree(table + "_commits")
    cdc2 = TranscriptCdc(spark, table)  # re-open: fresh ledger
    results = run_batched(spark, cdc2, chunks)  # replay everything
    assert all(r.skipped for r in results)  # data markers made replay no-ops
    ledger = {r["batch_id"]: r for r in cdc2.ledger.read().collect()}
    assert sorted(ledger) == list(range(len(chunks)))
    assert all(ledger[b]["recovered"] for b in ledger)
    assert cdc2.read_published().count() == rows_before


def test_merge_retries_past_racing_commit(spark, tmp_table_dir):
    """A foreign commit racing the merge: merge_into hits CommitConflict,
    reloads and lands on the next version."""
    from pyspark.sql import types as T

    from mimic_spark.lakehouse.merge import ensure_internal_schema, merge_into

    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("text", T.StringType(), True),
        ]
    )
    path = os.path.join(tmp_table_dir, "race_tbl")
    t = SnapshotTable.create(
        spark, path, ensure_internal_schema(schema), ["conv_id", "turn_idx"], 2
    )
    # steal the version the merge will want (a racing writer's commit)
    base = t.snapshot()
    t.commit(base=base, op="foreign", files=base.files)

    b = spark.createDataFrame(
        [("a", 0, "insert", 1, "x")],
        "conv_id string, turn_idx int, op string, lsn long, text string",
    )

    # make the first in-merge commit attempt collide, then let the retry win:
    # pre-create the NEXT version file via a foreign commit mid-flight is
    # hard to time deterministically, so instead assert the retry loop works
    # when the base moved between snapshot() and commit: monkeypatch one
    # conflict.
    from mimic_spark.lakehouse import table as table_mod

    real_commit = SnapshotTable.commit
    state = {"raised": False}

    def flaky_commit(self, **kw):
        if not state["raised"]:
            state["raised"] = True
            raise table_mod.CommitConflict("injected")
        return real_commit(self, **kw)

    SnapshotTable.commit = flaky_commit
    try:
        res = merge_into(t, b, batch_id=0)
    finally:
        SnapshotTable.commit = real_commit
    assert state["raised"]
    assert not res.skipped and res.inserts == 1
    live = t.read().collect()
    assert len(live) == 1 and live[0]["text"] == "x"


def test_metrics_backfilled_on_recovered_batch(spark, tmp_table_dir):
    """Crash after the data commit but before ANY recording: the replay's
    skipped path must backfill the batch's lineage metrics (not just the
    ledger row), and a second replay must not duplicate them."""
    from pyspark.sql import functions as F

    from mimic_spark.lakehouse.merge import merge_into

    chunks = write_changelog_chunks(
        spark, SPEC, os.path.join(tmp_table_dir, "changelog")
    )
    table = os.path.join(tmp_table_dir, "transcripts")
    cdc = TranscriptCdc(spark, table)
    run_batched(spark, cdc, chunks[:1])

    # batch 1: data commit lands, process dies before _record ever runs
    deduped, _ = cdc.prepare(spark.read.parquet(chunks[1]))
    merge_into(cdc.table, deduped, batch_id=1, mode=cdc.mode)
    assert cdc.metrics.read().filter(F.col("batch_id") == 1).count() == 0

    cdc2 = TranscriptCdc(spark, table)  # restart; replay chunk 1 as batch 1
    res2 = cdc2.apply_batch(spark.read.parquet(chunks[1]), 1)
    assert res2.skipped
    n_metrics = cdc2.metrics.read().filter(F.col("batch_id") == 1).count()
    assert n_metrics > 0
    ledger = {r["batch_id"]: r for r in cdc2.ledger.read().collect()}
    assert ledger[1]["recovered"]
    # replay once more: fully idempotent, no metric duplication
    cdc3 = TranscriptCdc(spark, table)
    cdc3.apply_batch(spark.read.parquet(chunks[1]), 1)
    assert cdc3.metrics.read().filter(F.col("batch_id") == 1).count() == n_metrics


def test_driver_state_is_o1_after_reopen(spark, tmp_table_dir):
    """Re-opening a table with N committed batches keeps O(1) driver state:
    a single int high-watermark, not a set of every batch id ever seen."""
    chunks = write_changelog_chunks(
        spark, SPEC, os.path.join(tmp_table_dir, "changelog")
    )
    table = os.path.join(tmp_table_dir, "transcripts")
    cdc = TranscriptCdc(spark, table)
    run_batched(spark, cdc, chunks)
    cdc2 = TranscriptCdc(spark, table)
    assert isinstance(cdc2._ledger_hwm, int)
    assert cdc2._ledger_hwm == len(chunks) - 1
    assert not hasattr(cdc2, "_ledger_ids")


def test_concurrent_writers_race_to_consistent_state(spark, tmp_table_dir):
    """Two real threads racing merges on ONE table: CommitConflict retries
    must interleave both writers' commits so the final state equals the
    oracle (union of all batches), with one snapshot per successful merge."""
    import threading

    from pyspark.sql import types as T

    from mimic_spark.lakehouse.merge import ensure_internal_schema, merge_into

    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("text", T.StringType(), True),
        ]
    )
    path = os.path.join(tmp_table_dir, "race_tbl")
    t = SnapshotTable.create(
        spark, path, ensure_internal_schema(schema), ["conv_id", "turn_idx"], 2
    )

    n_writers, merges_each = 2, 3
    batches: dict[tuple[int, int], list] = {}
    for w in range(n_writers):
        for m in range(merges_each):
            batches[(w, m)] = [
                (f"w{w}b{m}k{i}", i, "insert", w * 100 + m * 10 + i, f"txt-{w}-{m}-{i}")
                for i in range(5)
            ]
    bschema = "conv_id string, turn_idx int, op string, lsn long, text string"

    barrier = threading.Barrier(n_writers)
    errors: list[Exception] = []

    def writer(w: int) -> None:
        try:
            handle = SnapshotTable(spark, path)  # own handle, like a real job
            barrier.wait()
            for m in range(merges_each):
                df = spark.createDataFrame(batches[(w, m)], bschema)
                merge_into(handle, df, batch_id=None, max_retries=20)
        except Exception as e:  # surface into the main thread
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(w,)) for w in range(n_writers)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=300)
    assert not errors, errors

    total = n_writers * merges_each
    assert t.latest_version() == total  # one snapshot per successful merge
    got = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in t.read().filter("NOT _deleted OR _deleted IS NULL").collect()
    }
    want = {
        (r[0], r[1]): r[4] for rows in batches.values() for r in rows
    }
    assert got == want
