"""Write-audit-publish: staged commits are invisible to default readers and
change-feed consumers until published; failed audits leave them staged;
aborts restore the published state and orphan the staged files; rollback_to
is a metadata-only restore that never rewrites history."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mimic_spark.lakehouse import wap
from mimic_spark.lakehouse.maintenance import expire_snapshots, remove_orphan_files
from mimic_spark.lakehouse.table import CommitConflict, SnapshotTable
from mimic_spark.sources.changelog import ChangelogSpec, write_changelog_chunks
from mimic_spark.streaming.apply import TranscriptCdc, run_batched
from mimic_spark.streaming.changefeed import ChangeFeedConsumer

SCHEMA = "conv_id string, turn_idx int, text string"
KEYS = ["conv_id", "turn_idx"]


def _mk(spark, path):
    df = spark.createDataFrame(
        [("c1", 1, "hello"), ("c1", 2, "world"), ("c2", 1, "base")], SCHEMA
    )
    t = SnapshotTable.create(spark, path, df.schema, KEYS, 2)
    t.append(df)
    return t


def _state(df):
    return sorted((r["conv_id"], r["turn_idx"], r["text"]) for r in df.collect())


def test_wap_stage_publish_abort(spark, tmp_table_dir):
    t = _mk(spark, os.path.join(tmp_table_dir, "t"))
    published = _state(t.read())

    staged_df = spark.createDataFrame([("c3", 1, "staged")], SCHEMA)
    wap.stage(t, staged_df, "batch-a")

    # invisible by default; visible ONLY via the staged version explicitly
    assert _state(t.read()) == published
    sv = wap.staged_version(t, "batch-a")
    assert sv == t.latest_version()
    assert ("c3", 1, "staged") in _state(t.read(version=sv))

    # a second stage under the SAME id stacks into the same logical batch;
    # a different id is refused while one is in flight
    wap.stage(t, spark.createDataFrame([("c3", 2, "staged2")], SCHEMA), "batch-a")
    with pytest.raises(RuntimeError, match="already staged"):
        wap.stage(t, staged_df, "batch-b")

    # a non-WAP commit cannot bury/inherit the staged marker
    with pytest.raises(CommitConflict, match="WAP-staged"):
        t.append(spark.createDataFrame([("c9", 9, "x")], SCHEMA))

    # failing audit -> StagedAuditError, batch REMAINS staged
    def bad_audit(df):
        raise AssertionError("row count too low")

    with pytest.raises(wap.StagedAuditError, match="row count too low"):
        wap.publish(t, "batch-a", audit=bad_audit)
    assert wap.staged_version(t, "batch-a") is not None
    assert _state(t.read()) == published

    # passing audit -> metadata-only publish; both staged chunks appear
    def good_audit(df):
        assert df.filter(F.col("text").startswith("staged")).count() == 2

    snap = wap.publish(t, "batch-a", audit=good_audit)
    assert snap.props.get("wap.published") == "batch-a"
    now = _state(t.read())
    assert ("c3", 1, "staged") in now and ("c3", 2, "staged2") in now
    # and normal commits work again
    t.append(spark.createDataFrame([("c9", 9, "x")], SCHEMA))

    # --- abort path: staged files never become visible, then get GC'd ---
    base_files = {f["path"] for f in t.snapshot().files}
    wap.stage(t, spark.createDataFrame([("c4", 1, "doomed")], SCHEMA), "batch-c")
    doomed = {
        f["path"] for f in t.snapshot().files if f["path"] not in base_files
    }
    assert doomed
    wap.abort(t, "batch-c")
    assert "doomed" not in {x[2] for x in _state(t.read())}
    assert {f["path"] for f in t.snapshot().files} == base_files
    with pytest.raises(RuntimeError, match="no staged"):
        wap.abort(t, "batch-c")
    # the aborted files are referenced only by the (now historical) staged
    # snapshots: expiring those reclaims the staged data, while the
    # published files stay (still referenced by the kept snapshot)
    expire_snapshots(t, keep_last=1)
    remove_orphan_files(t, older_than_s=0)
    assert all(not os.path.exists(os.path.join(t.path, p)) for p in doomed)
    assert _state(t.read()) == sorted(now + [("c9", 9, "x")])


def test_wap_staged_data_never_reaches_changefeed(spark, tmp_table_dir):
    """The full WAP x CDC interplay: a feed (bounded, so it walks versions)
    never consumes staged data; published batches arrive exactly once;
    aborted batches never arrive at all."""
    spec = ChangelogSpec(n_events=1500, n_convs=40, n_chunks=3)
    chunks = write_changelog_chunks(
        spark, spec, os.path.join(tmp_table_dir, "cl")
    )
    up = TranscriptCdc(spark, os.path.join(tmp_table_dir, "up"), n_buckets=2)
    run_batched(spark, up, chunks)
    down = TranscriptCdc(spark, os.path.join(tmp_table_dir, "down"), n_buckets=2)
    feed = ChangeFeedConsumer(
        spark, up.table_path, down, max_versions_per_poll=1
    )
    feed.run_until_idle()

    wm = up.high_watermark()
    schema = up.table.schema()
    good = spark.createDataFrame(
        [("wapc", 1, "user", "published turn", None, None, wm + 1, False)],
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp, _lsn long, _deleted boolean",
    )
    bad = good.select(
        F.lit("wapx").alias("conv_id"), "turn_idx", "role",
        F.lit("aborted turn").alias("text"), "tool", "ts",
        (F.col("_lsn") + 1).alias("_lsn"), "_deleted",
    )

    # staged -> feed sees nothing, lag stays zero (published view current)
    wap.stage(up.table, good, "w1")
    assert feed.lag()["versions_behind"] == 0
    assert feed.run_until_idle() == 0
    assert "wapc" not in {r["conv_id"] for r in down.read_published().collect()}

    # publish -> exactly one poll picks it up
    wap.publish(up.table, "w1")
    assert feed.run_until_idle() == 1
    assert "wapc" in {r["conv_id"] for r in down.read_published().collect()}

    # staged then ABORTED -> never flows downstream, even though the
    # bounded consumer walks every version in between
    wap.stage(up.table, bad, "w2")
    wap.abort(up.table, "w2")
    up.apply_batch(  # a real post-abort batch so the feed has work to do
        spark.createDataFrame(
            [("wapc", 2, "user", "after abort", None, None, wm + 3, "insert")],
            "conv_id string, turn_idx int, role string, text string,"
            " tool string, ts timestamp, lsn long, op string",
        ),
        int(up.table.props()["last_batch_id"]) + 1,
    )
    feed.run_until_idle()
    assert feed.cursor() == up.table.current_version()
    convs = {r["conv_id"] for r in down.read_published().collect()}
    assert "wapx" not in convs and "wapc" in convs
    assert _state_eq(up, down)


def _state_eq(a: TranscriptCdc, b: TranscriptCdc) -> bool:
    sa = sorted(
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in a.read_published().collect()
    )
    sb = sorted(
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in b.read_published().collect()
    )
    return sa == sb


def test_rollback_to_restores_state_without_rewriting_history(
    spark, tmp_table_dir
):
    t = _mk(spark, os.path.join(tmp_table_dir, "rb"))
    v_good = t.latest_version()
    good = _state(t.read())

    t.append(spark.createDataFrame([("bad", 1, "oops")], SCHEMA))
    v_bad = t.latest_version()
    assert ("bad", 1, "oops") in _state(t.read())

    t.rollback_to(v_good)
    assert _state(t.read()) == good
    # history intact: the bad version still time-travels
    assert ("bad", 1, "oops") in _state(t.read(version=v_bad))
    # and the table moves on normally afterwards
    t.append(spark.createDataFrame([("c5", 5, "post")], SCHEMA))
    assert ("c5", 5, "post") in _state(t.read())
    assert ("bad", 1, "oops") not in _state(t.read())

    with pytest.raises(FileNotFoundError):
        t.rollback_to(99)

def test_expire_snapshots_protects_published_under_staged_head(
    spark, tmp_table_dir
):
    """r5 ADVICE (high): while a WAP batch is staged at the head, positional
    keep_last would expire the latest PUBLISHED snapshot — current_version
    then raises for every reader and feed poll, abort crashes, and an
    overwrite-mode stage deletes the published data files outright.  Expiry
    must always retain the published snapshot (and its files)."""
    t = _mk(spark, os.path.join(tmp_table_dir, "twapexp"))
    published = _state(t.read())
    pub_v = t.current_version()

    # two stacked stage commits occupy the positional keep_last=2 window
    wap.stage(t, spark.createDataFrame([("s", 1, "a")], SCHEMA), "b1")
    wap.stage(t, spark.createDataFrame([("s", 2, "b")], SCHEMA), "b1")
    expire_snapshots(t, keep_last=2)
    assert t.current_version() == pub_v
    assert _state(t.read()) == published  # data files intact
    wap.abort(t, "b1")  # abort resolves current_version — must not crash
    assert _state(t.read()) == published

    # the nastier variant: an OVERWRITE stage with keep_last=1 — without
    # the published version in the keep set, the published files are only
    # referenced by expired snapshots and get deleted from disk
    pub_v = t.current_version()  # abort committed a new published head
    wap.stage(
        t, spark.createDataFrame([("o", 1, "ow")], SCHEMA), "b2",
        mode="overwrite",
    )
    expire_snapshots(t, keep_last=1)
    assert t.current_version() == pub_v
    assert _state(t.read()) == published
    wap.abort(t, "b2")
    assert _state(t.read()) == published
