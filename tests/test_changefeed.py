"""Change-feed consumer: a downstream CDC table converges to the upstream's
published state through read_changes_since polling ONLY (never touching the
original changelog), including deletes, incremental polls, and
checkpoint-free resume after a consumer restart."""

from __future__ import annotations

import os

from mimic_spark.sources.changelog import ChangelogSpec, write_changelog_chunks
from mimic_spark.streaming.apply import TranscriptCdc, run_batched
from mimic_spark.streaming.changefeed import ChangeFeedConsumer


def _published_state(cdc: TranscriptCdc):
    return sorted(
        (r["conv_id"], r["turn_idx"], r["text"], r["role"])
        for r in cdc.read_published().collect()
    )


def test_changefeed_chains_tables(spark, tmp_table_dir):
    spec = ChangelogSpec(n_events=3000, n_convs=60, n_chunks=5)
    chunks = write_changelog_chunks(
        spark, spec, os.path.join(tmp_table_dir, "changelog")
    )
    # upstream in MoR mode so delta files keep low lsn_hi footers and the
    # feed's file pruning is actually exercised (COW would lift every file)
    up = TranscriptCdc(
        spark, os.path.join(tmp_table_dir, "upstream"), n_buckets=4,
        mode="mor", compact_every=0,
    )
    down = TranscriptCdc(
        spark, os.path.join(tmp_table_dir, "downstream"), n_buckets=4
    )
    feed = ChangeFeedConsumer(spark, up.table_path, down)

    # incremental: apply upstream chunk-by-chunk, poll after each — every
    # poll sees exactly the new slice and the downstream tracks the upstream
    for i, chunk in enumerate(chunks):
        run_batched(spark, up, chunks[: i + 1])  # chunks 0..i-1 skip (ledger)
        applied = feed.run_until_idle()
        assert applied > 0
        assert feed.cursor() == up.table.latest_version()
        assert _published_state(down) == _published_state(up)

    # idle poll: nothing new -> no commit, version stable
    v = down.table.latest_version()
    assert feed.poll_once() == 0
    assert down.table.latest_version() == v

    # deletes flow through the feed as tombstones: upstream applies a
    # delete-only batch; the feed must remove the same keys downstream
    victims = [
        (r["conv_id"], r["turn_idx"])
        for r in up.read_published().limit(5).collect()
    ]
    wm = up.high_watermark()
    del_rows = [
        (c, t, "user", "", None, None, wm + 1 + i, "delete")
        for i, (c, t) in enumerate(victims)
    ]
    del_batch = spark.createDataFrame(
        del_rows,
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp, lsn long, op string",
    )
    up.apply_batch(del_batch, len(chunks))
    feed.run_until_idle()
    assert _published_state(down) == _published_state(up)
    down_keys = {
        (r["conv_id"], r["turn_idx"])
        for r in down.read_published().collect()
    }
    assert not (set(victims) & down_keys)

    # checkpoint-free resume: a brand-new consumer (fresh process role)
    # derives its cursor from the downstream table itself and sees idle
    down2 = TranscriptCdc(
        spark, os.path.join(tmp_table_dir, "downstream"), n_buckets=4
    )
    feed2 = ChangeFeedConsumer(spark, up.table_path, down2)
    assert feed2.cursor() == up.table.latest_version()
    assert feed2.poll_once() == 0

    # missing upstream is a hard error, never a silent empty table
    import pytest

    with pytest.raises(FileNotFoundError):
        ChangeFeedConsumer(
            spark, os.path.join(tmp_table_dir, "nope"), down2
        )


def test_changefeed_three_table_chain(spark, tmp_table_dir):
    """The lake fan-out shape: source CDC table -> mid -> leaf, each hop a
    ChangeFeedConsumer reading ONLY its upstream's change feed.  Both
    derived tables converge to the source's published state, including a
    delete propagated two hops, and each hop's cursor tracks its own
    upstream independently."""
    spec = ChangelogSpec(n_events=1500, n_convs=40, n_chunks=3)
    chunks = write_changelog_chunks(
        spark, spec, os.path.join(tmp_table_dir, "cl3")
    )
    src = TranscriptCdc(spark, os.path.join(tmp_table_dir, "src"), n_buckets=2)
    mid = TranscriptCdc(spark, os.path.join(tmp_table_dir, "mid"), n_buckets=2)
    leaf = TranscriptCdc(spark, os.path.join(tmp_table_dir, "leaf"), n_buckets=2)
    feed1 = ChangeFeedConsumer(spark, src.table_path, mid)
    feed2 = ChangeFeedConsumer(spark, mid.table_path, leaf)

    for i in range(len(chunks)):
        run_batched(spark, src, chunks[: i + 1])
        feed1.run_until_idle()
        feed2.run_until_idle()
        assert _published_state(mid) == _published_state(src)
        assert _published_state(leaf) == _published_state(src)
        assert feed1.cursor() == src.table.latest_version()
        assert feed2.cursor() == mid.table.latest_version()

    # delete at the source propagates through both hops
    victim = src.read_published().limit(1).collect()[0]
    wm = src.high_watermark()
    src.apply_batch(
        spark.createDataFrame(
            [(victim["conv_id"], victim["turn_idx"], "user", "", None, None,
              wm + 1, "delete")],
            "conv_id string, turn_idx int, role string, text string,"
            " tool string, ts timestamp, lsn long, op string",
        ),
        len(chunks),
    )
    feed1.run_until_idle()
    feed2.run_until_idle()
    assert _published_state(leaf) == _published_state(src)
    leaf_keys = {
        (r["conv_id"], r["turn_idx"]) for r in leaf.read_published().collect()
    }
    assert (victim["conv_id"], victim["turn_idx"]) not in leaf_keys


def test_changefeed_crash_between_merge_and_ledger(spark, tmp_table_dir):
    """A crash after the merge commit but before the ledger append leaves
    the ledger high-watermark one behind the table's committed
    last_batch_id.  The next poll must derive a FRESH batch id (not collide
    with the committed one, which would skip the merge while still
    reporting rows applied) and the feed must still converge with accurate
    per-poll counts."""
    spec = ChangelogSpec(n_events=1200, n_convs=30, n_chunks=3)
    chunks = write_changelog_chunks(
        spark, spec, os.path.join(tmp_table_dir, "cl2")
    )
    up = TranscriptCdc(spark, os.path.join(tmp_table_dir, "u2"), n_buckets=2)
    down = TranscriptCdc(spark, os.path.join(tmp_table_dir, "d2"), n_buckets=2)
    feed = ChangeFeedConsumer(spark, up.table_path, down)

    run_batched(spark, up, chunks[:1])
    feed.run_until_idle()
    assert _published_state(down) == _published_state(up)

    # crash window: merge + cursor committed, ledger row lost.  Simulate by
    # suppressing _record for one poll — the table carries last_batch_id=N
    # while the ledger hwm stays at N-1, exactly the post-crash state.
    run_batched(spark, up, chunks[:2])
    real_record = TranscriptCdc._record
    TranscriptCdc._record = lambda self, *a, **k: None
    try:
        feed.poll_once()
    finally:
        TranscriptCdc._record = real_record
    committed = int(down.table.props().get("last_batch_id"))
    assert down._ledger_hwm < committed  # the crash state we mean to test

    # restart role: the next poll must FIRST backfill the missing ledger
    # row (else the ledger-continuity audit fails forever), then apply the
    # next slice under a fresh id — never silently skip it
    run_batched(spark, up, chunks)
    n = feed.poll_once()
    assert n > 0  # merge genuinely applied (a collision would have raised)
    assert int(down.table.props().get("last_batch_id")) == committed + 1
    feed.run_until_idle()
    assert feed.cursor() == up.table.latest_version()
    assert _published_state(down) == _published_state(up)

    # the healed ledger is contiguous (a recovery marker fills the hole)
    # and the audit gate — which checks exactly that — passes
    ledger_ids = sorted(
        r["batch_id"] for r in down.ledger.read().collect()
    )
    assert ledger_ids == list(range(len(ledger_ids)))
    recovered = [
        r for r in down.ledger.read().collect() if r["recovered"]
    ]
    assert len(recovered) == 1 and recovered[0]["batch_id"] == committed

    from mimic_spark.streaming.audit import run_audit

    rep = run_audit(down, fail_on_error=True)
    assert all(v["ok"] for v in rep.checks.values())


def test_changefeed_single_pass_poll(spark, tmp_table_dir):
    """r4 verdict #4: each poll scans the version diff exactly once.

    - A data poll must run NO count() job (the old emptiness probe
      re-scanned the diff before the merge scanned it again); the applied
      row count now comes from the merge's own Observation.
    - A metadata-only upstream version (props/rename commits add no data
      files) is detected from the manifest file lists DRIVER-side: the
      poll advances the cursor with ZERO Spark jobs."""
    import pyspark.sql.dataframe as _dfmod

    spec = ChangelogSpec(n_events=800, n_convs=20, n_chunks=2)
    chunks = write_changelog_chunks(
        spark, spec, os.path.join(tmp_table_dir, "clsp")
    )
    up = TranscriptCdc(spark, os.path.join(tmp_table_dir, "usp"), n_buckets=2)
    down = TranscriptCdc(spark, os.path.join(tmp_table_dir, "dsp"), n_buckets=2)
    feed = ChangeFeedConsumer(spark, up.table_path, down)

    # data poll with count() poisoned: any emptiness-probe regression raises
    run_batched(spark, up, chunks[:1])
    real_count = _dfmod.DataFrame.count

    def _no_count(self):
        raise AssertionError("poll_once must not run a count() job")

    _dfmod.DataFrame.count = _no_count
    try:
        n = feed.poll_once()
    finally:
        _dfmod.DataFrame.count = real_count
    assert n > 0
    assert _published_state(down) == _published_state(up)

    # metadata-only version: props commit adds no data files -> zero jobs
    base = up.table.snapshot()
    up.table.commit(
        base=base, op="props", files=base.files,
        props_update={"note": "metadata only"},
    )
    sc = spark.sparkContext
    sc.setJobGroup("meta-poll", "metadata-only poll must plan no job")
    try:
        assert feed.poll_once() == 0
    finally:
        sc.setJobGroup(None, None)
    assert len(sc.statusTracker().getJobIdsForGroup("meta-poll")) == 0
    assert feed.cursor() == up.table.latest_version()

    # sanity: the same counter DOES see jobs when a real scan happens
    sc.setJobGroup("data-poll", "data poll runs jobs")
    try:
        run_batched(spark, up, chunks)
        assert feed.poll_once() > 0
    finally:
        sc.setJobGroup(None, None)
    assert len(sc.statusTracker().getJobIdsForGroup("data-poll")) > 0


def test_changefeed_backfill_gap_bounded(spark, tmp_table_dir):
    """A genuine crash leaves a ledger gap of exactly 1; a huge gap means
    the ledger table was lost/recreated and the poll must fail loud instead
    of fabricating thousands of recovery markers (r4 ADVICE)."""
    import pytest

    from mimic_spark.streaming.changefeed import MAX_LEDGER_BACKFILL

    spec = ChangelogSpec(n_events=600, n_convs=20, n_chunks=2)
    chunks = write_changelog_chunks(
        spark, spec, os.path.join(tmp_table_dir, "clbg")
    )
    up = TranscriptCdc(spark, os.path.join(tmp_table_dir, "ubg"), n_buckets=2)
    down = TranscriptCdc(spark, os.path.join(tmp_table_dir, "dbg"), n_buckets=2)
    feed = ChangeFeedConsumer(spark, up.table_path, down)
    run_batched(spark, up, chunks[:1])
    feed.run_until_idle()

    # simulate a lost ledger: hwm far behind the committed last_batch_id
    committed = int(down.table.props().get("last_batch_id"))
    down._ledger_hwm = committed - (MAX_LEDGER_BACKFILL + 1)
    run_batched(spark, up, chunks)
    with pytest.raises(RuntimeError, match="lost or recreated"):
        feed.poll_once()


def test_changefeed_expired_cursor_fails_loud(spark, tmp_table_dir):
    """If upstream snapshot retention expired the cursor's version, an
    incremental read would silently lose history — the consumer must raise
    with reset instructions instead."""
    import pytest

    from mimic_spark.lakehouse.maintenance import expire_snapshots

    spec = ChangelogSpec(n_events=1000, n_convs=30, n_chunks=4)
    chunks = write_changelog_chunks(
        spark, spec, os.path.join(tmp_table_dir, "cl")
    )
    up = TranscriptCdc(spark, os.path.join(tmp_table_dir, "u"), n_buckets=2)
    down = TranscriptCdc(spark, os.path.join(tmp_table_dir, "d"), n_buckets=2)
    feed = ChangeFeedConsumer(spark, up.table_path, down)

    run_batched(spark, up, chunks[:1])
    feed.run_until_idle()
    run_batched(spark, up, chunks)  # more upstream versions
    expire_snapshots(up.table, keep_last=1)  # cursor's snapshot is gone

    with pytest.raises(RuntimeError, match="full backfill"):
        feed.poll_once()


def test_changefeed_bounded_polls_drain_backlog(spark, tmp_table_dir):
    """Backpressure (maxOffsetsPerTrigger role): a consumer resuming behind
    a multi-version backlog drains it in bounded micro-batches — each poll
    advances the cursor by at most max_versions_per_poll / ~max_rows_per_poll
    — and still converges to the upstream's published state."""
    spec = ChangelogSpec(n_events=3000, n_convs=60, n_chunks=5)
    chunks = write_changelog_chunks(
        spark, spec, os.path.join(tmp_table_dir, "clb")
    )
    up = TranscriptCdc(spark, os.path.join(tmp_table_dir, "ub"), n_buckets=2)
    run_batched(spark, up, chunks)  # full backlog before the consumer starts

    down = TranscriptCdc(spark, os.path.join(tmp_table_dir, "db"), n_buckets=2)
    feed = ChangeFeedConsumer(
        spark, up.table_path, down, max_versions_per_poll=1
    )
    latest = up.table.latest_version()
    polls = 0
    while feed.cursor() < latest:
        before = feed.cursor()
        feed.poll_once()
        after = feed.cursor()
        assert after - max(before, -1) <= 1 or before < 0
        # version-bounded: from a live cursor each poll moves exactly 1
        if before >= 0:
            assert after == before + 1
        polls += 1
        assert polls <= 100
    assert polls > 1  # the backlog genuinely took multiple micro-batches
    assert _published_state(down) == _published_state(up)

    # rows-bounded variant: tiny cap -> many polls, same convergence;
    # a single version larger than the cap still advances (no stall)
    down2 = TranscriptCdc(spark, os.path.join(tmp_table_dir, "db2"), n_buckets=2)
    feed2 = ChangeFeedConsumer(
        spark, up.table_path, down2, max_rows_per_poll=200
    )
    lag0 = feed2.lag()
    assert lag0["versions_behind"] > 0 and lag0["rows_behind"] > 0
    polls2 = 0
    while feed2.cursor() < latest:
        feed2.poll_once()
        polls2 += 1
        assert polls2 <= 200
    # each ~600-row version exceeds the 200-row cap, so every poll is
    # clamped to exactly one version (the no-stall guarantee, exercised
    # on every single poll here)
    assert polls2 >= polls > 1
    assert _published_state(down2) == _published_state(up)
    assert feed2.lag() == {
        "cursor": latest,
        "latest_upstream_version": latest,
        "versions_behind": 0,
        "rows_behind": 0,
        "files_behind": 0,
    }

    import pytest

    with pytest.raises(ValueError):
        ChangeFeedConsumer(spark, up.table_path, down2, max_versions_per_poll=0)


def test_changefeed_bootstrap_then_tail(spark, tmp_table_dir):
    """Snapshot-then-stream onboarding (the Debezium initial-snapshot role):
    bootstrap bulk-loads the upstream's CURRENT resolved state in one
    O(live-rows) batch — skipping per-version churn replay — sets the
    cursor atomically, then incremental polls take over seamlessly."""
    spec = ChangelogSpec(n_events=4000, n_convs=50, n_chunks=5)
    chunks = write_changelog_chunks(
        spark, spec, os.path.join(tmp_table_dir, "clboot")
    )
    up = TranscriptCdc(
        spark, os.path.join(tmp_table_dir, "uboot"), n_buckets=2, mode="mor",
        compact_every=0,
    )
    run_batched(spark, up, chunks[:4])  # history exists before the consumer

    down = TranscriptCdc(spark, os.path.join(tmp_table_dir, "dboot"), n_buckets=2)
    feed = ChangeFeedConsumer(
        spark, up.table_path, down, max_versions_per_poll=1
    )
    loaded = feed.bootstrap()
    live_rows = up.read_published().count()
    assert loaded == live_rows  # O(live rows), not O(history events)
    assert feed.cursor() == up.table.latest_version()
    assert _published_state(down) == _published_state(up)

    # idempotent: a second bootstrap (or a crash-rerun after the cursor
    # committed) is a no-op, never a duplicate load
    assert feed.bootstrap() == 0

    # stream phase: later upstream changes flow through normal polls,
    # interleaving correctly with bootstrapped rows under the LSN guard
    run_batched(spark, up, chunks)
    feed.run_until_idle()
    assert _published_state(down) == _published_state(up)

    # fresh-consumer resume derives everything from the table, sees idle
    down2 = TranscriptCdc(spark, os.path.join(tmp_table_dir, "dboot"), n_buckets=2)
    feed2 = ChangeFeedConsumer(spark, up.table_path, down2)
    assert feed2.bootstrap() == 0
    assert feed2.poll_once() == 0

def test_changefeed_bootstrap_empty_upstream_advances_cursor(
    spark, tmp_table_dir
):
    """r5 ADVICE: bootstrapping against an upstream whose current snapshot
    is EMPTY skipped the merge, so no commit carried the cursor prop — the
    cursor stayed -1 and the next poll replayed full history (or failed
    loud if early versions were expired: the exact case bootstrap exists
    to handle).  The empty bootstrap must still pin the cursor."""
    from mimic_spark.lakehouse.maintenance import expire_snapshots

    up = TranscriptCdc(
        spark, os.path.join(tmp_table_dir, "uboote"), n_buckets=2, mode="mor",
        compact_every=0,
    )
    # history that inserts then deletes everything: current state is empty
    SCHEMA = (
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp, lsn long, op string"
    )
    up.apply_batch(
        spark.createDataFrame(
            [("c", t, "user", f"t{t}", None, None, t, "insert")
             for t in range(5)],
            SCHEMA,
        ),
        0,
    )
    up.apply_batch(
        spark.createDataFrame(
            [("c", t, None, None, None, None, 100 + t, "delete")
             for t in range(5)],
            SCHEMA,
        ),
        1,
    )
    assert up.read_published().count() == 0
    # expire early history so a full-history replay would fail loud
    expire_snapshots(up.table, keep_last=1)

    down = TranscriptCdc(
        spark, os.path.join(tmp_table_dir, "dboote"), n_buckets=2
    )
    feed = ChangeFeedConsumer(spark, up.table_path, down)
    assert feed.bootstrap() == 0
    assert feed.cursor() == up.table.current_version()
    assert feed.poll_once() == 0  # tails cleanly; no history replay

    # new upstream rows after the empty bootstrap flow through normally
    up.apply_batch(
        spark.createDataFrame(
            [("c2", 1, "user", "new", None, None, 200, "insert")], SCHEMA
        ),
        2,
    )
    feed.run_until_idle()
    assert _published_state(down) == _published_state(up)


def test_changefeed_skips_upstream_compaction_reemits(spark, tmp_table_dir):
    """An upstream compaction between polls rewrites every row into new
    files; the op-aware poll must plan ZERO files for it — lag reports 0
    rows behind, the downstream gets cursor-only commits, no re-merge —
    while data batches before and after still flow exactly (r8
    streaming-soak decay fix)."""
    from mimic_spark.lakehouse.maintenance import compact

    spec = ChangelogSpec(n_events=800, n_convs=20, n_chunks=2)
    chunks = write_changelog_chunks(
        spark, spec, os.path.join(tmp_table_dir, "clsk")
    )
    up = TranscriptCdc(
        spark, os.path.join(tmp_table_dir, "upsk"), n_buckets=2,
        mode="mor", compact_every=0,
    )
    down = TranscriptCdc(spark, os.path.join(tmp_table_dir, "downsk"), n_buckets=2)
    feed = ChangeFeedConsumer(spark, up.table_path, down)

    run_batched(spark, up, chunks[:1])
    feed.run_until_idle()
    assert _published_state(down) == _published_state(up)
    v_down = down.table.latest_version()

    compact(up.table)
    assert feed.lag()["rows_behind"] == 0  # op-aware lag: no logical change
    feed.run_until_idle()
    for v in range(v_down + 1, down.table.latest_version() + 1):
        assert down.table.snapshot(v).op == "changefeed-cursor"
    assert _published_state(down) == _published_state(up)

    run_batched(spark, up, chunks)
    feed.run_until_idle()
    assert _published_state(down) == _published_state(up)
