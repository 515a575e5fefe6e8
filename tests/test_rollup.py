"""Incremental view maintenance: the per-conversation rollup table tracks
the upstream CDC table's change feed by delta+retraction and must equal a
full groupBy recompute of the upstream published state after every poll —
through inserts, updates, deletes, late/stale events, restarts, and both
old-value read paths (point lookup and bucket-scoped scan)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from mimic_spark.sources.changelog import ChangelogSpec, write_changelog_chunks
from mimic_spark.streaming.apply import TranscriptCdc, run_batched
from mimic_spark.streaming.rollup import IncrementalConvRollup


def _recompute(cdc: TranscriptCdc) -> list[tuple]:
    """The rollup's defining oracle: a full recompute from published rows
    (max_ts included — the reserve-maintained aggregate must match a plain
    MAX over the live group at every point)."""
    return sorted(
        (r["conv_id"], r["n_turns"], r["n_chars"], r["max_ts"])
        for r in cdc.read_published()
        .groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(F.length("text")).alias("n_chars"),
            F.max("ts").alias("max_ts"),
        )
        .collect()
    )


def _materialized(roll: IncrementalConvRollup) -> list[tuple]:
    return sorted(
        (r["conv_id"], r["n_turns"], r["n_chars"], r["max_ts"])
        for r in roll.read().collect()
    )


def test_rollup_tracks_upstream_incrementally(spark, tmp_table_dir):
    spec = ChangelogSpec(n_events=2400, n_convs=50, n_chunks=4)
    chunks = write_changelog_chunks(
        spark, spec, os.path.join(tmp_table_dir, "clru")
    )
    up = TranscriptCdc(
        spark, os.path.join(tmp_table_dir, "upru"), n_buckets=4,
        mode="mor", compact_every=0,
    )
    roll = IncrementalConvRollup(
        spark, up.table_path, os.path.join(tmp_table_dir, "rollru"),
        n_buckets=2,
    )

    # incremental convergence after every upstream batch
    for i in range(len(chunks)):
        run_batched(spark, up, chunks[: i + 1])
        roll.run_until_idle()
        assert roll.cursor() == up.table.latest_version()
        assert _materialized(roll) == _recompute(up), f"diverged at batch {i}"

    # deletes: remove a few turns, including EVERY turn of one conversation
    # (its rollup row must disappear, not linger at zero)
    rows = up.read_published().collect()
    by_conv: dict = {}
    for r in rows:
        by_conv.setdefault(r["conv_id"], []).append(r["turn_idx"])
    victim_conv = sorted(by_conv)[0]
    wm = up.high_watermark()
    del_rows = [
        (victim_conv, t, "user", "", None, None, wm + 1 + j, "delete")
        for j, t in enumerate(by_conv[victim_conv])
    ]
    other = sorted(by_conv)[1]
    del_rows.append(
        (other, by_conv[other][0], "user", "", None, None,
         wm + 1 + len(del_rows), "delete")
    )
    up.apply_batch(
        spark.createDataFrame(
            del_rows,
            "conv_id string, turn_idx int, role string, text string,"
            " tool string, ts timestamp, lsn long, op string",
        ),
        len(chunks),
    )
    roll.run_until_idle()
    state = _materialized(roll)
    assert state == _recompute(up)
    assert victim_conv not in {c for c, *_ in state}

    # stale late event: lower lsn than the key's current row — a no-op
    # upstream, must be a no-op in the rollup (the staleness guard)
    key = [r for r in up.read_published().collect()][0]
    up.apply_batch(
        spark.createDataFrame(
            [(key["conv_id"], key["turn_idx"], "user",
              "stale-text-of-a-very-different-length", None, None, 0,
              "update")],
            "conv_id string, turn_idx int, role string, text string,"
            " tool string, ts timestamp, lsn long, op string",
        ),
        len(chunks) + 1,
    )
    roll.run_until_idle()
    assert _materialized(roll) == _recompute(up)

    # restart role: a fresh consumer derives its cursor from the rollup
    # table itself and sees idle; replayed polls are no-ops
    roll2 = IncrementalConvRollup(
        spark, up.table_path, os.path.join(tmp_table_dir, "rollru")
    )
    assert roll2.cursor() == up.table.latest_version()
    assert roll2.poll_once() == 0
    assert _materialized(roll2) == _recompute(up)


def test_rollup_bucket_scan_path_matches_point_path(spark, tmp_table_dir):
    """max_point_keys=8 forces the bucket-scoped old-value scan (the large-
    batch path); results must match the recompute exactly as the point path
    does."""
    spec = ChangelogSpec(n_events=1200, n_convs=30, n_chunks=3)
    chunks = write_changelog_chunks(
        spark, spec, os.path.join(tmp_table_dir, "clrb")
    )
    up = TranscriptCdc(
        spark, os.path.join(tmp_table_dir, "uprb"), n_buckets=4,
        mode="mor", compact_every=0,
    )
    roll = IncrementalConvRollup(
        spark, up.table_path, os.path.join(tmp_table_dir, "rollrb"),
        n_buckets=2, max_point_keys=8,
    )
    for i in range(len(chunks)):
        run_batched(spark, up, chunks[: i + 1])
        roll.run_until_idle()
        assert _materialized(roll) == _recompute(up)


def test_rollup_off_changefeed_derived_table(spark, tmp_table_dir):
    """Depth-2 lake fan-out: source CDC table -> change-feed-derived mirror
    -> rollup maintained off the MIRROR's feed.  Every hop is incremental;
    after each upstream batch the rollup must equal the recompute of both
    the mirror and the source."""
    from mimic_spark.streaming.changefeed import ChangeFeedConsumer

    spec = ChangelogSpec(n_events=1500, n_convs=40, n_chunks=3)
    chunks = write_changelog_chunks(
        spark, spec, os.path.join(tmp_table_dir, "clr2")
    )
    src = TranscriptCdc(
        spark, os.path.join(tmp_table_dir, "srcr2"), n_buckets=2,
        mode="mor", compact_every=0,
    )
    mid = TranscriptCdc(
        spark, os.path.join(tmp_table_dir, "midr2"), n_buckets=2,
        mode="mor", compact_every=0,
    )
    feed = ChangeFeedConsumer(spark, src.table_path, mid)
    roll = IncrementalConvRollup(
        spark, mid.table_path, os.path.join(tmp_table_dir, "rollr2"),
        n_buckets=2,
    )
    for i in range(len(chunks)):
        run_batched(spark, src, chunks[: i + 1])
        feed.run_until_idle()
        roll.run_until_idle()
        want = _recompute(mid)
        assert _materialized(roll) == want == _recompute(src), (
            f"diverged at batch {i}"
        )


def test_rollup_random_sequences_converge(spark):
    """Property-based: random op sequences over a tiny colliding keyspace
    (the test_merge_properties changelog strategy — permuted delivery,
    duplicate deliveries, arbitrary batch splits), MoR upstream, rollup
    polled after every batch; the materialized aggregates must equal a
    full recompute of the live table at EVERY intermediate state.
    max_point_keys=5 so examples exercise both old-value paths."""
    import shutil
    import tempfile

    from hypothesis import HealthCheck, given, settings
    from test_merge_properties import BATCH_SCHEMA, SCHEMA, changelog

    from mimic_spark.lakehouse.merge import ensure_internal_schema, merge_into
    from mimic_spark.lakehouse.table import SnapshotTable
    from mimic_spark.streaming.apply import dedup_batch

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(data=changelog())
    def run(data):
        events, batches = data
        d = tempfile.mkdtemp(prefix="hyp_rollup_")
        try:
            t = SnapshotTable.create(
                spark,
                os.path.join(d, "t"),
                ensure_internal_schema(SCHEMA),
                ["conv_id", "turn_idx"],
                n_buckets=2,
            )
            roll = IncrementalConvRollup(
                spark, t.path, os.path.join(d, "roll"), n_buckets=2,
                max_point_keys=5,
            )
            for i, batch in enumerate(batches):
                if not batch:
                    continue
                df = spark.createDataFrame(
                    [
                        (e["lsn"], e["op"], e["conv_id"], e["turn_idx"], e["text"])
                        for e in batch
                    ],
                    BATCH_SCHEMA,
                )
                merge_into(t, dedup_batch(df), batch_id=i, mode="mor")
                roll.run_until_idle()
                live = t.read().filter(
                    ~F.coalesce(F.col("_deleted"), F.lit(False))
                )
                want = sorted(
                    # ts-less upstream: max_ts is NULL by construction
                    (r["conv_id"], r["n_turns"], r["n_chars"], None)
                    for r in live.groupBy("conv_id")
                    .agg(
                        F.count(F.lit(1)).alias("n_turns"),
                        F.sum(F.length("text")).alias("n_chars"),
                    )
                    .collect()
                )
                assert _materialized(roll) == want, f"diverged at batch {i}"
        finally:
            shutil.rmtree(d, ignore_errors=True)

    run()


def test_rollup_cow_upstream_re_emits_zero_out(spark, tmp_table_dir):
    """A COW upstream's merge rewrites whole buckets, so the version diff
    re-emits every row of the touched buckets — the unchanged rows must
    zero out in the delta join and the rollup must still converge (the
    documented expensive-but-correct pairing)."""
    spec = ChangelogSpec(n_events=1200, n_convs=30, n_chunks=3)
    chunks = write_changelog_chunks(
        spark, spec, os.path.join(tmp_table_dir, "clrw")
    )
    up = TranscriptCdc(
        spark, os.path.join(tmp_table_dir, "uprw"), n_buckets=4, mode="cow"
    )
    roll = IncrementalConvRollup(
        spark, up.table_path, os.path.join(tmp_table_dir, "rollrw"),
        n_buckets=2,
    )
    for i in range(len(chunks)):
        run_batched(spark, up, chunks[: i + 1])
        roll.run_until_idle()
        assert _materialized(roll) == _recompute(up), f"diverged at batch {i}"


def test_rollup_bucket_path_across_rebucket_and_key_widening(spark, tmp_table_dir):
    """The bucket-scoped old-value path must pin BOTH the bucket count and
    the key TYPES to the previous cursor version: a rebucket re-hashes
    files under a new count, and a key-type widening (int->long turn_idx
    via merge schema evolution) makes current-schema values hash
    differently under xxhash64 — either un-pinned would silently miss old
    values and double-count deltas (r5 review finding).  max_point_keys=1
    forces the bucket path on every poll."""
    from pyspark.sql import types as T

    from mimic_spark.lakehouse.maintenance import rebucket
    from mimic_spark.lakehouse.merge import ensure_internal_schema, merge_into
    from mimic_spark.lakehouse.table import SnapshotTable
    from mimic_spark.streaming.apply import dedup_batch

    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("text", T.StringType(), True),
        ]
    )
    t = SnapshotTable.create(
        spark,
        os.path.join(tmp_table_dir, "wide_up"),
        ensure_internal_schema(schema),
        ["conv_id", "turn_idx"],
        n_buckets=2,
    )
    roll = IncrementalConvRollup(
        spark, t.path, os.path.join(tmp_table_dir, "wide_roll"),
        n_buckets=2, max_point_keys=1,
    )

    def recompute():
        live = t.read().filter(
            ~F.coalesce(F.col("_deleted"), F.lit(False))
        )
        return sorted(
            # ts-less upstream: max_ts is NULL by construction
            (r["conv_id"], r["n_turns"], r["n_chars"], None)
            for r in live.groupBy("conv_id")
            .agg(
                F.count(F.lit(1)).alias("n_turns"),
                F.sum(F.length("text")).alias("n_chars"),
            )
            .collect()
        )

    b1 = spark.createDataFrame(
        [(i, "update", f"c{i % 3}", i, f"text-{i}") for i in range(9)],
        "lsn long, op string, conv_id string, turn_idx int, text string",
    )
    merge_into(t, dedup_batch(b1), batch_id=0, mode="mor")
    roll.run_until_idle()
    assert _materialized(roll) == recompute()

    # rebucket between polls: the diff re-emits every row under the new
    # count; zero deltas, state unchanged, bucket path hashes old keys
    # under the OLD count
    rebucket(t, 4)
    before = _materialized(roll)
    roll.run_until_idle()
    assert _materialized(roll) == before == recompute()

    # key-type widening: a batch with LONG turn_idx updates existing keys
    # (longer text) and deletes one — old values live under the INT schema
    b2 = spark.createDataFrame(
        [
            (10, "update", "c0", 0, "much-longer-replacement-text"),
            (11, "delete", "c1", 1, None),
            (12, "insert", "c2", 100, "brand-new-turn"),
        ],
        "lsn long, op string, conv_id string, turn_idx long, text string",
    )
    merge_into(t, dedup_batch(b2), batch_id=1, mode="mor")
    assert isinstance(t.schema()["turn_idx"].dataType, T.LongType)
    roll.run_until_idle()
    assert _materialized(roll) == recompute()


def test_rollup_snapshot_retention_bounded(spark, tmp_table_dir):
    """Every poll commits a rollup snapshot; cadenced expiry must bound
    the metadata and on-disk files while the state stays converged."""
    spec = ChangelogSpec(n_events=1600, n_convs=30, n_chunks=8)
    chunks = write_changelog_chunks(
        spark, spec, os.path.join(tmp_table_dir, "clre")
    )
    up = TranscriptCdc(
        spark, os.path.join(tmp_table_dir, "upre"), n_buckets=2,
        mode="mor", compact_every=0,
    )
    roll = IncrementalConvRollup(
        spark, up.table_path, os.path.join(tmp_table_dir, "rollre"),
        n_buckets=2, expire_every=3, keep_snapshots=2,
    )
    for i in range(len(chunks)):
        run_batched(spark, up, chunks[: i + 1])
        roll.run_until_idle()
    assert _materialized(roll) == _recompute(up)
    # 8 data polls with expiry every 3: history bounded, never O(polls)
    assert len(roll.table.versions()) <= 2 + 3
    import os as _os

    data_dir = os.path.join(roll.table.path, "data")
    n_files = sum(
        1 for _r, _d, fns in _os.walk(data_dir) for f in fns
        if f.endswith(".parquet")
    )
    live = sum(1 for _ in roll.table.snapshot().files)
    # expiry deleted the unreferenced generations (allow the retained
    # time-travel window's worth of extras)
    assert n_files <= live * (2 + 3)


def test_rollup_retention_bounded_across_session_restarts(spark, tmp_table_dir):
    """Expiry keys on the rollup's surviving snapshot count, not an
    in-memory poll counter (r8 streaming-soak bug class): a FRESH rollup
    instance per wave — run_stream constructs one per invocation — must
    still expire even though each instance polls fewer than expire_every
    times."""
    spec = ChangelogSpec(n_events=1600, n_convs=30, n_chunks=8)
    chunks = write_changelog_chunks(
        spark, spec, os.path.join(tmp_table_dir, "clrr")
    )
    up = TranscriptCdc(
        spark, os.path.join(tmp_table_dir, "uprr"), n_buckets=2,
        mode="mor", compact_every=0,
    )
    roll_path = os.path.join(tmp_table_dir, "rollrr")
    for i in range(len(chunks)):  # one instance per wave: 1 poll each
        run_batched(spark, up, chunks[: i + 1])
        roll = IncrementalConvRollup(
            spark, up.table_path, roll_path,
            n_buckets=2, expire_every=3, keep_snapshots=2,
        )
        roll.run_until_idle()
    assert _materialized(roll) == _recompute(up)
    assert len(roll.table.versions()) <= 2 + 3


def test_rollup_survives_upstream_compaction(spark, tmp_table_dir):
    """Compaction rewrites every row into new files; the re-emitted
    unchanged rows must zero out (no delta) and the rollup must stay
    exactly converged."""
    from mimic_spark.lakehouse.maintenance import compact

    spec = ChangelogSpec(n_events=1000, n_convs=25, n_chunks=2)
    chunks = write_changelog_chunks(
        spark, spec, os.path.join(tmp_table_dir, "clrc")
    )
    up = TranscriptCdc(
        spark, os.path.join(tmp_table_dir, "uprc"), n_buckets=4,
        mode="mor", compact_every=0,
    )
    roll = IncrementalConvRollup(
        spark, up.table_path, os.path.join(tmp_table_dir, "rollrc"),
        n_buckets=2,
    )
    run_batched(spark, up, chunks)
    roll.run_until_idle()
    before = _materialized(roll)
    rollup_v = roll.table.latest_version()

    compact(up.table)
    roll.run_until_idle()
    assert _materialized(roll) == before == _recompute(up)
    # the compaction poll changed no aggregates: cursor-only commit(s)
    for v in range(rollup_v + 1, roll.table.latest_version() + 1):
        assert roll.table.snapshot(v).op == "rollup-cursor"


def test_rollup_max_ts_reserve_underflow_refill(spark, tmp_table_dir):
    """Deletes that exhaust a conversation's whole ts-reserve (reserve_k=2
    here) must trigger the targeted upstream refill and keep max_ts exact —
    the one case delta maintenance alone cannot answer.  Also covers a
    ts-LOWERING update (retraction of the current max via update, absorbed
    by the reserve without any refill)."""
    import datetime as dt

    SCHEMA = (
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp, lsn long, op string"
    )
    base = dt.datetime(2025, 1, 1)

    def ts(c, t):
        return base + dt.timedelta(minutes=100 * c + t)

    up = TranscriptCdc(
        spark, os.path.join(tmp_table_dir, "upuf"), n_buckets=4,
        mode="mor", compact_every=0,
    )
    rows = [
        (f"c{c}", t, "user", f"turn {t}", None, ts(c, t), c * 100 + t, "insert")
        for c in range(3)
        for t in range(10)
    ]
    up.apply_batch(spark.createDataFrame(rows, SCHEMA), 0)
    roll = IncrementalConvRollup(
        spark, up.table_path, os.path.join(tmp_table_dir, "rolluf"),
        n_buckets=2, reserve_k=2,
    )
    roll.run_until_idle()
    assert _materialized(roll) == _recompute(up)
    assert roll.reserve_refills == 0

    # three rounds of "delete every conversation's top-2 turns" — each
    # round empties every reserve (reserve_k=2), forcing a refill
    lsn = 10_000
    for rnd in range(3):
        live = up.read_published().collect()
        top: dict = {}
        for r in live:
            top.setdefault(r["conv_id"], []).append((r["ts"], r["turn_idx"]))
        dels = []
        for c, pairs in top.items():
            for _, t in sorted(pairs, reverse=True)[:2]:
                lsn += 1
                dels.append((c, t, None, None, None, None, lsn, "delete"))
        up.apply_batch(spark.createDataFrame(dels, SCHEMA), 1 + rnd)
        roll.run_until_idle()
        assert _materialized(roll) == _recompute(up), f"round {rnd}"
    assert roll.reserve_refills == 3

    # ts-lowering update: the current max turn moves BELOW every other
    # turn; the reserve absorbs the retraction locally (no new refill)
    refills_before = roll.reserve_refills
    live = sorted(
        up.read_published().collect(), key=lambda r: r["ts"], reverse=True
    )
    mx = live[0]
    lsn += 1
    upd = [(
        mx["conv_id"], mx["turn_idx"], "user", "moved back", None,
        base - dt.timedelta(days=1), lsn, "update",
    )]
    up.apply_batch(spark.createDataFrame(upd, SCHEMA), 10)
    roll.run_until_idle()
    assert _materialized(roll) == _recompute(up)
    assert roll.reserve_refills == refills_before


def test_rollup_reserve_watermark_blocks_low_readmission(spark, tmp_table_dir):
    """The r5 ADVICE counterexample: a batch that deletes a reserve member
    AND inserts a turn below the old reserve minimum must NOT admit the low
    turn into the freed slot — live non-reserve turns with higher ts exist,
    and a later delete of the remaining reserve member would leave max_ts
    anchored to the low turn, silently wrong forever.  The eviction
    watermark (ts_floor) discards the below-watermark addition instead."""
    import datetime as dt

    SCHEMA = (
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp, lsn long, op string"
    )
    base = dt.datetime(2025, 1, 1)

    def ts(m):
        return base + dt.timedelta(minutes=m)

    up = TranscriptCdc(
        spark, os.path.join(tmp_table_dir, "upwm"), n_buckets=2,
        mode="mor", compact_every=0,
    )
    roll = IncrementalConvRollup(
        spark, up.table_path, os.path.join(tmp_table_dir, "rollwm"),
        n_buckets=2, reserve_k=2,
    )
    # turns ts=10,20,30,40: reserve={40,30}, watermark rises to 20 (sliced)
    up.apply_batch(
        spark.createDataFrame(
            [("c", t, "user", f"t{t}", None, ts(10 * t), t, "insert")
             for t in (1, 2, 3, 4)],
            SCHEMA,
        ),
        0,
    )
    roll.run_until_idle()
    assert _materialized(roll) == _recompute(up)

    # one batch: delete the max turn (ts=40) AND insert ts=5 — the freed
    # reserve slot must NOT be filled by the below-watermark addition
    up.apply_batch(
        spark.createDataFrame(
            [
                ("c", 4, None, None, None, None, 100, "delete"),
                ("c", 9, "user", "low", None, ts(5), 101, "insert"),
            ],
            SCHEMA,
        ),
        1,
    )
    roll.run_until_idle()
    assert _materialized(roll) == _recompute(up)  # max_ts = 30

    # delete the last original reserve member (ts=30): the reserve empties
    # (the low turn was never admitted) -> targeted refill, max_ts = 20
    refills = roll.reserve_refills
    up.apply_batch(
        spark.createDataFrame(
            [("c", 3, None, None, None, None, 102, "delete")], SCHEMA
        ),
        2,
    )
    roll.run_until_idle()
    assert _materialized(roll) == _recompute(up)  # max_ts = 20, not 5
    assert roll.reserve_refills == refills + 1

    # and once more down to the genuinely-low region: refill reset the
    # watermark, so ts=10 / ts=5 are reachable again
    up.apply_batch(
        spark.createDataFrame(
            [("c", 2, None, None, None, None, 103, "delete")], SCHEMA
        ),
        3,
    )
    roll.run_until_idle()
    assert _materialized(roll) == _recompute(up)  # max_ts = 10
    up.apply_batch(
        spark.createDataFrame(
            [("c", 1, None, None, None, None, 104, "delete")], SCHEMA
        ),
        4,
    )
    roll.run_until_idle()
    assert _materialized(roll) == _recompute(up)  # max_ts = 5 (the low turn)

def test_rollup_fallback_paths_no_wide_driver_collect(
    spark, tmp_table_dir, monkeypatch
):
    """r5 verdict wrong #1 done-criteria: with max_point_keys=0 every key
    path takes the bucket-scan + semi-join fallback, the poll converges to
    the full-recompute oracle, and NO DataFrame.collect during the polls
    returns more rows than the bucket count — i.e. no collect of width
    O(changed keys) exists anywhere (same poisoning style as
    test_changefeed_single_pass_poll)."""
    import datetime as dt

    import pyspark.sql.classic.dataframe as _cdfmod

    SCHEMA = (
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp, lsn long, op string"
    )
    base = dt.datetime(2025, 1, 1)
    up = TranscriptCdc(
        spark, os.path.join(tmp_table_dir, "upnc"), n_buckets=4,
        mode="mor", compact_every=0,
    )
    roll = IncrementalConvRollup(
        spark, up.table_path, os.path.join(tmp_table_dir, "rollnc"),
        n_buckets=4, max_point_keys=0, reserve_k=2,
    )
    lsn = 0

    def batch(rows, bid):
        nonlocal lsn
        out = []
        for conv, turn, op in rows:
            lsn += 1
            out.append((
                conv, turn, "user", f"{conv}-{turn}" if op != "delete" else None,
                None, base + dt.timedelta(minutes=lsn) if op != "delete" else None,
                lsn, op,
            ))
        up.apply_batch(spark.createDataFrame(out, SCHEMA), bid)

    batch([(f"c{i}", t, "insert") for i in range(20) for t in range(4)], 0)
    roll.run_until_idle()  # bootstrap poll, unguarded (no assertion yet)
    assert _materialized(roll) == _recompute(up)

    # poison collect: during guarded polls, any driver collect must be
    # bounded by the bucket count (4), never by the changed-key count (20+)
    orig = _cdfmod.DataFrame.collect
    widths: list[int] = []

    def guarded(self):
        rows = orig(self)
        widths.append(len(rows))
        assert len(rows) <= 4, f"driver collect of width {len(rows)}"
        return rows

    monkeypatch.setattr(_cdfmod.DataFrame, "collect", guarded)
    # updates + deletes touching EVERY conversation, incl. reserve-emptying
    # deletes of each conversation's top-2 turns by ts (after the update,
    # that is turn 0 — fresh high ts — and turn 3), forcing the refill path
    batch([(f"c{i}", 0, "update") for i in range(20)], 1)
    roll.run_until_idle()
    batch(
        [(f"c{i}", t, "delete") for i in range(20) for t in (0, 3)], 2
    )
    roll.run_until_idle()
    assert roll.reserve_refills >= 1
    monkeypatch.setattr(_cdfmod.DataFrame, "collect", orig)
    assert widths, "poisoned collect never ran"
    assert _materialized(roll) == _recompute(up)
