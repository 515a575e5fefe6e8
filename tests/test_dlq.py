"""Dead-letter queue: structurally malformed change events (null key, null
LSN, unknown op) are quarantined with reasons instead of silently merged or
crashing the stream; quarantine is exactly-once under replay; a clean
stream never even creates the DLQ table."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from mimic_spark.sources.changelog import ChangelogSpec, write_changelog_chunks
from mimic_spark.streaming.apply import TranscriptCdc, run_batched

SCHEMA = (
    "conv_id string, turn_idx int, role string, text string,"
    " tool string, ts timestamp, lsn long, op string"
)


def test_dlq_quarantines_malformed_events(spark, tmp_table_dir):
    spec = ChangelogSpec(n_events=1000, n_convs=30, n_chunks=2)
    chunks = write_changelog_chunks(
        spark, spec, os.path.join(tmp_table_dir, "cl")
    )
    cdc = TranscriptCdc(spark, os.path.join(tmp_table_dir, "t"), n_buckets=4)
    run_batched(spark, cdc, chunks)

    # clean stream: the DLQ table was never created (zero cost), and the
    # metrics rows carry rejects=0
    assert not os.path.exists(cdc.table_path + "_rejects")
    assert cdc.read_rejects().count() == 0
    assert (
        cdc.metrics.read().agg(F.sum("rejects")).collect()[0][0] == 0
    )

    wm = cdc.high_watermark()
    n_before = cdc.read_published().count()
    mixed = spark.createDataFrame(
        [
            # 2 valid rows
            ("dlq_ok", 1, "user", "fine", None, None, wm + 1, "insert"),
            ("dlq_ok", 2, "user", "also fine", None, None, wm + 2, "insert"),
            # malformed: null key / null turn / null lsn / unknown op
            (None, 3, "user", "no conv", None, None, wm + 3, "insert"),
            ("dlq_bad", None, "user", "no turn", None, None, wm + 4, "update"),
            ("dlq_bad", 5, "user", "no lsn", None, None, None, "insert"),
            ("dlq_bad", 6, "user", "bad op", None, None, wm + 6, "upsert"),
            # op=NULL: isin() yields NULL, so a non-null-safe check would
            # silently admit this row as a non-delete upsert
            ("dlq_bad", 7, "user", "null op", None, None, wm + 7, None),
        ],
        SCHEMA,
    )
    bid = int(cdc.table.props()["last_batch_id"]) + 1
    res = cdc.apply_batch(mixed, bid)
    assert int(res.rows_applied) == 2

    # published table got ONLY the valid rows
    pub = {
        (r["conv_id"], r["turn_idx"])
        for r in cdc.read_published().collect()
    }
    assert ("dlq_ok", 1) in pub and ("dlq_ok", 2) in pub
    assert not any(k[0] == "dlq_bad" for k in pub)
    assert cdc.read_published().count() == n_before + 2

    # DLQ rows carry the right reasons and the full raw event as JSON
    rej = {
        r["reject_reason"]: r
        for r in cdc.read_rejects().filter(F.col("batch_id") == bid).collect()
    }
    assert set(rej) == {
        "null key: conv_id",
        "null key: turn_idx",
        "null lsn",
        "bad op: upsert",
        "bad op: NULL",
    }
    ev = json.loads(rej["bad op: upsert"]["event"])
    assert ev["conv_id"] == "dlq_bad" and ev["text"] == "bad op"
    assert rej["null lsn"]["lsn"] is None
    assert rej["bad op: upsert"]["lsn"] == wm + 6

    # metrics aggregated exactly 5 rejects for this batch
    got = (
        cdc.metrics.read()
        .filter(F.col("batch_id") == bid)
        .agg(F.sum("rejects"))
        .collect()[0][0]
    )
    assert got == 5

    # replay the same batch id (crash-recovery path): merge skips AND the
    # DLQ does not double-quarantine
    res2 = cdc.apply_batch(mixed, bid)
    assert res2.skipped
    assert cdc.read_rejects().filter(F.col("batch_id") == bid).count() == 5

    # the stream continues normally after a poisoned batch
    cdc.apply_batch(
        spark.createDataFrame(
            [("dlq_ok", 9, "user", "later", None, None, wm + 10, "insert")],
            SCHEMA,
        ),
        bid + 1,
    )
    assert ("dlq_ok", 9) in {
        (r["conv_id"], r["turn_idx"]) for r in cdc.read_published().collect()
    }

    # an ALL-rejected batch applies zero rows but still advances the ledger
    allbad = spark.createDataFrame(
        [(None, 1, "user", "x", None, None, wm + 20, "insert")], SCHEMA
    )
    res3 = cdc.apply_batch(allbad, bid + 2)
    assert not res3.skipped and int(res3.rows_applied) == 0
    assert cdc.high_watermark() == bid + 2 or cdc._ledger_hwm == bid + 2


def test_poison_ratio_audit_gate(spark, tmp_table_dir):
    """The audit gate fails the run when dead-lettered events exceed the
    allowed ratio of the stream — a rotting producer stops the pipeline."""
    import pytest

    from mimic_spark.streaming.audit import AuditError, run_audit

    spec = ChangelogSpec(n_events=600, n_convs=20, n_chunks=1)
    chunks = write_changelog_chunks(
        spark, spec, os.path.join(tmp_table_dir, "clpr")
    )
    cdc = TranscriptCdc(spark, os.path.join(tmp_table_dir, "tpr"), n_buckets=4)
    run_batched(spark, cdc, chunks)
    rep = run_audit(cdc)  # clean stream: ratio 0, default threshold passes
    assert rep.checks["poison_ratio"]["ok"]

    wm = cdc.high_watermark()
    bad = spark.createDataFrame(
        [(None, i, "user", "x", None, None, wm + 1 + i, "insert")
         for i in range(10)]
        + [("ok", 1, "user", "y", None, None, wm + 100, "insert")],
        SCHEMA,
    )
    cdc.apply_batch(bad, int(cdc.table.props()["last_batch_id"]) + 1)

    # 10 rejects over ~611 events ≈ 1.6% > default 1% -> gate trips
    with pytest.raises(AuditError, match="poison_ratio"):
        run_audit(cdc)
    # explicit looser threshold passes and reports the ratio
    rep2 = run_audit(cdc, max_reject_ratio=0.05)
    assert rep2.checks["poison_ratio"]["ok"]
    assert rep2.checks["poison_ratio"]["detail"]["rejects"] == 10
    # disabled -> check absent
    assert "poison_ratio" not in run_audit(cdc, max_reject_ratio=None).checks

def test_poison_ratio_tolerates_pre_dlq_metrics_schema(spark, tmp_table_dir):
    """r5 ADVICE: a metrics table created before the DLQ feature (existing
    checkpoint dir, no new batch applied yet) lacks the 'rejects' column;
    run_audit must report zero rejects, not raise AnalysisException."""
    from pyspark.sql import types as T

    from mimic_spark.lakehouse.table import SnapshotTable
    from mimic_spark.streaming.apply import METRICS_SCHEMA
    from mimic_spark.streaming.audit import run_audit

    path = os.path.join(tmp_table_dir, "tpre")
    old_schema = T.StructType(
        [f for f in METRICS_SCHEMA.fields if f.name != "rejects"]
    )
    SnapshotTable.create(
        spark, path + "_metrics", old_schema, ["batch_id", "partition_id"], 1
    )
    cdc = TranscriptCdc(spark, path, n_buckets=2)
    # no batch applied: the metrics schema still lacks 'rejects'
    assert "rejects" not in cdc.metrics.read().columns
    rep = run_audit(cdc, fail_on_error=False)
    assert rep.checks["poison_ratio"]["ok"]
    assert rep.checks["poison_ratio"]["detail"]["rejects"] == 0

def test_dlq_replay_after_fix(spark, tmp_table_dir):
    """r5 verdict Missing #3: quarantined payloads replay through the
    normal apply pipeline after a declarative fix — fresh LSNs above the
    watermark, still-malformed rows re-quarantine, the replay watermark
    makes a second call a no-op, and state converges by value."""
    cdc = TranscriptCdc(spark, os.path.join(tmp_table_dir, "trp"), n_buckets=2)
    cdc.apply_batch(
        spark.createDataFrame(
            [("seed", 1, "user", "ok", None, None, 10, "insert")], SCHEMA
        ),
        0,
    )
    wm = cdc.high_watermark()
    poisoned = spark.createDataFrame(
        [
            ("seed", 2, "user", "fine", None, None, wm + 1, "insert"),
            ("r", 1, "user", "fixme a", None, None, wm + 2, "upsert"),
            ("r", 2, "user", "fixme b", None, None, wm + 3, None),
            (None, 3, "user", "hopeless", None, None, wm + 4, "insert"),
        ],
        SCHEMA,
    )
    cdc.apply_batch(poisoned, 1)
    assert cdc.read_rejects().count() == 3

    def fix(df):
        repaired = F.when(
            F.coalesce(F.col("op").isin("insert", "update", "delete"),
                       F.lit(False)),
            F.col("op"),
        ).otherwise(F.lit("insert"))
        return df.withColumn("op", repaired).filter(
            F.col("conv_id").isNotNull() & F.col("turn_idx").isNotNull()
        )

    res = cdc.replay_rejects(fix=fix)
    assert res["replayed"] == 3  # all pending parsed + offered to the fix
    assert res["rows_applied"] == 2 and res["re_rejected"] == 0
    pub = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in cdc.read_published().collect()
    }
    assert pub[("r", 1)] == "fixme a" and pub[("r", 2)] == "fixme b"
    # fresh LSNs sit above the pre-replay COMMITTED watermark (wm+1, the
    # only valid row of the poisoned batch); rejected events' raw LSNs
    # were never applied, so that space is free
    assert cdc.high_watermark() == wm + 1 + 2  # two replayed rows

    # watermark advanced: a second replay has nothing pending
    res2 = cdc.replay_rejects(fix=fix)
    assert res2 == {
        "replayed": 0,
        "re_rejected": 0,
        "dropped_stale": 0,
        "batch_id": None,
    }

    # an unfixed replay re-quarantines under the NEW batch id (and those
    # rows become the next call's pending set — no silent loss)
    wm2 = cdc.high_watermark()
    cdc.apply_batch(
        spark.createDataFrame(
            [("x", 9, "user", "still bad", None, None, wm2 + 1, "bogus")],
            SCHEMA,
        ),
        int(cdc.table.props()["last_batch_id"]) + 1,
    )
    res3 = cdc.replay_rejects()  # no fix: op stays bogus
    assert res3["replayed"] == 1 and res3["re_rejected"] == 1
    assert res3["rows_applied"] == 0

def test_all_rejected_batch_on_mor_table(spark, tmp_table_dir):
    """r6 drive finding: an ALL-rejected batch on a MoR table ran a
    zero-task delta write, so the merge's Observation never fired and
    obs.get raised a bare JVM assertion.  The empty MoR batch must commit
    the batch marker (replay skips) and the stream must continue."""
    cdc = TranscriptCdc(
        spark, os.path.join(tmp_table_dir, "tmorall"), n_buckets=2, mode="mor"
    )
    cdc.apply_batch(
        spark.createDataFrame(
            [("seed", 1, "user", "ok", None, None, 1, "insert")], SCHEMA
        ),
        0,
    )
    allbad = spark.createDataFrame(
        [("x", 1, "user", "bad", None, None, 2, "bogus"),
         (None, 2, "user", "bad2", None, None, 3, "insert")],
        SCHEMA,
    )
    res = cdc.apply_batch(allbad, 1)
    assert not res.skipped and int(res.rows_applied) == 0
    assert cdc.read_rejects().count() == 2
    # marker advanced: replaying the batch id skips
    assert cdc.apply_batch(allbad, 1).skipped
    # stream continues; state untouched by the poisoned batch
    cdc.apply_batch(
        spark.createDataFrame(
            [("seed", 2, "user", "later", None, None, 9, "insert")], SCHEMA
        ),
        2,
    )
    assert {(r["conv_id"], r["turn_idx"])
            for r in cdc.read_published().collect()} == {("seed", 1), ("seed", 2)}


def test_replay_id_never_collides_with_resumed_stream_epoch(
    spark, tmp_table_dir
):
    """r6 ADVICE high: replay minted batch_id = ledger_hwm + 1, which is
    exactly the epoch id a resumed stream checkpoint assigns to its NEXT
    real micro-batch — the merge guard then silently skipped that epoch
    while the checkpoint committed it (permanent loss).  With external-id
    remapping (domain="stream"), the post-replay epoch must still apply."""
    from mimic_spark.streaming.audit import run_audit

    cdc = TranscriptCdc(spark, os.path.join(tmp_table_dir, "tcol"), n_buckets=2)
    # stream epochs 0 and 1 (epoch 1 carries a poisoned event)
    cdc.apply_batch(
        spark.createDataFrame(
            [("s", 1, "user", "a", None, None, 10, "insert")], SCHEMA
        ),
        0,
        domain="stream",
    )
    cdc.apply_batch(
        spark.createDataFrame(
            [
                ("s", 2, "user", "b", None, None, 11, "insert"),
                ("p", 1, "user", "poison", None, None, 12, "bogus"),
            ],
            SCHEMA,
        ),
        1,
        domain="stream",
    )
    assert cdc.read_rejects().count() == 1

    # DLQ replay between stream sessions: allocates internal id 2
    res = cdc.replay_rejects(
        fix=lambda df: df.withColumn("op", F.lit("insert"))
    )
    assert res["rows_applied"] == 1 and res["batch_id"] == 2

    # resumed stream: the checkpoint's next epoch id is 2 — the exact value
    # the old code burned for the replay.  It must APPLY, not skip.
    r = cdc.apply_batch(
        spark.createDataFrame(
            [("s", 3, "user", "after-replay", None, None, 20, "insert")],
            SCHEMA,
        ),
        2,
        domain="stream",
    )
    assert not r.skipped and int(r.rows_applied) == 1
    pub = {
        (x["conv_id"], x["turn_idx"]) for x in cdc.read_published().collect()
    }
    assert ("s", 3) in pub and ("p", 1) in pub
    # a genuinely replayed epoch still skips (exactly-once intact)
    assert cdc.apply_batch(
        spark.createDataFrame(
            [("s", 3, "user", "dup delivery", None, None, 20, "insert")],
            SCHEMA,
        ),
        2,
        domain="stream",
    ).skipped
    # internal ids stayed dense: ledger-continuity audit green
    rep = run_audit(cdc, max_reject_ratio=None)
    assert rep.checks["ledger_continuity"]["ok"]


def test_replay_does_not_overwrite_newer_committed_value(
    spark, tmp_table_dir
):
    """r6 ADVICE medium: fresh replay LSNs bypass the merge's staleness
    guard, so a rejected event older than a later committed update for the
    same key must be dropped by the replay's own arbitration — while
    fresh-key rejects in the same replay still apply."""
    cdc = TranscriptCdc(spark, os.path.join(tmp_table_dir, "tstale"), n_buckets=2)
    # batch 0: poisoned event for ("k",1) at ORIGINAL lsn 5, plus a
    # fresh-key poisoned event ("f",1) at lsn 6
    cdc.apply_batch(
        spark.createDataFrame(
            [
                ("k", 1, "user", "old value", None, None, 5, "bogus"),
                ("f", 1, "user", "fresh key", None, None, 6, "bogus"),
            ],
            SCHEMA,
        ),
        0,
    )
    # batch 1: a NEWER valid update for ("k",1) commits at lsn 10
    cdc.apply_batch(
        spark.createDataFrame(
            [("k", 1, "user", "newer value", None, None, 10, "insert")],
            SCHEMA,
        ),
        1,
    )
    res = cdc.replay_rejects(
        fix=lambda df: df.withColumn("op", F.lit("insert"))
    )
    assert res["dropped_stale"] == 1
    assert res["rows_applied"] == 1 and res["re_rejected"] == 0
    pub = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in cdc.read_published().collect()
    }
    assert pub[("k", 1)] == "newer value"  # NOT overwritten by the replay
    assert pub[("f", 1)] == "fresh key"


def test_replay_order_deterministic_for_null_lsn_ties(spark, tmp_table_dir):
    """r6 ADVICE low: two same-key events with NULL LSNs in one DLQ batch
    tied on every replay sort key, so which value won the merge was plan-
    nondeterministic.  The content-hash tiebreak pins the winner: the event
    whose xxhash64 over the replay row is larger gets the higher fresh LSN
    and wins last-writer-wins."""
    path = os.path.join(tmp_table_dir, "ttie")
    cdc = TranscriptCdc(spark, path, n_buckets=2)
    cdc.apply_batch(
        spark.createDataFrame(
            [
                ("n", 1, "user", "candidate A", None, None, None, "insert"),
                ("n", 1, "user", "candidate B", None, None, None, "insert"),
            ],
            SCHEMA,
        ),
        0,
    )
    assert cdc.read_rejects().count() == 2  # both: null lsn
    res = cdc.replay_rejects()
    assert res["replayed"] == 2 and res["re_rejected"] == 0
    got = {
        r["text"] for r in cdc.read_published().collect()
    }
    assert len(got) == 1
    # white-box twin of the replay's tiebreak: same column layout as the
    # parsed replay rows (_dlq_batch + payload + lsn + op), larger
    # xxhash64 -> higher fresh LSN -> wins
    payload = [
        f.name for f in cdc.table.schema().fields if not f.name.startswith("_")
    ]
    rows = cdc.read_rejects().select(
        F.col("batch_id").alias("_dlq_batch"),
        F.from_json(
            "event",
            ", ".join(
                [f"{c} {cdc.table.schema()[c].dataType.simpleString()}" for c in payload]
                + ["lsn long", "op string"]
            ),
        ).alias("e"),
    ).select("_dlq_batch", "e.*")
    expected = (
        rows.withColumn(
            "_h", F.xxhash64(*[F.col(c) for c in sorted(rows.columns)])
        )
        .orderBy(F.col("_h").desc())
        .limit(1)
        .collect()[0]["text"]
    )
    assert got == {expected}


def test_redelivered_epoch_after_later_replay_no_dup_dlq(spark, tmp_table_dir):
    """r7 ADVICE medium: a replayed external id used to map onto the CURRENT
    head internal id and still run prepare + quarantine.  When another
    internal batch (a DLQ replay between stream sessions) committed after
    the epoch's original application, the head id postdated the epoch's
    original id, the rejects table's ``last_batch_id >= batch_id`` guard no
    longer matched, and the epoch's reject rows entered the DLQ a SECOND
    time — which the next replay_rejects replayed again.  The re-delivery
    must short-circuit: merge skips AND zero new DLQ rows."""
    from mimic_spark.streaming.audit import run_audit

    cdc = TranscriptCdc(spark, os.path.join(tmp_table_dir, "tdup"), n_buckets=2)
    epoch0 = [
        ("s", 1, "user", "good", None, None, 10, "insert"),
        ("p", 1, "user", "poison", None, None, 11, "bogus"),
    ]
    cdc.apply_batch(spark.createDataFrame(epoch0, SCHEMA), 0, domain="stream")
    assert cdc.read_rejects().count() == 1

    # a LATER internal batch commits between stream sessions: DLQ replay
    res = cdc.replay_rejects(fix=lambda df: df.withColumn("op", F.lit("insert")))
    assert res["rows_applied"] == 1

    # crash-style re-delivery of epoch 0 under the same external id
    r = cdc.apply_batch(spark.createDataFrame(epoch0, SCHEMA), 0, domain="stream")
    assert r.skipped
    assert cdc.read_rejects().count() == 1  # pre-fix: 2 (duplicate DLQ row)
    # and nothing new for a second replay pass to pick up
    res2 = cdc.replay_rejects(fix=lambda df: df.withColumn("op", F.lit("insert")))
    assert res2["replayed"] == 0

    pub = {
        (x["conv_id"], x["turn_idx"]): x["text"]
        for x in cdc.read_published().collect()
    }
    assert pub == {("s", 1): "good", ("p", 1): "poison"}
    rep = run_audit(cdc, max_reject_ratio=None)
    assert rep.checks["ledger_continuity"]["ok"]


def test_run_batched_chunks_after_replay_still_apply(spark, tmp_table_dir):
    """Batch-mode twin of the id-collision fix: chunk indexes are external
    ids, so chunks arriving AFTER a DLQ replay must apply instead of being
    swallowed by the replay's internal id, and earlier chunks still skip."""
    spec = ChangelogSpec(n_events=2000, n_convs=40, n_chunks=4)
    chunks = write_changelog_chunks(
        spark, spec, os.path.join(tmp_table_dir, "clra")
    )
    cdc = TranscriptCdc(spark, os.path.join(tmp_table_dir, "tra"), n_buckets=4)
    run_batched(spark, cdc, chunks[:2])
    wm = cdc.high_watermark()
    cdc.apply_batch(
        spark.createDataFrame(
            [("rr", 1, "user", "fixable", None, None, wm + 1, "bogus")],
            SCHEMA,
        ),
        int(cdc.table.props()["last_batch_id"]) + 1,
    )
    res = cdc.replay_rejects(
        fix=lambda df: df.withColumn("op", F.lit("insert"))
    )
    assert res["rows_applied"] == 1
    results = run_batched(spark, cdc, chunks)  # 0-1 skip, 2-3 MUST apply
    assert [r.skipped for r in results] == [True, True, False, False]

    # final state = clean-path oracle (all chunks, no replay detour) plus
    # the replayed row
    oracle = TranscriptCdc(
        spark, os.path.join(tmp_table_dir, "tra_oracle"), n_buckets=4
    )
    run_batched(spark, oracle, chunks)
    got = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in cdc.read_published().collect()
    }
    want = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in oracle.read_published().collect()
    }
    want[("rr", 1)] = "fixable"
    assert got == want
