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
