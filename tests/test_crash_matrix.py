"""Crash matrix (r6 verdict Next #6): instead of one hand-picked crash test
per subsystem, inject a simulated process death immediately AFTER EVERY
commit boundary in a representative end-to-end chain —

    DLQ quarantine -> data merge -> metrics -> ledger -> DLQ replay
    (merge/metrics/ledger/replay-watermark) -> rollup cursor commits ->
    WAP stage -> WAP publish

— then resume the pipeline cold and assert it converges to the
never-crashed oracle's state with the audit green.  "After the commit" is
the hard half of each boundary: the atomic snapshot landed but every
subsequent step of the chain is missing, so recovery must skip, heal, or
redo depending on which table moved.

The injection wraps SnapshotTable.commit itself, so the matrix
automatically covers every NEW commit the chain grows in future rounds
(the commit count is asserted, not assumed).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from mimic_spark.lakehouse.table import SnapshotTable
from mimic_spark.lakehouse.wap import publish, stage, staged_version
from mimic_spark.streaming.apply import TranscriptCdc
from mimic_spark.streaming.audit import run_audit
from mimic_spark.streaming.rollup import IncrementalConvRollup

SCHEMA = (
    "conv_id string, turn_idx int, role string, text string,"
    " tool string, ts timestamp, lsn long, op string"
)


class InjectedCrash(RuntimeError):
    pass


def _pipeline(spark, root: str) -> TranscriptCdc:
    """The full chain, written RESUMABLE: every step is a skip/heal/redo
    no-op when its effects already committed — re-running from the top is
    exactly what a restarted job does."""
    cdc = TranscriptCdc(
        spark, os.path.join(root, "t"), n_buckets=2, mode="mor",
        compact_every=0,
    )
    b0 = spark.createDataFrame(
        [
            ("cm_a", i, "user", f"turn {i}", None, None, 10 + i, "insert")
            for i in range(6)
        ]
        + [("cm_fix", 1, "user", "fix me", None, None, 30, "bogus")],
        SCHEMA,
    )
    cdc.apply_batch(b0, 0, domain="chunk")
    b1 = spark.createDataFrame(
        [
            ("cm_b", i, "assistant", f"reply {i}", None, None, 40 + i,
             "insert")
            for i in range(4)
        ]
        + [("cm_a", 2, "user", "edited", None, None, 50, "update")],
        SCHEMA,
    )
    cdc.apply_batch(b1, 1, domain="chunk")
    cdc.replay_rejects(fix=lambda df: df.withColumn("op", F.lit("insert")))

    roll = IncrementalConvRollup(
        spark,
        os.path.join(root, "t"),
        os.path.join(root, "roll"),
        n_buckets=2,
    )
    roll.run_until_idle()

    pub_path = os.path.join(root, "pub")
    published = cdc.read_published()
    if not SnapshotTable.exists(pub_path):
        SnapshotTable.create(
            spark, pub_path, published.schema, ["conv_id", "turn_idx"], 2
        )
    pub = SnapshotTable(spark, pub_path)
    if pub.props().get("wap.published") != "w1":
        if staged_version(pub, "w1") is None:
            stage(pub, published, "w1")
        publish(pub, "w1", audit=lambda df: df.count())
    return cdc


def _state(spark, root: str):
    """Convergence fingerprint: published data, rollup content (excluding
    the poll-cadence-dependent src_version), WAP table content.  LSNs are
    excluded — a crash inside the replay step legitimately re-mints fresh
    ones (at-least-once, value-idempotent)."""
    cdc = TranscriptCdc(
        spark, os.path.join(root, "t"), n_buckets=2, mode="mor",
        compact_every=0,
    )
    data = sorted(
        (r["conv_id"], r["turn_idx"], r["role"], r["text"])
        for r in cdc.read_published().collect()
    )
    roll = sorted(
        (r["conv_id"], r["n_turns"], r["n_chars"], r["max_ts"])
        for r in SnapshotTable(spark, os.path.join(root, "roll"))
        .read()
        .filter(~F.coalesce(F.col("_deleted"), F.lit(False)))
        .collect()
    )
    # the WAP table is a plain published copy (no internal columns)
    pub = sorted(
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in SnapshotTable(spark, os.path.join(root, "pub"))
        .read()
        .collect()
    )
    return data, roll, pub


def _install_crash(after_n: int | None):
    """Wrap SnapshotTable.commit: the commit LANDS, then the process 'dies'
    when the global commit counter hits after_n.  Returns (counter,
    restore)."""
    orig = SnapshotTable.commit
    counter = {"n": 0}

    def wrapper(self, **kw):
        snap = orig(self, **kw)
        counter["n"] += 1
        if after_n is not None and counter["n"] == after_n:
            raise InjectedCrash(
                f"crash after commit #{after_n} "
                f"(op={kw.get('op')!r} on {os.path.basename(self.path)})"
            )
        return snap

    SnapshotTable.commit = wrapper
    return counter, lambda: setattr(SnapshotTable, "commit", orig)


def test_crash_matrix_converges_at_every_commit_boundary(
    spark, tmp_table_dir
):
    # oracle: the never-crashed run (also measures the commit count K)
    oracle_root = os.path.join(tmp_table_dir, "oracle")
    counter, restore = _install_crash(None)
    try:
        oracle_cdc = _pipeline(spark, oracle_root)
    finally:
        restore()
    k = counter["n"]
    # the chain must expose at least the six named boundaries (quarantine,
    # data merge, metrics, ledger, rollup cursor, wap publish) — in
    # practice it is well above that
    assert k >= 10, f"pipeline only produced {k} commits"
    want = _state(spark, oracle_root)
    run_audit(oracle_cdc, max_reject_ratio=0.2)

    failures = []
    for inj in range(1, k + 1):
        root = os.path.join(tmp_table_dir, f"crash{inj:02d}")
        shutil.rmtree(root, ignore_errors=True)
        counter, restore = _install_crash(inj)
        try:
            _pipeline(spark, root)
            crashed = False
        except InjectedCrash:
            crashed = True
        finally:
            restore()
        assert crashed, f"injection point {inj} never reached (k={k})"
        # cold resume: run the whole chain again, no injection
        cdc = _pipeline(spark, root)
        got = _state(spark, root)
        if got != want:
            failures.append(f"injection after commit #{inj}: state diverged")
            continue
        rep = run_audit(cdc, max_reject_ratio=0.2, fail_on_error=False)
        if rep.failures:
            failures.append(
                f"injection after commit #{inj}: audit failed {rep.failures}"
            )
    assert not failures, "\n".join(failures)
