"""E2E: synthetic changelog -> CDC apply -> final table == pure-Python replay.

The reference's analog is its mock end-to-end pipeline test
(test/py/test_mock_e2e.py) + determinism test
(test/py/test_deterministic_load_row_id.py); here the oracle is a sequential
LSN-ordered replay and the invariant is per-turn text equality under stable
(conv_id, turn_idx) ordering — exactly the BASELINE.json contract.
"""

from __future__ import annotations

import os

import pytest

from mimic_spark.functions.normalize import normalize_text_py
from mimic_spark.sources.changelog import (
    ChangelogSpec,
    gen_changelog_df,
    gen_events_py,
    replay_oracle_py,
    write_changelog_chunks,
)
from mimic_spark.streaming.apply import TranscriptCdc, run_batched

SPEC = ChangelogSpec(n_events=6000, n_convs=120, n_chunks=6)


def _final_rows(cdc: TranscriptCdc) -> list[tuple]:
    df = cdc.read_published().select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts"
    )
    return sorted(
        [tuple(r) for r in df.collect()], key=lambda r: (r[0], r[1])
    )


def _oracle_rows(spec: ChangelogSpec) -> list[tuple]:
    state = replay_oracle_py(spec, normalize=normalize_text_py)
    rows = [
        (k[0], k[1], v["role"], v["text"], v["tool"], v["ts"])
        for k, v in state.items()
    ]
    return sorted(rows, key=lambda r: (r[0], r[1]))


def test_generator_twins_agree(spark):
    """Spark-columnar generator == pure-Python generator, event for event."""
    spec = ChangelogSpec(n_events=2000, n_convs=50, n_chunks=4)
    got = sorted(
        [tuple(r) for r in gen_changelog_df(spark, spec).collect()],
        key=lambda r: (r[0], r[8]),
    )
    want = sorted(
        [
            (
                e["lsn"], e["op"], e["conv_id"], e["turn_idx"], e["role"],
                e["text"], e["tool"], e["ts"], e["batch_hint"],
            )
            for e in gen_events_py(spec)
        ],
        key=lambda r: (r[0], r[8]),
    )
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g == w, f"mismatch: {g} != {w}"


def test_cdc_e2e_matches_replay_oracle(spark, tmp_table_dir):
    chunks = write_changelog_chunks(
        spark, SPEC, os.path.join(tmp_table_dir, "changelog")
    )
    cdc = TranscriptCdc(spark, os.path.join(tmp_table_dir, "transcripts"))
    results = run_batched(spark, cdc, chunks)
    assert all(not r.skipped for r in results)
    assert sum(r.inserts for r in results) > 0
    assert sum(r.deletes for r in results) > 0

    got = _final_rows(cdc)
    want = _oracle_rows(SPEC)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g == w, f"row mismatch: {g} != {w}"

    # high watermark reached the end of the stream
    assert cdc.high_watermark() == SPEC.n_events - 1


def test_cdc_replay_is_idempotent(spark, tmp_table_dir):
    """Re-applying every batch (same batch ids) changes nothing — the
    reference's fingerprint-skip behavior (should_skip_load)."""
    chunks = write_changelog_chunks(
        spark, SPEC, os.path.join(tmp_table_dir, "changelog")
    )
    cdc = TranscriptCdc(spark, os.path.join(tmp_table_dir, "transcripts"))
    run_batched(spark, cdc, chunks)
    before = _final_rows(cdc)
    v_before = cdc.table.latest_version()

    replay = run_batched(spark, cdc, chunks)  # same batch ids 0..n
    assert all(r.skipped for r in replay)
    assert cdc.table.latest_version() == v_before
    assert _final_rows(cdc) == before


def test_cdc_resume_from_partial(spark, tmp_table_dir):
    """Apply half, then replay ALL chunks (as a checkpoint restart would):
    already-committed batches skip, the rest apply; final state converges."""
    chunks = write_changelog_chunks(
        spark, SPEC, os.path.join(tmp_table_dir, "changelog")
    )
    cdc = TranscriptCdc(spark, os.path.join(tmp_table_dir, "transcripts"))
    run_batched(spark, cdc, chunks[:3])

    cdc2 = TranscriptCdc(spark, os.path.join(tmp_table_dir, "transcripts"))
    results = run_batched(spark, cdc2, chunks)
    assert [r.skipped for r in results] == [True, True, True, False, False, False]
    assert _final_rows(cdc2) == _oracle_rows(SPEC)


def test_schema_evolution_tool_column(spark, tmp_table_dir):
    """Early chunks lack `tool`; the table starts without it; post-evolution
    rows carry it and pre-evolution rows read as NULL."""
    chunks = write_changelog_chunks(
        spark, SPEC, os.path.join(tmp_table_dir, "changelog")
    )
    cdc = TranscriptCdc(spark, os.path.join(tmp_table_dir, "transcripts"))
    assert "tool" not in cdc.table.schema().fieldNames()
    run_batched(spark, cdc, chunks[: SPEC.evolve_chunk])
    assert "tool" not in cdc.table.schema().fieldNames()
    run_batched(spark, cdc, chunks)
    assert "tool" in cdc.table.schema().fieldNames()
    n_tools = cdc.read_published().filter("tool is not null").count()
    assert n_tools > 0


def test_lineage_and_ledger(spark, tmp_table_dir):
    chunks = write_changelog_chunks(
        spark, SPEC, os.path.join(tmp_table_dir, "changelog")
    )
    cdc = TranscriptCdc(spark, os.path.join(tmp_table_dir, "transcripts"))
    results = run_batched(spark, cdc, chunks)

    ledger = {r["batch_id"]: r for r in cdc.ledger.read().collect()}
    assert sorted(ledger) == list(range(len(chunks)))
    for i, res in enumerate(results):
        assert ledger[i]["rows_applied"] == res.inserts + res.updates + res.deletes

    m = cdc.metrics.read()
    agg = m.groupBy("batch_id").count().collect()
    assert len(agg) == len(chunks)
    # per-partition rows_in totals equal the generated event count (+ dups)
    total_in = m.agg({"rows_in": "sum"}).collect()[0][0]
    n_dups = len([e for e in gen_events_py(SPEC)]) - SPEC.n_events
    assert total_in == SPEC.n_events + n_dups


def test_ledger_metrics_bounded_by_meta_compaction(spark, tmp_table_dir):
    """r4 verdict #3: the ledger/metrics tables must not grow one commit +
    one tiny file per batch forever.  They compact + expire on the same
    compact_every cadence as the data table (both COW and MoR streams), so
    after 3x compact_every batches the file and snapshot counts stay
    bounded while every ledger row and the audit's continuity survive."""
    spec = ChangelogSpec(n_events=1800, n_convs=40, n_chunks=6)
    chunks = write_changelog_chunks(
        spark, spec, os.path.join(tmp_table_dir, "clmc")
    )
    cdc = TranscriptCdc(
        spark,
        os.path.join(tmp_table_dir, "tmc"),
        n_buckets=4,
        compact_every=2,  # 6 batches = 3x the cadence
    )
    run_batched(spark, cdc, chunks)

    for t in (cdc.ledger, cdc.metrics):
        # last compaction folded everything to <=1 file/bucket (1 bucket);
        # at most compact_every-1 trailing appends sit on top
        assert len(t.snapshot().files) <= cdc.compact_every, t.path
        # snapshot expiry bounds the _log dir too (keep_last=2 + appends
        # since the last maintenance)
        assert len(t.versions()) <= 2 + 2 * cdc.compact_every, t.path

    # no bookkeeping lost: ledger contiguous, one metrics group per batch
    ledger_ids = sorted(r["batch_id"] for r in cdc.ledger.read().collect())
    assert ledger_ids == list(range(len(chunks)))
    assert cdc.metrics.read().groupBy("batch_id").count().count() == len(chunks)

    from mimic_spark.streaming.audit import run_audit

    rep = run_audit(cdc, fail_on_error=True)
    assert all(v["ok"] for v in rep.checks.values())


def test_resume_from_every_prefix(spark, tmp_table_dir):
    """north_rule: 'resumable from checkpoint ... replay from any checkpoint
    reconverges' — literally every prefix: apply k batches, then replay the
    full stream; the final table must equal the oracle for every k."""
    spec = ChangelogSpec(n_events=1500, n_convs=40, n_chunks=4)
    chunks = write_changelog_chunks(
        spark, spec, os.path.join(tmp_table_dir, "changelog")
    )
    want = _oracle_rows(spec)
    for k in range(len(chunks) + 1):
        path = os.path.join(tmp_table_dir, f"transcripts_k{k}")
        cdc = TranscriptCdc(spark, path, n_buckets=8)
        run_batched(spark, cdc, chunks[:k])
        cdc2 = TranscriptCdc(spark, path, n_buckets=8)  # "restart"
        results = run_batched(spark, cdc2, chunks)
        assert [r.skipped for r in results] == [True] * k + [False] * (
            len(chunks) - k
        )
        assert _final_rows(cdc2) == want, f"diverged when resuming after {k}"
