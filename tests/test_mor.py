"""Merge-on-read mode: equality with COW/oracle, auto-compaction, mixed mode."""

from __future__ import annotations

import os

from mimic_spark.functions.normalize import normalize_text_py
from mimic_spark.sources.changelog import (
    ChangelogSpec,
    replay_oracle_py,
    write_changelog_chunks,
)
from mimic_spark.streaming.apply import TranscriptCdc, run_batched

SPEC = ChangelogSpec(n_events=6000, n_convs=120, n_chunks=6)


def _oracle_rows(spec):
    state = replay_oracle_py(spec, normalize=normalize_text_py)
    return sorted(
        (k[0], k[1], v["role"], v["text"], v["tool"], v["ts"])
        for k, v in state.items()
    )


def _rows(cdc):
    df = cdc.read_published().select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts"
    )
    return sorted(tuple(r) for r in df.collect())


def test_mor_matches_oracle_with_autocompact(spark, tmp_table_dir):
    chunks = write_changelog_chunks(
        spark, SPEC, os.path.join(tmp_table_dir, "changelog")
    )
    cdc = TranscriptCdc(
        spark,
        os.path.join(tmp_table_dir, "transcripts"),
        mode="mor",
        compact_every=3,
    )
    results = run_batched(spark, cdc, chunks)
    assert all(r.mode == "mor" and not r.skipped for r in results)
    assert _rows(cdc) == _oracle_rows(SPEC)
    # auto-compaction ran (6 batches, every 3): latest snapshot has deltas
    # only from the post-compaction batches
    files = cdc.table.snapshot().files
    assert any(not f.get("delta") for f in files)  # compacted base exists
    assert cdc.high_watermark() == SPEC.n_events - 1


def test_mor_delta_accumulation_and_resolution(spark, tmp_table_dir):
    chunks = write_changelog_chunks(
        spark, SPEC, os.path.join(tmp_table_dir, "changelog")
    )
    cdc = TranscriptCdc(
        spark,
        os.path.join(tmp_table_dir, "transcripts"),
        mode="mor",
        compact_every=0,  # never compact: pure delta resolution
    )
    run_batched(spark, cdc, chunks)
    files = cdc.table.snapshot().files
    assert all(f.get("delta") for f in files)
    assert _rows(cdc) == _oracle_rows(SPEC)


def test_mor_replay_idempotent(spark, tmp_table_dir):
    chunks = write_changelog_chunks(
        spark, SPEC, os.path.join(tmp_table_dir, "changelog")
    )
    cdc = TranscriptCdc(
        spark, os.path.join(tmp_table_dir, "transcripts"), mode="mor"
    )
    run_batched(spark, cdc, chunks)
    before = _rows(cdc)
    replay = run_batched(spark, cdc, chunks)
    assert all(r.skipped for r in replay)
    assert _rows(cdc) == before


def test_mixed_mor_then_cow(spark, tmp_table_dir):
    """COW merge over a table holding MoR deltas resolves them correctly."""
    chunks = write_changelog_chunks(
        spark, SPEC, os.path.join(tmp_table_dir, "changelog")
    )
    cdc = TranscriptCdc(
        spark,
        os.path.join(tmp_table_dir, "transcripts"),
        mode="mor",
        compact_every=0,
    )
    run_batched(spark, cdc, chunks[:3])
    cdc.mode = "cow"
    run_batched(spark, cdc, chunks)  # first 3 skip, rest apply as COW
    assert _rows(cdc) == _oracle_rows(SPEC)


def test_scd2_history_from_deltas(spark, tmp_table_dir):
    """MoR deltas = full SCD2 history: version intervals chain per key and
    the max-interval row equals the published row."""
    chunks = write_changelog_chunks(
        spark, SPEC, os.path.join(tmp_table_dir, "changelog")
    )
    cdc = TranscriptCdc(
        spark,
        os.path.join(tmp_table_dir, "transcripts"),
        mode="mor",
        compact_every=0,
    )
    run_batched(spark, cdc, chunks)
    hist = cdc.read_history().collect()
    by_key: dict = {}
    for r in hist:
        by_key.setdefault((r["conv_id"], r["turn_idx"]), []).append(r)
    published = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in cdc.read_published().collect()
    }
    multi = 0
    for k, versions in by_key.items():
        versions.sort(key=lambda r: r["valid_from_lsn"])
        if len(versions) > 1:
            multi += 1
        # intervals chain: each version's valid_to == next version's valid_from
        for a, b in zip(versions, versions[1:]):
            assert a["valid_to_lsn"] == b["valid_from_lsn"]
        last = versions[-1]
        assert last["valid_to_lsn"] is None
        if last["is_delete"]:
            assert k not in published
        else:
            assert published[k] == last["text"]
    assert multi > 0  # updates actually produced multi-version histories
