"""Debezium-style JSON WAL envelope source: exact encode/decode round-trip,
CDC replay equality vs the python oracle through the JSON tail (batch AND
Structured Streaming), and poisoned lines degrading to DLQ rows."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from mimic_spark.functions.normalize import normalize_text_py
from mimic_spark.sources.changelog import (
    ChangelogSpec,
    gen_changelog_df,
    replay_oracle_py,
)
from mimic_spark.sources.wal_json import (
    encode_wal_envelope,
    write_wal_json_chunks,
)
from mimic_spark.streaming.apply import TranscriptCdc, run_batched
from mimic_spark.streaming.cdc import run_stream

SPEC = ChangelogSpec(n_events=4000, n_convs=100, n_chunks=5)


def _canon(rows):
    return sorted(
        (r["lsn"], r["op"], r["conv_id"], r["turn_idx"], r["role"], r["text"],
         r["tool"], r["ts"])
        for r in rows
    )


def test_wal_envelope_round_trip_exact(spark):
    """decode(encode(events)) == events, field for field — including
    timestamps (epoch-micros payload encoding, no tz drift) and delete
    events whose identity rides the before-image."""
    events = gen_changelog_df(spark, SPEC, with_batch_hint=False)
    back = encode_wal_envelope(events)
    from mimic_spark.sources.wal_json import parse_wal_envelope

    decoded = parse_wal_envelope(back)
    assert _canon(decoded.collect()) == _canon(events.collect())

    # envelope shape spot-checks: op codes, micros ts, delete before-image
    line = json.loads(
        back.filter(F.col("value").contains('"op":"d"')).first()["value"]
    )
    assert line["op"] == "d" and "after" not in line
    assert isinstance(line["before"]["ts_micros"], int)
    assert line["source"]["table"] == "transcripts"


def test_wal_json_cdc_replay_matches_oracle(spark, tmp_table_dir):
    """Full CDC replay through the JSON WAL tail (batch reader) converges to
    the python replay oracle — same bar the parquet path is held to."""
    chunks = write_wal_json_chunks(
        spark, SPEC, os.path.join(tmp_table_dir, "wal")
    )
    assert len(chunks) == SPEC.n_chunks
    cdc = TranscriptCdc(
        spark, os.path.join(tmp_table_dir, "transcripts"), n_buckets=8
    )
    run_batched(spark, cdc, chunks, source="wal_json")
    got = sorted(
        tuple(r)
        for r in cdc.read_published()
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
        .collect()
    )
    state = replay_oracle_py(SPEC, normalize=normalize_text_py)
    want = sorted(
        (k[0], k[1], v["role"], v["text"], v["tool"], v["ts"])
        for k, v in state.items()
    )
    assert got == want


def test_wal_json_stream_end_to_end(spark, tmp_table_dir):
    """The same JSON tail through Structured Streaming (readStream.text ->
    decode -> foreachBatch merge)."""
    write_wal_json_chunks(spark, SPEC, os.path.join(tmp_table_dir, "wal"))
    cdc = run_stream(
        spark,
        os.path.join(tmp_table_dir, "wal", "wal-*"),
        os.path.join(tmp_table_dir, "transcripts"),
        os.path.join(tmp_table_dir, "ckpt"),
        max_files_per_trigger=2,
        source="wal_json",
    )
    state = replay_oracle_py(SPEC, normalize=normalize_text_py)
    got = sorted(
        tuple(r)
        for r in cdc.read_published()
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
        .collect()
    )
    assert got == [
        (k[0], k[1], v["role"], v["text"], v["tool"], v["ts"])
        for k, v in sorted(state.items())
    ]


def test_wal_json_poisoned_lines_quarantined(spark, tmp_table_dir):
    """Corrupt JSON, payload-less envelopes, and unknown op codes reach the
    DLQ with their raw content recoverable; valid lines still apply."""
    spec = ChangelogSpec(n_events=500, n_convs=20, n_chunks=1)
    chunks = write_wal_json_chunks(
        spark, spec, os.path.join(tmp_table_dir, "wal")
    )
    poison = [
        "this is not json at all {{{",
        json.dumps({"op": "u", "ts_ms": 1}),  # parses, but no image
        json.dumps(
            {
                "op": "t",  # Debezium truncate — unsupported here
                "source": {"lsn": 999_999},
                "after": {"conv_id": "cX", "turn_idx": 1, "ts_micros": 1},
            }
        ),
    ]
    extra = os.path.join(tmp_table_dir, "wal", "wal-00000", "poison.txt")
    with open(extra, "w") as f:
        f.write("\n".join(poison) + "\n")

    cdc = TranscriptCdc(
        spark, os.path.join(tmp_table_dir, "transcripts"), n_buckets=4
    )
    run_batched(spark, cdc, chunks, source="wal_json")

    rejects = cdc.read_rejects().collect()
    reasons = sorted(r["reject_reason"] for r in rejects)
    # corrupt + imageless lines have no lsn; the unknown op keeps its lsn
    assert reasons == ["bad op: t", "null lsn", "null lsn"]
    assert {r["lsn"] for r in rejects if r["reject_reason"] == "bad op: t"} == {
        999_999
    }
    # the raw corrupt line survives inside the DLQ event payload
    raws = [json.loads(r["event"]).get("text") for r in rejects]
    assert "this is not json at all {{{" in raws

    # and the valid stream still converged to the oracle
    state = replay_oracle_py(spec, normalize=normalize_text_py)
    assert cdc.read_published().count() == len(state)
