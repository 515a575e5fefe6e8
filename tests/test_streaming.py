"""Structured Streaming mode: availableNow stream, crash/resume, watermark."""

from __future__ import annotations

import os

import pytest

from mimic_spark.functions.normalize import normalize_text_py
from mimic_spark.sources.changelog import ChangelogSpec, replay_oracle_py, write_changelog_chunks
from mimic_spark.streaming.apply import TranscriptCdc
from mimic_spark.streaming.cdc import run_stream, windowed_rate_metrics

SPEC = ChangelogSpec(n_events=4000, n_convs=100, n_chunks=5)


def _oracle_rows(spec):
    state = replay_oracle_py(spec, normalize=normalize_text_py)
    return sorted(
        (k[0], k[1], v["role"], v["text"], v["tool"], v["ts"])
        for k, v in state.items()
    )


def _published_rows(cdc):
    df = cdc.read_published().select("conv_id", "turn_idx", "role", "text", "tool", "ts")
    return sorted(tuple(r) for r in df.collect())


def test_stream_end_to_end(spark, tmp_table_dir):
    write_changelog_chunks(spark, SPEC, os.path.join(tmp_table_dir, "changelog"))
    cdc = run_stream(
        spark,
        os.path.join(tmp_table_dir, "changelog", "chunk-*"),
        os.path.join(tmp_table_dir, "transcripts"),
        os.path.join(tmp_table_dir, "ckpt"),
        max_files_per_trigger=2,
    )
    assert _published_rows(cdc) == _oracle_rows(SPEC)
    assert cdc.high_watermark() == SPEC.n_events - 1


def test_stream_crash_and_resume(spark, tmp_table_dir):
    """Kill the stream mid-run (injected failure), restart from the same
    checkpoint: the in-flight batch replays, already-committed merges skip,
    and the final table still equals the replay oracle."""
    write_changelog_chunks(spark, SPEC, os.path.join(tmp_table_dir, "changelog"))
    glob = os.path.join(tmp_table_dir, "changelog", "chunk-*")
    table = os.path.join(tmp_table_dir, "transcripts")
    ckpt = os.path.join(tmp_table_dir, "ckpt")

    with pytest.raises(Exception, match="injected failure"):
        run_stream(spark, glob, table, ckpt, fail_after=2)

    cdc = TranscriptCdc(spark, table)
    v_mid = cdc.table.latest_version()
    assert v_mid >= 1  # some batches landed before the crash

    cdc2 = run_stream(spark, glob, table, ckpt)  # resume, same checkpoint
    assert _published_rows(cdc2) == _oracle_rows(SPEC)

    # resume again: nothing new to do, table version must not move
    v_done = cdc2.table.latest_version()
    cdc3 = run_stream(spark, glob, table, ckpt)
    assert cdc3.table.latest_version() == v_done


def test_windowed_watermark_metrics(spark, tmp_table_dir):
    write_changelog_chunks(spark, SPEC, os.path.join(tmp_table_dir, "changelog"))
    agg = windowed_rate_metrics(
        spark, os.path.join(tmp_table_dir, "changelog", "chunk-*")
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("rate_metrics")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql(
        "SELECT sum(n_events) AS n, min(lsn_lo) AS lo, max(lsn_hi) AS hi "
        "FROM rate_metrics"
    ).collect()[0]
    # every generated event (incl. duplicate deliveries) lands in a window
    from mimic_spark.sources.changelog import gen_events_py

    assert rows["n"] == len(gen_events_py(SPEC))
    assert rows["lo"] == 0 and rows["hi"] == SPEC.n_events - 1
    spark.catalog.dropTempView("rate_metrics")


def test_stateful_conversation_progress(spark, tmp_table_dir):
    """applyInPandasWithState keyed state across micro-batches equals the
    batch groupBy over the whole changelog."""
    import pyspark.sql.functions as F

    from mimic_spark.streaming.cdc import CHANGELOG_SCHEMA
    from mimic_spark.streaming.stateful import conversation_progress

    spec = ChangelogSpec(n_events=3000, n_convs=60, n_chunks=4)
    write_changelog_chunks(spark, spec, os.path.join(tmp_table_dir, "changelog"))
    glob = os.path.join(tmp_table_dir, "changelog", "chunk-*")

    stream = (
        spark.readStream.schema(CHANGELOG_SCHEMA)
        .option("maxFilesPerTrigger", 2)
        .parquet(glob)
    )
    q = (
        conversation_progress(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("conv_progress")
        .option("checkpointLocation", os.path.join(tmp_table_dir, "ckpt_state"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # memory sink in update mode appends each emitted update; the LAST row
    # per conv_id is the final state
    got = {
        r["conv_id"]: r
        for r in spark.sql(
            """SELECT * FROM (
                 SELECT *, row_number() OVER (PARTITION BY conv_id
                            ORDER BY n_events DESC) AS rn FROM conv_progress
               ) WHERE rn = 1"""
        ).collect()
    }
    want = {
        r["conv_id"]: r
        for r in spark.read.schema(CHANGELOG_SCHEMA)
        .parquet(glob)
        .groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("lsn").alias("max_lsn"),
            F.max("ts").alias("last_ts"),
            F.sum(F.when(F.col("op") == "delete", 1).otherwise(0)).alias("n_deletes"),
        )
        .collect()
    }
    assert set(got) == set(want)
    for k in want:
        for c in ("n_events", "max_lsn", "last_ts", "n_deletes"):
            assert got[k][c] == want[k][c], (k, c, got[k][c], want[k][c])
    spark.catalog.dropTempView("conv_progress")


def test_session_window_stream(spark, tmp_table_dir):
    """Streaming session windows (session_window + watermark): per-conv
    activity sessions with a 1-hour gap; totals equal the batch count."""
    import pyspark.sql.functions as F

    from mimic_spark.streaming.cdc import CHANGELOG_SCHEMA

    spec = ChangelogSpec(n_events=3000, n_convs=40, n_chunks=3)
    write_changelog_chunks(spark, spec, os.path.join(tmp_table_dir, "changelog"))
    glob = os.path.join(tmp_table_dir, "changelog", "chunk-*")
    stream = spark.readStream.schema(CHANGELOG_SCHEMA).parquet(glob)
    sess = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.session_window("ts", "1 hour").alias("win"), F.col("conv_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    q = (
        sess.writeStream.outputMode("complete")
        .format("memory")
        .queryName("conv_sessions")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    total = spark.sql("SELECT sum(n_events) FROM conv_sessions").collect()[0][0]
    from mimic_spark.sources.changelog import gen_events_py

    assert total == len(gen_events_py(spec))
    n_sessions = spark.sql("SELECT count(*) FROM conv_sessions").collect()[0][0]
    n_convs = spark.sql(
        "SELECT count(DISTINCT conv_id) FROM conv_sessions"
    ).collect()[0][0]
    assert n_sessions >= n_convs  # gaps split at least some conversations
    spark.catalog.dropTempView("conv_sessions")


def test_stream_mor_mode(spark, tmp_table_dir):
    """Streaming apply in merge-on-read mode (with auto-compaction) equals
    the replay oracle too."""
    write_changelog_chunks(spark, SPEC, os.path.join(tmp_table_dir, "changelog"))
    cdc = run_stream(
        spark,
        os.path.join(tmp_table_dir, "changelog", "chunk-*"),
        os.path.join(tmp_table_dir, "transcripts"),
        os.path.join(tmp_table_dir, "ckpt"),
        max_files_per_trigger=3,
        mode="mor",
        compact_every=2,
    )
    assert _published_rows(cdc) == _oracle_rows(SPEC)


def test_maintenance_cadence_survives_session_restarts(spark, tmp_table_dir):
    """Maintenance cadence keys on the table-internal batch id, not an
    in-memory counter (r8 streaming-soak finding): a fresh TranscriptCdc per
    stream session — exactly what every run_stream invocation constructs —
    previously reset the counter, so sessions shorter than compact_every
    epochs NEVER compacted (measured: table files +16/epoch linear, session
    wall 162 s -> 365 s over 50M events).  Three sessions of two batches
    each with compact_every=3 must still fire the cadence twice."""
    path = os.path.join(tmp_table_dir, "transcripts")
    schema = (
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp, lsn long, op string"
    )
    lsn = 0
    for session in range(3):
        cdc = TranscriptCdc(
            spark, path, n_buckets=4, mode="mor", compact_every=3
        )
        for b in range(2):
            batch_id = session * 2 + b
            rows = []
            for i in range(30):
                lsn += 1
                rows.append(
                    (f"s{session}b{b}_{i:03d}", 1, "user", f"v{lsn}",
                     None, None, lsn, "insert")
                )
            cdc.apply_batch(spark.createDataFrame(rows, schema), batch_id)
    # internal ids 2 and 5 are cadence points; both fall in sessions that
    # applied only 2 batches, so a per-instance counter never reaches 3
    ops = [s.op for s in cdc.table.history()]
    assert "compact-incremental" in ops
    # ledger/metrics fold on the same cadence: 6 appended batch rows must
    # not mean 6 live files
    assert len(cdc.ledger.snapshot().files) <= 2
    assert len(cdc.metrics.snapshot().files) <= 2
    # and the data itself is intact
    assert cdc.read_published().count() == 180


def test_normalize_arrow_equals_python_twin_fuzz():
    """_normalize_series (pyarrow/RE2 path) must stay byte-identical to
    normalize_text_py — the replay oracle depends on it. Fuzzes control
    chars, unicode separators, combining accents, NBSP, zero-width chars."""
    import random

    import pandas as pd

    from mimic_spark.functions.normalize import _normalize_series, normalize_text_py

    rng = random.Random(1234)
    alphabet = (
        [chr(c) for c in range(0x20, 0x7F)]
        + ["\t", "\n", "\r", "\x00", "\x07", "\x0b", "\x1f", "\x7f", "\x85",
           "\xa0", " ", " ", "　", "​", "é", "\xe9",
           "\xf1", "字",
           # decomposed combining sequences + lone combining marks: the r3
           # reorder (C++ space/ctrl passes BEFORE NFC) must commute — a
           # combining mark right after NBSP/space/ctrl is the sharp edge
           "e\u0301", "\u0301", "n\u0303", "\u212b", "\u2126"]
    )
    cases = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 60)))
        for _ in range(2000)
    ]
    cases += ["", None, "   ", "\n", "plain ascii", "caf\xe9  créme"]
    got = _normalize_series(pd.Series(cases, dtype=object)).tolist()
    want = [normalize_text_py(c) for c in cases]
    for c, g, w in zip(cases, got, want):
        if w is None:
            assert g is None or (isinstance(g, float))  # NaN for None is fine
        else:
            assert g == w, (repr(c), repr(g), repr(w))


def test_session_window_rollup_matches_batch_twin(spark, tmp_table_dir):
    """Streaming session_window sessions == batch merge_intervals over
    [ts, ts+gap) — same boundaries by construction (§2.9 native stateful
    sessionization, state bounded by the watermark)."""
    from pyspark.sql import functions as F

    from mimic_spark.operators.windows import merge_intervals
    from mimic_spark.streaming.cdc import session_window_rollup

    spec = ChangelogSpec(n_events=2000, n_convs=40, n_chunks=2)
    write_changelog_chunks(spark, spec, os.path.join(tmp_table_dir, "changelog"))

    agg = session_window_rollup(
        spark, os.path.join(tmp_table_dir, "changelog", "chunk-*"), gap="30 minutes"
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("session_rollup")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        tuple(r)
        for r in spark.table("session_rollup")
        .select("conv_id", "session_start", "session_end", "n_events")
        .collect()
    )

    ev = spark.read.parquet(os.path.join(tmp_table_dir, "changelog", "chunk-*"))
    iv = ev.select(
        "conv_id",
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("end_ts"),
    )
    want = sorted(
        tuple(r)
        for r in merge_intervals(iv, ["conv_id"], gap_seconds=0)
        .groupBy("conv_id", "era_id")
        .agg(
            F.min("start_ts").alias("session_start"),
            F.max("end_ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("conv_id", "session_start", "session_end", "n_events")
        .collect()
    )
    assert got == want
    assert len(got) > 0


def test_stream_dedup_within_watermark(spark, tmp_table_dir):
    """Duplicate deliveries (the generator emits them) collapse to one row
    per (conv_id, turn_idx, lsn); non-duplicates all survive."""
    from mimic_spark.streaming.cdc import stream_dedup_within_watermark

    spec = ChangelogSpec(n_events=2000, n_convs=40, n_chunks=2)
    write_changelog_chunks(spark, spec, os.path.join(tmp_table_dir, "changelog"))
    glob = os.path.join(tmp_table_dir, "changelog", "chunk-*")

    deduped = stream_dedup_within_watermark(spark, glob)
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("dd_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("dd_stream").count()

    raw = spark.read.parquet(glob)
    n_raw = raw.count()
    n_distinct = raw.select("conv_id", "turn_idx", "lsn").distinct().count()
    assert n_distinct < n_raw  # generator really does emit duplicates
    assert got == n_distinct

def test_stream_with_inline_rollup_maintenance(spark, tmp_table_dir):
    """r5 verdict Missing #4: the incremental per-conversation rollup is
    maintained INSIDE run_stream's foreachBatch lifecycle (no external
    poll loop), stays exact across a crash/resume, and converges to the
    full-recompute oracle."""
    from pyspark.sql import functions as F

    write_changelog_chunks(spark, SPEC, os.path.join(tmp_table_dir, "changelog"))
    glob = os.path.join(tmp_table_dir, "changelog", "chunk-*")
    table = os.path.join(tmp_table_dir, "transcripts")
    ckpt = os.path.join(tmp_table_dir, "ckpt")
    rpath = os.path.join(tmp_table_dir, "rollup")

    # crash mid-stream, then resume with the SAME rollup attached
    with pytest.raises(Exception, match="injected failure"):
        run_stream(spark, glob, table, ckpt, fail_after=2, mode="mor",
                   rollup_path=rpath, rollup_n_buckets=2)
    cdc = run_stream(spark, glob, table, ckpt, mode="mor",
                     rollup_path=rpath, rollup_n_buckets=2)
    assert cdc.rollup is not None
    # rollup is current to the table head inside the stream lifecycle
    assert cdc.rollup.cursor() == cdc.table.current_version()

    oracle = sorted(
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
    got = sorted(
        (r["conv_id"], r["n_turns"], r["n_chars"], r["max_ts"])
        for r in cdc.rollup.read().collect()
    )
    assert got == oracle


def test_stream_rollup_refresh_cadence(spark, tmp_table_dir):
    """rollup_every=3: the inline rollup folds every 3rd applied batch plus
    one catch-up at drain, so a finished session always hands off a CURRENT
    rollup — equal to the full recompute — while paying the old-value read
    a third as often (the continuous-aggregate refresh-policy knob)."""
    from pyspark.sql import functions as F

    write_changelog_chunks(spark, SPEC, os.path.join(tmp_table_dir, "changelog"))
    cdc = run_stream(
        spark,
        os.path.join(tmp_table_dir, "changelog", "chunk-*"),
        os.path.join(tmp_table_dir, "transcripts"),
        os.path.join(tmp_table_dir, "ckpt"),
        mode="mor",
        rollup_path=os.path.join(tmp_table_dir, "rollup"),
        rollup_n_buckets=2,
        rollup_every=3,
    )
    assert cdc.rollup is not None
    # current at session end despite folding only every 3rd batch
    assert cdc.rollup.cursor() == cdc.table.current_version()
    oracle = sorted(
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
    got = sorted(
        (r["conv_id"], r["n_turns"], r["n_chars"], r["max_ts"])
        for r in cdc.rollup.read().collect()
    )
    assert got == oracle
