"""On-the-fly streaming synthesis: rate source -> changelog -> CDC apply.

Evidences the 10^10-scale posture: the stream is synthesized by pure column
expressions over the rate source (never materialized) and applied through the
same foreachBatch pipeline; the resulting table must equal the Python oracle
replayed over exactly the contiguous LSN range the rate source emitted.
"""

from __future__ import annotations

import os
import time

from mimic_spark.functions.normalize import normalize_text_py
from mimic_spark.sources.changelog import (
    ChangelogSpec,
    gen_changelog_stream,
    gen_events_py,
)
from mimic_spark.streaming.apply import TranscriptCdc


def test_rate_stream_cdc(spark, tmp_table_dir):
    spec = ChangelogSpec(n_events=10**9, n_convs=80, n_chunks=4)  # unbounded-ish
    cdc = TranscriptCdc(spark, os.path.join(tmp_table_dir, "transcripts"))
    stream = gen_changelog_stream(spark, spec, rows_per_second=20_000)
    q = (
        stream.writeStream.foreachBatch(lambda df, bid: cdc.apply_batch(df, bid))
        .option("checkpointLocation", os.path.join(tmp_table_dir, "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    deadline = time.time() + 40
    while time.time() < deadline and (cdc.high_watermark() or 0) < 20_000:
        time.sleep(1)
    q.stop()
    q.awaitTermination()

    hwm = cdc.high_watermark()
    assert hwm and hwm >= 5_000, f"stream barely flowed: hwm={hwm}"

    # rate-source lsns are contiguous 0..hwm: replay the python twin over
    # exactly that range, pinning the big spec's evolution threshold (far
    # beyond this range -> `tool` stays NULL in both engine and oracle)
    pinned = ChangelogSpec(
        n_events=hwm + 1,
        n_convs=spec.n_convs,
        n_chunks=spec.n_chunks,
        evolve_at_override=spec.evolve_at,
    )
    state: dict = {}
    for e in gen_events_py(pinned):  # dup injections are exact copies: harmless
        k = (e["conv_id"], e["turn_idx"])
        cur = state.get(k)
        if cur is not None and e["lsn"] < cur["_lsn"]:
            continue
        if e["op"] == "delete":
            state[k] = {"_lsn": e["lsn"], "_deleted": True}
        else:
            state[k] = {
                "_lsn": e["lsn"],
                "_deleted": False,
                "role": e["role"],
                "text": normalize_text_py(e["text"]),
                "tool": e["tool"],
                "ts": e["ts"],
            }
    want = sorted(
        (k[0], k[1], v["role"], v["text"], v["tool"], v["ts"])
        for k, v in state.items()
        if not v["_deleted"]
    )
    got = sorted(
        tuple(r)
        for r in cdc.read_published()
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
        .collect()
    )
    assert got == want
