"""Decompose the streaming-vs-batched soak overhead factor (r8).

BENCH/soak_stream.json records the streaming soak at 2.42x the batched
soak's per-event cost, with a caveat: the streaming path pays a WAL-JSON
decode the parquet-fed batched soak does not.  This tool isolates that
decode term so the factor is attributable instead of a single opaque
number.  On one identically-shaped chunk (same ChangelogSpec as both
soaks: body_words=48, ~40 events/conversation, parallelism 8) it times,
with a noop sink forcing full materialization:

  A. parquet read                      -> the batched soak's input cost
  B. text read + fixed-schema parse    -> JSON parse, drift detect off
     (parse_wal_envelope == decode_wal_lines(on_drift="ignore"))
  C. text read + drift-aware decode    -> the streaming soak's actual
     decode (detection agg runs, no drift present: the steady state)
  D. same, with drift PRESENT          -> detection + schema inference +
     extended re-parse (the epoch where a producer evolves)

Per-event decode surcharge = C - A (median of --repeats runs each).  The
record states what fraction of the soaks' per-event gap that surcharge
explains (computed from the soak records' rates AT RUN TIME — r8 ADVICE:
re-running either soak invalidates the recorded fraction, so treat the
fraction as valid only against the soak records this run read);
the remainder is the streaming wrapper proper (checkpoint + epoch
bookkeeping + external-id remap) plus the inline rollup cadence the
batched soak does not run.  Box drift vs the soak runs is bounded by the
shared canary (pinned ref 0.703 s, see bench.py); all per-event numbers
are reported raw AND canary-normalized.

Usage: python tools/bench_decode_overhead.py          # ~5 min
"""

from __future__ import annotations

import argparse
import datetime as dt
import json
import os
import shutil
import statistics
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

CANARY_REF_SEC = 0.703  # pinned r6 reference (see bench.py)


def soak_rates() -> tuple[float | None, float | None]:
    """Overall ev/s of the two soak records whose gap this decomposes,
    read from BENCH at run time so a soak re-run stays consistent."""
    out = []
    for name in ("soak_stream.json", "soak.json"):
        try:
            with open(os.path.join(os.path.dirname(HERE), "BENCH", name)) as f:
                out.append(float(json.load(f)["overall_events_per_sec"]))
        except Exception:
            out.append(None)
    return out[0], out[1]


def canary_sec(spark) -> float:
    t0 = time.time()
    (
        spark.range(200_000_000)
        .selectExpr("id % 4096 AS k", "id AS v")
        .groupBy("k")
        .agg({"v": "sum", "*": "count"})
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    return round(time.time() - t0, 3)


def timed_noop(build, repeats: int) -> float:
    """Median seconds to force `build()`'s DataFrame through a noop sink.
    One untimed warm run first (file listing, schema inference, JIT)."""
    build().write.format("noop").mode("overwrite").save()
    samples = []
    for _ in range(repeats):
        t0 = time.time()
        build().write.format("noop").mode("overwrite").save()
        samples.append(time.time() - t0)
    return statistics.median(samples)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-events", type=int, default=4_000_000)
    ap.add_argument("--n-convs", type=int, default=100_000)
    ap.add_argument("--parallelism", type=int, default=8)
    ap.add_argument("--body-words", type=int, default=48)
    ap.add_argument("--files-per-chunk", type=int, default=4)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument(
        "--workdir",
        default=(
            "/dev/shm/mimic_spark_decode_bench"
            if os.path.isdir("/dev/shm")
            else "/tmp/mimic_spark_decode_bench"
        ),
    )
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(HERE), "BENCH", "decode_overhead.json"
        ),
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from mimic_spark.session import get_spark
    from mimic_spark.sources.changelog import ChangelogSpec, derive_event_df
    from mimic_spark.sources.wal_json import (
        decode_wal_lines,
        encode_wal_envelope,
    )

    # clean BEFORE the session exists: spark.local.dir lives inside the
    # workdir, and removing it under a live block manager kills tasks
    shutil.rmtree(args.workdir, ignore_errors=True)
    spark = get_spark(
        parallelism=args.parallelism,
        app_name="bench_decode_overhead",
        shuffle_partitions=64,
        extra_conf={
            "spark.local.dir": os.path.join(args.workdir, "spark_local"),
            "spark.sql.files.maxPartitionBytes": str(32 * 1024 * 1024),
        },
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm JVM

    spec = ChangelogSpec(
        n_events=args.n_events,
        n_convs=args.n_convs,
        n_chunks=1,
        body_words=args.body_words,
    )
    base = spark.range(0, args.n_events).select(F.col("id").alias("lsn"))
    ev = derive_event_df(base, spec).drop("batch_hint")

    pq = os.path.join(args.workdir, "chunk_parquet")
    wal = os.path.join(args.workdir, "chunk_wal")
    wal_drift = os.path.join(args.workdir, "chunk_wal_drift")
    ev.repartition(args.files_per_chunk).write.mode("overwrite").parquet(pq)
    encode_wal_envelope(ev).repartition(args.files_per_chunk).write.mode(
        "overwrite"
    ).text(wal)
    encode_wal_envelope(
        ev.withColumn("src_tag", F.lit("prod-v2")),
        extra_payload_cols=["src_tag"],
    ).repartition(args.files_per_chunk).write.mode("overwrite").text(wal_drift)

    c0 = canary_sec(spark)
    t_parquet = timed_noop(lambda: spark.read.parquet(pq), args.repeats)
    t_parse = timed_noop(
        lambda: decode_wal_lines(
            spark, spark.read.text(wal), on_drift="ignore"
        ),
        args.repeats,
    )
    t_decode = timed_noop(
        lambda: decode_wal_lines(spark, spark.read.text(wal)), args.repeats
    )
    t_drift = timed_noop(
        lambda: decode_wal_lines(spark, spark.read.text(wal_drift)),
        args.repeats,
    )
    c1 = canary_sec(spark)
    canary = round((c0 + c1) / 2, 3)
    norm = CANARY_REF_SEC / canary  # <1 on a slower-than-ref box

    n = args.n_events

    def us(sec: float) -> float:
        return round(sec / n * 1e6, 3)

    surcharge_us = us(t_decode - t_parquet)
    surcharge_norm_us = round(surcharge_us * norm, 3)
    # the soaks' recorded per-event gap, in us (their rates were already
    # measured on this box within the same canary band; the canary ratio
    # bounds residual drift)
    stream_ev_s, batched_ev_s = soak_rates()
    gap_us = (
        round((1 / stream_ev_s - 1 / batched_ev_s) * 1e6, 3)
        if stream_ev_s and batched_ev_s
        else None
    )
    frac = round(surcharge_us / gap_us, 3) if gap_us and gap_us > 0 else None

    try:
        rev = subprocess.run(
            ["git", "rev-parse", "HEAD"],
            capture_output=True, text=True,
            cwd=os.path.dirname(HERE), check=True,
        ).stdout.strip()
    except Exception:
        rev = None

    out = {
        "what": "decomposition of the streaming-vs-batched soak overhead "
        "factor: per-event WAL-JSON decode surcharge vs parquet read on an "
        "identically-shaped chunk; remainder of the gap = streaming "
        "wrapper (checkpoint/epoch bookkeeping/id remap) + inline rollup "
        "cadence (rollup_every=1 in the streaming soak, absent in the "
        "batched one)",
        "git_rev": rev,
        "measured_at": dt.datetime.now(dt.timezone.utc).isoformat(
            timespec="seconds"
        ),
        "config": {
            "n_events": n,
            "n_convs": args.n_convs,
            "parallelism": args.parallelism,
            "body_words": args.body_words,
            "repeats": args.repeats,
        },
        "canary_sec": canary,
        "canary_ref_sec": CANARY_REF_SEC,
        "per_event_us_raw": {
            "parquet_read": us(t_parquet),
            "json_parse_fixed_schema": us(t_parse),
            "json_decode_drift_aware": us(t_decode),
            "json_decode_drift_present": us(t_drift),
        },
        "decode_surcharge_us_per_event": surcharge_us,
        "decode_surcharge_us_normalized": surcharge_norm_us,
        "drift_detection_agg_us_per_event": us(t_decode - t_parse),
        "drift_present_extra_us_per_event": us(t_drift - t_decode),
        "soak_stream_events_per_sec": stream_ev_s,
        "soak_batched_events_per_sec": batched_ev_s,
        "soak_gap_us_per_event": gap_us,
        "decode_fraction_of_soak_gap": frac,
        "note": "fraction computed from raw us on the same box family as "
        "the soak runs; canary bounds box drift between the measurements",
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps(out, indent=1))
    spark.stop()
    shutil.rmtree(args.workdir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
