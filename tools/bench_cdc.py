"""Single-parallelism CDC throughput run (invoked per level by bench.py).

Measures sustained change-events/sec of the end-to-end apply path
(changelog parquet -> dedup -> Arrow normalize -> MERGE upsert commits),
excluding one-time changelog generation (the same files are reused across
parallelism levels so both runs read identical input).

Prints one JSON line: {"parallelism": P, "apply_sec": s, "events_per_sec": r}
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--parallelism", type=int, required=True)
    ap.add_argument("--n-events", type=int, default=1_000_000)
    ap.add_argument("--n-convs", type=int, default=50_000)
    ap.add_argument("--n-chunks", type=int, default=4)
    ap.add_argument("--n-buckets", type=int, default=64)
    ap.add_argument("--workdir", default="/tmp/mimic_spark_bench")
    ap.add_argument("--files-per-chunk", type=int, default=32)
    ap.add_argument("--body-words", type=int, default=48)
    ap.add_argument("--mode", default="cow", choices=["cow", "mor"])
    args = ap.parse_args()

    from mimic_spark.session import get_spark
    from mimic_spark.sources.changelog import ChangelogSpec, write_changelog_chunks
    from mimic_spark.streaming.apply import TranscriptCdc, run_batched

    spec = ChangelogSpec(
        n_events=args.n_events,
        n_convs=args.n_convs,
        n_chunks=args.n_chunks,
        files_per_chunk=args.files_per_chunk,
        body_words=args.body_words,
    )
    spark = get_spark(
        parallelism=args.parallelism,
        app_name=f"bench_cdc_p{args.parallelism}",
        # identical config at every parallelism level (the scaling rule
        # compares same code + same input, only cores change): fixed shuffle
        # width and a small file-split size so scan parallelism is never
        # capped by file packing; AQE coalesces the excess at low core counts
        shuffle_partitions=64,
        extra_conf={
            "spark.local.dir": os.path.join(args.workdir, "spark_local"),
            "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(1024 * 1024),
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(8 * 1024 * 1024),
        },
    )

    changelog = os.path.join(args.workdir, f"changelog_{args.n_events}_{args.body_words}w")
    if not os.path.exists(os.path.join(changelog, f"chunk-{spec.n_chunks-1:05d}")):
        write_changelog_chunks(spark, spec, changelog)
    chunks = [
        os.path.join(changelog, f"chunk-{c:05d}") for c in range(spec.n_chunks)
    ]

    table = os.path.join(args.workdir, f"transcripts_{args.mode}_p{args.parallelism}")
    shutil.rmtree(table, ignore_errors=True)
    shutil.rmtree(table + "_commits", ignore_errors=True)
    shutil.rmtree(table + "_metrics", ignore_errors=True)

    cdc = TranscriptCdc(spark, table, n_buckets=args.n_buckets, mode=args.mode, compact_every=8)
    t0 = time.time()
    results = run_batched(spark, cdc, chunks)
    dt = time.time() - t0
    assert all(not r.skipped for r in results)
    print(
        json.dumps(
            {
                "parallelism": args.parallelism,
                "mode": args.mode,
                "n_events": args.n_events,
                "apply_sec": round(dt, 2),
                "events_per_sec": round(args.n_events / dt, 1),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
