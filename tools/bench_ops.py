"""Per-operator isolation bench for the optimization round (guide §1.4).

Times individual catalog operators with the noop sink under EXACTLY the
session config the frozen bench.py uses, so numbers are comparable with the
driver's measurement; optionally dumps .explain("formatted") per op.

This is a measurement-only tool: bench.py itself is frozen (round-start copy
is what the driver runs) and is not touched.

Usage:
  python tools/bench_ops.py [--sf-dir D] [--steady N] [--plans-dir P]
                            [--skip-cold] [op ...]
Prints one JSON line per op and a final summary JSON line.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADLINE = [
    "q1_pricing_summary",
    "join_broadcast_star",
    "join_left_chain",
    "window_dedup_latest",
    "sessionize_gaps",
    "era_gaps_islands",
    "asof_range_join",
    "topk_per_group",
    "era_variable_intervals",
    "dedup_minhash_lsh",
    "ann_cosine_topk",
    "text_quality_scores",
    "doc_fingerprint",
    "timeseries_expand_samples",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("ops", nargs="*", default=None)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--steady", type=int, default=3)
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--plan-suffix", default="")
    ap.add_argument("--skip-cold", action="store_true")
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from mimic_spark.operators import OPS
    from mimic_spark.operators.windows import era_gaps_islands
    from mimic_spark.session import get_spark

    spark = get_spark(
        parallelism=cpus,
        app_name="bench_ops",
        shuffle_partitions=64,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(1024 * 1024),
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(8 * 1024 * 1024),
            **(
                {"spark.local.dir": "/dev/shm/mimic_spark_bench/spark_local"}
                if os.path.isdir("/dev/shm")
                else {}
            ),
        },
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    names = args.ops or HEADLINE
    out: dict[str, dict] = {}
    for name in names:
        fn = era_gaps_islands if name == "era_gaps_islands" else OPS[name].fn
        spark.sparkContext.setJobDescription(f"bench_ops:{name}")
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            df = fn(spark, args.sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(
                os.path.join(
                    args.plans_dir, f"{name}{args.plan_suffix}.txt"
                ),
                "w",
            ) as f:
                f.write(buf.getvalue())
        cold = None
        if not args.skip_cold:
            t0 = time.time()
            fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            cold = round(time.time() - t0, 3)
        samples = []
        for _ in range(args.steady):
            t0 = time.time()
            fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
        med = sorted(samples)[len(samples) // 2] if samples else None
        rec = {"cold": cold, "steady": med, "samples": samples}
        out[name] = rec
        print(json.dumps({"op": name, **rec}), flush=True)
    total = sum(v["steady"] for v in out.values() if v["steady"] is not None)
    print(json.dumps({"sf_dir": args.sf_dir, "total_steady": round(total, 2), "ops": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
