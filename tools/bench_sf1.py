"""sf1 scale-trend bench: 10x deterministic tile of sf0.1 + headline ops.

r4 verdict #8: everything benched to date is sf0.1 — one cold+steady pass
at sf1 evidences the plans' scale trend and flags any op growing
super-linearly.  No sf1 parquet ships in /root/testdata, so this tool
synthesizes one DETERMINISTICALLY from sf0.1 (no randomness, no external
data): each fact table is tiled 10x with disjoint id spaces (all int64
id/FK columns offset by replica * 10^8, so per-replica join cardinalities
match the original), dimension tables (region, nation) are shared, and
document texts get a per-replica consonant rotation (translate, JVM-side)
so the tiled corpus is not a degenerate 10-way exact-duplicate blow-up for
the dedup operators — each replica is a distinct corpus with the same
statistical shape.

Output: BENCH/sf1.json with cold + steady-median-of-3 per op, the same-
session sf0.1 steady medians, and per-op growth ratios; bench.py embeds it
into BENCH/latest.json as a recorded block.  An op whose sf1 steady time
exceeds 10x its sf0.1 steady time is flagged in "super_linear" for a
written explanation.

Usage: python tools/bench_sf1.py   (~6 min: ~1 min generation + 2 passes)
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

N_REPLICAS = 10
ID_OFFSET = 100_000_000  # beyond every sf0.1 id space

# int64 id/FK columns to offset per table (FKs to tiled tables use the
# same offset, so replica k's facts join replica k's dims/facts only)
OFFSET_COLS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
SHARED_DIMS = ["region", "nation"]  # FK targets of int32 keys; not tiled

ROT_ALPHABET = "etaoinshrd"  # 10 distinct rotations -> 10 distinct corpora


def generate(spark, src: str, dst: str) -> dict:
    from pyspark.sql import functions as F

    os.makedirs(dst, exist_ok=True)
    t0 = time.time()
    rows = {}
    for name in SHARED_DIMS:
        df = spark.read.parquet(f"{src}/{name}.parquet")
        df.write.mode("overwrite").parquet(f"{dst}/{name}.parquet")
        rows[name] = df.count()
    for name, id_cols in OFFSET_COLS.items():
        df = spark.read.parquet(f"{src}/{name}.parquet")
        parts = []
        for k in range(N_REPLICAS):
            rep = df
            for c in id_cols:
                rep = rep.withColumn(c, F.col(c) + F.lit(k * ID_OFFSET))
            if name == "documents" and k:
                rot = ROT_ALPHABET[k:] + ROT_ALPHABET[:k]
                rep = rep.withColumn(
                    "text", F.translate(F.col("text"), ROT_ALPHABET, rot)
                )
            parts.append(rep)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        # enough files for 32-way scan parallelism at this size
        out.repartition(32).write.mode("overwrite").parquet(
            f"{dst}/{name}.parquet"
        )
        rows[name] = spark.read.parquet(f"{dst}/{name}.parquet").count()
    return {"gen_seconds": round(time.time() - t0, 1), "rows": rows}


def run_suite(spark, ops, headline, sf_dir: str, n_steady: int = 3):
    from mimic_spark.operators.windows import era_gaps_islands

    cold, steady, samples = {}, {}, {}
    for name in headline:
        fn = era_gaps_islands if name == "era_gaps_islands" else ops[name].fn
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        cold[name] = round(time.time() - t0, 3)
        ss = []
        for _ in range(n_steady):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            ss.append(round(time.time() - t0, 3))
        steady[name] = sorted(ss)[len(ss) // 2]
        samples[name] = ss
    return cold, steady, samples


def main() -> int:
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    base = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    dst = os.environ.get("SPARK_GRAFT_SF1_DIR", f"{base}/mimic_sf1")

    from bench import HEADLINE

    from mimic_spark.operators import OPS
    from mimic_spark.session import get_spark

    spark = get_spark(
        parallelism=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        app_name="bench_sf1",
        shuffle_partitions=64,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(1024 * 1024),
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(
                8 * 1024 * 1024
            ),
            **(
                {"spark.local.dir": f"{base}/mimic_spark_bench/spark_local"}
                if base == "/dev/shm"
                else {}
            ),
        },
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm JVM

    gen = generate(spark, src, dst)
    print(f"generated sf1 tile at {dst}: {gen}", file=sys.stderr)

    # same-session sf0.1 medians first: the growth ratio must compare
    # within one JVM/page-cache state, not against a different run's record
    _, steady01, _ = run_suite(spark, OPS, HEADLINE, src)
    cold1, steady1, samples1 = run_suite(spark, OPS, HEADLINE, dst)

    growth = {
        n: (round(steady1[n] / steady01[n], 2) if steady01[n] else None)
        for n in HEADLINE
    }
    # provenance stamp (r6 verdict wrong #1): bench.py marks the embedded
    # block stale when this rev no longer matches HEAD
    import datetime as dt
    import subprocess

    try:
        rev = subprocess.run(
            ["git", "rev-parse", "HEAD"],
            capture_output=True, text=True,
            cwd=os.path.dirname(HERE), check=True,
        ).stdout.strip()
    except Exception:
        rev = None
    rec = {
        "sf": 1.0,
        "git_rev": rev,
        "measured_at": dt.datetime.now(dt.timezone.utc).isoformat(
            timespec="seconds"
        ),
        "tiled_from": src,
        "replicas": N_REPLICAS,
        "gen": gen,
        "value": round(sum(steady1.values()), 2),
        "value_cold": round(sum(cold1.values()), 2),
        "queries": steady1,
        "queries_cold": cold1,
        "queries_steady_samples": samples1,
        "steady_median_of": 3,
        "same_session_sf0.1_steady": steady01,
        "ratio_total": round(
            sum(steady1.values()) / sum(steady01.values()), 2
        ),
        "growth_ratio_vs_sf0.1": growth,
        "super_linear": sorted(
            n for n, g in growth.items() if g is not None and g > 10
        ),
    }
    out = os.path.join(os.path.dirname(HERE), "BENCH", "sf1.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps({k: rec[k] for k in (
        "value", "value_cold", "ratio_total", "super_linear")}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
