"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR + CDC throughput.

Output contract (the driver tails stdout, so the LAST line must be one
COMPACT JSON object that survives a bounded tail capture — r3's single
giant line was truncated to `parsed: null` in the round record):

  last stdout line  -> {"metric", "value" (steady total sec), "unit",
                        "queries" {name: steady sec}, "sf",
                        "value_cold", "cdc" {cow/mor median ev/s, median_of},
                        "scaling" {pair, efficiency}, "detail": path}
  BENCH/latest.json -> full detail: cold per-query map, every CDC sample,
                       large-batch study, scaling runs.

CDC points are median-of-3 (the box shows ±20% single-sample variance;
a single sample made r3 look like a regression while the builder's own
medians improved).  The N->4N scaling study needs two JVMs (~10 min) and
lives in BENCH/BASELINE.md / BENCH/scaling.json with exact repro commands;
set SPARK_GRAFT_BENCH_FULL=1 to re-run it inline here.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

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
    # the scale-path dedup is the headline number; the exact quadratic
    # Jaccard form stays as an oracled validation baseline at small sf only
    "dedup_minhash_lsh",
    "ann_cosine_topk",
    "text_quality_scores",
    "doc_fingerprint",
    "timeseries_expand_samples",
]

CDC_BENCH_EVENTS = int(os.environ.get("SPARK_GRAFT_CDC_EVENTS", "4000000"))

# Pinned canary reference: the r6 bench pass recorded box_canary_sec=0.703
# (spark.range(2e8) % 4096 hash-agg, noop sink, median of 3).  CDC numbers
# are additionally reported normalized to that box speed so rounds compare
# on equal terms (r6 verdict Next #3):
#     cdc_normalized = raw_ev_per_sec * (canary_now / CANARY_REF_SEC)
# Direction: throughput scales ~1/box-time, so on a SLOWER box
# (canary_now > ref) the raw number normalizes UP to its
# reference-box-equivalent.  Worked example: a box running 2x slower
# measures ~half the ev/s and a ~1.406 s canary; x(1.406/0.703) restores
# the reference-box figure.
CANARY_REF_SEC = 0.703


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])

    from mimic_spark.operators import OPS
    from mimic_spark.session import get_spark

    spark = get_spark(
        parallelism=cpus,
        app_name="bench",
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

    # warm the session (JVM/codegen) outside the timed region
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # Box-speed canary (r5 verdict wrong #3): a fixed pure-JVM hash-agg
    # over spark.range — constant work, no I/O, no Python — recorded with
    # every bench run so cross-session comparisons can be normalized
    # without an interleaved A/B study (this box's absolute speed swung
    # ~25-35% between r4 and r5 sessions on identical code).  Median of 3.
    def _canary_once() -> float:
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

    canary_samples = sorted(_canary_once() for _ in range(3))
    canary = {
        "what": "spark.range(2e8) % 4096 hash-agg, noop sink, median of 3",
        "sec": canary_samples[1],
        "samples": canary_samples,
    }

    # Timed passes per query:
    #  - cold (1 pass): includes Catalyst analysis + Janino codegen of the
    #    query's expressions (a fixed per-plan cost — the portable-hash
    #    operators compile ~2-3s of nested lambdas regardless of data size);
    #  - steady (median of N_STEADY_SAMPLES, r4 verdict #5): the same plan
    #    re-executed, which is what repeats at scale.  Single steady samples
    #    swung ±30% run-to-run on this box (r4's apparent ann_cosine_topk
    #    "regression" was exactly that); the median settles it for ~20s.
    # `queries`/`value` report the steady medians; per-query sample spreads
    # land in BENCH/latest.json.  cache_for_query releases each query's
    # caches at the next catalog invocation, so every pass rebuilds its own
    # caches — no cross-query (or cross-pass) cache dependence.
    n_steady = int(os.environ.get("SPARK_GRAFT_STEADY_SAMPLES", "3"))
    queries: dict[str, float] = {}
    queries_cold: dict[str, float] = {}
    queries_samples: dict[str, list[float]] = {}
    total = 0.0
    total_cold = 0.0
    from mimic_spark.operators.windows import era_gaps_islands

    for name in HEADLINE:
        # era_gaps_islands was deregistered from the catalog in r3 (W5 is
        # carried by era_variable_intervals) but stays a headline bench op
        fn = era_gaps_islands if name == "era_gaps_islands" else OPS[name].fn
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        cold = time.time() - t0
        samples = []
        for _ in range(n_steady):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
        dt = sorted(samples)[len(samples) // 2]
        queries_cold[name] = round(cold, 3)
        queries[name] = dt
        queries_samples[name] = samples
        total_cold += cold
        total += dt

    # CDC throughput via the scaling-study runner (own JVM at local[8]:
    # the stable high-throughput config; local[32] oversubscribes Python
    # workers + task threads and measures noisily — see BENCH/BASELINE.md)
    base = (
        "/dev/shm/mimic_spark_bench"
        if os.path.isdir("/dev/shm")
        else "/tmp/mimic_spark_bench"
    )
    here = os.path.dirname(os.path.abspath(__file__))
    n_cdc_samples = int(os.environ.get("SPARK_GRAFT_CDC_SAMPLES", "3"))
    cdc_info: dict[str, dict] = {}
    for mode in ("cow", "mor"):
        samples = []
        # one spare attempt per mode: a single flaky subprocess must not
        # void the whole round's bench record
        attempts_left = n_cdc_samples + 1
        while len(samples) < n_cdc_samples and attempts_left > 0:
            attempts_left -= 1
            try:
                out = subprocess.run(
                    [
                        sys.executable,
                        os.path.join(here, "tools", "bench_cdc.py"),
                        "--parallelism", "8",
                        "--n-events", str(CDC_BENCH_EVENTS),
                        "--n-chunks", "2",
                        "--n-convs", str(max(1000, CDC_BENCH_EVENTS // 40)),
                        "--workdir", base,
                        "--mode", mode,
                    ],
                    capture_output=True,
                    text=True,
                    check=True,
                )
                samples.append(
                    json.loads(out.stdout.strip().splitlines()[-1])
                )
            except Exception as e:  # noqa: BLE001 - record and move on
                print(f"cdc sample failed ({mode}): {e}", file=sys.stderr)
        if not samples:
            cdc_info[mode] = {"error": "all samples failed", "events_per_sec": None}
            continue
        by_rate = sorted(samples, key=lambda s: s["events_per_sec"])
        median = by_rate[len(by_rate) // 2]
        cdc_info[mode] = {
            **median,
            "events_per_sec_samples": [s["events_per_sec"] for s in by_rate],
            "median_of": len(samples),
            # box-speed-normalized throughput (see CANARY_REF_SEC note)
            "events_per_sec_normalized": round(
                median["events_per_sec"] * canary["sec"] / CANARY_REF_SEC, 1
            ),
        }
    # MoR (+ amortized compaction) is the documented default posture for
    # write-hot streams at scale: COW degenerates to a full-table rewrite
    # once every batch touches all buckets — see lakehouse/merge.py docs.

    large_batch = None
    lb_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH", "large_batch.json")
    if os.path.exists(lb_path):
        with open(lb_path) as f:
            lb = json.load(f)
        large_batch = {
            "recorded": True,
            "points": lb["points"],
            "see": "BENCH/BASELINE.md",
        }

    # Offline measurement records (sf1 scale trend, sustained soak, recall
    # audit), each produced by its own tool on final round code.  Every
    # record is stamped with the git rev it measured (r6 verdict wrong #1:
    # an old round's sf1 figure was embedded as if current); a mismatch
    # against HEAD marks the embedded block stale.
    head = None
    try:
        head = subprocess.run(
            ["git", "rev-parse", "HEAD"],
            capture_output=True, text=True, cwd=here, check=True,
        ).stdout.strip()
    except Exception:
        pass

    def _is_stale(rev, prefixes, exact):
        """Stale iff measurement-relevant code changed since the record's
        stamped rev.  Plain rev != HEAD would false-flag every record the
        moment the record itself (or docs) is committed — the semantics
        that matter are 'was THIS code measured', so compare the changed
        paths against the record's OWN measured surface: the engine paths
        its workload exercises plus its own tool (r8 refinement: a repo-
        wide tools/ prefix false-flagged every record whenever any OTHER
        tool changed, and the CDC soaks' engine surface differs from the
        batch-operator benches')."""
        if rev is None or head is None:
            return True
        if rev == head:
            return False
        try:
            out = subprocess.run(
                ["git", "diff", "--name-only", f"{rev}..{head}"],
                capture_output=True, text=True, cwd=here, check=True,
            ).stdout.split()
        except Exception:
            return True  # unknown ancestry -> conservative
        exact = set(exact)
        return any(
            p.startswith(tuple(prefixes)) or p in exact for p in out
        )

    def stamped_record(name, tool, sensitive=("mimic_spark/",), extra_exact=()):
        """sensitive: engine path prefixes the record's workload executes
        (default: the whole engine — right for the CDC soaks, which drive
        sources+streaming+lakehouse end-to-end; batch-operator records
        narrow it to the operator surface).  The record's own tool is
        always part of the measured surface."""
        path = os.path.join(here, "BENCH", name)
        if not os.path.exists(path):
            return None
        with open(path) as f:
            rec = json.load(f)
        return {
            "recorded": True,
            "stale": _is_stale(
                rec.get("git_rev"), sensitive, (tool,) + tuple(extra_exact)
            ),
            **rec,
            "see": tool,
        }

    # the batch-operator records run the query catalog only — their
    # measured engine surface is the operator layer, not the CDC stack
    OPERATOR_SURFACE = (
        "mimic_spark/operators/",
        "mimic_spark/functions/",
    )
    # rerun with: python tools/bench_sf1.py   # ~6 min incl. generation
    sf1 = stamped_record(
        "sf1.json",
        "tools/bench_sf1.py",
        sensitive=OPERATOR_SURFACE,
        extra_exact=("mimic_spark/session.py", "bench.py", "__spark_entry__.py"),
    )
    # sustained-throughput soak (r6 verdict Next #1): >=100M events into one
    # MoR table, decay plateau-vs-final, canary-normalized.  The soaks keep
    # the whole-engine default surface: they drive sources -> streaming ->
    # lakehouse end-to-end.
    soak = stamped_record("soak.json", "tools/bench_soak.py")
    # streaming-path soak (r7 verdict Next #1): the same decay bar through
    # run_stream itself — WAL-JSON source, drift detection live, inline
    # rollup, checkpointed epochs across sessions
    soak_stream = stamped_record("soak_stream.json", "tools/bench_soak_stream.py")
    # LSH/IVF/minhash recall with sizing.py auto-derivation live, off the
    # pinned 500-row point (r6 verdict Next #5); tile generation reuses
    # tools/bench_sf1.generate
    recall = stamped_record(
        "recall.json",
        "tools/recall_audit.py",
        sensitive=OPERATOR_SURFACE,
        extra_exact=("mimic_spark/session.py", "tools/bench_sf1.py"),
    )
    # per-op regression adjudication (r7 verdict Next #4): interleaved
    # old/new A/B on the ops whose raw medians moved past canary drift
    op_ab = stamped_record(
        "ab_r8.json",
        "tools/ab_adjudicate.py",
        sensitive=OPERATOR_SURFACE,
        extra_exact=("mimic_spark/session.py",),
    )
    # streaming-vs-batched overhead decomposition (r8): decode surcharge
    # on one identically-shaped chunk; exercises the WAL source layer
    decode_oh = stamped_record(
        "decode_overhead.json",
        "tools/bench_decode_overhead.py",
        sensitive=("mimic_spark/sources/",),
        extra_exact=("mimic_spark/session.py",),
    )

    scaling = None
    scaling_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH", "scaling.json")
    if os.environ.get("SPARK_GRAFT_BENCH_FULL") == "1":
        runs = []
        # 1->4 is the headline N->4N pair: past 4 threads the shared local
        # JVM degrades per-core (memory bus/GC) in a way a real multi-
        # executor cluster does not — see BENCH/scaling.json pair_choice
        for p in (1, 4):
            out = subprocess.run(
                [
                    sys.executable,
                    os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools", "bench_cdc.py"),
                    "--parallelism", str(p),
                    "--n-events", "20000000",
                    "--n-chunks", "2",
                    "--n-convs", "500000",
                    "--workdir", os.path.join(base, "full"),
                ],
                capture_output=True,
                text=True,
                check=True,
            )
            runs.append(json.loads(out.stdout.strip().splitlines()[-1]))
        eff = runs[1]["events_per_sec"] / (4 * runs[0]["events_per_sec"])
        scaling = {"runs": runs, "scaling_efficiency": round(eff, 3)}
    elif os.path.exists(scaling_path):
        # emit the LATEST round's confirmed pair, not the historical
        # top-level headline (r5 verdict wrong #2: the driver record
        # silently carried r3's 0.881 while r5 had measured 0.915/0.984).
        # scaling.json's `latest_confirmation` names the current record.
        with open(scaling_path) as f:
            rec = json.load(f)
        latest_key = rec.get("latest_confirmation")
        latest = rec.get(latest_key) if latest_key else None
        cur = latest if isinstance(latest, dict) else rec
        scaling = {
            "recorded": True,
            "confirmation": latest_key or "initial",
            "runs": cur["runs"],
            "scaling_efficiency": cur["scaling_efficiency"],
            "see": "BENCH/BASELINE.md",
        }

    # Full detail -> file; the FINAL stdout line stays compact so the
    # driver's bounded tail capture parses it (r3 lesson: one giant line
    # was truncated and the round's headline number was lost).
    detail = {
        "metric": "headline suite wall seconds (14 operators, noop sink, steady-state pass; cold pass incl. plan compile reported alongside) + CDC changelog->upsert throughput",
        "value": round(total, 2),
        "unit": "sec",
        "queries": queries,
        "queries_steady_samples": queries_samples,
        "steady_median_of": n_steady,
        "value_cold": round(total_cold, 2),
        "queries_cold": queries_cold,
        "sf": sf,
        "cdc": cdc_info,
        "cdc_large_batch": large_batch,
        "cdc_scaling": scaling,
        "sf1": sf1,
        "soak": soak,
        "soak_stream": soak_stream,
        "recall": recall,
        "op_ab": op_ab,
        "decode_overhead": decode_oh,
        "box_canary": canary,
    }
    detail_path = os.path.join(here, "BENCH", "latest.json")
    os.makedirs(os.path.dirname(detail_path), exist_ok=True)
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1)

    compact = {
        "metric": "headline steady sec (14 ops, median of %d) + CDC ev/s "
        "(median of %d)" % (n_steady, n_cdc_samples),
        "value": round(total, 2),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "value_cold": round(total_cold, 2),
        "cdc": {
            "cow_events_per_sec": cdc_info["cow"]["events_per_sec"],
            "mor_events_per_sec": cdc_info["mor"]["events_per_sec"],
            # canary-normalized (x canary_now/0.703, the pinned r6
            # reference): cross-round comparable on this noisy box
            "cow_normalized": cdc_info["cow"].get("events_per_sec_normalized"),
            "mor_normalized": cdc_info["mor"].get("events_per_sec_normalized"),
            # actual successful samples (may be < requested after a flake)
            "median_of": min(
                cdc_info[m].get("median_of", 0) for m in ("cow", "mor")
            ),
            "n_events": CDC_BENCH_EVENTS,
        },
        "scaling": (
            {
                "pair": "1->4",
                "efficiency": scaling["scaling_efficiency"],
                "confirmation": scaling.get("confirmation"),
            }
            if scaling
            else None
        ),
        "box_canary_sec": canary["sec"],
        "sf1": (
            {
                "value": sf1.get("value"),
                "ratio": sf1.get("ratio_total"),
                "stale": sf1.get("stale"),
            }
            if sf1
            else None
        ),
        "soak": (
            {
                "decay": soak.get("decay"),
                "pass": soak.get("decay_pass"),
                "events": soak.get("config", {}).get("n_events"),
                "stale": soak.get("stale"),
            }
            if soak
            else None
        ),
        "soak_stream": (
            {
                "decay": soak_stream.get("decay"),
                "pass": soak_stream.get("decay_pass"),
                "events": soak_stream.get("config", {}).get("n_events"),
                "overhead_vs_batched": soak_stream.get(
                    "streaming_overhead_vs_batched"
                ),
                "stale": soak_stream.get("stale"),
            }
            if soak_stream
            else None
        ),
        "decode_overhead": (
            {
                "surcharge_us_per_event": decode_oh.get(
                    "decode_surcharge_us_per_event"
                ),
                "fraction_of_soak_gap": decode_oh.get(
                    "decode_fraction_of_soak_gap"
                ),
                "stale": decode_oh.get("stale"),
            }
            if decode_oh
            else None
        ),
        "recall": (
            {
                "pass": recall.get("all_pass"),
                "scales": sorted(recall.get("scales", {})),
                "stale": recall.get("stale"),
            }
            if recall
            else None
        ),
        "op_ab": (
            {
                "all_noise": op_ab.get("all_noise"),
                "ratios": {
                    n: v.get("ratio_new_over_old")
                    for n, v in op_ab.get("ops", {}).items()
                },
                "stale": op_ab.get("stale"),
            }
            if op_ab
            else None
        ),
        "detail": "BENCH/latest.json",
    }
    sys.stdout.flush()
    print(json.dumps(compact), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
