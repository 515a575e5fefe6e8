"""Interleaved old-code/new-code A/B for per-op regression adjudication
(r7 verdict Next #4).

r7's raw headline medians moved +40-59% on three ops whose code was
untouched between rounds (`era_gaps_islands`, `sessionize_gaps`,
`q1_pricing_summary`) while the box canary moved +29% — the canary covers
the aggregate but is a pure JVM hash-agg that may not track shuffle-bound
ops.  Cross-round raw comparisons on this box are unreliable (documented
25-35% phase swings); the only measurement that settles a suspected
regression is an INTERLEAVED A/B: alternate old-code and new-code
subprocesses on the same box within minutes, so box phase hits both sides
equally and the per-op RATIO is clean even when absolutes are not.

Method: git worktree at --old-rev; --rounds alternating (old, new) sample
pairs; each sample is its own JVM running each op once warm + 3 steady and
reporting the steady median; verdict per op from median(new)/median(old):
<= 1 + --tolerance -> "noise confirmed", else "regression".

Usage: python tools/ab_adjudicate.py --old-rev <r6-commit>   # ~12 min
"""

from __future__ import annotations

import argparse
import datetime as dt
import json
import os
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

SAMPLE_SCRIPT = '''
import json, sys, time
from mimic_spark.session import get_spark
from mimic_spark.operators import OPS
from mimic_spark.operators.windows import era_gaps_islands

ops = {}
for name in sys.argv[1].split(","):
    ops[name] = era_gaps_islands if name == "era_gaps_islands" else OPS[name].fn
spark = get_spark(
    parallelism=32, app_name="ab_op", shuffle_partitions=64,
    extra_conf={
        "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
        "spark.sql.files.openCostInBytes": str(1024 * 1024),
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(8 * 1024 * 1024),
    },
)
spark.range(1_000_000).selectExpr("sum(id)").collect()
out = {}
for name, fn in ops.items():
    fn(spark, sys.argv[2]).write.format("noop").mode("overwrite").save()
    ss = []
    for _ in range(3):
        t0 = time.time()
        fn(spark, sys.argv[2]).write.format("noop").mode("overwrite").save()
        ss.append(round(time.time() - t0, 3))
    out[name] = sorted(ss)[1]
print("ABRESULT " + json.dumps(out))
'''


def one_sample(pythonpath: str, script: str, ops: str, sf_dir: str) -> dict:
    env = {**os.environ, "PYTHONPATH": pythonpath}
    out = subprocess.run(
        [sys.executable, script, ops, sf_dir],
        capture_output=True, text=True, env=env, check=True, timeout=600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    raise RuntimeError(f"no ABRESULT line:\n{out.stdout[-2000:]}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--old-rev", required=True)
    ap.add_argument(
        "--ops",
        default="era_gaps_islands,sessionize_gaps,q1_pricing_summary",
    )
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--tolerance", type=float, default=0.15)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--out", default=os.path.join(REPO, "BENCH", "ab_r8.json")
    )
    args = ap.parse_args()

    old_tree = tempfile.mkdtemp(prefix="ab_old_")
    subprocess.run(
        ["git", "worktree", "add", "-f", old_tree, args.old_rev],
        cwd=REPO, check=True, capture_output=True,
    )
    script = tempfile.mktemp(suffix=".py", prefix="ab_sample_")
    with open(script, "w") as f:
        f.write(SAMPLE_SCRIPT)

    names = args.ops.split(",")
    samples: dict[str, dict[str, list[float]]] = {
        n: {"old": [], "new": []} for n in names
    }
    try:
        for r in range(args.rounds):
            for side, pp in (("old", old_tree), ("new", REPO)):
                res = one_sample(pp, script, args.ops, args.sf_dir)
                for n in names:
                    samples[n][side].append(res[n])
                print(
                    json.dumps({"round": r, "side": side, **res}),
                    file=sys.stderr,
                )
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", old_tree],
            cwd=REPO, capture_output=True,
        )

    def med(xs):
        xs = sorted(xs)
        return xs[len(xs) // 2]

    verdicts = {}
    for n in names:
        old_m, new_m = med(samples[n]["old"]), med(samples[n]["new"])
        ratio = round(new_m / old_m, 3) if old_m else None
        verdicts[n] = {
            "old_median": old_m,
            "new_median": new_m,
            "ratio_new_over_old": ratio,
            "old_samples": samples[n]["old"],
            "new_samples": samples[n]["new"],
            "verdict": (
                "noise confirmed"
                if ratio is not None and ratio <= 1 + args.tolerance
                else "regression"
            ),
        }
    try:
        rev = subprocess.run(
            ["git", "rev-parse", "HEAD"],
            capture_output=True, text=True, cwd=REPO, check=True,
        ).stdout.strip()
    except Exception:
        rev = None
    out = {
        "what": "interleaved old/new A/B per op: alternating single-JVM "
        "samples (each = warm + median of 3 steady) on one box within "
        "minutes, so box phase cancels in the ratio.  Adjudicates the r7 "
        "raw headline moves that exceeded canary drift on untouched code.",
        "git_rev": rev,
        "old_rev": args.old_rev,
        "measured_at": dt.datetime.now(dt.timezone.utc).isoformat(
            timespec="seconds"
        ),
        "sf_dir": args.sf_dir,
        "rounds": args.rounds,
        "tolerance": args.tolerance,
        "ops": verdicts,
        "all_noise": all(
            v["verdict"] == "noise confirmed" for v in verdicts.values()
        ),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({n: v["ratio_new_over_old"] for n, v in verdicts.items()}
                     | {"all_noise": out["all_noise"]}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
