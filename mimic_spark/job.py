"""spark-submit entry point for the CDC engine.

    spark-submit --py-files mimic_spark.zip -m ... mimic_spark/job.py \
        [--conf job.json] [--set n_events=1000000] [--set mode=stream]

Runs: generate/locate changelog -> apply (stream or batch mode) -> audit gate
-> print one summary JSON line.  Exit code 1 on audit failure (the
reference's forced-error abort, post_etl_audit.sql:456-499).

On a real cluster the generator is replaced by the actual binlog/WAL source
(Kafka/Iceberg-changelog readStream); everything downstream is unchanged.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

from mimic_spark.config import load_config
from mimic_spark.session import get_spark
from mimic_spark.sources.changelog import ChangelogSpec, write_changelog_chunks
from mimic_spark.streaming.apply import TranscriptCdc, run_batched
from mimic_spark.streaming.audit import AuditError, run_audit
from mimic_spark.streaming.cdc import run_stream


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--conf", default=None, help="JSON config file")
    ap.add_argument("--set", action="append", default=[], help="k=v override")
    args = ap.parse_args(argv)
    conf = load_config(args.conf, args.set)

    spark = get_spark(parallelism=conf["parallelism"], app_name="mimic_spark_job")
    spec = ChangelogSpec(
        n_events=int(conf["n_events"]),
        n_convs=int(conf["n_convs"]),
        n_chunks=int(conf["n_chunks"]),
    )
    workdir = conf["workdir"]
    t0 = time.time()
    chunks = write_changelog_chunks(
        spark, spec, os.path.join(workdir, "changelog")
    )
    t_gen = time.time() - t0

    table = os.path.join(workdir, "transcripts")
    t1 = time.time()
    if conf["mode"] == "stream":
        cdc = run_stream(
            spark,
            os.path.join(workdir, "changelog", "chunk-*"),
            table,
            os.path.join(workdir, "ckpt"),
            n_buckets=int(conf["n_buckets"]),
            max_files_per_trigger=4,
        )
    else:
        cdc = TranscriptCdc(spark, table, n_buckets=int(conf["n_buckets"]))
        run_batched(spark, cdc, chunks)
    t_apply = time.time() - t1

    try:
        report = run_audit(
            cdc,
            expected_final_count=conf["expected_final_count"],
            fail_on_error=conf["fail_on_audit"],
        )
        audit_ok = True
        audit_detail = report.checks
    except AuditError as e:
        audit_ok = False
        audit_detail = str(e)

    n_final = cdc.read_published().count()
    print(
        json.dumps(
            {
                "mode": conf["mode"],
                "n_events": spec.n_events,
                "final_rows": n_final,
                "watermark": cdc.high_watermark(),
                "gen_sec": round(t_gen, 2),
                "apply_sec": round(t_apply, 2),
                "events_per_sec": round(spec.n_events / t_apply, 1),
                "audit_ok": audit_ok,
                "audit": audit_detail,
            },
            default=str,
        )
    )
    return 0 if audit_ok else 1


if __name__ == "__main__":
    sys.exit(main())
