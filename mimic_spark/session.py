"""SparkSession factory.

Single place where engine-level Spark config lives so tests, bench and the
driver entry point all run with the same semantics.

Design notes (100 TB posture):
- AQE on: runtime coalescing + skew-join splitting are the first line of
  defense against skewed conversations (SURVEY.md §4 "skew handling").
- shuffle.partitions defaults to ~cores in local mode; on a real cluster this
  is overridden per-job (AQE coalesces down anyway).
- ANSI off: the engine mirrors the reference's TRY_CAST-tolerant load path
  (reference: scripts/ingest_mimic_csv_to_duckdb.py:553-573) and the DuckDB
  oracle comparisons assume permissive cast-to-NULL semantics.
- Session timezone pinned to UTC: reference timestamps are tz-naive
  (SURVEY.md §1.2); DuckDB oracle comparisons require it.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    parallelism: int | None = None,
    app_name: str = "mimic_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine SparkSession.

    parallelism: N for ``local[N]``; defaults to $SPARK_GRAFT_CPUS or '*'.
    """
    if parallelism is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{env}]" if env else "local[*]"
        cores = int(env) if env else (os.cpu_count() or 8)
    else:
        master = f"local[{parallelism}]"
        cores = parallelism

    if shuffle_partitions is None:
        shuffle_partitions = max(8, cores)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # r9 (guide §3.1/§9): let the planner pick shuffled-hash join when
        # its size conditions hold — avoids both sort passes of sort-merge
        # for the CDC COW full-outer merge join; plan choice only, results
        # identical, SMJ still chosen when neither side fits in memory
        .config("spark.sql.join.preferSortMergeJoin", "false")
        # r9 (guide §4.2): 4x default Arrow batch so the vectorized
        # normalize/kernel passes amortize per-batch fixed costs; rows here
        # are narrow (text columns ~300 B), so 40k rows is ~12 MB per batch
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "40000")
        .config("spark.driver.memory", os.environ.get("MIMIC_SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # TIMESTAMP_MICROS instead of legacy INT96: INT96 carries NO parquet
        # column statistics, which would blind the manifest ts-range
        # harvesting (lakehouse/table.py:_footer_stats) and parquet row-group
        # pruning on ts predicates
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # parquet: keep filter pushdown + column pruning observable in plans
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    # driver-sim hook: JSON dict of conf overrides applied LAST, so tools
    # (check_correctness, bench) can be re-run under a foreign session
    # config (ANSI on, non-UTC timezone) without code changes, e.g.
    #   MIMIC_SPARK_CONF_JSON='{"spark.sql.ansi.enabled":"true"}'
    env_conf = os.environ.get("MIMIC_SPARK_CONF_JSON")
    if env_conf:
        import json as _json

        for k, v in _json.loads(env_conf).items():
            builder = builder.config(k, str(v))
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
