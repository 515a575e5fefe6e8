"""Flagship query: the CDC engine end-to-end as a catalog entry.

Generates a deterministic changelog, applies it through the full pipeline
(dedup -> normalize -> MERGE with exactly-once markers) into a fresh
snapshot table, and returns the published transcripts.  Not SQL-expressible
(stateful multi-commit engine) => rows-only driver check; the strong
correctness check is tests/test_cdc_e2e.py's replay-oracle equality.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

from mimic_spark.operators.catalog import register
from mimic_spark.sources.changelog import ChangelogSpec, write_changelog_chunks
from mimic_spark.streaming.apply import TranscriptCdc, run_batched

FLAGSHIP_SPEC = ChangelogSpec(n_events=8000, n_convs=160, n_chunks=6)


def run_cdc_flagship(
    spark: SparkSession,
    spec: ChangelogSpec = FLAGSHIP_SPEC,
    workdir: str | None = None,
) -> DataFrame:
    if workdir is None:
        workdir = tempfile.mkdtemp(prefix="mimic_spark_flagship_")
    else:
        shutil.rmtree(workdir, ignore_errors=True)
        os.makedirs(workdir, exist_ok=True)
    chunks = write_changelog_chunks(spark, spec, os.path.join(workdir, "changelog"))
    cdc = TranscriptCdc(spark, os.path.join(workdir, "transcripts"))
    run_batched(spark, cdc, chunks)
    return cdc.read_published().select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts"
    )


@register(
    "cdc_transcripts_final",
    family="north_star: changelog tail -> dedup -> exactly-once MERGE -> published transcripts",
    oracle=None,  # stateful engine; equality vs sequential-replay oracle is
    # asserted in tests/test_cdc_e2e.py::test_cdc_e2e_matches_replay_oracle
)
def cdc_transcripts_final(spark: SparkSession, sf: str) -> DataFrame:
    return run_cdc_flagship(spark)


@register(
    "rollup_conv_incremental",
    family="streaming: change-feed-maintained per-conversation aggregate table (incremental view maintenance, delta+retraction)",
    oracle=None,  # multi-commit stateful pipeline; equality vs a full
    # groupBy recompute after EVERY poll is asserted in tests/test_rollup.py
)
def rollup_conv_incremental(spark: SparkSession, sf: str) -> DataFrame:
    """End-to-end IVM demo (r5): CDC-apply a deterministic changelog batch
    by batch, maintaining the conversation rollup from the change feed
    after each batch; returns the final materialized rollup (which
    tests/test_rollup.py proves equals the full recompute at every
    intermediate state, through deletes, stale events, and restarts)."""
    import tempfile

    from pyspark.sql import functions as F

    from mimic_spark.streaming.rollup import IncrementalConvRollup

    workdir = tempfile.mkdtemp(prefix="mimic_spark_rollup_")
    spec = ChangelogSpec(n_events=6000, n_convs=120, n_chunks=4)
    chunks = write_changelog_chunks(
        spark, spec, os.path.join(workdir, "changelog")
    )
    cdc = TranscriptCdc(
        spark, os.path.join(workdir, "transcripts"), mode="mor",
        compact_every=0,
    )
    roll = IncrementalConvRollup(
        spark, cdc.table_path, os.path.join(workdir, "conv_rollup")
    )
    for i, chunk in enumerate(chunks):
        # apply ONLY the new chunk: replaying the whole prefix would still
        # converge (merge idempotence) but re-scan every prior batch
        cdc.apply_batch(spark.read.parquet(chunk), i)
        roll.run_until_idle()
    return roll.read().orderBy("conv_id").select(
        "conv_id", "n_turns", "n_chars", "max_ts", F.col("src_version")
    )


@register(
    "wap_publish_pipeline",
    family="lakehouse: write-audit-publish staged ingest (stage -> audit -> publish/abort, Iceberg spark.wap.id role)",
    oracle=None,  # multi-commit metadata pipeline; invisibility/publish/
    # abort/GC semantics are asserted in tests/test_wap.py
)
def wap_publish_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    """Write-audit-publish demo (r5): CDC-ingest a changelog, then stage a
    suspicious batch invisibly, audit it (reject -> abort), stage a clean
    batch, audit it (accept -> metadata-only publish), and return the
    published table — which tests/test_wap.py proves never exposed staged
    or aborted rows to default readers or change-feed consumers."""
    import tempfile

    from pyspark.sql import functions as F

    from mimic_spark.lakehouse import wap

    workdir = tempfile.mkdtemp(prefix="mimic_spark_wap_")
    spec = ChangelogSpec(n_events=4000, n_convs=100, n_chunks=3)
    chunks = write_changelog_chunks(
        spark, spec, os.path.join(workdir, "changelog")
    )
    cdc = TranscriptCdc(spark, os.path.join(workdir, "transcripts"))
    run_batched(spark, cdc, chunks)
    t = cdc.table
    wm = cdc.high_watermark()
    row_schema = (
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp, _lsn long, _deleted boolean"
    )
    # batch 1: empty text rows -> audit rejects -> abort (files orphaned)
    bad = spark.createDataFrame(
        [("wap_bad", i, "user", "", None, None, wm + 1 + i, False)
         for i in range(3)],
        row_schema,
    )
    wap.stage(t, bad, "audit-reject")
    try:
        wap.publish(
            t, "audit-reject",
            audit=lambda df: (_ for _ in ()).throw(
                ValueError("empty text rows")
            ) if df.filter(
                (F.col("conv_id") == "wap_bad") & (F.col("text") == "")
            ).count() > 0 else None,
        )
    except wap.StagedAuditError:
        wap.abort(t, "audit-reject")
    # batch 2: clean rows -> audit passes -> published atomically
    good = spark.createDataFrame(
        [("wap_ok", i, "assistant", f"audited turn {i}", None, None,
          wm + 10 + i, False) for i in range(3)],
        row_schema,
    )
    wap.stage(t, good, "audit-accept")
    wap.publish(
        t, "audit-accept",
        audit=lambda df: None if df.filter(
            (F.col("conv_id") == "wap_ok") & (F.col("text") == "")
        ).count() == 0 else (_ for _ in ()).throw(ValueError("empty text")),
    )
    return cdc.read_published().select(
        "conv_id", "turn_idx", "role", "text"
    )
