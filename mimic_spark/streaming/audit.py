"""Post-run audit gate — checks that FAIL the run, not just report.

The reference's audit workflow is a gate: its final SQL statement forces a
cast error to abort the pipeline when checks fail
(etl/audit/post_etl_audit.sql:456-499).  Here the same role is a module that
raises AuditError (nonzero exit in job.py) on violated expectations:

A1 key uniqueness      — one live row per (conv_id, turn_idx)
A2 watermark sanity    — no row carries an LSN above the committed watermark
A3 ledger continuity   — batch ids 0..n with no holes
A4 lineage coverage    — every applied batch has per-partition metrics rows
A5 population equality — optional expected row count (the reference's
                         row-count reconciliation, test/qa/qa_person.sql)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import functions as F

from mimic_spark.streaming.apply import TranscriptCdc


class AuditError(Exception):
    pass


@dataclass
class AuditReport:
    checks: dict[str, Any] = field(default_factory=dict)
    failures: list[str] = field(default_factory=list)

    def record(self, name: str, ok: bool, detail: Any) -> None:
        self.checks[name] = {"ok": ok, "detail": detail}
        if not ok:
            self.failures.append(f"{name}: {detail}")


def run_audit(
    cdc: TranscriptCdc,
    expected_final_count: int | None = None,
    fail_on_error: bool = True,
) -> AuditReport:
    rep = AuditReport()
    keys = cdc.table.key_cols

    live = cdc.read_published()
    stats = live.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(*[F.col(k) for k in keys]).alias("nk"),
    ).collect()[0]
    rep.record(
        "key_uniqueness",
        stats["n"] == stats["nk"],
        {"rows": stats["n"], "distinct_keys": stats["nk"]},
    )

    wm = cdc.high_watermark()
    max_lsn = cdc.table.read().agg(F.max("_lsn")).collect()[0][0]
    rep.record(
        "watermark",
        wm is not None and (max_lsn is None or max_lsn <= wm),
        {"lsn_hi": wm, "max_row_lsn": max_lsn},
    )

    ledger = cdc.ledger.read().collect()
    batch_ids = sorted(r["batch_id"] for r in ledger)
    contiguous = batch_ids == list(range(len(batch_ids)))
    rep.record("ledger_continuity", contiguous, {"batch_ids": batch_ids})

    applied = {r["batch_id"] for r in ledger if not r["recovered"] and (r["rows_applied"] or 0) > 0}
    with_metrics = {
        r["batch_id"]
        for r in cdc.metrics.read().select("batch_id").distinct().collect()
    }
    missing = sorted(applied - with_metrics)
    rep.record("lineage_coverage", not missing, {"batches_missing_metrics": missing})

    if expected_final_count is not None:
        rep.record(
            "population_equality",
            stats["n"] == expected_final_count,
            {"rows": stats["n"], "expected": expected_final_count},
        )

    if rep.failures and fail_on_error:
        raise AuditError("; ".join(rep.failures))
    return rep
