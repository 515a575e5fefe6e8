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
A6 poison ratio        — dead-lettered events / total events stays under a
                         threshold (a quietly rotting producer should stop
                         the pipeline, not fill the DLQ forever)
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
    max_reject_ratio: float | None = 0.01,
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

    # Continuity as an aggregate — never collect the full ledger: it grows
    # with the stream's lifetime (10^10 events => millions of batches).
    # Unique + contiguous from 0 <=> count == distinct == max+1.
    ls = (
        cdc.ledger.read()
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("batch_id").alias("nd"),
            F.max("batch_id").alias("mx"),
        )
        .collect()[0]
    )
    contiguous = ls["n"] == 0 or (ls["nd"] == ls["n"] and ls["mx"] == ls["n"] - 1)
    rep.record(
        "ledger_continuity",
        contiguous,
        {"n_batches": ls["n"], "distinct": ls["nd"], "max_batch_id": ls["mx"]},
    )

    # Coverage as an anti-join (distributed), reporting only a bounded sample
    # of offenders instead of materializing every batch id on the driver.
    applied = cdc.ledger.read().filter(
        (~F.coalesce(F.col("recovered"), F.lit(False)))
        & (F.coalesce(F.col("rows_applied"), F.lit(0)) > 0)
    ).select("batch_id")
    with_metrics = cdc.metrics.read().select("batch_id").distinct()
    missing = [
        r["batch_id"]
        for r in applied.join(with_metrics, "batch_id", "left_anti")
        .orderBy("batch_id")
        .limit(20)
        .collect()
    ]
    rep.record("lineage_coverage", not missing, {"batches_missing_metrics": missing})

    if expected_final_count is not None:
        rep.record(
            "population_equality",
            stats["n"] == expected_final_count,
            {"rows": stats["n"], "expected": expected_final_count},
        )

    if max_reject_ratio is not None:
        # one aggregate over the (compacted, bounded) metrics table — the
        # DLQ itself is not scanned (it may legitimately be absent).  A
        # metrics table written before the DLQ feature existed lacks the
        # 'rejects' column entirely; absence means zero rejects, not a crash.
        mdf = cdc.metrics.read()
        rej_col = (
            F.sum("rejects") if "rejects" in mdf.columns else F.sum(F.lit(0))
        )
        ms = (
            mdf.agg(
                F.coalesce(rej_col, F.lit(0)).alias("rej"),
                F.coalesce(F.sum("rows_in"), F.lit(0)).alias("total"),
            )
            .collect()[0]
        )
        ratio = (int(ms["rej"]) / int(ms["total"])) if ms["total"] else 0.0
        rep.record(
            "poison_ratio",
            ratio <= max_reject_ratio,
            {
                "rejects": int(ms["rej"]),
                "events": int(ms["total"]),
                "ratio": round(ratio, 6),
                "max": max_reject_ratio,
            },
        )

    # Bucket-layout report (informational, never fails the run): surfaces
    # the rows-per-bucket drift and any pending rebucket recommendation
    # committed by maintenance.maybe_rebucket — driver-side footer stats,
    # no scan.
    snap = cdc.table.snapshot()
    frows = [f.get("rows") for f in snap.files]
    total = sum(int(r) for r in frows if r is not None)
    nb = cdc.table._n_buckets_from(snap.props)
    rec = snap.props.get("rebucket.recommended")
    rep.record(
        "bucket_layout",
        True,
        {
            "n_buckets": nb,
            "total_rows": total,
            "rows_per_bucket": round(total / nb, 1) if nb else None,
            "rebucket_recommended": None if rec is None else int(rec),
        },
    )

    if rep.failures and fail_on_error:
        raise AuditError("; ".join(rep.failures))
    return rep
