"""Config-driven data-quality checks — the reference's generated UT layer.

The reference expands per-table configs into uniqueness / FK / NOT-NULL /
range checks whose boolean outcomes land in a ``report_unit_test`` table
(test/ut/gen_bq_ut_basic.py, templates test/ut/ut_templates.sql:14-160), and
reconciles src-vs-cdm row counts per unit (test/qa/qa_person.sql:14-41).
Same surface here, Spark-first: a check spec list -> one result row per check
-> optional gate (QualityError) on failures.

Check types:
- unique:      {type, table, cols}                 no duplicate (cols) tuples
- not_null:    {type, table, cols}                 no NULLs in any col
- fk:          {type, table, cols, ref, ref_cols}  all non-null keys resolve
- range:       {type, table, col, min?, max?}      values within bounds
- start_le_end:{type, table, start, end}           start <= end where both set
- count_match: {type, table, ref, where?, ref_where?}  row-count equality
  (the QA reconciliation layer)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class QualityError(Exception):
    pass


@dataclass
class CheckResult:
    name: str
    check_type: str
    table: str
    passed: bool
    violations: int
    detail: str


def _view(spark: SparkSession, name: str) -> DataFrame:
    return spark.table(name)


def run_check(spark: SparkSession, spec: dict[str, Any]) -> CheckResult:
    ctype = spec["type"]
    table = spec["table"]
    df = _view(spark, table)
    name = spec.get("name", f"{ctype}:{table}")

    if ctype == "unique":
        cols = spec["cols"]
        dup = (
            df.groupBy(*cols)
            .count()
            .filter(F.col("count") > 1)
            .agg(F.coalesce(F.sum("count"), F.lit(0)))
            .collect()[0][0]
        )
        return CheckResult(name, ctype, table, dup == 0, int(dup), f"cols={cols}")

    if ctype == "not_null":
        cols = spec["cols"]
        cond = None
        for c in cols:
            cur = F.col(c).isNull()
            cond = cur if cond is None else (cond | cur)
        n = df.filter(cond).count()
        return CheckResult(name, ctype, table, n == 0, n, f"cols={cols}")

    if ctype == "fk":
        cols, ref, ref_cols = spec["cols"], spec["ref"], spec["ref_cols"]
        ref_df = _view(spark, ref).select(
            *[F.col(rc).alias(c) for c, rc in zip(cols, ref_cols)]
        ).distinct()
        lhs = df.select(*cols).na.drop()
        n = lhs.join(ref_df, cols, "left_anti").count()
        return CheckResult(
            name, ctype, table, n == 0, n, f"{cols} -> {ref}.{ref_cols}"
        )

    if ctype == "range":
        c = F.col(spec["col"])
        cond = F.lit(False)
        if "min" in spec:
            cond = cond | (c < F.lit(spec["min"]))
        if "max" in spec:
            cond = cond | (c > F.lit(spec["max"]))
        n = df.filter(cond).count()
        return CheckResult(
            name, ctype, table, n == 0, n,
            f"{spec['col']} in [{spec.get('min')}, {spec.get('max')}]",
        )

    if ctype == "start_le_end":
        s, e = F.col(spec["start"]), F.col(spec["end"])
        n = df.filter(s.isNotNull() & e.isNotNull() & (s > e)).count()
        return CheckResult(
            name, ctype, table, n == 0, n, f"{spec['start']} <= {spec['end']}"
        )

    if ctype == "count_match":
        lhs = df
        if spec.get("where"):
            lhs = lhs.filter(spec["where"])
        rhs = _view(spark, spec["ref"])
        if spec.get("ref_where"):
            rhs = rhs.filter(spec["ref_where"])
        a, b = lhs.count(), rhs.count()
        return CheckResult(
            name, ctype, table, a == b, abs(a - b),
            f"{table}={a} vs {spec['ref']}={b}",
        )

    raise ValueError(f"unknown check type: {ctype!r}")


def run_quality_suite(
    spark: SparkSession,
    checks: list[dict[str, Any]],
    fail_on_error: bool = True,
    report_view: str | None = "report_unit_test",
) -> list[CheckResult]:
    """Run all checks; optionally register the report (the reference's
    report_unit_test table) and gate on failures."""
    results = [run_check(spark, spec) for spec in checks]
    if report_view:
        spark.createDataFrame(
            [
                (r.name, r.check_type, r.table, r.passed, r.violations, r.detail)
                for r in results
            ],
            "name string, check_type string, table string, passed boolean, "
            "violations long, detail string",
        ).createOrReplaceTempView(report_view)
    failures = [r for r in results if not r.passed]
    if failures and fail_on_error:
        raise QualityError(
            "; ".join(f"{r.name}: {r.violations} violations" for r in failures)
        )
    return results
