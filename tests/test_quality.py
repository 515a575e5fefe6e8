"""Data-quality check generator (reference test/ut + test/qa parity)."""

from __future__ import annotations

import pytest

from mimic_spark.quality import QualityError, run_quality_suite

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def views(spark):
    for t in ("orders", "lineitem", "customer", "events"):
        spark.read.parquet(f"{SF}/{t}.parquet").createOrReplaceTempView(t)
    yield
    for t in ("orders", "lineitem", "customer", "events"):
        spark.catalog.dropTempView(t)


CHECKS = [
    {"type": "unique", "table": "orders", "cols": ["o_orderkey"]},
    # (driver-synthetic lineitem does NOT have unique (orderkey, linenumber);
    # events.event_id is the honest unique key in this star schema)
    {"type": "unique", "table": "events", "cols": ["event_id"]},
    {"type": "not_null", "table": "orders", "cols": ["o_orderkey", "o_custkey"]},
    {
        "type": "fk",
        "table": "lineitem",
        "cols": ["l_orderkey"],
        "ref": "orders",
        "ref_cols": ["o_orderkey"],
    },
    {
        "type": "fk",
        "table": "orders",
        "cols": ["o_custkey"],
        "ref": "customer",
        "ref_cols": ["c_custkey"],
    },
    {"type": "range", "table": "lineitem", "col": "l_discount", "min": 0.0, "max": 0.1},
    {
        "type": "start_le_end",
        "table": "orders",
        "start": "o_orderdate",
        "end": "o_orderdate",
    },
]


def test_quality_suite_passes(spark, views):
    results = run_quality_suite(spark, CHECKS)
    assert all(r.passed for r in results)
    report = {r["name"]: r for r in spark.table("report_unit_test").collect()}
    assert len(report) == len(CHECKS)
    assert all(r["passed"] for r in report.values())


def test_quality_suite_gates(spark, views):
    bad = CHECKS + [
        # events.user_id is not unique -> must fail and abort
        {"type": "unique", "table": "events", "cols": ["user_id"], "name": "ev_uid"}
    ]
    with pytest.raises(QualityError, match="ev_uid"):
        run_quality_suite(spark, bad)
    results = run_quality_suite(spark, bad, fail_on_error=False)
    failed = [r for r in results if not r.passed]
    assert len(failed) == 1 and failed[0].violations > 0


def test_count_match_reconciliation(spark, views):
    spark.table("lineitem").createOrReplaceTempView("lineitem_copy")
    res = run_quality_suite(
        spark,
        [
            {
                "type": "count_match",
                "table": "lineitem",
                "ref": "lineitem_copy",
                "name": "qa_lineitem",
            },
            {
                "type": "count_match",
                "table": "lineitem",
                "ref": "lineitem_copy",
                "where": "l_quantity > 25",
                "ref_where": "l_quantity > 25",
                "name": "qa_lineitem_filtered",
            },
        ],
    )
    assert all(r.passed for r in res)
    spark.catalog.dropTempView("lineitem_copy")
