"""Workflow runner: SQL steps (split/substitution), ingest, cdc, audit gate."""

from __future__ import annotations

import os

import pytest

from mimic_spark.sources.changelog import ChangelogSpec, write_changelog_chunks
from mimic_spark.streaming.audit import AuditError
from mimic_spark.workflow import run_workflow, split_statements


def test_split_statements():
    sql = """
-- a comment line; with a semicolon
CREATE OR REPLACE TEMP VIEW v AS SELECT 1 AS a; -- trailing
SELECT a, ';' AS semi, concat(a, ';') FROM v WHERE a IN (1, 2);
SELECT 2
"""
    stmts = split_statements(sql)
    assert len(stmts) == 3
    assert stmts[0].startswith("CREATE OR REPLACE TEMP VIEW")
    assert "';'" in stmts[1]  # semicolons inside strings survive
    assert stmts[2] == "SELECT 2"


def test_workflow_end_to_end(spark, tmp_table_dir):
    spec = ChangelogSpec(n_events=2000, n_convs=50, n_chunks=3)
    chunks = write_changelog_chunks(
        spark, spec, os.path.join(tmp_table_dir, "changelog")
    )
    csv_path = os.path.join(tmp_table_dir, "dim.csv")
    with open(csv_path, "w") as f:
        f.write("role_id,role\n0,system\n1,user\n2,assistant\n3,tool\n")
    ddl_path = os.path.join(tmp_table_dir, "dim.sql")
    with open(ddl_path, "w") as f:
        f.write("CREATE TABLE roles (role_id INTEGER, role VARCHAR(16));")

    md_dir = os.path.join(tmp_table_dir, "run_metadata")
    conf = {
        "variables": {"base": tmp_table_dir, "table": "@base/transcripts"},
        "run_metadata_dir": md_dir,
        "steps": [
            {
                "name": "load_dims",
                "type": "ingest",
                "ddl": ddl_path,
                "target_dir": os.path.join(tmp_table_dir, "dims"),
                "tables": {"roles": csv_path},
            },
            {
                "name": "apply_cdc",
                "type": "cdc",
                "table": "@table",
                "chunks": chunks,
                "register": "transcripts",
            },
            {
                "name": "rollup",
                "type": "sql",
                "scripts": [
                    """
-- per-role turn counts joined to the ingested dim
CREATE OR REPLACE TEMP VIEW roles_v AS
  SELECT * FROM parquet.`@base/dims/roles`;
SELECT r.role_id AS role_id, t.role AS role, count(*) AS n
FROM transcripts t JOIN roles_v r ON t.role = r.role
GROUP BY r.role_id, t.role;
"""
                ],
                "register": "role_rollup",
            },
            {"name": "gate", "type": "audit"},
        ],
    }
    results = run_workflow(spark, conf)
    assert [r["name"] for r in results] == [
        "load_dims", "apply_cdc", "rollup", "gate",
    ]
    assert results[0]["result"]["roles"] == 4
    assert results[1]["result"]["watermark"] == spec.n_events - 1
    rollup = {r["role"]: r["n"] for r in spark.table("role_rollup").collect()}
    assert set(rollup) <= {"system", "user", "assistant", "tool"}
    assert sum(rollup.values()) == spark.table("transcripts").count()
    assert results[3]["result"]["key_uniqueness"]["ok"]

    # exactly one run-metadata row per run (reference audit.run_metadata,
    # scripts/run_workflow.py:183-203; mock E2E asserts exactly-1)
    import json as _json

    from mimic_spark.workflow import audit_run_metadata, read_run_metadata

    md = read_run_metadata(spark, md_dir).collect()
    assert len(md) == 1
    row = md[0]
    assert row["status"] == "ok" and row["error"] is None
    assert row["n_steps_done"] == 4
    assert [s["name"] for s in _json.loads(row["steps"])] == [
        "load_dims", "apply_cdc", "rollup", "gate",
    ]
    assert row["config_digest"] and len(row["config_digest"]) == 64
    audit_run_metadata(spark, md_dir, row["run_id"])

    # the audit step gates: impossible expectation aborts the workflow —
    # and the aborted run STILL stamps a (failed) run-metadata row
    conf_bad = dict(conf)
    conf_bad["steps"] = conf["steps"][:3] + [
        {"name": "gate", "type": "audit", "expected_final_count": -1}
    ]
    with pytest.raises(AuditError):
        run_workflow(spark, conf_bad)
    md2 = read_run_metadata(spark, md_dir).collect()
    assert len(md2) == 2
    failed = [r for r in md2 if r["status"] == "failed"]
    assert len(failed) == 1 and "AuditError" in failed[0]["error"]
    assert failed[0]["run_id"] != row["run_id"]

    # a FAILING metadata write must not mask the step exception (the write
    # runs in the finally block precisely when a step just died) — the
    # operator sees the AuditError, not the bogus-dir IO error
    conf_worse = dict(conf_bad)
    conf_worse["run_metadata_dir"] = os.path.join(
        tmp_table_dir, "not_a_dir_file"
    )
    open(conf_worse["run_metadata_dir"], "w").write("block the mkdir")
    with pytest.raises(AuditError):
        run_workflow(spark, conf_worse)


def test_full_workflow_conf_reproduces_flagship(spark, tmp_table_dir):
    """The checked-in conf/full.workflow.json (the reference's full.etlconf
    role) reproduces the flagship catalog result in ONE run_workflow call:
    generate -> cdc -> quality -> audit, published table identical to
    cdc_transcripts_final (same deterministic spec)."""
    import json

    from mimic_spark.operators.cdc_flagship import run_cdc_flagship

    with open("/root/repo/conf/full.workflow.json") as f:
        conf = json.load(f)
    conf["variables"]["workdir"] = tmp_table_dir

    results = run_workflow(spark, conf)
    assert [r["name"] for r in results] == [
        "gen_changelog", "apply_cdc", "quality", "gate",
    ]
    assert results[0]["result"]["chunks"] == 6
    assert all(c["passed"] for c in results[2]["result"])
    assert all(v["ok"] for v in results[3]["result"].values())

    got = sorted(
        tuple(r)
        for r in spark.table("transcripts")
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
        .collect()
    )
    want = sorted(
        tuple(r)
        for r in run_cdc_flagship(spark).collect()
    )
    assert got == want


def test_vocabulary_refresh_conf(spark, tmp_table_dir):
    """conf/vocabulary_refresh.workflow.json — the reference's config-driven
    vocab refresh (vocabulary_refresh.py -s10/-s20 + custom_vocabularies.sql):
    standard + custom CSVs in, refreshed concept table out with custom
    precedence on (vocabulary_id, concept_code) and the 2e9 id offset."""
    import json

    os.makedirs(os.path.join(tmp_table_dir, "athena"))
    os.makedirs(os.path.join(tmp_table_dir, "custom_mapping_csv"))
    with open(os.path.join(tmp_table_dir, "vocab.ddl.sql"), "w") as f:
        f.write(
            "CREATE TABLE concept (concept_id INTEGER, concept_name VARCHAR(64),"
            " vocabulary_id VARCHAR(16), concept_code VARCHAR(16));"
            "CREATE TABLE tmp_custom_mapping (concept_id INTEGER,"
            " concept_name VARCHAR(64), vocabulary_id VARCHAR(16),"
            " concept_code VARCHAR(16));"
        )
    with open(os.path.join(tmp_table_dir, "athena", "concept.csv"), "w") as f:
        f.write(
            "concept_id,concept_name,vocabulary_id,concept_code\n"
            "1,Aspirin,RxNorm,A1\n"
            "2,Warfarin,RxNorm,W1\n"
            "3,Glucose,LOINC,G1\n"
        )
    with open(
        os.path.join(tmp_table_dir, "custom_mapping_csv", "tmp_custom_mapping.csv"), "w"
    ) as f:
        f.write(
            "concept_id,concept_name,vocabulary_id,concept_code\n"
            "10,Aspirin (site),RxNorm,A1\n"   # overrides standard A1
            "11,Local obs,mimiciv_obs,X9\n"   # brand-new custom concept
        )

    with open("/root/repo/conf/vocabulary_refresh.workflow.json") as f:
        conf = json.load(f)
    conf["variables"]["workdir"] = tmp_table_dir

    results = run_workflow(spark, conf)
    assert results[0]["result"]["concept"] == 3
    assert results[1]["result"]["tmp_custom_mapping"] == 2
    assert all(c["passed"] for c in results[3]["result"])

    rows = {
        (r["vocabulary_id"], r["concept_code"]): r
        for r in spark.table("concept_refreshed").collect()
    }
    assert len(rows) == 4  # 3 standard, 1 overridden, 1 new
    assert rows[("RxNorm", "A1")]["vocab_source"] == "custom"
    assert rows[("RxNorm", "A1")]["concept_id"] == 2000000010
    assert rows[("RxNorm", "W1")]["vocab_source"] == "standard"
    assert rows[("mimiciv_obs", "X9")]["concept_id"] == 2000000011


def test_metrics_workflow_conf(spark, tmp_table_dir):
    """conf/metrics.workflow.json (the reference's workflow_metrics.conf
    role): attach an existing table, build report views for human review."""
    import json

    chunks = write_changelog_chunks(
        spark,
        ChangelogSpec(n_events=1500, n_convs=40, n_chunks=2),
        os.path.join(tmp_table_dir, "changelog"),
    )
    from mimic_spark.streaming.apply import TranscriptCdc, run_batched

    cdc = TranscriptCdc(spark, os.path.join(tmp_table_dir, "transcripts"), n_buckets=4)
    run_batched(spark, cdc, chunks)
    n = cdc.read_published().count()

    with open("/root/repo/conf/metrics.workflow.json") as f:
        conf = json.load(f)
    conf["variables"]["table"] = os.path.join(tmp_table_dir, "transcripts")
    results = run_workflow(spark, conf)
    assert results[0]["result"]["watermark"] is not None

    totals = spark.table("me_totals").collect()[0]
    assert totals["n_rows"] == n and totals["n_convs"] > 0
    roles = {r["role"]: r for r in spark.table("me_role_distribution").collect()}
    assert abs(sum(float(r["pct"]) for r in roles.values()) - 100.0) < 0.5
    top = spark.table("me_top_conversations").collect()
    assert len(top) <= 100 and top[0]["n_turns"] >= top[-1]["n_turns"]
    assert spark.table("me_tool_usage").count() >= 1


def test_derived_tables_workflow_conf(spark, tmp_table_dir):
    """conf/derived_tables.workflow.json: the staged->derived fan-out as
    config — source CDC apply, change-feed chained derived table,
    conf-driven maintenance (ts-clustered compaction, retention, orphan
    GC), SQL parity view, audit gate.  The derived table must equal the
    source's published state and end compacted."""
    import json

    from mimic_spark.lakehouse.table import SnapshotTable
    from mimic_spark.streaming.apply import TranscriptCdc

    write_changelog_chunks(
        spark,
        ChangelogSpec(n_events=1500, n_convs=40, n_chunks=2),
        os.path.join(tmp_table_dir, "changelog"),
    )
    with open("/root/repo/conf/derived_tables.workflow.json") as f:
        conf = json.load(f)
    conf["variables"]["root"] = tmp_table_dir
    conf["variables"]["changelog"] = os.path.join(tmp_table_dir, "changelog")
    # empty dict means "with defaults", not "skip" (falsy-check hazard)
    for s in conf["steps"]:
        if s["name"] == "maintain_derived":
            s["expire_snapshots"] = True  # boolean opt-in coerces to defaults
    results = run_workflow(spark, conf)
    by_name = {r["name"]: r["result"] for r in results}

    assert by_name["chain_derived"]["rows_applied"] > 0
    src = TranscriptCdc(spark, os.path.join(tmp_table_dir, "source"), n_buckets=4)
    der = TranscriptCdc(spark, os.path.join(tmp_table_dir, "derived"), n_buckets=4)
    s = sorted(tuple(r) for r in src.read_published().collect())
    d = sorted(tuple(r) for r in der.read_published().collect())
    assert s == d and len(s) > 0

    m = by_name["maintain_derived"]
    assert m["compact"]["files_after"] <= m["compact"]["files_before"]
    assert "expire_snapshots" in m and "remove_orphans" in m
    # views are registered AFTER maintenance (attach step) so retention
    # cannot delete the files behind them mid-workflow
    assert [r["name"] for r in results] == [
        "apply_source", "chain_derived", "maintain_rollup",
        "maintain_derived", "attach_derived", "parity", "gate",
    ]
    t = SnapshotTable(spark, os.path.join(tmp_table_dir, "derived"))
    assert all(not f.get("delta") for f in t.snapshot().files)  # compacted

    # conf-driven incremental rollup converged with the source feed
    assert by_name["maintain_rollup"]["conversations_changed"] > 0
    parity = spark.table("parity").collect()[0]
    assert parity["src_rows"] == parity["derived_rows"] == len(s)
    assert parity["rollup_convs"] == parity["src_convs"] > 0

    # exactly one run-metadata row for the run
    from mimic_spark.workflow import read_run_metadata

    md = read_run_metadata(
        spark, os.path.join(tmp_table_dir, "run_metadata")
    ).collect()
    assert len(md) == 1 and md[0]["status"] == "ok"
