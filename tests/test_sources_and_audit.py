"""CSV ingest (DDL-driven, fingerprint-skip, on_exists), config, audit gate."""

from __future__ import annotations

import os

import pytest

from mimic_spark.config import load_config, merge_config, substitute_variables
from mimic_spark.sources.changelog import ChangelogSpec, write_changelog_chunks
from mimic_spark.sources.csv_ingest import (
    IngestRegistry,
    ingest_csv_table,
    parse_ddl,
    typed_csv_load,
)
from mimic_spark.streaming.apply import TranscriptCdc, run_batched
from mimic_spark.streaming.audit import AuditError, run_audit

DDL = """
CREATE TABLE hosp.patients (
  subject_id INTEGER NOT NULL,
  gender VARCHAR(1),
  anchor_age SMALLINT,
  weight DOUBLE PRECISION,
  admit_ts TIMESTAMP(3),
  birth_date DATE,
  PRIMARY KEY (subject_id)
);
CREATE TABLE icu.chartevents (
  stay_id BIGINT,
  value TEXT,
  valuenum NUMERIC(10,2)
);
"""


def test_parse_ddl():
    schemas = parse_ddl(DDL)
    assert set(schemas) == {"patients", "chartevents"}
    p = {f.name: f.dataType.simpleString() for f in schemas["patients"].fields}
    assert p == {
        "subject_id": "int",
        "gender": "string",
        "anchor_age": "smallint",
        "weight": "double",
        "admit_ts": "timestamp",
        "birth_date": "date",
    }
    c = {f.name: f.dataType.simpleString() for f in schemas["chartevents"].fields}
    assert c == {"stay_id": "bigint", "value": "string", "valuenum": "double"}


CSV = """subject_id,gender,anchor_age,weight,admit_ts,extra_col
1,M,44,70.5,2024-01-01 10:00:00,ignoreme
2,F,oops,81.25,2024-02-03 11:30:00,x
,U,33,notanumber,bad-timestamp,y
"""


def test_typed_csv_load_drift_and_badcells(spark, tmp_table_dir):
    """Extra column ignored; missing column -> typed NULL; bad cells -> NULL
    (reference TRY_CAST load + drift shims)."""
    path = os.path.join(tmp_table_dir, "patients.csv")
    with open(path, "w") as f:
        f.write(CSV)
    schema = parse_ddl(DDL)["patients"]
    rows = {r["subject_id"]: r for r in typed_csv_load(spark, path, schema).collect()}
    assert set(rows) == {1, 2, None}
    assert rows[1]["weight"] == 70.5
    assert rows[2]["anchor_age"] is None  # 'oops' -> NULL, row survives
    assert rows[None]["weight"] is None
    assert rows[None]["admit_ts"] is None
    assert all(r["birth_date"] is None for r in rows.values())  # missing col
    assert "extra_col" not in [f.name for f in schema.fields]


def test_ingest_registry_skip_and_on_exists(spark, tmp_table_dir):
    path = os.path.join(tmp_table_dir, "patients.csv")
    with open(path, "w") as f:
        f.write(CSV)
    schema = parse_ddl(DDL)["patients"]
    tgt = os.path.join(tmp_table_dir, "warehouse")
    reg = IngestRegistry(tgt)

    n1 = ingest_csv_table(spark, path, schema, tgt, "patients", registry=reg)
    assert n1 == 3
    # unchanged file: fingerprint match => skipped
    n2 = ingest_csv_table(spark, path, schema, tgt, "patients", registry=reg)
    assert n2 == 0
    # file touched with new content => reloaded (append doubles rows)
    with open(path, "a") as f:
        f.write("7,M,50,66.0,2024-03-01 00:00:00,z\n")
    n3 = ingest_csv_table(
        spark, path, schema, tgt, "patients", on_exists="append", registry=reg
    )
    assert n3 == 7  # 3 + 4
    # on_exists=fail raises on existing target
    with pytest.raises(Exception):
        ingest_csv_table(spark, path, schema, tgt, "patients", on_exists="fail")
    # limit honored
    n4 = ingest_csv_table(
        spark, path, schema, tgt, "patients_l", on_exists="replace", limit=2
    )
    assert n4 == 2


def test_config_merge_and_substitution():
    assert merge_config({"a": {"x": 1, "y": 2}}, {"a": {"y": 3}}) == {
        "a": {"x": 1, "y": 3}
    }
    # longest-match-first: @ab before @a; fixpoint chains
    vars_ = {"a": "@ab", "ab": "Z"}
    assert substitute_variables("@a @ab", vars_) == "Z Z"
    conf = load_config(None, ["n_events=5000", "workdir=/tmp/@mode", "mode=batch"])
    assert conf["n_events"] == 5000
    assert conf["workdir"] == "/tmp/batch"


def test_audit_gate(spark, tmp_table_dir):
    spec = ChangelogSpec(n_events=2000, n_convs=60, n_chunks=4)
    chunks = write_changelog_chunks(
        spark, spec, os.path.join(tmp_table_dir, "changelog")
    )
    cdc = TranscriptCdc(spark, os.path.join(tmp_table_dir, "transcripts"))
    run_batched(spark, cdc, chunks)

    rep = run_audit(cdc)
    assert not rep.failures
    assert rep.checks["key_uniqueness"]["ok"]
    assert rep.checks["watermark"]["ok"]
    assert rep.checks["ledger_continuity"]["ok"]
    assert rep.checks["lineage_coverage"]["ok"]

    n = cdc.read_published().count()
    rep2 = run_audit(cdc, expected_final_count=n)
    assert rep2.checks["population_equality"]["ok"]

    # the gate actually gates: wrong expectation aborts the run
    with pytest.raises(AuditError, match="population_equality"):
        run_audit(cdc, expected_final_count=n + 1)
    rep3 = run_audit(cdc, expected_final_count=n + 1, fail_on_error=False)
    assert rep3.failures


def test_tar_archive_ingest(spark, tmp_table_dir):
    """S2: ingest_csv_table accepts a tarball (or a dir holding one) and
    resolves the member CSV named after the table — the shape real MIMIC
    downloads arrive in (ref ingest_mimic_csv_to_duckdb.py:42-71)."""
    import tarfile

    from mimic_spark.sources.csv_ingest import resolve_source_dir

    src = os.path.join(tmp_table_dir, "src")
    os.makedirs(src)
    with open(os.path.join(src, "patients.csv"), "w") as f:
        f.write(CSV)
    tar_path = os.path.join(tmp_table_dir, "mimic_demo.tar.gz")
    with tarfile.open(tar_path, "w:gz") as tf:
        tf.add(os.path.join(src, "patients.csv"), arcname="demo/patients.csv")

    schema = parse_ddl(DDL)["patients"]
    tgt = os.path.join(tmp_table_dir, "lake")

    # tarball path directly
    n = ingest_csv_table(spark, tar_path, schema, tgt, "patients")
    assert n == 3
    # a directory containing only the tarball resolves into it
    holder = os.path.join(tmp_table_dir, "holder")
    os.makedirs(holder)
    os.link(tar_path, os.path.join(holder, "mimic_demo.tar.gz"))
    resolved = resolve_source_dir(holder)
    assert os.path.exists(os.path.join(resolved, "patients.csv"))
    # extraction is cached: same resolved dir across calls
    assert resolve_source_dir(tar_path) == resolve_source_dir(tar_path)


def test_tar_traversal_rejected(tmp_table_dir):
    """Unsafe member paths (../) must be rejected, never extracted."""
    import io
    import tarfile

    import pytest as _pytest

    from mimic_spark.sources.csv_ingest import resolve_source_dir

    tar_path = os.path.join(tmp_table_dir, "evil.tar")
    with tarfile.open(tar_path, "w") as tf:
        data = b"x,y\n1,2\n"
        info = tarfile.TarInfo(name="../evil.csv")
        info.size = len(data)
        tf.addfile(info, io.BytesIO(data))
    with _pytest.raises(ValueError, match="unsafe path"):
        resolve_source_dir(tar_path)


def test_export_published_roundtrip(spark, tmp_table_dir):
    """S13: export the CDC published view with a schema sidecar, re-read it
    through the sidecar-declared schema, and get identical rows back."""
    import json as _json

    from mimic_spark.sinks import export_published

    chunks = write_changelog_chunks(
        spark,
        ChangelogSpec(n_events=1500, n_convs=40, n_chunks=2),
        os.path.join(tmp_table_dir, "changelog"),
    )
    cdc = TranscriptCdc(spark, os.path.join(tmp_table_dir, "transcripts"), n_buckets=4)
    run_batched(spark, cdc, chunks)
    want = sorted(tuple(r) for r in cdc.read_published().collect())

    out = os.path.join(tmp_table_dir, "delivery")
    rep = export_published(cdc, out, format="csv")
    with open(rep["schema_sidecar"]) as f:
        manifest = _json.load(f)
    assert [c["name"] for c in manifest] == cdc.read_published().columns

    # re-read via the exported schema (reference load_to_bq role)
    back = spark.read.option("header", True).schema(cdc.read_published().schema).csv(
        rep["path"]
    )
    got = sorted(tuple(r) for r in back.collect())
    assert got == want

    # parquet flavor round-trips too
    rep2 = export_published(cdc, out, format="parquet", table="transcripts_pq")
    got2 = sorted(tuple(r) for r in spark.read.parquet(rep2["path"]).collect())
    assert got2 == want


def test_load_table_manifest_roundtrip(spark, tmp_table_dir):
    """S13 import half: load_table consumes export_table's own sidecar +
    data and reproduces the DataFrame — values AND types — for both
    formats; contract violations (missing sidecar, header drift, NULL in a
    REQUIRED column) fail loud (reference load_to_bq + cdm_schemas role)."""
    import json as _json

    import pytest
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from mimic_spark.sinks import (
        DeliveryContractError,
        export_table,
        load_table,
    )

    src = spark.createDataFrame(
        [
            (1, "alice", 3.5, True, None),
            (2, "bob", None, False, "2025-01-02 10:00:00"),
        ],
        T.StructType(
            [
                T.StructField("id", T.LongType(), False),  # -> REQUIRED
                T.StructField("name", T.StringType(), True),
                T.StructField("score", T.DoubleType(), True),
                T.StructField("ok", T.BooleanType(), True),
                T.StructField("seen", T.StringType(), True),
            ]
        ),
    ).withColumn("seen", F.col("seen").cast("timestamp"))
    out = os.path.join(tmp_table_dir, "delivery2")
    want = sorted(tuple(r) for r in src.collect())

    for fmt in ("csv", "parquet"):
        rep = export_table(src, out, f"t_{fmt}", format=fmt)
        back = load_table(spark, out, f"t_{fmt}")  # format auto-detected
        # (Spark file sources always surface nullable=True; the REQUIRED
        # contract is enforced by load_table's non-null scan instead)
        assert [f.dataType for f in back.schema.fields] == [
            f.dataType for f in src.schema.fields
        ]
        assert sorted(tuple(r) for r in back.collect()) == want

    # no sidecar -> never infer
    with pytest.raises(FileNotFoundError, match="sidecar"):
        load_table(spark, out, "nope")

    # NULL in a REQUIRED column (or a cell failing its manifest type) fails
    sidecar = os.path.join(out, "t_csv.schema.json")
    manifest = _json.load(open(sidecar))
    assert {"name": "id", "type": "INTEGER", "mode": "REQUIRED"} in manifest
    for c in manifest:
        if c["name"] == "name":
            c["mode"] = "REQUIRED"
            c["type"] = "INTEGER"  # 'alice'/'bob' now fail the typed parse
    _json.dump(manifest, open(sidecar, "w"))
    with pytest.raises(DeliveryContractError, match="REQUIRED"):
        load_table(spark, out, "t_csv").collect()

    # header drift: manifest renames a column the files don't carry
    manifest2 = _json.load(open(os.path.join(out, "t_parquet.schema.json")))
    manifest2[1]["name"] = "renamed_away"
    _json.dump(
        manifest2, open(os.path.join(out, "t_parquet.schema.json"), "w")
    )
    with pytest.raises(DeliveryContractError, match="absent"):
        load_table(spark, out, "t_parquet")


def test_pyfiles_zip_builds_and_imports(tmp_table_dir):
    """tools/make_pyfiles_zip.py produces a spark-submit --py-files archive
    the package imports from (the cluster submission path)."""
    import subprocess
    import sys
    import zipfile

    out = os.path.join(tmp_table_dir, "mimic_spark.zip")
    from tools.make_pyfiles_zip import build

    build(out)
    names = zipfile.ZipFile(out).namelist()
    assert "mimic_spark/job.py" in names
    assert "mimic_spark/lakehouse/merge.py" in names
    assert not any("__pycache__" in n for n in names)
    # importable from the archive in a clean interpreter (zipimport path)
    code = (
        "import sys; sys.path.insert(0, %r); "
        "import mimic_spark.config, mimic_spark.workflow; print('ok')" % out
    )
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, cwd="/tmp"
    )
    assert r.returncode == 0 and "ok" in r.stdout, r.stderr
