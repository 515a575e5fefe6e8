"""DDL-driven, idempotent CSV ingest (reference S1-S7 re-expressed).

The reference's ingest (scripts/ingest_mimic_csv_to_duckdb.py) contributes
four behaviors the Spark engine reproduces:

- S3 **DDL-driven typed load**: parse CREATE TABLE DDL into declared schemas
  (no CSV inference, README.md:182-184); read columns as strings and
  TRY_CAST to the declared type — bad cells become NULL, never a crash
  (ingest_mimic_csv_to_duckdb.py:445-451,553-573).
- drift shims: extra CSV columns ignored with a warning; missing columns load
  as typed NULLs (ingest_mimic_csv_to_duckdb.py:521-528).
- S6 **fingerprint skip**: a per-target registry of (path, size, mtime_ns,
  rows) makes re-ingest a no-op (ingest_mimic_csv_to_duckdb.py:181-332) —
  the batch-level cousin of the CDC ledger.
- S7 **on_exists policies**: replace/append/skip/fail ==
  overwrite/append/ignore/errorifexists (ingest_mimic_csv_to_duckdb.py:624-633).
"""

from __future__ import annotations

import json
import logging
import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

log = logging.getLogger(__name__)

_TYPE_MAP: list[tuple[str, T.DataType]] = [
    (r"BIGINT|INT8|INT64", T.LongType()),
    (r"SMALLINT|INT2", T.ShortType()),
    (r"INTEGER|INT4?|INT32", T.IntegerType()),
    (r"DOUBLE PRECISION|DOUBLE|FLOAT8|FLOAT64|REAL|FLOAT", T.DoubleType()),
    (r"TIMESTAMP(\(\d+\))?|DATETIME", T.TimestampType()),
    (r"DATE", T.DateType()),
    (r"VARCHAR(\(\d+\))?|TEXT|STRING|CHAR(\(\d+\))?", T.StringType()),
    (r"NUMERIC(\(\d+,\s*\d+\))?|DECIMAL(\(\d+,\s*\d+\))?", T.DoubleType()),
    (r"BOOLEAN|BOOL", T.BooleanType()),
]

_CREATE_RE = re.compile(
    r"CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?([\w.\"]+)\s*\((.*?)\)\s*;",
    re.IGNORECASE | re.DOTALL,
)


def _map_type(sql_type: str) -> T.DataType:
    s = sql_type.strip().upper()
    for pat, dt in _TYPE_MAP:
        if re.fullmatch(pat, s):
            return dt
    raise ValueError(f"unmapped SQL type: {sql_type!r}")


def parse_ddl(ddl_text: str) -> dict[str, T.StructType]:
    """CREATE TABLE statements -> {table_name: StructType}.

    Mirrors the reference's parse_mimic_create_tables
    (ingest_mimic_csv_to_duckdb.py:364-409): declared schemas only.
    """
    out: dict[str, T.StructType] = {}
    for m in _CREATE_RE.finditer(ddl_text):
        name = m.group(1).replace('"', "").split(".")[-1].lower()
        body = m.group(2)
        fields = []
        depth = 0
        col = ""
        cols = []
        for ch in body:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            if ch == "," and depth == 0:
                cols.append(col)
                col = ""
            else:
                col += ch
        if col.strip():
            cols.append(col)
        for c in cols:
            c = c.strip()
            if not c or re.match(
                r"PRIMARY|FOREIGN|UNIQUE|CONSTRAINT|CHECK", c, re.IGNORECASE
            ):
                continue
            parts = c.split(None, 1)
            cname = parts[0].strip('"').lower()
            ctype = re.sub(
                r"\s+(NOT\s+NULL|NULL|PRIMARY\s+KEY|DEFAULT\s+.*)$",
                "",
                parts[1],
                flags=re.IGNORECASE,
            )
            fields.append(T.StructField(cname, _map_type(ctype), True))
        out[name] = T.StructType(fields)
    return out


def _fingerprint(path: str) -> dict:
    st = os.stat(path)
    return {"size": st.st_size, "mtime_ns": st.st_mtime_ns}


class IngestRegistry:
    """File-load ledger: fingerprint match => skip reload (reference
    ingest.file_loads)."""

    def __init__(self, target_dir: str):
        self.path = os.path.join(target_dir, "_ingest_registry.json")
        self._data: dict[str, dict] = {}
        if os.path.exists(self.path):
            with open(self.path) as f:
                self._data = json.load(f)

    def should_skip(self, path: str) -> bool:
        rec = self._data.get(os.path.abspath(path))
        return rec is not None and rec["fp"] == _fingerprint(path)

    def record(self, path: str, rows: int) -> None:
        self._data[os.path.abspath(path)] = {
            "fp": _fingerprint(path),
            "rows": rows,
        }
        tmp = self.path + ".tmp"
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        with open(tmp, "w") as f:
            json.dump(self._data, f, indent=1)
        os.replace(tmp, self.path)


def typed_csv_load(
    spark: SparkSession, csv_path: str, schema: T.StructType, limit: int | None = None
) -> DataFrame:
    """Read CSV as all-string, then TRY_CAST each declared column.

    - extra CSV columns: ignored with a warning
    - missing declared columns: typed NULLs
    - malformed cells: NULL (try_cast), never an abort
    """
    raw = spark.read.option("header", True).csv(csv_path)  # all strings
    declared = {f.name: f.dataType for f in schema.fields}
    extra = [c for c in raw.columns if c.lower() not in declared]
    if extra:
        log.warning("ignoring extra CSV columns in %s: %s", csv_path, extra)
    have = {c.lower(): c for c in raw.columns}
    cols = []
    for f in schema.fields:
        if f.name in have:
            src = F.nullif(F.col(have[f.name]), F.lit(""))
            cols.append(src.try_cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    out = raw.select(*cols)
    if limit is not None:
        out = out.limit(limit)
    return out


def ingest_csv_table(
    spark: SparkSession,
    csv_path: str,
    schema: T.StructType,
    target_dir: str,
    table: str,
    on_exists: str = "replace",  # replace | append | skip | fail
    limit: int | None = None,
    registry: IngestRegistry | None = None,
) -> int:
    """Load one CSV into a parquet table under target_dir; returns rows
    written (0 when fingerprint-skipped)."""
    modes = {
        "replace": "overwrite",
        "append": "append",
        "skip": "ignore",
        "fail": "errorifexists",
    }
    if on_exists not in modes:
        raise ValueError(f"on_exists must be one of {sorted(modes)}")
    # S2: csv_path may be a tar archive or a directory containing one —
    # resolve to the member CSV named after the table
    if os.path.isdir(csv_path) or _is_tar_archive(csv_path):
        csv_path = resolve_csv_path(csv_path, table)
    if registry is not None and registry.should_skip(csv_path):
        log.info("fingerprint match, skipping reload of %s", csv_path)
        return 0
    df = typed_csv_load(spark, csv_path, schema, limit=limit)
    out = os.path.join(target_dir, table)
    df.write.mode(modes[on_exists]).parquet(out)
    rows = spark.read.parquet(out).count()
    if registry is not None:
        registry.record(csv_path, rows)
    return rows


# ------------------------------------------------------------------ S2: tar

_EXTRACT_CACHE: dict[str, str] = {}


def _is_tar_archive(path: str) -> bool:
    n = os.path.basename(path).lower()
    return n.endswith(".tar.gz") or n.endswith(".tgz") or n.endswith(".tar")


def discover_csvs(folder: str) -> list[str]:
    """CSV files (plain or compressed) directly inside a folder."""
    import glob as _glob

    out: list[str] = []
    for ext in ("*.csv", "*.csv.gz", "*.csv.zip"):
        out.extend(_glob.glob(os.path.join(folder, ext)))
    return sorted(out)


def resolve_source_dir(path: str) -> str:
    """Resolve an ingest source that may be a directory or a tar archive
    (S2; ref scripts/ingest_mimic_csv_to_duckdb.py:42-71).

    - a ``.tar``/``.tar.gz``/``.tgz`` file is extracted once to a temp dir
      (process-lifetime cache) with a path-traversal guard;
    - a directory with CSVs resolves to itself;
    - a directory with no CSVs but exactly one tar archive resolves into
      that archive (the shape real MIMIC downloads arrive in).

    Extraction is a driver-side preprocess by design: MIMIC tarballs are a
    bounded number of member files, and Spark's CSV reader then scans the
    extracted files with normal split parallelism — streaming tar members
    through the JVM would serialize the read instead.
    """
    import tarfile
    import tempfile

    apath = os.path.abspath(os.path.expanduser(path))
    if os.path.isfile(apath) and _is_tar_archive(apath):
        if apath not in _EXTRACT_CACHE:
            tmp_dir = tempfile.mkdtemp(prefix="mimic_spark_extract_")
            with tarfile.open(apath, "r:*") as tf:
                for member in tf.getmembers():
                    # reject links outright: the realpath pre-check below runs
                    # before any member exists, so a symlink member followed by
                    # a write through it would escape undetected on the
                    # pre-3.11.4 fallback path (r2 ADVICE finding); data
                    # archives have no business carrying links
                    if member.issym() or member.islnk():
                        raise ValueError(
                            f"link member in tar archive: {member.name}"
                        )
                    mdest = os.path.realpath(os.path.join(tmp_dir, member.name))
                    if not (mdest + os.sep).startswith(
                        os.path.realpath(tmp_dir) + os.sep
                    ):
                        raise ValueError(f"unsafe path in tar archive: {member.name}")
                try:
                    tf.extractall(tmp_dir, filter="data")
                except TypeError:  # pre-3.11.4 tarfile: no filter kwarg
                    tf.extractall(tmp_dir)
            # archives may nest everything under one top-level dir
            root = tmp_dir
            entries = os.listdir(root)
            if not discover_csvs(root) and len(entries) == 1:
                sub = os.path.join(root, entries[0])
                if os.path.isdir(sub):
                    root = sub
            _EXTRACT_CACHE[apath] = root
        return _EXTRACT_CACHE[apath]
    if os.path.isdir(apath):
        if discover_csvs(apath):
            return apath
        tars = sorted(
            os.path.join(apath, n)
            for n in os.listdir(apath)
            if os.path.isfile(os.path.join(apath, n)) and _is_tar_archive(n)
        )
        if len(tars) == 1:
            return resolve_source_dir(tars[0])
    return apath


def resolve_csv_path(source: str, table: str) -> str:
    """Find table's CSV under a source that may be a dir or tarball."""
    folder = resolve_source_dir(source)
    for cand in (f"{table}.csv", f"{table}.csv.gz", f"{table}.csv.zip"):
        p = os.path.join(folder, cand)
        if os.path.exists(p):
            return p
    raise FileNotFoundError(f"no CSV for table {table!r} under {source!r}")
