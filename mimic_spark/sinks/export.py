"""S13 delivery/export layer — schema'd table export with a JSON sidecar.

The reference ships published tables out of the warehouse with a schema
manifest per table (scripts/delivery/export_from_bq.py; sidecar shape
scripts/delivery/cdm_schemas/*.json: a list of {name, type, mode} column
descriptors).  Spark-first equivalent: write the DataFrame with its own
writers (CSV with header / parquet — both distributed, one file per
partition, no driver funnel) and emit the same sidecar shape alongside.

Scale: the export IS the DataFrame write — partitioned, pushdown-pruned if
the caller projected/filtered, no collect.  `single_file=True` exists for
small dimension-table delivery only (it coalesces to 1 partition).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import types as T

_SQL_TYPE = {
    T.LongType(): "INTEGER",
    T.IntegerType(): "INTEGER",
    T.ShortType(): "INTEGER",
    T.DoubleType(): "FLOAT",
    T.FloatType(): "FLOAT",
    T.StringType(): "STRING",
    T.BooleanType(): "BOOLEAN",
    T.DateType(): "DATE",
    T.TimestampType(): "TIMESTAMP",
    T.TimestampNTZType(): "TIMESTAMP",
    T.BinaryType(): "BYTES",
}


def schema_manifest(schema: T.StructType) -> list[dict]:
    """StructType -> the reference's sidecar shape
    (cdm_schemas/*.json: [{name, type, mode}, ...])."""
    out = []
    for f in schema.fields:
        entry = {"name": f.name, "type": _SQL_TYPE.get(f.dataType, str(f.dataType.simpleString()).upper())}
        if not f.nullable:
            entry["mode"] = "REQUIRED"
        out.append(entry)
    return out


def export_table(
    df: DataFrame,
    out_dir: str,
    table: str,
    format: str = "csv",  # csv | parquet
    single_file: bool = False,
    overwrite: bool = True,
) -> dict:
    """Export one DataFrame to ``out_dir/<table>/`` plus
    ``out_dir/<table>.schema.json``.  Returns a small export report."""
    if format not in ("csv", "parquet"):
        raise ValueError(f"format must be csv|parquet, got {format!r}")
    dest = os.path.join(out_dir, table)
    mode = "overwrite" if overwrite else "errorifexists"
    w = (df.coalesce(1) if single_file else df).write.mode(mode)
    if format == "csv":
        # timestamps serialized without zone (tables carry NTZ semantics)
        w.option("header", True).option(
            "timestampNTZFormat", "yyyy-MM-dd HH:mm:ss"
        ).csv(dest)
    else:
        w.parquet(dest)
    manifest = schema_manifest(df.schema)
    os.makedirs(out_dir, exist_ok=True)
    sidecar = os.path.join(out_dir, f"{table}.schema.json")
    tmp = sidecar + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, sidecar)
    return {
        "table": table,
        "path": dest,
        "format": format,
        "schema_sidecar": sidecar,
        "columns": [c["name"] for c in manifest],
    }


def export_published(cdc, out_dir: str, format: str = "csv", table: str = "transcripts") -> dict:
    """Export a CDC table's published view (live rows, internal columns
    stripped) — the role of the reference's per-table BQ extract."""
    return export_table(cdc.read_published(), out_dir, table, format=format)
