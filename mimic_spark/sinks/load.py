"""S13 delivery/import layer — manifest-driven typed load.

The other half of the export contract: the reference loads delivered CSVs
into the warehouse with a per-table JSON schema (scripts/delivery/
load_to_bq.py driving scripts/delivery/cdm_schemas/*.json — each a list of
{name, type, mode} descriptors).  `load_table` consumes the sidecar that
`export_table` (sinks/export.py) writes and re-reads the data files as a
typed DataFrame: types come from the manifest (never inferred), the CSV
header is validated against the manifest column list, and REQUIRED columns
are checked non-null.  (Spark file sources always surface nullable=True in
the DataFrame schema — the REQUIRED mode is therefore enforced by the
non-null scan, the role BigQuery's loader plays for the reference.)

Scale: the load IS a schema'd DataFrame read — distributed, no inference
pass over the data (inference would be a second full scan at 100 TB), and
the REQUIRED check is one aggregate (a single job, map-side-combined).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# inverse of export.py's _SQL_TYPE; INTEGER widens to long and FLOAT to
# double on purpose — the manifest's SQL types don't carry width, and the
# wide reading is lossless for anything the narrow one accepts
_SPARK_TYPE: dict[str, T.DataType] = {
    "INTEGER": T.LongType(),
    "FLOAT": T.DoubleType(),
    "STRING": T.StringType(),
    "BOOLEAN": T.BooleanType(),
    "DATE": T.DateType(),
    "TIMESTAMP": T.TimestampType(),
    "BYTES": T.BinaryType(),
}


class DeliveryContractError(ValueError):
    """Delivered files don't match their schema manifest."""


def manifest_schema(manifest: list[dict]) -> T.StructType:
    """Sidecar descriptors -> StructType (reference load_to_bq's
    SchemaField construction, Spark-side)."""
    fields = []
    for col in manifest:
        name, typ = col["name"], str(col["type"]).upper()
        dt = _SPARK_TYPE.get(typ)
        if dt is None:
            try:  # composite types exported as simpleString (ARRAY<FLOAT> …)
                dt = T._parse_datatype_string(typ.lower())
            except Exception as e:
                raise DeliveryContractError(
                    f"column {name!r}: unknown manifest type {typ!r}"
                ) from e
        fields.append(
            T.StructField(name, dt, nullable=col.get("mode") != "REQUIRED")
        )
    return T.StructType(fields)


def load_table(
    spark: SparkSession,
    out_dir: str,
    table: str,
    format: str | None = None,  # csv | parquet | None = detect from files
    validate_required: bool = True,
) -> DataFrame:
    """Read ``out_dir/<table>/`` through ``out_dir/<table>.schema.json``.

    Round-trips `export_table`'s own output (pytest-verified, both formats)
    and loads any externally delivered directory that follows the same
    sidecar contract."""
    sidecar = os.path.join(out_dir, f"{table}.schema.json")
    if not os.path.exists(sidecar):
        raise FileNotFoundError(
            f"no schema sidecar at {sidecar!r} — a manifest-driven load "
            "never infers types"
        )
    with open(sidecar) as f:
        manifest = json.load(f)
    schema = manifest_schema(manifest)
    path = os.path.join(out_dir, table)

    if format is None:
        names = os.listdir(path)
        format = (
            "parquet" if any(n.endswith(".parquet") for n in names) else "csv"
        )
    if format == "csv":
        df = (
            spark.read.option("header", True)
            # enforceSchema=false makes Spark check the file header against
            # the manifest field names instead of trusting position
            .option("enforceSchema", False)
            .option("timestampNTZFormat", "yyyy-MM-dd HH:mm:ss")
            .schema(schema)
            .csv(path)
        )
    elif format == "parquet":
        df = spark.read.schema(schema).parquet(path)
        file_cols = set(spark.read.parquet(path).columns)
        missing = [f.name for f in schema.fields if f.name not in file_cols]
        if missing:
            raise DeliveryContractError(
                f"{table}: manifest columns {missing} absent from parquet files"
            )
    else:
        raise ValueError(f"format must be csv|parquet, got {format!r}")

    required = [c["name"] for c in manifest if c.get("mode") == "REQUIRED"]
    if validate_required and required:
        counts = df.select(
            [
                F.count(F.when(F.col(c).isNull(), 1)).alias(c)
                for c in required
            ]
        ).first()
        bad = {c: counts[c] for c in required if counts[c]}
        if bad:
            raise DeliveryContractError(
                f"{table}: NULLs in REQUIRED columns {bad} "
                "(or a CSV cell failed its manifest type)"
            )
    return df
