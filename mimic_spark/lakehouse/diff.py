"""Snapshot diff: emit the change events between two table versions.

The engine consumes a changelog; this closes the loop by *producing* one —
the role Iceberg's changelog reads / `table_changes` play.  Diffing two
snapshots of a keyed table yields insert/update/delete events suitable for
feeding a downstream CDC consumer (including this engine itself), which also
makes pipeline chaining testable: apply(diff(t, v1, v2)) onto a copy of
v1 must reproduce v2.

Implementation is a full-outer join of the two snapshots on the key with
row-hash change detection — bucket layouts may differ between versions
(rebucketing), so the join is by key, not by file."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mimic_spark.lakehouse.merge import INTERNAL_COLS
from mimic_spark.lakehouse.table import SnapshotTable


def _live(df: DataFrame) -> DataFrame:
    if "_deleted" in df.columns:
        df = df.filter(~F.coalesce(F.col("_deleted"), F.lit(False)))
    return df


def snapshot_diff(
    table: SnapshotTable, from_version: int, to_version: int
) -> DataFrame:
    """Change events turning `from_version` into `to_version`.

    Output: op (insert|update|delete), key columns, payload columns (NULL for
    deletes), lsn (the destination row's _lsn where available — preserving
    source ordering for downstream replay)."""
    keys = table.key_cols
    # new side keeps tombstones: they carry the delete's own LSN, so emitted
    # delete events replay correctly through the merge's >= LSN guard
    new = table.read(version=to_version)
    # the older snapshot may predate schema evolution: align it to the newer
    # schema (missing columns -> typed NULL) before comparing rows
    old = table._align(
        _live(table.read(version=from_version)),
        table.snapshot(to_version).schema,
    )
    payload = [
        c for c in new.columns if c not in (*keys, *INTERNAL_COLS)
    ]

    def rowhash(cols: list[str]):
        return F.xxhash64(
            *[F.coalesce(F.col(c).cast("string"), F.lit("\0")) for c in cols]
        )

    o = old.select(
        *keys,
        F.lit(True).alias("_o"),
        F.col("_lsn").alias("_old_lsn"),
        rowhash(payload).alias("_oh"),
    )
    n = new.select(
        *keys,
        *payload,
        F.lit(True).alias("_n"),
        F.coalesce(F.col("_deleted"), F.lit(False)).alias("_ndel"),
        F.col("_lsn").alias("_new_lsn"),
        rowhash(payload).alias("_nh"),
    )
    j = o.join(n, on=keys, how="full_outer")
    new_dead = F.col("_n").isNull() | F.col("_ndel")
    op = (
        F.when(F.col("_o").isNull() & ~new_dead, F.lit("insert"))
        .when(F.col("_o").isNotNull() & new_dead, F.lit("delete"))
        .when(
            F.col("_o").isNotNull() & ~new_dead & (F.col("_oh") != F.col("_nh")),
            F.lit("update"),
        )
        .otherwise(F.lit(None))  # unchanged (or never-live) -> dropped
    )
    lsn = F.coalesce(F.col("_new_lsn"), F.col("_old_lsn"))
    out_payload = [
        F.when(op == "delete", F.lit(None)).otherwise(F.col(c)).alias(c)
        for c in payload
    ]
    return (
        j.withColumn("op", op)
        .filter(F.col("op").isNotNull())
        .select("op", *keys, *out_payload, lsn.alias("lsn"))
    )
