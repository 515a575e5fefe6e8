"""Deterministic row identity, bucketing and skew salting.

The reference derives a deterministic 64-bit row id from the natural key:
``FARM_FINGERPRINT(TO_JSON_STRING(STRUCT(...)))`` on every staged row
(reference: etl/staging/st_hosp_base.sql:28-33; determinism is unit-tested in
test/py/test_deterministic_load_row_id.py:28-70).  The Spark-native analog is
``xxhash64(to_json(struct(...)))`` — JVM-side, codegen'd, stable across runs.

Never derive placement from ``rand()``/UUIDs: foreachBatch retries must land
rows identically or exactly-once breaks (the reference itself flags UUID row
ids as a known defect, etl/etl/lk_vis_part_2.sql:20).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def deterministic_row_id(*key_cols: str | Column) -> Column:
    """64-bit deterministic id of the natural key (reference load_row_id)."""
    cols = [F.col(c) if isinstance(c, str) else c for c in key_cols]
    return F.xxhash64(F.to_json(F.struct(*cols)))


def trace_id(**named_cols: str | Column) -> Column:
    """JSON of the natural key (reference trace_id, st_hosp_base.sql:31-33)."""
    cols = [
        (F.col(c) if isinstance(c, str) else c).alias(name)
        for name, c in named_cols.items()
    ]
    return F.to_json(F.struct(*cols))


def bucket_expr(key_cols: list[str], n_buckets: int) -> Column:
    """Deterministic bucket id in [0, n_buckets) from the key columns.

    Buckets hash the *full* key (conv_id, turn_idx), so a hot conversation's
    turns spread uniformly across buckets — the merge shuffle sees no skew
    even when a few conv_ids own >5% of all events.  This is the engine's
    primary skew defusal; `salted_key` covers per-conversation aggregations
    where the grouping key must stay conv_id.
    """
    return F.pmod(F.xxhash64(*[F.col(c) for c in key_cols]), F.lit(n_buckets)).cast(
        "int"
    )


def salted_key(key_col: str | Column, salt_from: str | Column, n_salts: int) -> Column:
    """conv_id#<salt> where salt is a pure function of row content.

    Used to split a hot grouping key into n_salts sub-keys for two-phase
    aggregation (partial per salted key, final per key).  Salt must be
    deterministic (never rand()): retried tasks must re-place rows identically.
    """
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    salt = F.pmod(F.xxhash64(salt_from), F.lit(n_salts))
    return F.concat_ws("#", key, salt.cast("string"))
