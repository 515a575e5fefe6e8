"""Debezium-style JSON WAL/binlog envelope source.

The engine's canonical changelog is already columnar (lsn, op, conv_id,
turn_idx, role, text, tool, ts).  A real CDC tail reads a log of JSON
*envelopes* instead — the Debezium convention of
``{"op": "c|u|d|r", "ts_ms": ..., "source": {"lsn": ...},
"before": {...}, "after": {...}}`` — and has to survive lines the producer
got wrong.  This module is that adapter, in both directions:

- ``write_wal_json_chunks``  — encode the deterministic synthetic changelog
  (``sources/changelog.py``) as JSON-lines envelope files, one directory per
  micro-batch.  This is the fixture/bench form of "a binlog on disk".
- ``parse_wal_envelope`` / ``read_wal_json`` — decode any such feed back to
  canonical change events.  Everything is JVM-side ``to_json``/``from_json``
  + column expressions — no Python in the row path, so the decode rides the
  same scan that reads the text lines and scales with input splits.

Decode rules (Debezium semantics):
- op ``c`` (create) and ``r`` (snapshot read) -> ``insert``, row from
  ``after``;
- op ``u`` -> ``update``, row from ``after``;
- op ``d`` -> ``delete``, identity from ``before``, payload NULL;
- an unknown op keeps its raw string, and an unparseable line becomes a
  row with NULL keys, op ``__corrupt_json__`` and the raw line preserved in
  ``text`` — both shapes are exactly what ``TranscriptCdc``'s dead-letter
  queue quarantines (reason ``bad op: ...`` / ``null key: ...``), so a
  poisoned tail degrades to quarantined rows instead of a crashed stream.

Timestamps are encoded as epoch **micros** inside the payload (Debezium's
``MicroTimestamp`` convention) — integer-exact and session-timezone-proof,
unlike ISO strings.

Reference analog: the staged source-feed ingest role of
``/root/reference/scripts/ingest_mimic_csv_to_duckdb.py`` (CSV dirs ->
typed relational rows); here the feed is a WAL of change envelopes rather
than full-table CSVs, per the CDC north star.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# payload (before/after image) struct — canonical transcript row, ts as
# epoch micros (Debezium MicroTimestamp)
PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), True),
        T.StructField("turn_idx", T.IntegerType(), True),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts_micros", T.LongType(), True),
    ]
)

ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType(), True),
        T.StructField("ts_ms", T.LongType(), True),
        T.StructField(
            "source",
            T.StructType(
                [
                    T.StructField("lsn", T.LongType(), True),
                    T.StructField("table", T.StringType(), True),
                ]
            ),
            True,
        ),
        T.StructField("before", PAYLOAD_SCHEMA, True),
        T.StructField("after", PAYLOAD_SCHEMA, True),
    ]
)

CORRUPT_OP = "__corrupt_json__"

_OP_ENCODE = {"insert": "c", "update": "u", "delete": "d"}


def _payload_struct(delete: bool) -> Column:
    """Canonical columns -> envelope payload struct (ts as epoch micros)."""
    null_s = F.lit(None).cast("string")
    return F.struct(
        F.col("conv_id").alias("conv_id"),
        F.col("turn_idx").alias("turn_idx"),
        (null_s if delete else F.col("role")).alias("role"),
        (null_s if delete else F.col("text")).alias("text"),
        (null_s if delete else F.col("tool")).alias("tool"),
        F.unix_micros(F.col("ts")).alias("ts_micros"),
    )


def encode_wal_envelope(events: DataFrame) -> DataFrame:
    """Canonical change events -> one-column DataFrame of JSON envelope
    lines (``value: string``).  Pure ``to_json`` over struct expressions;
    null payload fields are omitted per JSON-lines convention (a reader
    sees absent == null, which round-trips exactly)."""
    has_tool = "tool" in events.columns
    src = events if has_tool else events.withColumn(
        "tool", F.lit(None).cast("string")
    )
    is_del = F.col("op") == "delete"
    op_code = F.coalesce(
        *[
            F.when(F.col("op") == k, F.lit(v))
            for k, v in _OP_ENCODE.items()
        ],
        F.col("op"),  # unknown ops pass through verbatim (decoder -> DLQ)
    )
    env = F.struct(
        op_code.alias("op"),
        (F.unix_micros(F.col("ts")) / F.lit(1000)).cast("long").alias("ts_ms"),
        F.struct(
            F.col("lsn").cast("long").alias("lsn"),
            F.lit("transcripts").alias("table"),
        ).alias("source"),
        F.when(is_del, _payload_struct(delete=True)).alias("before"),
        F.when(~is_del, _payload_struct(delete=False)).alias("after"),
    )
    return src.select(F.to_json(env).alias("value"))


def parse_wal_envelope(lines: DataFrame, value_col: str = "value") -> DataFrame:
    """JSON envelope lines -> canonical change events (CHANGELOG_SCHEMA
    order: lsn, op, conv_id, turn_idx, role, text, tool, ts).

    Works on any DataFrame bearing a string column of envelope lines — the
    batch reader, ``readStream.text``, or a Kafka ``value`` cast to string —
    so the same decode expression serves every tail transport.  Malformed
    input never throws: it surfaces as DLQ-shaped rows (see module doc).
    """
    raw = F.col(value_col)
    e = F.from_json(raw, ENVELOPE_SCHEMA)
    # from_json yields NULL for unparseable lines (PERMISSIVE at the
    # expression level); a parsed envelope missing both images is equally
    # unusable and takes the same corrupt path
    parsed = e.isNotNull() & (e["before"].isNotNull() | e["after"].isNotNull())
    img = F.coalesce(e["after"], e["before"])  # deletes carry before only
    op = (
        F.when(~parsed, F.lit(CORRUPT_OP))
        .when(e["op"].isin("c", "r"), F.lit("insert"))
        .when(e["op"] == "u", F.lit("update"))
        .when(e["op"] == "d", F.lit("delete"))
        .otherwise(F.coalesce(e["op"], F.lit(CORRUPT_OP)))
    )
    return lines.select(
        F.when(parsed, e["source"]["lsn"]).cast("long").alias("lsn"),
        op.alias("op"),
        F.when(parsed, img["conv_id"]).alias("conv_id"),
        F.when(parsed, img["turn_idx"]).cast("int").alias("turn_idx"),
        F.when(parsed, img["role"]).alias("role"),
        # corrupt lines keep the raw payload in `text`: the DLQ serializes
        # the whole row to its `event` column, so the original line is
        # recoverable from quarantine
        F.when(parsed, img["text"]).otherwise(raw).alias("text"),
        F.when(parsed, img["tool"]).alias("tool"),
        F.when(parsed, F.timestamp_micros(img["ts_micros"])).alias("ts"),
    )


def read_wal_json(spark: SparkSession, path: str) -> DataFrame:
    """Batch-read a directory (or glob) of JSON-lines envelope files as
    canonical change events."""
    return parse_wal_envelope(spark.read.text(path))


def stream_wal_json(spark: SparkSession, glob: str) -> DataFrame:
    """Streaming tail of JSON-lines envelope files (same decode plan as the
    batch reader; pair with foreachBatch -> ``TranscriptCdc.apply_batch``)."""
    return parse_wal_envelope(spark.readStream.text(glob))


def write_wal_json_chunks(
    spark: SparkSession, spec, out_dir: str
) -> list[str]:
    """Materialize the synthetic changelog as JSON-lines envelope files,
    one directory per micro-batch (the WAL-on-disk twin of
    ``write_changelog_chunks``).  Returns chunk paths in delivery order.

    The pre-evolution chunks need no special casing here: ``to_json`` omits
    null fields, so a ``tool`` key simply never appears in a line until the
    producer starts emitting it — exactly how a real log evolves.
    """
    from mimic_spark.sources.changelog import gen_changelog_df

    os.makedirs(out_dir, exist_ok=True)
    events = gen_changelog_df(spark, spec).cache()
    paths = []
    try:
        for c in range(spec.n_chunks):
            chunk = events.filter(F.col("batch_hint") == c).drop("batch_hint")
            p = os.path.join(out_dir, f"wal-{c:05d}")
            encode_wal_envelope(chunk).repartition(
                spec.files_per_chunk
            ).write.mode("overwrite").text(p)
            paths.append(p)
    finally:
        events.unpersist()
    return paths
