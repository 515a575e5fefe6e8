"""Waveform-style time-series flattening: interval specs -> sample rows.

The reference's waveform POC (etl/staging/st_waveform_poc_1.sql:181-247)
expands per-signal rows into one row per sample: a sample timestamp built by
adding the sample index (milliseconds) to a base datetime, a waveform_id
string `<reference_id>.<row_id>`, the sampled value, and a TO_JSON_STRING
trace.  This module reproduces that shape as a Spark generator query over
the `events` table: each event is an interval spec whose deterministic
sample count derives from its key, and `explode(sequence(...))` plays
BigQuery's row-number-cross-join role.

Scale posture: explode(sequence) is a narrow generator — no shuffle, no
join; output partitioning inherits the input's, and sample counts are
bounded per row, so the expansion streams through whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mimic_spark.operators.catalog import load_tables, register

SAMPLE_PERIOD_MS = 250  # 4 Hz


@register(
    "timeseries_expand_samples",
    family="time-series: interval spec -> generated sample rows (ref st_waveform_poc_1.sql:181-247 sample expansion)",
    oracle=f"""
WITH spec AS (
  SELECT event_id, user_id, ts,
         cast(round(value * 100) AS BIGINT) AS value_c,
         (event_id % 8) + 3 AS n_samples
  FROM events WHERE event_type = 'error'
)
SELECT event_id, user_id,
       cast(i AS INT) AS sample_idx,
       ts + to_milliseconds(i * {SAMPLE_PERIOD_MS}) AS sample_ts,
       concat(cast(event_id AS VARCHAR), '.', cast(i AS VARCHAR)) AS waveform_id,
       value_c + i AS value_as_number_c,
       concat('{{"event_id":', event_id, ',"sample_idx":', i, '}}') AS trace_id
FROM (SELECT *, unnest(generate_series(0, n_samples - 1)) AS i FROM spec)
""",
)
def timeseries_expand_samples(spark: SparkSession, sf: str) -> DataFrame:
    """One row per sample from each event's interval spec: sample_ts =
    base ts + idx * 250ms, waveform_id = '<event_id>.<idx>', value in the
    integer cents pattern, and the reference's trace-JSON column built as a
    canonical concat so DuckDB mirrors it byte-for-byte."""
    (e,) = load_tables(spark, sf, "events")
    spec = e.filter(F.col("event_type") == "error").select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.col("value") * 100).cast("long").alias("value_c"),
        ((F.col("event_id") % 8) + 3).alias("n_samples"),
    )
    expanded = spec.select(
        "event_id",
        "user_id",
        "ts",
        "value_c",
        F.explode(F.sequence(F.lit(0), (F.col("n_samples") - 1).cast("int"))).alias(
            "i"
        ),
    )
    return expanded.select(
        "event_id",
        "user_id",
        F.col("i").cast("int").alias("sample_idx"),
        F.expr(f"timestampadd(MILLISECOND, i * {SAMPLE_PERIOD_MS}, ts)").alias(
            "sample_ts"
        ),
        F.concat_ws(".", F.col("event_id").cast("string"), F.col("i").cast("string")).alias(
            "waveform_id"
        ),
        (F.col("value_c") + F.col("i")).alias("value_as_number_c"),
        F.concat(
            F.lit('{"event_id":'),
            F.col("event_id").cast("string"),
            F.lit(',"sample_idx":'),
            F.col("i").cast("string"),
            F.lit("}"),
        ).alias("trace_id"),
    )
