"""Explicit skew handling: salted two-phase aggregation over hot keys.

north_rule requires partitioning/shuffle/skew handled *explicitly*.  The CDC
path defuses skew structurally (buckets hash the full (conv_id, turn_idx)
key), but per-conversation rollups must group by conv_id alone — exactly
where a hot conversation melts one reducer.  The fix is the classic salted
two-phase aggregation (the Spark-native analog of the reference's
DISTRIBUTE_ON_KEY hints, e.g. etl/etl/cdm_person.sql:97):

  phase 1: group by (key, salt)  -- salt = pure function of row content
  phase 2: re-aggregate by key

Results are identical to the direct groupBy (the oracle is the plain SQL),
but no single shuffle partition ever receives more than ~1/n_salts of a hot
key's rows.  Salts derive from xxhash64 of a row column — never rand() —
so retried tasks re-place rows identically (determinism contract, SURVEY §7.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mimic_spark.functions.hashing import salted_key
from mimic_spark.operators.catalog import load_tables, register

N_SALTS = 16


def salted_rollup(
    df: DataFrame,
    key: str,
    salt_from: str,
    aggs_phase1: list,
    aggs_phase2: list,
    n_salts: int = N_SALTS,
) -> DataFrame:
    salted = df.withColumn("_sk", salted_key(key, salt_from, n_salts))
    partial = salted.groupBy("_sk", key).agg(*aggs_phase1)
    return partial.groupBy(key).agg(*aggs_phase2)


@register(
    "skew_salted_rollup",
    family="north_rule skew handling: salted two-phase per-user rollup == direct groupBy (ref DISTRIBUTE_ON_KEY hints)",
    oracle="""
SELECT user_id,
       count(*) AS n_events,
       cast(sum(round(value * 100)) AS BIGINT) AS value_c,
       max(ts) AS last_ts
FROM events
GROUP BY user_id
""",
)
def skew_salted_rollup(spark: SparkSession, sf: str) -> DataFrame:
    (e,) = load_tables(spark, sf, "events")
    return salted_rollup(
        e,
        key="user_id",
        salt_from="event_id",
        aggs_phase1=[
            F.count(F.lit(1)).alias("pn"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("pv"),
            F.max("ts").alias("pt"),
        ],
        aggs_phase2=[
            F.sum("pn").alias("n_events"),
            F.sum("pv").alias("value_c"),
            F.max("pt").alias("last_ts"),
        ],
    )
