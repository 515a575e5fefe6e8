"""Window-function operator family (SURVEY.md §2.5) + range/as-of join (J3).

The reference's most loaded operator family — 34 OVER clauses.  Each op here
re-expresses one of its named patterns over the driver's events/orders tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from mimic_spark.operators.catalog import load_tables, register


@register(
    "window_dedup_latest",
    family="W1 row_number dedup / pick-latest (ref lk_meas_labevents.sql:142-145; the CDC dedup primitive)",
    oracle="""
SELECT event_id, user_id, event_type, ts
FROM (
  SELECT event_id, user_id, event_type, ts,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
""",
)
def window_dedup_latest(spark: SparkSession, sf: str) -> DataFrame:
    """r9: a max(struct(ts, event_id)) hash-aggregation variant was tried
    (map-side partial reduction, no sort) and REVERTED — a struct-typed max
    falls out of the primitive hash aggregate into ObjectHashAggregate, and
    the interleaved A/B under the bench config read the original
    rank-limited window FASTER (1.42 s vs 1.59 s at sf1): Spark 4's partial
    WindowGroupLimit already prunes to one row per group per map task
    before the exchange, so the window plan shuffles no more than the
    aggregation would."""
    (e,) = load_tables(spark, sf, "events")
    w = W.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("event_id", "user_id", "event_type", "ts")
    )


@register(
    "window_first_running_max",
    family="W3 FIRST_VALUE (ref cdm_person.sql:33-40) + W4 running MAX ROWS UNBOUNDED PRECEDING (ref cdm_drug_era.sql:82-89)",
    oracle="""
SELECT event_id, user_id,
       first_value(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS first_type,
       cast(round(max(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 100, 0)
            AS BIGINT) AS running_max_c
FROM events
""",
)
def window_first_running_max(spark: SparkSession, sf: str) -> DataFrame:
    (e,) = load_tables(spark, sf, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        F.first("event_type").over(w).alias("first_type"),
        F.round(
            F.max("value").over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
            * 100
        ).cast("long").alias("running_max_c"),
    )


@register(
    "sessionize_gaps",
    family="W2 sessionization: lag + cumulative sum over gap>threshold (ref lk_vis_part_2.sql:353-381 service sessions)",
    oracle="""
WITH gaps AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                OR datediff('second', lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) > 3600
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sess AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM gaps
)
SELECT user_id, cast(session_id AS BIGINT) AS session_id,
       count(*) AS n_events, min(ts) AS session_start, max(ts) AS session_end
FROM sess GROUP BY user_id, session_id
""",
)
def sessionize_gaps(spark: SparkSession, sf: str) -> DataFrame:
    (e,) = load_tables(spark, sf, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = W.partitionBy("user_id").orderBy("ts").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    # parquet ts is TIMESTAMP_NTZ in Spark 4: cast via timestamp to seconds
    secs = F.col("ts").cast("timestamp").cast("long")
    gap_s = secs - F.lag(secs).over(w)
    new_sess = F.when(gap_s.isNull() | (gap_s > 3600), 1).otherwise(0)
    return (
        e.withColumn("new_session", new_sess)
        .withColumn("session_id", F.sum("new_session").over(wrun).cast("long"))
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )


# Deregistered from the catalog in r3 (W5/W6 evidence is carried by the full
# era_variable_intervals entry; this fixed-width simplification stays as a
# plain function for the bench headline and the pytest that proves the
# lag-based simplification equals the running-max form on fixed-width
# intervals).  Freed slot keeps all oracled queries inside the driver's
# 50-entry correctness window.
ERA_GAPS_ISLANDS_ORACLE = """
WITH err AS (
  SELECT user_id, ts AS start_ts, ts + INTERVAL 2 HOUR AS end_ts
  FROM events WHERE event_type = 'error'
),
flagged AS (
  SELECT user_id, start_ts, end_ts,
         CASE WHEN lag(end_ts) OVER w IS NULL
                OR lag(end_ts) OVER w < start_ts THEN 1 ELSE 0 END AS new_era
  FROM err
  WINDOW w AS (PARTITION BY user_id ORDER BY start_ts)
),
eras AS (
  SELECT user_id, start_ts, end_ts,
         sum(new_era) OVER (PARTITION BY user_id ORDER BY start_ts
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS era_id
  FROM flagged
)
SELECT user_id, cast(era_id AS BIGINT) AS era_id,
       min(start_ts) AS era_start, max(end_ts) AS era_end, count(*) AS n_incidents
FROM eras GROUP BY user_id, era_id
"""


def era_gaps_islands(spark: SparkSession, sf: str) -> DataFrame:
    """Gaps-and-islands via lag + cumulative flag-sum — same algebra as the
    reference's two-pass running-max era build, in its simpler modern form.
    NOTE: lag(end_ts) (not running max) is sufficient here because intervals
    share a fixed 2h width, so end order == start order."""
    (e,) = load_tables(spark, sf, "events")
    err = e.filter(F.col("event_type") == "error").select(
        "user_id",
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("end_ts"),
    )
    w = W.partitionBy("user_id").orderBy("start_ts")
    wrun = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    prev_end = F.lag("end_ts").over(w)
    new_era = F.when(prev_end.isNull() | (prev_end < F.col("start_ts")), 1).otherwise(0)
    return (
        err.withColumn("new_era", new_era)
        .withColumn("era_id", F.sum("new_era").over(wrun).cast("long"))
        .groupBy("user_id", "era_id")
        .agg(
            F.min("start_ts").alias("era_start"),
            F.max("end_ts").alias("era_end"),
            F.count(F.lit(1)).alias("n_incidents"),
        )
    )


@register(
    "asof_range_join",
    family="J3 point-in-interval as-of join + W1 pick-earliest (ref lk_meas_labevents.sql:138-154 hadm_id recovery)",
    oracle="""
SELECT c.event_id AS event_id,
       i.incident_id AS incident_id
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
LEFT JOIN (
  SELECT event_id AS incident_id, user_id, ts AS lo, ts + INTERVAL 2 HOUR AS hi
  FROM events WHERE event_type = 'error'
) i ON c.user_id = i.user_id AND c.ts BETWEEN i.lo AND i.hi
QUALIFY row_number() OVER (PARTITION BY c.event_id ORDER BY i.lo DESC, i.incident_id) = 1
""",
)
def asof_range_join(spark: SparkSession, sf: str) -> DataFrame:
    """Recover the 'incident' (error event) a click belongs to: equi-join on
    user_id + range predicate, then keep the latest-starting incident — the
    reference's missing-hadm_id recovery, Spark-first.

    Scale note: the equi key (user_id) makes this a sort-merge/shuffle-hash
    join with a range post-filter, NOT a broadcast-nested-loop; the window
    then picks one row per fact.  Same plan shape the reference relies on
    DuckDB to produce."""
    (e,) = load_tables(spark, sf, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    incidents = e.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("incident_id"),
        F.col("user_id").alias("i_user"),
        F.col("ts").alias("lo"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("hi"),
    )
    j = clicks.join(
        incidents,
        (F.col("user_id") == F.col("i_user"))
        & F.col("ts").between(F.col("lo"), F.col("hi")),
        "left",
    )
    w = W.partitionBy("event_id").orderBy(
        F.col("lo").desc_nulls_last(), F.col("incident_id")
    )
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("event_id", "incident_id")
    )


def merge_intervals(
    df: DataFrame,
    keys: list[str],
    start: str = "start_ts",
    end: str = "end_ts",
    gap_seconds: int = 0,
    era_col: str = "era_id",
) -> DataFrame:
    """Merge possibly-overlapping, variable-length intervals per key group.

    The W5 primitive (ref etl/etl/cdm_drug_era.sql:51-260).  The reference
    builds eras with an event sweep: union starts and (pad-by-30-days) ends,
    take MAX(start_ordinal) OVER (... ROWS UNBOUNDED PRECEDING), keep rows
    where 2*start_ordinal = overall_ord, then unpad.  The algebraic core is a
    *running max of interval ends* — lag(end) is NOT sufficient because with
    variable-length intervals end order differs from start order (a long
    interval can swallow several later short ones).  Spark-first form: one
    window pass computing the running max of `end` over rows strictly before
    the current one; a new era starts where that max, padded by
    `gap_seconds` (the reference's 30-day grace), is still before `start`.

    Scale: two window functions over one (keys)-partitioned sort — a single
    shuffle, no self-join, no event-union blowup (the reference's sweep
    doubles the row count and needs an extra range join back).
    """
    w = W.partitionBy(*keys).orderBy(start, end)
    prev_max_end = F.max(end).over(w.rowsBetween(W.unboundedPreceding, -1))
    new_era = F.when(
        prev_max_end.isNull()
        | (prev_max_end + F.expr(f"INTERVAL {gap_seconds} SECONDS") < F.col(start)),
        1,
    ).otherwise(0)
    return df.withColumn("_new_era", new_era).withColumn(
        era_col,
        F.sum("_new_era")
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("long"),
    ).drop("_new_era")


@register(
    "era_variable_intervals",
    family="W5 full form: variable-length-interval era build w/ pad/unpad running-max merge (ref cdm_drug_era.sql:51-260; pad :189-198, unpad :228-237)",
    oracle="""
WITH iv AS (
  SELECT user_id, ts AS start_ts,
         ts + to_seconds((event_id % 240) * 60) AS end_ts
  FROM events WHERE event_type IN ('click', 'error')
),
sub_flag AS (
  SELECT user_id, start_ts, end_ts,
         CASE WHEN max(end_ts) OVER (PARTITION BY user_id ORDER BY start_ts, end_ts
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) >= start_ts
              THEN 0 ELSE 1 END AS new_sub
  FROM iv
),
sub AS (
  SELECT user_id, start_ts, end_ts,
         sum(new_sub) OVER (PARTITION BY user_id ORDER BY start_ts, end_ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sub_id
  FROM sub_flag
),
subs AS (
  SELECT user_id, sub_id,
         min(start_ts) AS s, max(end_ts) AS e, count(*) AS n_exposures
  FROM sub GROUP BY user_id, sub_id
),
era_flag AS (
  SELECT user_id, s, e, n_exposures,
         CASE WHEN max(e) OVER (PARTITION BY user_id ORDER BY s, e
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                + INTERVAL 30 MINUTE >= s
              THEN 0 ELSE 1 END AS new_era
  FROM subs
),
era AS (
  SELECT user_id, s, e, n_exposures,
         sum(new_era) OVER (PARTITION BY user_id ORDER BY s, e
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS era_id
  FROM era_flag
)
SELECT user_id, cast(era_id AS BIGINT) AS era_id,
       min(s) AS era_start, max(e) AS era_end,
       cast(sum(n_exposures) AS BIGINT) AS n_exposures,
       count(*) AS n_sub_eras
FROM era GROUP BY user_id, era_id
""",
)
def era_variable_intervals(spark: SparkSession, sf: str) -> DataFrame:
    """The reference's full two-level era build on variable-length intervals:

    1. raw exposures -> sub-exposures: merge *overlapping* intervals (gap 0)
       — ref cdm_drug_era.sql:51-170 (sub-enddates sweep + temp_ends);
    2. sub-exposures -> eras: merge with a 30-unit grace pad
       — ref :174-260 (pad :189-198, unpad :228-237), here 30 minutes in
       place of 30 days to suit the events table's time scale.

    Interval length varies per row ((event_id % 240) minutes), so end order
    differs from start order — the case where lag(end) is wrong and the
    running max is required (cf. era_gaps_islands' fixed-width simplification).
    """
    (e,) = load_tables(spark, sf, "events")
    iv = e.filter(F.col("event_type").isin("click", "error")).select(
        "user_id",
        F.col("ts").alias("start_ts"),
        F.expr("timestampadd(SECOND, (event_id % 240) * 60, ts)").alias("end_ts"),
    )
    subs = (
        merge_intervals(iv, ["user_id"], gap_seconds=0, era_col="sub_id")
        .groupBy("user_id", "sub_id")
        .agg(
            F.min("start_ts").alias("s"),
            F.max("end_ts").alias("e"),
            F.count(F.lit(1)).alias("n_exposures"),
        )
    )
    eras = merge_intervals(
        subs, ["user_id"], start="s", end="e", gap_seconds=30 * 60, era_col="era_id"
    )
    return eras.groupBy("user_id", "era_id").agg(
        F.min("s").alias("era_start"),
        F.max("e").alias("era_end"),
        F.sum("n_exposures").cast("long").alias("n_exposures"),
        F.count(F.lit(1)).alias("n_sub_eras"),
    )


@register(
    "window_rank_family",
    family="W2 LAG/LEAD prev/next event (ref lk_vis_part_1.sql:105-114, cdm_visit_occurrence.sql:91-94) + W-breadth: rank/dense_rank/percent_rank/ntile/cume_dist",
    oracle="""
SELECT event_id, user_id,
       lag(event_type) OVER w AS prev_type,
       lead(event_type) OVER w AS next_type,
       cast(round((value - lag(value) OVER w) * 100) AS BIGINT) AS delta_c,
       cast(rank() OVER w AS BIGINT) AS rnk,
       cast(dense_rank() OVER w AS BIGINT) AS drnk,
       round(percent_rank() OVER w, 6) AS prnk,
       cast(ntile(4) OVER w AS BIGINT) AS quartile,
       round(cume_dist() OVER w, 6) AS cdist
FROM events
WHERE user_id < 20
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
)
def window_rank_family(spark: SparkSession, sf: str) -> DataFrame:
    """LAG/LEAD plus the complete ranking-function family over one window —
    rounds out §2.5 beyond the row_number/first_value forms the reference
    leans on.  (Absorbed the former window_lag_lead entry in r3 so every
    oracled query fits the driver's 50-entry correctness window; all
    functions share one window spec — single sort, zero extra exchanges.
    event_id tiebreak keeps every function deterministic.)"""
    (e,) = load_tables(spark, sf, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return e.filter(F.col("user_id") < 20).select(
        "event_id",
        "user_id",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        F.round((F.col("value") - F.lag("value").over(w)) * 100)
        .cast("long")
        .alias("delta_c"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.round(F.percent_rank().over(w), 6).alias("prnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
    )
