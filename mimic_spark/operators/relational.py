"""Core relational operator inventory (SURVEY.md §2.1-§2.4, §2.7-§2.8).

Each query is the Spark-first re-expression of a reference pattern; the
reference file:line it mirrors is cited in the docstring/`family`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mimic_spark.functions.portable_hash import (
    duck_row_id as _duck_row_id,
    spark_row_id as _spark_row_id,
)
from mimic_spark.operators.catalog import load_tables, register


def _cents(col: str) -> F.Column:
    """Exact money aggregation: cents as BIGINT (order-independent sums)."""
    return F.round(F.col(col) * 100).cast("long")


# --------------------------------------------------------------------- A1/P1


@register(
    "q1_pricing_summary",
    family="A1 group-agg (ref etl/etl/lk_vis_part_2.sql:115-137), P1-P4 filters",
    oracle="""
SELECT l_returnflag, l_linestatus,
       cast(sum(cast(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
       cast(sum(cast(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_c,
       cast(sum(cast(round(l_extendedprice * 100) AS BIGINT)
           * cast(round((1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_cc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q1 shape: scan -> filter (pushed to parquet) -> hash agg.

    r9: a spread-before-aggregation variant was tried (the test parquet's
    6 row groups cap scan parallelism) and REVERTED — interleaved A/B under
    the bench config read 0.61 s plain vs 0.59 s spread (statistical tie),
    so the extra exchange isn't worth the plan complexity."""
    (li,) = load_tables(spark, sf, "lineitem")
    return (
        # parquet timestamps are NTZ in Spark 4; an NTZ literal keeps the
        # comparison session-timezone-independent (a plain `timestamp` literal
        # would coerce through the session TZ)
        li.filter(
            F.col("l_shipdate")
            <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz")
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_cents("l_quantity")).alias("sum_qty_c"),
            F.sum(_cents("l_extendedprice")).alias("sum_base_c"),
            F.sum(
                _cents("l_extendedprice")
                * F.round((1 - F.col("l_discount")) * 100).cast("long")
            ).alias("sum_disc_cc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ----------------------------------------------------------------------- P1


@register(
    "proj_rename_string_funcs",
    family="P1 projection+rename (ref st_hosp_base.sql:20-35); §2.8 string funcs",
    oracle="""
SELECT c_custkey,
       upper(c_name) AS name_u,
       concat(trim(c_mktsegment), '#', cast(c_nationkey AS VARCHAR)) AS seg_key,
       substring(c_name, 1, 8) AS name_prefix
FROM customer
""",
)
def proj_rename_string_funcs(spark: SparkSession, sf: str) -> DataFrame:
    (c,) = load_tables(spark, sf, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_u"),
        F.concat(
            F.trim(F.col("c_mktsegment")),
            F.lit("#"),
            F.col("c_nationkey").cast("string"),
        ).alias("seg_key"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
    )


# ------------------------------------------------------------------- P2-P7


@register(
    "filter_case_cascade",
    family="P2-P7: predicates, BETWEEN, IN, LIKE, CASE cascade (ref cdm_person.sql:129-133)",
    oracle="""
SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'hot'
            WHEN o_orderpriority LIKE '3%' THEN 'warm'
            ELSE 'cold' END AS prio_class,
       count(*) AS n,
       cast(sum(cast(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_c
FROM orders
WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1998-12-31'
  AND o_orderstatus <> 'P'
GROUP BY 1
""",
)
def filter_case_cascade(spark: SparkSession, sf: str) -> DataFrame:
    (o,) = load_tables(spark, sf, "orders")
    prio = (
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), F.lit("hot"))
        .when(F.col("o_orderpriority").like("3%"), F.lit("warm"))
        .otherwise(F.lit("cold"))
    )
    return (
        o.filter(
            F.col("o_orderdate").between("1996-01-01", "1998-12-31")
            & (F.col("o_orderstatus") != "P")
        )
        .groupBy(prio.alias("prio_class"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_cents("o_totalprice")).alias("total_c"),
        )
    )


# ------------------------------------------------------------------- J1/J9


@register(
    "join_broadcast_star",
    family="J1 fact-dim equi join + J9 multi-way star (ref cdm_visit_occurrence.sql:100-116); broadcast dims",
    oracle="""
SELECT n.n_name AS nation, r.r_name AS region,
       count(*) AS n_cust,
       cast(sum(cast(round(c.c_acctbal * 100) AS BIGINT)) AS BIGINT) AS acctbal_c
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY n.n_name, r.r_name
""",
)
def join_broadcast_star(spark: SparkSession, sf: str) -> DataFrame:
    c, n, r = load_tables(spark, sf, "customer", "nation", "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.sum(_cents("c_acctbal")).alias("acctbal_c"),
        )
    )


@register(
    "join_left_chain",
    family="J2 left-join mapping chain with join-side predicates (ref lk_meas_labevents.sql:114-130)",
    oracle="""
SELECT coalesce(n.n_name, 'UNMAPPED') AS nation, count(*) AS n_orders
FROM orders o
LEFT JOIN customer c ON o.o_custkey = c.c_custkey AND c.c_acctbal > 0
LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY 1
""",
)
def join_left_chain(spark: SparkSession, sf: str) -> DataFrame:
    o, c, n = load_tables(spark, sf, "orders", "customer", "nation")
    return (
        o.join(
            F.broadcast(c),
            (o.o_custkey == c.c_custkey) & (c.c_acctbal > 0),
            "left",
        )
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "left")
        .groupBy(F.coalesce(F.col("n_name"), F.lit("UNMAPPED")).alias("nation"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


# ------------------------------------------------------------------- J4


@register(
    "join_disjunctive_split",
    family="J4 disjunctive join condition, split into two equi-joins + union (ref lk_vis_part_2.sql:389-395)",
    oracle="""
WITH ev AS (
  SELECT event_id,
         CASE WHEN event_type = 'error' THEN NULL ELSE user_id END AS uid,
         cast(event_id % 25 AS INTEGER) AS fallback_key
  FROM events
)
SELECT coalesce(n.n_name, 'NONE') AS match_name, count(*) AS n
FROM ev
LEFT JOIN nation n
  ON (ev.uid IS NOT NULL AND ev.uid = n.n_nationkey)
  OR (ev.uid IS NULL AND ev.fallback_key = n.n_nationkey)
GROUP BY 1
""",
)
def join_disjunctive_split(spark: SparkSession, sf: str) -> DataFrame:
    """Disjunctive LEFT JOIN = two equi-joins unioned — the scale-safe plan
    (a single OR-join degenerates to broadcast-nested-loop)."""
    e, n = load_tables(spark, sf, "events", "nation")
    ev = e.select(
        "event_id",
        F.when(F.col("event_type") == "error", F.lit(None))
        .otherwise(F.col("user_id"))
        .alias("uid"),
        (F.col("event_id") % 25).cast("int").alias("fallback_key"),
    )
    with_uid = ev.filter(F.col("uid").isNotNull()).join(
        F.broadcast(n), F.col("uid") == F.col("n_nationkey"), "left"
    )
    without = ev.filter(F.col("uid").isNull()).join(
        F.broadcast(n), F.col("fallback_key") == F.col("n_nationkey"), "left"
    )
    both = with_uid.select("event_id", "n_name").unionByName(
        without.select("event_id", "n_name")
    )
    return both.groupBy(
        F.coalesce(F.col("n_name"), F.lit("NONE")).alias("match_name")
    ).agg(F.count(F.lit(1)).alias("n"))


# ------------------------------------------------------------------- J5


@register(
    "cross_join_scalar",
    family="J5 cross join with 1-row side (ref st_waveform_poc_1.sql:175,201) — auto-broadcast",
    oracle="""
WITH g AS (
  SELECT sum(cast(round(value * 100) AS BIGINT)) * 1.0 / count(*) AS gavg_c
  FROM events
)
SELECT e.event_type AS event_type, count(*) AS n_above
FROM events e CROSS JOIN g
WHERE cast(round(e.value * 100) AS BIGINT) > g.gavg_c
GROUP BY 1
""",
)
def cross_join_scalar(spark: SparkSession, sf: str) -> DataFrame:
    (e,) = load_tables(spark, sf, "events")
    g = e.agg(
        (
            F.sum(_cents("value")) * 1.0 / F.count(F.lit(1))
        ).alias("gavg_c")
    )
    return (
        e.crossJoin(F.broadcast(g))
        .filter(_cents("value") > F.col("gavg_c"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_above"))
    )


# ------------------------------------------------------------------- J7


@register(
    "join_on_expression",
    family="J7 join on normalized expression (ref lk_cond_diagnoses.sql:98: REPLACE(code,'.',''))",
    oracle="""
WITH dim AS (
  SELECT DISTINCT replace(upper(p_type), ' ', '') AS type_norm FROM part
)
SELECT d.type_norm AS type_norm, count(*) AS n_parts
FROM part p
JOIN dim d ON replace(upper(p.p_type), ' ', '') = d.type_norm
GROUP BY 1
""",
)
def join_on_expression(spark: SparkSession, sf: str) -> DataFrame:
    (p,) = load_tables(spark, sf, "part")
    norm = F.regexp_replace(F.upper(F.col("p_type")), " ", "")
    dim = p.select(norm.alias("type_norm")).distinct()
    return (
        p.withColumn("type_norm_p", norm)
        .join(F.broadcast(dim), F.col("type_norm_p") == dim.type_norm)
        .groupBy("type_norm")
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )


# ---------------------------------------------------------------- J6/P8/J10


@register(
    "anti_join_dup_removal",
    family="J6 dup-list self-join + P8 anti-join filter (ref lk_vis_part_1.sql:89-127)",
    oracle="""
WITH dups AS (
  SELECT user_id, event_type, cast(ts AS DATE) AS d
  FROM events GROUP BY 1, 2, 3 HAVING count(*) > 1
)
SELECT e.event_type AS event_type, count(*) AS n_unique_events
FROM events e
LEFT JOIN dups d
  ON e.user_id = d.user_id AND e.event_type = d.event_type
  AND cast(e.ts AS DATE) = d.d
WHERE d.user_id IS NULL
GROUP BY 1
""",
)
def anti_join_dup_removal(spark: SparkSession, sf: str) -> DataFrame:
    (e,) = load_tables(spark, sf, "events")
    keyed = e.withColumn("d", F.to_date("ts"))
    dups = (
        keyed.groupBy("user_id", "event_type", "d")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter("cnt > 1")
        .drop("cnt")
    )
    return (
        keyed.join(dups, ["user_id", "event_type", "d"], "left_anti")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_unique_events"))
    )


@register(
    "semi_join_exists",
    family="left-semi (EXISTS) — §2.3 table note; J10 FK-style membership",
    oracle="""
SELECT o.o_orderstatus AS o_orderstatus, count(*) AS n
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49)
GROUP BY 1
""",
)
def semi_join_exists(spark: SparkSession, sf: str) -> DataFrame:
    o, li = load_tables(spark, sf, "orders", "lineitem")
    big = li.filter(F.col("l_quantity") >= 49).select("l_orderkey")
    return (
        o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ------------------------------------------------------------------- U1/U2/A6


@register(
    "union_distinct_reagg",
    family="U1/U2 union-all + distinct (ref st_hosp.sql:323-392); A6 re-agg of pre-aggs (ref cdm_observation_period.sql)",
    oracle="""
WITH per_source AS (
  SELECT user_id, min(ts) AS lo, max(ts) AS hi FROM events
  WHERE event_type = 'click' GROUP BY user_id
  UNION ALL
  SELECT user_id, min(ts) AS lo, max(ts) AS hi FROM events
  WHERE event_type = 'view' GROUP BY user_id
  UNION ALL
  SELECT user_id, min(ts) AS lo, max(ts) AS hi FROM events
  WHERE event_type = 'purchase' GROUP BY user_id
)
SELECT user_id, min(lo) AS span_start, max(hi) AS span_end, count(*) AS n_sources
FROM per_source GROUP BY user_id
""",
)
def union_distinct_reagg(spark: SparkSession, sf: str) -> DataFrame:
    (e,) = load_tables(spark, sf, "events")

    def per(t: str) -> DataFrame:
        return (
            e.filter(F.col("event_type") == t)
            .groupBy("user_id")
            .agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"))
        )

    u = per("click").unionByName(per("view")).unionByName(per("purchase"))
    return u.groupBy("user_id").agg(
        F.min("lo").alias("span_start"),
        F.max("hi").alias("span_end"),
        F.count(F.lit(1)).alias("n_sources"),
    )


# -------------------------------------------------------------------- A2-A5


@register(
    "agg_conditional_having",
    family="A3 having (ref lk_vis_part_1.sql:89-97) + A4 conditional agg (ref post_etl_audit.sql:193-195)",
    oracle="""
SELECT user_id,
       count(*) AS n_events,
       cast(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
       round(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
             * 100.0 / count(*), 2) AS error_pct
FROM events
GROUP BY user_id
HAVING count(*) > 10
""",
)
def agg_conditional_having(spark: SparkSession, sf: str) -> DataFrame:
    (e,) = load_tables(spark, sf, "events")
    n_err = F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
    return (
        e.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            n_err.alias("n_errors"),
            F.round(n_err * 100.0 / F.count(F.lit(1)), 2).alias("error_pct"),
        )
        .filter(F.col("n_events") > 10)
    )


@register(
    "distinct_count_audit",
    family="A2 distinct + A5 population counts (ref post_etl_audit.sql:58-182); countDistinct",
    oracle="""
SELECT 'events' AS tbl, count(*) AS n_rows, count(DISTINCT user_id) AS n_keys FROM events
UNION ALL
SELECT 'orders' AS tbl, count(*) AS n_rows, count(DISTINCT o_custkey) AS n_keys FROM orders
UNION ALL
SELECT 'lineitem' AS tbl, count(*) AS n_rows, count(DISTINCT l_orderkey) AS n_keys FROM lineitem
""",
)
def distinct_count_audit(spark: SparkSession, sf: str) -> DataFrame:
    e, o, li = load_tables(spark, sf, "events", "orders", "lineitem")

    def pop(df: DataFrame, tbl: str, key: str) -> DataFrame:
        return df.agg(
            F.lit(tbl).alias("tbl"),
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct(key).alias("n_keys"),
        )

    return (
        pop(e, "events", "user_id")
        .unionByName(pop(o, "orders", "o_custkey"))
        .unionByName(pop(li, "lineitem", "l_orderkey"))
    )


# ---------------------------------------------------------------------- O2/O3


@register(
    "topk_per_group",
    family="O2 top-k per group via rank window (ref post_etl_audit.sql:341-350)",
    oracle="""
SELECT o_orderpriority, o_orderkey, cast(round(o_totalprice * 100) AS BIGINT) AS price_c
FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 3
""",
)
def topk_per_group(spark: SparkSession, sf: str) -> DataFrame:
    """r9: Spark 4 already prunes this to <= k rows per group per map task
    (partial WindowGroupLimit) — but that partial pass needs a FULL local
    sort of every scan partition, which profiled as ~80% of the query (1.3 s
    of 1.6 s at sf1).  A best-effort Arrow local-top-k prefilter
    (arrow_kernels.make_local_topk_kernel) replaces the local sort with a
    numpy per-batch selection; the exact window then ranks the surviving
    <= k·groups·batches rows with the identical (price DESC, orderkey)
    ordering.  Row-identical by construction: the kernel never drops a row
    that could rank <= k within its group, and passes batches through
    untouched on any doubt (nulls)."""
    from pyspark.sql import Window as W

    from mimic_spark.functions.arrow_kernels import make_local_topk_kernel

    (o,) = load_tables(spark, sf, "orders")
    cand = o.select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    ).mapInArrow(
        make_local_topk_kernel(
            "o_orderpriority", "o_totalprice", "o_orderkey", 3
        ),
        "o_orderkey bigint, o_totalprice double, o_orderpriority string",
    )
    w = W.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "o_orderpriority",
            "o_orderkey",
            _cents("o_totalprice").alias("price_c"),
        )
    )


@register(
    "global_topk",
    family="O3 global ORDER BY + LIMIT (TakeOrderedAndProject; ref tmp_top100.sql)",
    oracle="""
SELECT c_custkey, c_name, cast(round(c_acctbal * 100) AS BIGINT) AS acctbal_c
FROM customer
ORDER BY c_acctbal DESC, c_custkey
LIMIT 10
""",
)
def global_topk(spark: SparkSession, sf: str) -> DataFrame:
    (c,) = load_tables(spark, sf, "customer")
    return (
        c.orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
        .limit(10)
        .select("c_custkey", "c_name", _cents("c_acctbal").alias("acctbal_c"))
    )


# ---------------------------------------------------------- §2.7 (∅ rows)


@register(
    "set_intersect_except",
    family="§2.7 INTERSECT/EXCEPT (unused by the reference — ∅ rows covered for completeness)",
    oracle="""
SELECT 'both' AS which, count(*) AS n FROM (
  SELECT user_id FROM events WHERE event_type = 'click'
  INTERSECT
  SELECT user_id FROM events WHERE event_type = 'purchase')
UNION ALL
SELECT 'click_only' AS which, count(*) AS n FROM (
  SELECT user_id FROM events WHERE event_type = 'click'
  EXCEPT
  SELECT user_id FROM events WHERE event_type = 'purchase')
""",
)
def set_intersect_except(spark: SparkSession, sf: str) -> DataFrame:
    (e,) = load_tables(spark, sf, "events")
    clicks = e.filter(F.col("event_type") == "click").select("user_id").distinct()
    buys = e.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    both = clicks.intersect(buys).agg(
        F.lit("both").alias("which"), F.count(F.lit(1)).alias("n")
    )
    only = clicks.exceptAll(buys).agg(
        F.lit("click_only").alias("which"), F.count(F.lit(1)).alias("n")
    )
    return both.unionByName(only)


@register(
    "pivot_event_matrix",
    family="pivot/unpivot (beyond reference: ∅ there; standard OLAP reshaping)",
    oracle="""
SELECT user_id,
       cast(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
       cast(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
       cast(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
       cast(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
       cast(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup
FROM events GROUP BY user_id
""",
)
def pivot_event_matrix(spark: SparkSession, sf: str) -> DataFrame:
    (e,) = load_tables(spark, sf, "events")
    kinds = ["click", "view", "purchase", "error", "signup"]
    out = (
        e.groupBy("user_id")
        .pivot("event_type", kinds)
        .agg(F.count(F.lit(1)))
    )
    return out.select(
        "user_id", *[F.coalesce(F.col(k), F.lit(0)).cast("long").alias(k) for k in kinds]
    )


# ------------------------------------------------------------------- §2.8


@register(
    "scalar_functions",
    family="§2.8: regexp_extract w/ BQ NULL-on-miss shim, coalesce/nullif, date math, JSON extract",
    oracle="""
SELECT event_id,
       nullif(regexp_extract(event_type, '^(s[a-z]+)', 1), '') AS s_word,
       coalesce(nullif(event_type, 'view'), 'VIEWED') AS type_or_default,
       cast(ts AS DATE) AS d,
       cast(ts + INTERVAL 30 DAY AS DATE) AS d_plus30,
       datediff('day', TIMESTAMP '2024-01-01', ts) AS days_since,
       json_extract_string(props, '$.k') AS k_val
FROM events
""",
)
def scalar_functions(spark: SparkSession, sf: str) -> DataFrame:
    """regexp_extract: Spark returns '' on miss (like DuckDB), the reference's
    BigQuery dialect returned NULL — reproduce NULL semantics with nullif
    (SURVEY.md §2.8 caveat; ref shim etl/duckdb/macros.sql:23)."""
    (e,) = load_tables(spark, sf, "events")
    return e.select(
        "event_id",
        F.nullif(F.regexp_extract("event_type", r"^(s[a-z]+)", 1), F.lit("")).alias(
            "s_word"
        ),
        F.coalesce(F.nullif(F.col("event_type"), F.lit("view")), F.lit("VIEWED")).alias(
            "type_or_default"
        ),
        F.to_date("ts").alias("d"),
        F.to_date(F.col("ts") + F.expr("INTERVAL 30 DAYS")).alias("d_plus30"),
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")).alias(
            "days_since"
        ),
        F.get_json_object("props", "$.k").alias("k_val"),
    )


@register(
    "explode_split_words",
    family="§2.8 UNNEST(string_split) (ref post_etl_audit.sql:471-473) -> explode(split)",
    oracle="""
SELECT word, count(*) AS n
FROM (SELECT unnest(string_split(p_type, ' ')) AS word FROM part)
WHERE word <> ''
GROUP BY word
""",
)
def explode_split_words(spark: SparkSession, sf: str) -> DataFrame:
    (p,) = load_tables(spark, sf, "part")
    return (
        p.select(F.explode(F.split("p_type", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "deterministic_row_id",
    family="§2.8 hash ids: FARM_FINGERPRINT(TO_JSON_STRING(STRUCT(...))) analog over the canonical key JSON (ref st_hosp_base.sql:28-33)",
    oracle=f"""
WITH t AS (
  SELECT o_orderkey,
         concat('{{"orderkey":', o_orderkey, ',"custkey":', o_custkey, '}}') AS trace_id
  FROM orders
)
SELECT o_orderkey,
       {_duck_row_id('trace_id')} AS load_row_id,
       trace_id
FROM t
""",
)
def deterministic_row_id_op(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic row identity from the natural key's canonical JSON —
    the reference's FARM_FINGERPRINT(TO_JSON_STRING(STRUCT(...))) role
    (st_hosp_base.sql:28-33).

    ORACLE TWIN, NOT THE PRODUCTION ID PATH.  This catalog form uses the
    portable 62-bit polynomial hash (functions/portable_hash.py) purely so
    DuckDB can value-check the id bit-for-bit; it is an interpreted
    per-character Catalyst expression (CodegenFallback) and MUST NOT migrate
    into the CDC hot path.  The engine's production id is
    functions/hashing.py:deterministic_row_id (xxhash64 — JVM codegen'd,
    ~100x faster), with its own determinism pytest
    (ref test_deterministic_load_row_id.py); a marker test asserts the CDC
    schema's id derives from xxhash64, never from this twin."""
    from mimic_spark.functions.hashing import trace_id

    (o,) = load_tables(spark, sf, "orders")
    # materialize the canonical JSON once, then hash the column reference —
    # inlining the to_json call into the hash expression would evaluate it
    # once per rolling hash (the 62-bit id runs two)
    staged = o.select(
        "o_orderkey",
        trace_id(orderkey="o_orderkey", custkey="o_custkey").alias("trace_id"),
    )
    return staged.select(
        "o_orderkey",
        F.expr(_spark_row_id("trace_id")).alias("load_row_id"),
        "trace_id",
    )


@register(
    "cube_rollup_totals",
    family="cube/rollup grouping sets (beyond reference ∅; standard OLAP)",
    oracle="""
SELECT coalesce(l_returnflag, 'ALL') AS rf,
       coalesce(l_linestatus, 'ALL') AS ls,
       count(*) AS n,
       cast(sum(cast(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_c
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def cube_rollup_totals(spark: SparkSession, sf: str) -> DataFrame:
    (li,) = load_tables(spark, sf, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_cents("l_quantity")).alias("qty_c"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("ls"),
            "n",
            "qty_c",
        )
    )


@register(
    "unpivot_stack",
    family="unpivot/stack (melt wide metrics to rows)",
    oracle="""
SELECT o_orderkey, 'total_c' AS metric,
       cast(round(o_totalprice * 100) AS BIGINT) AS value_c
FROM orders WHERE o_orderkey < 100
UNION ALL
SELECT o_orderkey, 'key10' AS metric, o_orderkey * 10 AS value_c
FROM orders WHERE o_orderkey < 100
""",
)
def unpivot_stack(spark: SparkSession, sf: str) -> DataFrame:
    (o,) = load_tables(spark, sf, "orders")
    narrow = o.filter(F.col("o_orderkey") < 100).select(
        "o_orderkey",
        _cents("o_totalprice").alias("total_c"),
        (F.col("o_orderkey") * 10).alias("key10"),
    )
    return narrow.unpivot(
        ids=["o_orderkey"],
        values=["total_c", "key10"],
        variableColumnName="metric",
        valueColumnName="value_c",
    )


@register(
    "array_agg_sorted",
    family="array_agg / collect_list with deterministic ordering",
    oracle="""
SELECT user_id,
       array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types,
       count(*) AS n
FROM events GROUP BY user_id
""",
)
def array_agg_sorted(spark: SparkSession, sf: str) -> DataFrame:
    """collect_set -> sort_array for determinism, then array_join to a
    string: the correctness harness canonicalizes via pandas hashing, which
    cannot hash array-typed cells — a serialized form is the portable
    contract (and what the reference's STRING_AGG-style audits emit anyway).
    """
    (e,) = load_tables(spark, sf, "events")
    return e.groupBy("user_id").agg(
        F.array_join(F.sort_array(F.collect_set("event_type")), ",").alias("types"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "exact_percentiles",
    family="exact percentile / median (ref ∅; audits use ROUND only)",
    oracle="""
SELECT event_type,
       cast(round(quantile_cont(value, 0.5) * 100) AS BIGINT) AS median_c,
       cast(round(quantile_cont(value, 0.9) * 100) AS BIGINT) AS p90_c
FROM events GROUP BY event_type
""",
)
def exact_percentiles(spark: SparkSession, sf: str) -> DataFrame:
    """Exact (non-approx) percentiles: Spark `percentile` == DuckDB
    quantile_cont (both linear-interpolating)."""
    (e,) = load_tables(spark, sf, "events")
    return e.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)) * 100)
        .cast("long")
        .alias("median_c"),
        F.round(F.percentile("value", F.lit(0.9)) * 100)
        .cast("long")
        .alias("p90_c"),
    )


@register(
    "vocab_union_custom",
    family="S-vocab: base vocabulary UNION custom concepts with precedence dedup (ref etl/staging/voc_copy_to_target_dataset.sql:29-39)",
    oracle="""
WITH base AS (
  SELECT n_nationkey AS concept_id, n_name AS concept_name,
         'base' AS vocab_source
  FROM nation
),
custom AS (  -- custom rows override two base concepts and add one new
  SELECT * FROM (VALUES (0, 'CUSTOM_ZERO', 'custom'),
                        (5, 'CUSTOM_FIVE', 'custom'),
                        (99, 'CUSTOM_NEW', 'custom'))
         AS t(concept_id, concept_name, vocab_source)
),
unioned AS (SELECT * FROM base UNION ALL SELECT * FROM custom)
SELECT concept_id, concept_name, vocab_source FROM (
  SELECT *, row_number() OVER (PARTITION BY concept_id
             ORDER BY CASE vocab_source WHEN 'custom' THEN 0 ELSE 1 END) AS rn
  FROM unioned
) WHERE rn = 1
""",
)
def vocab_union_custom(spark: SparkSession, sf: str) -> DataFrame:
    """Vocabulary refresh: custom concepts take precedence over base rows
    with the same id — union + priority window dedup (W1 again)."""
    from pyspark.sql import Window as W

    (n,) = load_tables(spark, sf, "nation")
    base = n.select(
        F.col("n_nationkey").alias("concept_id"),
        F.col("n_name").alias("concept_name"),
        F.lit("base").alias("vocab_source"),
    )
    custom = spark.createDataFrame(
        [(0, "CUSTOM_ZERO", "custom"), (5, "CUSTOM_FIVE", "custom"),
         (99, "CUSTOM_NEW", "custom")],
        "concept_id int, concept_name string, vocab_source string",
    )
    u = base.unionByName(custom)
    w = W.partitionBy("concept_id").orderBy(
        F.when(F.col("vocab_source") == "custom", 0).otherwise(1)
    )
    return (
        u.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("concept_id", "concept_name", "vocab_source")
    )
