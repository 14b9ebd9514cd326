"""Relational core: scans, projections, filters, joins, aggregations,
window dedup, sorts, top-k (SURVEY §2a: P1-P7, J1-J4, A1-A7, W1, O1-O3).

Every query here is a declarative DataFrame plan — Catalyst handles filter
pushdown / column pruning; small dimensions are broadcast explicitly so the
big-table side never shuffles for a join it doesn't need (at 100 TB the
lineitem scan dominates and must stream map-side through broadcast joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from youtube_etl_project_spark.functions import safe_str
from youtube_etl_project_spark.registry import (
    cnt,
    dec,
    dec_avg,
    dec_sum,
    lsum,
    register,
)
from youtube_etl_project_spark.sources import load_table


# --------------------------------------------------------------------------
# Flagship: the reference's daily aggregate (A1 over J1), re-expressed on the
# star schema: fact(lineitem) ⋈ orders ⋈ dim(customer) ⋈ dim(nation),
# grouped by nation × derived sentiment-like category.
# Reference: src/snowflake_loader.py:140-155 (GROUP BY channel_country,
# final_sentiment with COUNT/SUM/SUM/SUM/AVG).
# --------------------------------------------------------------------------

def flagship_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")

    sentiment = (
        F.when(F.col("l_returnflag") == "R", F.lit("NEGATIVE"))
        .when(F.col("l_returnflag") == "A", F.lit("POSITIVE"))
        .otherwise(F.lit("NEUTRAL"))
        .alias("final_sentiment")
    )
    # lineitem⋈orders shuffles on orderkey (both huge at scale — sort-merge);
    # customer and nation broadcast, so no extra shuffle stages.
    fact = (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return (
        fact.select(F.col("n_name").alias("channel_country"), sentiment,
                    "l_extendedprice", "l_quantity", "l_discount")
        .groupBy("channel_country", "final_sentiment")
        .agg(
            cnt("video_count"),
            dec_sum("l_extendedprice", "total_views"),
            dec_sum("l_quantity", "total_likes"),
            dec_avg("l_discount", "avg_engagement_rate"),
        )
    )


register(
    "flagship_daily_agg",
    oracle="""
        SELECT n_name AS channel_country,
               CASE WHEN l_returnflag = 'R' THEN 'NEGATIVE'
                    WHEN l_returnflag = 'A' THEN 'POSITIVE'
                    ELSE 'NEUTRAL' END AS final_sentiment,
               COUNT(*) AS video_count,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS total_views,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_likes,
               CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_discount)
                   AS avg_engagement_rate
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        GROUP BY 1, 2
    """,
    doc="A1/J1: fact⋈dims multi-aggregate (reference SL:140-155)",
)(flagship_df)


@register(
    "q1_pricing_summary",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
               ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                        * (1 - CAST(l_discount AS DECIMAL(8,4)))) AS DOUBLE), 4)
                   AS sum_disc_price,
               ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                        * (1 - CAST(l_discount AS DECIMAL(8,4)))
                        * (1 + CAST(l_tax AS DECIMAL(8,4)))) AS DOUBLE), 4)
                   AS sum_charge,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_quantity)
                   AS avg_qty,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 shape: wide multi-aggregate scan with pushed date filter",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    # Arithmetic in decimal (not double-then-cast): exact and associative,
    # so partial aggregation order can't perturb the result cross-engine.
    price = dec("l_extendedprice")
    disc_f = F.lit(1) - dec("l_discount", "decimal(8,4)")
    tax_f = F.lit(1) + dec("l_tax", "decimal(8,4)")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dec_sum("l_quantity", "sum_qty"),
        dec_sum("l_extendedprice", "sum_base_price"),
        # scale-8 decimal sums: round post-cast — DuckDB's int128-scaled
        # decimal->double conversion can be 1 ULP off Java's correctly-
        # rounded BigDecimal.doubleValue (seen at sf0.001)
        F.round(F.sum(price * disc_f).cast("double"), 4).alias("sum_disc_price"),
        F.round(F.sum(price * disc_f * tax_f).cast("double"), 4).alias("sum_charge"),
        dec_avg("l_quantity", "avg_qty"),
        cnt("count_order"),
    )


@register(
    "proj_defensive",
    oracle="""
        SELECT c_custkey,
               UPPER(c_name) AS name_upper,
               COALESCE(c_mktsegment, 'UNKNOWN') AS segment,
               CAST(c_nationkey AS BIGINT) AS nationkey
        FROM customer
    """,
    doc="P1/P2/F5: typed projection with defensive defaults (YC:152-168)",
)
def proj_defensive(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey"),
        F.upper("c_name").alias("name_upper"),
        safe_str("c_mktsegment").alias("segment"),
        F.col("c_nationkey").cast("long").alias("nationkey"),
    )


@register(
    "filter_kind",
    oracle="""
        SELECT event_id, user_id, value
        FROM events WHERE event_type = 'purchase'
    """,
    doc="P3: equality filter (kind=='youtube#video', YC:29-30)",
)
def filter_kind(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "value")
    )


@register(
    "filter_like",
    oracle="""
        SELECT p_partkey, p_name, p_type
        FROM part WHERE p_name LIKE '%small%' AND p_type LIKE '%ECO%'
    """,
    doc="P4: LIKE predicates (filename routing, SL:59,80)",
)
def filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%small%") & F.col("p_type").like("%ECO%"))
        .select("p_partkey", "p_name", "p_type")
    )


@register(
    "filter_notnull",
    oracle="""
        SELECT event_id, event_type
        FROM events
        WHERE props IS NOT NULL
          AND json_extract_string(props, '$.k') IS NOT NULL
    """,
    doc="P5: NOT NULL predicates on semi-structured fields (SL:81,131)",
)
def filter_notnull(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(
        F.col("props").isNotNull()
        & F.get_json_object("props", "$.k").isNotNull()
    ).select("event_id", "event_type")


@register(
    "filter_date_incremental",
    oracle="""
        SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS ship_month,
               COUNT(*) AS n_rows,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        GROUP BY 1
    """,
    doc="P6/S7: incremental date predicate + monthly rollup (FA:71; SL:153)",
)
def filter_date_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp")
    )
    return (
        li.withColumn("ship_month", F.trunc(F.to_date("l_shipdate"), "month"))
        .groupBy("ship_month")
        .agg(cnt("n_rows"), dec_sum("l_quantity", "sum_qty"))
    )


@register(
    "json_extract_typed",
    oracle="""
        SELECT event_type,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
                   AS sum_k,
               COUNT(json_extract_string(props, '$.k')) AS n_with_k
        FROM events
        GROUP BY event_type
    """,
    doc="P7: VARIANT path extraction + cast (raw_json:field::TYPE, SL:111-129)",
)
def json_extract_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.select("event_type", k.alias("k")).groupBy("event_type").agg(
        lsum("k", "sum_k"),
        F.count("k").cast("long").alias("n_with_k"),
    )


# --------------------------------------------------------------------------
# Joins
# --------------------------------------------------------------------------

@register(
    "join_fact_dim",
    oracle="""
        SELECT n_name,
               COUNT(*) AS order_count,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        GROUP BY n_name
    """,
    doc="J1: fact⋈dim broadcast equi-join + group (SL:151-152)",
)
def join_fact_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        orders.join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(cnt("order_count"), dec_sum("o_totalprice", "total_price"))
    )


@register(
    "join_semi",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
    """,
    doc="J4: semi-join id-list lookup (detail fetch by collected ids, YC:43)",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    rich = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 5000)
    return orders.join(
        F.broadcast(rich), F.col("o_custkey") == F.col("c_custkey"), "left_semi"
    ).select("o_orderkey", "o_custkey", "o_totalprice")


@register(
    "join_anti",
    oracle="""
        SELECT c_custkey, c_name
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
    """,
    doc="J3 core: left-anti join (insert-only MERGE's NOT MATCHED, "
        "FA:439-482); status filter keeps the result non-empty at every sf",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    pending = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "P"
    )
    return customer.join(
        pending, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name")


# --------------------------------------------------------------------------
# Aggregations
# --------------------------------------------------------------------------

@register(
    "group_pct_of_total",
    oracle="""
        SELECT event_type,
               COUNT(*) AS n_events,
               100.0 * COUNT(*) / (SELECT COUNT(*) FROM events) AS pct
        FROM events GROUP BY event_type
    """,
    doc="A2: group-count + percentage of total (sentiment distribution, YC:247-256)",
)
def group_pct_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    grouped = ev.groupBy("event_type").agg(cnt("n_events"))
    # Broadcast the one-row grand total instead of a window-over-(): same
    # values (one associative count), but no single-partition WindowExec.
    total = grouped.agg(F.sum("n_events").alias("__total"))
    return (
        grouped.crossJoin(F.broadcast(total))
        .withColumn(
            "pct", F.lit(100.0) * F.col("n_events") / F.col("__total")
        )
        .drop("__total")
    )


@register(
    "group_count_region",
    oracle="""
        SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM orders GROUP BY o_orderpriority
    """,
    doc="A3: group-count (region distribution, YC:259-266)",
)
def group_count_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(cnt("n_orders"))
    )


@register(
    "distinct_projection",
    oracle="SELECT DISTINCT event_type, user_id FROM events",
    doc="A4/A5: DISTINCT projection (channel dedup YC:171; SELECT DISTINCT FA:442)",
)
def distinct_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").select("event_type", "user_id").distinct()


@register(
    "scalar_subquery_counts",
    oracle="""
        SELECT (SELECT COUNT(*) FROM customer) AS n_customers,
               (SELECT COUNT(*) FROM orders)   AS n_orders,
               (SELECT COUNT(*) FROM lineitem) AS n_lineitems
    """,
    doc="A6: scalar-subquery counts in one row (SL:166-171)",
)
def scalar_subquery_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").agg(cnt("n_customers"))
    o = load_table(spark, sf_dir, "orders").agg(cnt("n_orders"))
    l = load_table(spark, sf_dir, "lineitem").agg(cnt("n_lineitems"))
    return c.crossJoin(o).crossJoin(l)


@register(
    "agg_refresh_daily",
    oracle="""
        SELECT CAST(o_orderdate AS DATE) AS analysis_date,
               o_orderstatus,
               COUNT(*) AS order_count,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
        FROM orders
        GROUP BY 1, 2
    """,
    doc="A7: the daily-materialized-aggregate SELECT (DELETE+INSERT refresh, "
        "SL:135-156); engine side uses partition-overwrite (operators/upsert.py)",
)
def agg_refresh_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.withColumn("analysis_date", F.to_date("o_orderdate"))
        .groupBy("analysis_date", "o_orderstatus")
        .agg(cnt("order_count"), dec_sum("o_totalprice", "total_price"))
    )


# --------------------------------------------------------------------------
# Window / sort / top-k
# --------------------------------------------------------------------------

@register(
    "window_latest_per_key",
    oracle="""
        SELECT user_id, event_id, event_type, value
        FROM (
            SELECT user_id, event_id, event_type, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        ) WHERE rn = 1
    """,
    doc="W1: latest-per-key dedup (QUALIFY ROW_NUMBER()=1, SL:82); "
        "event_id tiebreak keeps it deterministic",
)
def window_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", "value")
    )


@register(
    "topk_per_group",
    oracle="""
        SELECT o_custkey, o_orderkey, CAST(rnk AS BIGINT) AS rnk
        FROM (
            SELECT o_custkey, o_orderkey,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
            FROM orders
        ) WHERE rnk <= 3
    """,
    doc="O3: top-k per group via window row_number (source-side top-k, YC:21-23)",
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", F.col("rnk").cast("long").alias("rnk"))
    )


@register(
    "sort_mixed",
    oracle="""
        SELECT c_mktsegment, COUNT(*) AS n_customers
        FROM customer GROUP BY c_mktsegment
        ORDER BY c_mktsegment ASC, n_customers DESC
    """,
    doc="O1/O2: two-key mixed-direction sort of an aggregate (SL:178-185)",
)
def sort_mixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(cnt("n_customers"))
        .orderBy(F.col("c_mktsegment").asc(), F.col("n_customers").desc())
    )


@register(
    "param_fanout",
    oracle="""
        SELECT r_name, c_mktsegment, COUNT(*) AS n_pairs
        FROM region CROSS JOIN customer
        GROUP BY 1, 2
    """,
    doc="S4: param fan-out cross product driving a per-combination workload "
        "(REGIONS × KEYWORDS loop nest, YC:132-138)",
)
def param_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region")
    customer = load_table(spark, sf_dir, "customer")
    segments = customer.select("c_mktsegment").distinct()
    combos = region.select("r_name").crossJoin(segments)
    return (
        combos.join(customer, "c_mktsegment")
        .groupBy("r_name", "c_mktsegment")
        .agg(cnt("n_pairs"))
    )
