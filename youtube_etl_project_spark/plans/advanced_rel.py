"""Advanced relational coverage beyond the reference's literal surface —
the operators a user of a real analytics engine expects: rollup/cube
hierarchies, set operations, range (interval) joins, ordered collection
aggregates, conditional aggregation, regex extraction, and the salted
skew-join (oracle = the plain join: salting must be semantics-preserving).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from youtube_etl_project_spark.operators.skew import salted_join
from youtube_etl_project_spark.registry import cnt, dec_sum, register
from youtube_etl_project_spark.sources import load_table


@register(
    "rollup_hierarchy",
    oracle="""
        SELECT COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
               COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                   AS total_price
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    doc="Hierarchical subtotal rollup (status → priority → grand total); "
        "NULL grouping markers normalized to 'ALL' on both engines",
)
def rollup_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(cnt("n_orders"), dec_sum("o_totalprice", "total_price"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("o_orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("o_orderpriority"),
            "n_orders",
            "total_price",
        )
    )


@register(
    "cube_matrix",
    oracle="""
        SELECT COALESCE(l_returnflag, '*') AS l_returnflag,
               COALESCE(l_linestatus, '*') AS l_linestatus,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="Full cube over two dimensions",
)
def cube_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(cnt("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("*")).alias("l_returnflag"),
            F.coalesce("l_linestatus", F.lit("*")).alias("l_linestatus"),
            "n",
        )
    )


@register(
    "set_ops",
    oracle="""
        SELECT c_custkey, 'both' AS src FROM (
            SELECT c_custkey FROM customer WHERE c_acctbal > 5000
            INTERSECT
            SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        )
        UNION ALL
        SELECT c_custkey, 'rich_only' AS src FROM (
            SELECT c_custkey FROM customer WHERE c_acctbal > 5000
            EXCEPT
            SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        )
    """,
    doc="Set operations: INTERSECT / EXCEPT / UNION ALL composition",
)
def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    rich = cust.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    both = rich.intersect(building).withColumn("src", F.lit("both"))
    rich_only = rich.exceptAll(building).dropDuplicates().withColumn(
        "src", F.lit("rich_only")
    )
    return both.unionByName(rich_only)


@register(
    "range_join_events",
    oracle="""
        SELECT p.event_id AS purchase_id,
               COUNT(f.event_id) AS n_followups
        FROM (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'purchase') p
        LEFT JOIN (SELECT event_id, user_id, ts FROM events
                   WHERE event_type <> 'purchase') f
          ON f.user_id = p.user_id
         AND f.ts > p.ts
         AND f.ts <= p.ts + INTERVAL 10 MINUTE
        GROUP BY p.event_id
    """,
    doc="Range (interval) join: activity within 10min after each purchase, "
        "per user — equi-key on user_id keeps it a partitioned band join, "
        "not a cross product",
)
def range_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    f = ev.filter(F.col("event_type") != "purchase").select(
        F.col("event_id").alias("f_id"),
        F.col("user_id").alias("f_user"),
        F.col("ts").alias("f_ts"),
    )
    joined = p.join(
        f,
        (F.col("f_user") == F.col("p_user"))
        & (F.col("f_ts") > F.col("p_ts"))
        & (F.col("f_ts") <= F.col("p_ts") + F.expr("INTERVAL 10 MINUTES")),
        "left",
    )
    return joined.groupBy("purchase_id").agg(
        F.count("f_id").cast("long").alias("n_followups")
    )


@register(
    "collect_sorted_list",
    oracle="""
        SELECT o_orderpriority,
               CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS n_statuses,
               string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus)
                   AS status_csv
        FROM orders GROUP BY o_orderpriority
    """,
    doc="Ordered collection aggregate, serialized — sorted for determinism. "
        "The collected set leaves the query as a csv STRING (plus its "
        "cardinality), never as an array column: the driver's comparator "
        "canonicalizes by pandas sort_values over every output column and "
        "list cells throw `unhashable type: 'list'` (the r7 "
        "user_recent_history ERR; rule codified in registry.py)",
)
def collect_sorted_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.count_distinct("o_orderstatus").cast("long").alias("n_statuses"),
        F.array_join(F.array_sort(F.collect_set("o_orderstatus")), ",").alias(
            "status_csv"
        ),
    )


@register(
    "conditional_agg",
    oracle="""
        SELECT user_id,
               CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
                   AS n_purchases,
               CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT)
                   AS n_errors,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                             THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE)
                   AS purchase_value
        FROM events GROUP BY user_id
    """,
    doc="Conditional aggregation (FILTER / CASE pivot) — one scan, many "
        "conditions",
)
def conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    is_p = F.col("event_type") == "purchase"
    return ev.groupBy("user_id").agg(
        F.count_if(is_p).cast("long").alias("n_purchases"),
        F.count_if(F.col("event_type") == "error").cast("long").alias("n_errors"),
        F.sum(F.when(is_p, F.col("value").cast("decimal(18,6)")))
        .cast("double")
        .alias("purchase_value"),
    )


@register(
    "regexp_extraction",
    oracle="""
        SELECT p_partkey,
               regexp_extract(p_name, '^(\\w+)', 1) AS first_word,
               CAST(regexp_matches(p_name, 'g') AS BOOLEAN) AS has_g
        FROM part
    """,
    doc="Regex extraction + predicate",
)
def regexp_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        F.col("p_name").rlike("g").alias("has_g"),
    )


@register(
    "salted_skew_join",
    oracle="""
        SELECT s_name, COUNT(*) AS n_items,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY s_name
    """,
    doc="Salted join for hot keys (10 suppliers × 600k lineitems = natural "
        "skew): identical semantics to the plain join — the oracle IS the "
        "unsalted SQL; shuffle keys fan out (key, salt) S ways",
)
def salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey", "l_quantity")
    sup = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_name"
    )
    joined = salted_join(li, sup, "l_suppkey", salt_buckets=8)
    return joined.groupBy("s_name").agg(
        cnt("n_items"), dec_sum("l_quantity", "sum_qty")
    )


@register(
    "bloom_semi_join",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity
        FROM lineitem
        WHERE l_orderkey IN (
            SELECT o_orderkey FROM orders
            WHERE o_orderpriority = '1-URGENT'
        )
    """,
    doc="Runtime bloom-join pruning, explicit: build a 2^17-bit "
        "Kirsch-Mitzenmacher bloom over the urgent order keys (one "
        "distributed bit_or aggregation; only the 16 KiB bitmap reaches "
        "the driver), probe every lineitem row with 5 codegen bit-tests "
        "AT THE SCAN — before any shuffle — and let the closing semi-join "
        "absorb the false positives. No false negatives by construction, "
        "so the oracle is the plain IN-subquery semi-join; what the bloom "
        "changes is where fact rows die, which at 100 TB is the "
        "difference between shuffling the full fact table and shuffling "
        "the ~selectivity fraction of it. tests/test_bloom.py pins the "
        "no-false-negative invariant and the measured prefilter "
        "selectivity",
)
def bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from youtube_etl_project_spark.operators import bloom

    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    return bloom.bloom_semi_join(
        lineitem.select("l_orderkey", "l_linenumber", "l_quantity"),
        urgent,
        "l_orderkey",
        "o_orderkey",
    ).select("l_orderkey", "l_linenumber", "l_quantity")
