"""Coverage wave 7: the remaining TPC-H query shapes expressible on the
simplified schema (no partsupp / commitdate / shipmode / phone columns in
the fixtures — Q4, Q8, Q9 and Q22 are adapted to equivalent plan shapes on
the available columns; each docstring states the adaptation).

Reference parity: the reference's warehouse queries are Snowflake SQL
join-aggregates (see reference sql/*.sql and function_app.py query
strings); these cover the same relational algebra — multi-way joins,
EXISTS/NOT EXISTS, correlated-aggregate filters, disjunctive predicate
pushdown, two-level aggregation — expressed as Catalyst plans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from youtube_etl_project_spark.registry import cnt, dec, register
from youtube_etl_project_spark.sources import load_table


def _revenue() -> Column:
    """Exact-decimal revenue term; DuckDB twin:
    ``CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS
    DECIMAL(8,4)))``."""
    return dec("l_extendedprice") * (F.lit(1) - dec("l_discount", "decimal(8,4)"))


@register(
    "tpch_q4_priority_returns",
    oracle="""
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
        FROM orders
        WHERE EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'
        )
        GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 shape (adapted: the fixture has no l_commitdate, so the "
        "EXISTS predicate is 'order has a returned line' instead of "
        "'late line') — EXISTS decorrelates to a left-semi join whose "
        "probe side is pre-filtered before the shuffle",
)
def tpch_q4_priority_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    return (
        orders.join(
            li, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(cnt("order_count"))
    )


@register(
    "tpch_q7_volume_shipping",
    oracle="""
        SELECT supp_nation, cust_nation, l_year,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                        * (1 - CAST(l_discount AS DECIMAL(8,4)))) AS DOUBLE)
                   AS revenue
        FROM (
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   CAST(YEAR(l_shipdate) AS INTEGER) AS l_year,
                   l_extendedprice, l_discount
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
               OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
        )
        GROUP BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7 shape: bilateral trade volume between two nations by "
        "ship year — the same dim table joined twice under different "
        "roles; both nation dims broadcast, the pair disjunction applied "
        "after both joins (Catalyst pushes each name filter into its own "
        "broadcast side is impossible here because the disjunction spans "
        "them — the residual filter stays, dims still broadcast)",
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    n1 = nat.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nat.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
    )


@register(
    "tpch_q8_market_share",
    oracle="""
        SELECT o_year,
               ROUND(
                 CAST(SUM(CASE WHEN supp_nation = 'NATION_1' THEN rev
                          ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                 / CAST(SUM(rev) AS DOUBLE), 6) AS mkt_share
        FROM (
            SELECT CAST(YEAR(o_orderdate) AS INTEGER) AS o_year,
                   CAST(l_extendedprice AS DECIMAL(18,4))
                     * (1 - CAST(l_discount AS DECIMAL(8,4))) AS rev,
                   n1.n_name AS supp_nation
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN part     ON l_partkey = p_partkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            JOIN region   ON n2.n_regionkey = r_regionkey
            WHERE r_name = 'EUROPE' AND p_type = 'PROMO'
        )
        GROUP BY o_year
    """,
    doc="TPC-H Q8 shape (adapted: no p_name, market segment is p_type = "
        "'PROMO'): one nation's share of a region's market by order year "
        "— 8-way snowflake with nation joined twice (supplier side for "
        "the share numerator, customer side filtered by region); CASE "
        "inside the aggregate keeps it one pass",
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    n1 = nat.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nat.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    rev = _revenue()
    national = F.when(F.col("supp_nation") == "NATION_1", rev).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(reg), F.col("c_rk") == F.col("r_regionkey"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.round(
                F.sum(national).cast("double") / F.sum(rev).cast("double"), 6
            ).alias("mkt_share")
        )
    )


@register(
    "tpch_q9_product_profit",
    oracle="""
        SELECT n_name AS nation, o_year,
               ROUND(CAST(SUM(amount) AS DOUBLE), 4) AS sum_profit
        FROM (
            SELECT n_name, CAST(YEAR(o_orderdate) AS INTEGER) AS o_year,
                   CAST(l_extendedprice AS DECIMAL(18,4))
                     * (1 - CAST(l_discount AS DECIMAL(8,4)))
                   - CAST(0.5 AS DECIMAL(2,1))
                     * CAST(p_retailprice AS DECIMAL(18,4))
                     * CAST(l_quantity AS DECIMAL(18,4)) AS amount
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN part     ON l_partkey = p_partkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation   ON s_nationkey = n_nationkey
            WHERE p_type = 'ECONOMY'
        )
        GROUP BY n_name, o_year
    """,
    doc="TPC-H Q9 shape (adapted: no partsupp, so supply cost is "
        "0.5 * p_retailprice * l_quantity): profit by supplier nation and "
        "order year — the all-decimal profit expression keeps partial "
        "aggregation associative, so Spark's combiner order can't diverge "
        "from the oracle's sequential sum",
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    amount = _revenue() - (
        F.lit(0.5).cast("decimal(2,1)")
        * dec("p_retailprice")
        * dec("l_quantity")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.round(F.sum(amount).cast("double"), 4).alias("sum_profit"))
    )


@register(
    "tpch_q13_order_count_dist",
    oracle="""
        SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
        FROM (
            SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
            FROM customer LEFT JOIN orders ON c_custkey = o_custkey
            GROUP BY c_custkey
        )
        GROUP BY c_count
    """,
    doc="TPC-H Q13 shape: customer order-count distribution — two-level "
        "aggregation. The plan pre-aggregates orders per custkey BEFORE "
        "the left join (shuffle moves one row per customer, not one per "
        "order), then histograms the counts; equivalent to the textbook "
        "LEFT JOIN + COUNT because customers without orders coalesce to 0",
)
def tpch_q13_order_count_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(cnt("n_orders"))
    counts = (
        cust.join(per_cust, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select(F.coalesce("n_orders", F.lit(0)).cast("long").alias("c_count"))
    )
    return counts.groupBy("c_count").agg(cnt("custdist"))


@register(
    "tpch_q15_top_supplier",
    oracle="""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                       * (1 - CAST(l_discount AS DECIMAL(8,4)))) AS total_rev
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name,
               CAST(total_rev AS DOUBLE) AS total_revenue
        FROM supplier
        JOIN revenue ON s_suppkey = supplier_no
        WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
    """,
    doc="TPC-H Q15 shape: top supplier by quarterly revenue. The max is "
        "taken and compared in the exact decimal domain (double ULP "
        "divergence can't break the equality), as a broadcast scalar "
        "joined back — no unpartitioned window over the full table",
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    sup = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_revenue()).alias("total_rev")
    )
    mx = rev.agg(F.max("total_rev").alias("mx"))
    return (
        rev.join(F.broadcast(mx), F.col("total_rev") == F.col("mx"))
        .join(F.broadcast(sup), F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_rev").cast("double").alias("total_revenue"),
        )
    )


@register(
    "tpch_q17_small_qty_revenue",
    oracle="""
        WITH per_part AS (
            SELECT l_partkey,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   SUM(CAST(l_quantity AS DECIMAL(18,4))) AS sum_qty
            FROM lineitem
            WHERE l_partkey IN (SELECT p_partkey FROM part
                                WHERE p_brand = 'Brand#3')
            GROUP BY l_partkey
        )
        SELECT ROUND(
                 CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
                 / 7.0, 4) AS avg_yearly
        FROM lineitem
        JOIN per_part USING (l_partkey)
        WHERE CAST(5 * n AS DECIMAL(18,0)) * CAST(l_quantity AS DECIMAL(18,4))
              < sum_qty
    """,
    doc="TPC-H Q17 shape: lines whose quantity is below 20% of their "
        "part's average. The correlated AVG subquery is decorrelated into "
        "a per-part aggregate joined back on the same key (co-partitioned "
        "shuffle, no row explosion), and the 0.2*avg comparison is "
        "rewritten division-free as 5*n*qty < sum_qty so it stays in the "
        "exact decimal domain on both engines",
)
def tpch_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    brand = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#3"
    )
    li_b = li.join(
        F.broadcast(brand), F.col("l_partkey") == F.col("p_partkey"), "left_semi"
    )
    per_part = li_b.groupBy(F.col("l_partkey").alias("pk")).agg(
        cnt("n"), F.sum(dec("l_quantity")).alias("sum_qty")
    )
    return (
        li_b.join(per_part, F.col("l_partkey") == F.col("pk"))
        .filter(
            (F.lit(5) * F.col("n")).cast("decimal(18,0)") * dec("l_quantity")
            < F.col("sum_qty")
        )
        .agg(
            F.round(
                F.sum(dec("l_extendedprice")).cast("double") / 7.0, 4
            ).alias("avg_yearly")
        )
    )


@register(
    "tpch_q19_disjunctive_revenue",
    oracle="""
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                        * (1 - CAST(l_discount AS DECIMAL(8,4)))) AS DOUBLE)
                   AS revenue
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 5
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H Q19 shape: three-way disjunctive predicate spanning both "
        "join sides — the classic OR-pushdown test. Catalyst derives the "
        "implied single-side filters (brand IN set, size <= 15, quantity "
        "ranges) and pushes them below the broadcast join; the full "
        "disjunction remains as the join residual",
)
def tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    disj = (
        (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#4")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .filter(disj)
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
    )


@register(
    "tpch_q22_dormant_customers",
    oracle="""
        WITH avg_bal AS (
            SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
                   / COUNT(*) AS ab
            FROM customer WHERE c_acctbal > 0.0
        )
        SELECT c_nationkey AS cntrycode,
               CAST(COUNT(*) AS BIGINT) AS numcust,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
                   AS totacctbal
        FROM customer, avg_bal
        WHERE c_nationkey IN (1, 2, 3, 4, 5, 6, 7)
          AND c_acctbal > ab
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '2000-01-01')
        GROUP BY c_nationkey
    """,
    doc="TPC-H Q22 shape (adapted: no c_phone — country code is "
        "c_nationkey; 'no orders' is 'no orders since 2000' so the "
        "fixture, where every customer has ordered at least once, still "
        "exercises the anti-join): high-balance dormant customers. The scalar "
        "AVG subquery becomes a broadcast cross join (exact decimal sum / "
        "count, bit-identical on both engines); NOT EXISTS is a left-anti "
        "join against the orders key projection",
)
def tpch_q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    ab = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(dec("c_acctbal")).cast("double") / F.count(F.lit(1))
        ).alias("ab")
    )
    return (
        cust.filter(F.col("c_nationkey").isin(1, 2, 3, 4, 5, 6, 7))
        .join(F.broadcast(ab))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            cnt("numcust"),
            F.sum(dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )


@register(
    "tpch_q21_waiting_suppliers",
    oracle="""
        SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        FROM supplier
        JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        JOIN orders ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
        WHERE l1.l_returnflag = 'R'
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_returnflag = 'R')
        GROUP BY s_name
    """,
    doc="TPC-H Q21 shape (adapted: no l_receiptdate/l_commitdate — 'kept "
        "waiting' is 'sole returning supplier on a finished multi-supplier "
        "order'): the EXISTS + NOT EXISTS pair decorrelates to a left-semi "
        "and a left-anti join against id-only lineitem projections, all "
        "three legs co-partitioned on l_orderkey so the two correlated "
        "subqueries add no extra shuffle pattern beyond the key",
)
def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    l1 = li.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_suppkey"
    )
    l2 = li.select(
        F.col("l_orderkey").alias("l2_ok"), F.col("l_suppkey").alias("l2_sk")
    )
    l3 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("l3_ok"), F.col("l_suppkey").alias("l3_sk")
    )
    return (
        l1.join(
            l2,
            (F.col("l_orderkey") == F.col("l2_ok"))
            & (F.col("l_suppkey") != F.col("l2_sk")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("l3_ok"))
            & (F.col("l_suppkey") != F.col("l3_sk")),
            "left_anti",
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(cnt("numwait"))
    )
