"""Coverage wave: the last three TPC-H shapes adaptable to the fixture
schema — Q12 (mode × priority conditional counts), Q16 (distinct-supplier
counts with a NOT-IN blacklist), Q20 (dominant-supplier nested-aggregate
threshold). The fixture lacks l_shipmode/partsupp, so each docstring
states the stand-in columns; the *plan shapes* — conditional aggregation
over a fact⋈dim join, distinct-count with an anti-join filter, and a
per-group aggregate compared against a re-aggregated total — are the
TPC-H originals' (reference parity: the reference's warehouse queries are
Snowflake SQL join-aggregates, see reference sql/*.sql).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from youtube_etl_project_spark.registry import cnt, dec, register
from youtube_etl_project_spark.sources import load_table


@register(
    "tpch_q12_mode_priority",
    oracle="""
        SELECT l_returnflag AS ret_mode,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT',
                                                          '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY l_returnflag
    """,
    doc="TPC-H Q12 shape (adapted: l_returnflag stands in for the absent "
        "l_shipmode; shipdate window for the receipt window): per mode, "
        "conditional counts of urgent vs non-urgent order priorities. The "
        "date filter pushes to the lineitem scan; the join shuffles only "
        "the two-year slice; the CASE pair folds into one aggregate pass.",
)
def tpch_q12_mode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("l_returnflag").alias("ret_mode"))
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0))
            .cast("long")
            .alias("high_line_count"),
            F.sum(F.when(~urgent, 1).otherwise(0))
            .cast("long")
            .alias("low_line_count"),
        )
    )


@register(
    "tpch_q16_supplier_cnt",
    oracle="""
        SELECT p_brand, p_type, p_size,
               CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#2'
          AND p_type NOT LIKE 'ECONOMY%'
          AND p_size IN (2, 5, 9, 11, 15, 20, 28, 37)
          AND l_suppkey NOT IN (
              SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
          )
        GROUP BY p_brand, p_type, p_size
    """,
    doc="TPC-H Q16 shape (adapted: lineitem stands in for the absent "
        "partsupp as the part-supplier relation; the negative-acctbal "
        "blacklist stands in for the complaints subquery): distinct-"
        "supplier counts per (brand, type, size) excluding blacklisted "
        "suppliers. The NOT IN decorrelates to a broadcast anti-join "
        "(s_suppkey is non-null, so NOT IN ≡ anti); all part predicates "
        "push to the dim scan before the broadcast.",
)
def tpch_q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#2")
        & ~F.col("p_type").startswith("ECONOMY")
        & F.col("p_size").isin(2, 5, 9, 11, 15, 20, 28, 37)
    )
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(
            F.broadcast(bad),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


@register(
    "tpch_q20_dominant_suppliers",
    oracle="""
        WITH shipped AS (
            SELECT l_suppkey, l_partkey,
                   SUM(CAST(l_quantity AS DECIMAL(18,4))) AS qty
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
              AND l_partkey IN (
                  SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
              )
            GROUP BY l_suppkey, l_partkey
        )
        SELECT s_name,
               CAST(COUNT(*) AS BIGINT) AS n_dominant_parts
        FROM (
            SELECT l_suppkey, qty,
                   SUM(qty) OVER (PARTITION BY l_partkey) AS part_qty
            FROM shipped
        )
        JOIN supplier ON l_suppkey = s_suppkey
        WHERE qty * 10 > part_qty * 3
        GROUP BY s_name
    """,
    doc="TPC-H Q20 shape (adapted: partsupp availability is absent, so "
        "'excess availability' becomes 'dominant supplier' — shipped more "
        "than 30% of a small-part's one-year volume): nested aggregation "
        "where a per-(supplier, part) aggregate is compared against the "
        "per-part total. The total is a SUM window over l_partkey rather "
        "than a re-agg + self-join: one pass over shipped, no second "
        "lineitem scan, and no per-part totals broadcast (per-part is "
        "data-sized, not model-sized — broadcasting it would not survive "
        "100 TB). The dominance test stays in the exact decimal domain as "
        "qty*10 > total*3 — no engine-specific decimal×0.3 rounding.",
)
def tpch_q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    small = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith("small"))
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    shipped = (
        li.join(
            F.broadcast(small),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(dec("l_quantity")).alias("qty"))
    )
    from pyspark.sql.window import Window

    sup = load_table(spark, sf_dir, "supplier")
    return (
        shipped.withColumn(
            "part_qty",
            F.sum("qty").over(Window.partitionBy("l_partkey")),
        )
        .filter(F.col("qty") * 10 > F.col("part_qty") * 3)
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(cnt("n_dominant_parts"))
    )
