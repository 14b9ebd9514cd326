"""TPC-H completion wave: Q2 and Q11, the two shapes that need PARTSUPP —
a table the fixture lacks. Both engines DERIVE the same partsupp
deterministically from part × supplier with pure integer arithmetic
(4 suppliers per part, availqty/cost from modular hashes), so the oracle
comparison stays exact: no floats until the final display division, and
min-cost / value comparisons run in integer cents.

With these, all 22 TPC-H query shapes are registered (Q1,3-22 on fixture
tables; Q2/Q11 on derived partsupp; Q16/Q20 adapted partsupp-free in
tpch3.py plus full derived-ps forms here)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from youtube_etl_project_spark.registry import register
from youtube_etl_project_spark.sources import load_table

# Shared oracle CTE: the derived partsupp (4 suppliers per part; keys are
# 0-based dense in every fixture SF, so % n lands on real suppliers).
_PS_CTE = """
    ns AS (SELECT COUNT(*) AS n FROM supplier),
    ps AS (
        SELECT p_partkey AS ps_partkey,
               (p_partkey * 7 + i.i * 13) % ns.n AS ps_suppkey,
               (p_partkey * 31
                + ((p_partkey * 7 + i.i * 13) % ns.n) * 17) % 9999 + 1
                   AS ps_availqty,
               (p_partkey * 37
                + ((p_partkey * 7 + i.i * 13) % ns.n) * 11) % 90000 + 100
                   AS ps_cost_cents
        FROM part CROSS JOIN ns
        CROSS JOIN (SELECT unnest(range(0, 4)) AS i) AS i(i)
    )
"""


def derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(ps_partkey, ps_suppkey, ps_availqty, ps_cost_cents) — integer-exact
    and identical to the oracle's CTE. One broadcast scalar (supplier
    count) + a 4-way per-part explode; never wider than 4×|part|."""
    part = load_table(spark, sf_dir, "part")
    n = load_table(spark, sf_dir, "supplier").count()
    i = F.explode(F.sequence(F.lit(0), F.lit(3))).alias("i")
    base = part.select(F.col("p_partkey").alias("ps_partkey"), i)
    sk = (F.col("ps_partkey") * 7 + F.col("i") * 13) % n
    return base.select(
        "ps_partkey",
        sk.alias("ps_suppkey"),
        ((F.col("ps_partkey") * 31 + sk * 17) % 9999 + 1).alias("ps_availqty"),
        ((F.col("ps_partkey") * 37 + sk * 11) % 90000 + 100).alias(
            "ps_cost_cents"
        ),
    )


@register(
    "tpch_q2_min_cost_supplier",
    oracle=f"""
        WITH {_PS_CTE.strip()},
        eu AS (
            SELECT ps.ps_partkey, ps.ps_cost_cents,
                   s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
            FROM ps
            JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
            JOIN nation n ON n.n_nationkey = s.s_nationkey
            JOIN region r ON r.r_regionkey = n.n_regionkey
            WHERE r.r_name = 'EUROPE'
        ), mc AS (
            SELECT ps_partkey, MIN(ps_cost_cents) AS m FROM eu GROUP BY 1
        )
        SELECT e.s_acctbal, e.s_name, e.n_name,
               p.p_partkey, p.p_type,
               ROUND(e.ps_cost_cents / 100.0, 2) AS supplycost
        FROM eu e
        JOIN mc ON mc.ps_partkey = e.ps_partkey
               AND mc.m = e.ps_cost_cents
        JOIN part p ON p.p_partkey = e.ps_partkey
        WHERE p.p_size = 11
        ORDER BY e.s_acctbal DESC, e.n_name, e.s_name, p.p_partkey
        LIMIT 100
    """,
    doc="TPC-H Q2 (min-cost supplier): for every size-11 part, the "
        "EUROPE supplier(s) achieving the regional minimum cost — the "
        "correlated-min decorrelated into an aggregate + equality join "
        "back (same rewrite Catalyst applies to the scalar subquery "
        "form). Cost comparisons in integer cents (exact); "
        "supplier/nation/region broadcast; fully deterministic "
        "4-column tiebreak order",
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = derived_partsupp(spark, sf_dir)
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    part = load_table(spark, sf_dir, "part")
    eu = (
        ps.join(
            F.broadcast(sup), ps["ps_suppkey"] == sup["s_suppkey"]
        )
        .join(F.broadcast(nat), sup["s_nationkey"] == nat["n_nationkey"])
        .join(F.broadcast(reg), nat["n_regionkey"] == reg["r_regionkey"])
        .filter(F.col("r_name") == "EUROPE")
        .select("ps_partkey", "ps_cost_cents", "s_name", "s_acctbal", "n_name")
    )
    # distinct join-key name: eu["ps_partkey"] == mc["ps_partkey"] resolves
    # both sides to the SAME attribute id (mc derives from eu), leaving
    # Spark to rewrite a trivially-true predicate by dataset-id — fragile
    # across versions (ADVICE r2)
    mc = (
        eu.groupBy("ps_partkey")
        .agg(F.min("ps_cost_cents").alias("m"))
        .withColumnRenamed("ps_partkey", "mc_partkey")
    )
    return (
        eu.join(
            mc,
            (F.col("ps_partkey") == F.col("mc_partkey"))
            & (F.col("ps_cost_cents") == F.col("m")),
        )
        .drop("mc_partkey", "m")
        .join(
            F.broadcast(part.filter(F.col("p_size") == 11)),
            F.col("ps_partkey") == F.col("p_partkey"),
        )
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_type",
            F.round(F.col("ps_cost_cents") / 100.0, 2).alias("supplycost"),
        )
        .orderBy(
            F.desc("s_acctbal"), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


@register(
    "tpch_q11_important_stock",
    oracle=f"""
        WITH {_PS_CTE.strip()},
        asia AS (
            SELECT ps.ps_partkey,
                   ps.ps_cost_cents * ps.ps_availqty AS v
            FROM ps
            JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
            JOIN nation n ON n.n_nationkey = s.s_nationkey
            JOIN region r ON r.r_regionkey = n.n_regionkey
            WHERE r.r_name = 'ASIA'
        ), tot AS (SELECT SUM(v) AS t FROM asia)
        SELECT a.ps_partkey,
               CAST(SUM(a.v) AS BIGINT) AS value_cents
        FROM asia a CROSS JOIN tot
        GROUP BY a.ps_partkey, tot.t
        HAVING CAST(SUM(a.v) AS BIGINT) > tot.t / 800.0
    """,
    doc="TPC-H Q11 (important stock): per-part ASIA inventory value with "
        "a global-fraction HAVING threshold (the group-vs-global scalar "
        "pattern). Values stay in exact integer cents through both "
        "aggregations; the global total is a 1-row broadcast; threshold "
        "comparison uses the identical double on both engines",
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = derived_partsupp(spark, sf_dir)
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    asia = (
        ps.join(F.broadcast(sup), ps["ps_suppkey"] == sup["s_suppkey"])
        .join(F.broadcast(nat), sup["s_nationkey"] == nat["n_nationkey"])
        .join(F.broadcast(reg), nat["n_regionkey"] == reg["r_regionkey"])
        .filter(F.col("r_name") == "ASIA")
        .select(
            "ps_partkey",
            (F.col("ps_cost_cents") * F.col("ps_availqty")).alias("v"),
        )
    )
    tot = asia.agg(F.sum("v").alias("t"))
    return (
        asia.groupBy("ps_partkey")
        .agg(F.sum("v").cast("long").alias("value_cents"))
        .crossJoin(F.broadcast(tot))
        .filter(F.col("value_cents") > F.col("t") / 800.0)
        .select("ps_partkey", "value_cents")
    )
