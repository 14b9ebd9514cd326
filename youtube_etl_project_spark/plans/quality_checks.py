"""Wave 9: declarative data-quality constraint suite (the Deequ/dbt-test
shape) — each check is a tiny aggregate; the union reports violation counts
per named constraint. At scale each check is one pass over the relevant
table (Catalyst merges same-table checks into shared scans), and the output
is a handful of rows regardless of input size."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from youtube_etl_project_spark.registry import register
from youtube_etl_project_spark.sources import load_table


@register(
    "dq_checks",
    oracle="""
        SELECT 'orders_custkey_not_null' AS check_name,
               COUNT(*) FILTER (WHERE o_custkey IS NULL) AS violations
        FROM orders
        UNION ALL
        SELECT 'events_event_id_unique',
               CAST(COUNT(*) - COUNT(DISTINCT event_id) AS BIGINT)
        FROM events
        UNION ALL
        SELECT 'orders_custkey_in_customer', COUNT(*)
        FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        WHERE c_custkey IS NULL
        UNION ALL
        SELECT 'events_value_in_range',
               COUNT(*) FILTER (WHERE value < 0 OR value > 10000)
        FROM events
        UNION ALL
        SELECT 'documents_lang_in_domain',
               COUNT(*) FILTER (WHERE lang NOT IN
                   ('en', 'de', 'fr', 'es', 'zh'))
        FROM documents
    """,
    doc="Constraint suite over the warehouse: not-null, uniqueness, "
        "referential integrity (anti-join), range, and domain checks, "
        "reported as violation counts per named check — the engine-side "
        "equivalent of the reference's defensive extraction guarantees "
        "(SURVEY §2a error-handling semantics)",
)
def dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    events = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    docs = load_table(spark, sf_dir, "documents")

    def check(name: str, df: DataFrame) -> DataFrame:
        return df.select(
            F.lit(name).alias("check_name"),
            F.col("violations").cast("long").alias("violations"),
        )

    not_null = check(
        "orders_custkey_not_null",
        orders.agg(
            F.count_if(F.col("o_custkey").isNull()).alias("violations")
        ),
    )
    unique = check(
        "events_event_id_unique",
        events.agg(
            (F.count(F.lit(1)) - F.countDistinct("event_id")).alias(
                "violations"
            )
        ),
    )
    ref_integrity = check(
        "orders_custkey_in_customer",
        orders.join(
            F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"),
            "left_anti",
        ).agg(F.count(F.lit(1)).alias("violations")),
    )
    in_range = check(
        "events_value_in_range",
        events.agg(
            F.count_if(
                (F.col("value") < 0) | (F.col("value") > 10000)
            ).alias("violations")
        ),
    )
    domain = check(
        "documents_lang_in_domain",
        docs.agg(
            F.count_if(
                ~F.col("lang").isin("en", "de", "fr", "es", "zh")
            ).alias("violations")
        ),
    )
    return (
        not_null.unionByName(unique)
        .unionByName(ref_integrity)
        .unionByName(in_range)
        .unionByName(domain)
    )


_K_ANON = 10  # groups smaller than this re-identify their members


@register(
    "k_anonymity_report",
    oracle=f"""
        WITH q AS (
            SELECT c_nationkey AS nat, c_mktsegment AS seg,
                   CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS balk
            FROM customer
        ), l0 AS (
            SELECT COUNT(*) AS n FROM q GROUP BY nat, seg, balk
        ), l1 AS (
            SELECT COUNT(*) AS n FROM q GROUP BY nat, seg
        ), l2 AS (
            SELECT COUNT(*) AS n FROM q GROUP BY seg
        )
        SELECT 'nat+seg+balk' AS qi_level,
               CAST(COUNT(*) AS BIGINT) AS n_groups,
               CAST(MIN(n) AS BIGINT) AS min_group,
               CAST(COUNT(*) FILTER (WHERE n < {_K_ANON}) AS BIGINT)
                   AS n_risky_groups,
               CAST(COALESCE(SUM(n) FILTER (WHERE n < {_K_ANON}), 0)
                    AS BIGINT) AS n_rows_at_risk
        FROM l0
        UNION ALL
        SELECT 'nat+seg', CAST(COUNT(*) AS BIGINT), CAST(MIN(n) AS BIGINT),
               CAST(COUNT(*) FILTER (WHERE n < {_K_ANON}) AS BIGINT),
               CAST(COALESCE(SUM(n) FILTER (WHERE n < {_K_ANON}), 0)
                    AS BIGINT)
        FROM l1
        UNION ALL
        SELECT 'seg', CAST(COUNT(*) AS BIGINT), CAST(MIN(n) AS BIGINT),
               CAST(COUNT(*) FILTER (WHERE n < {_K_ANON}) AS BIGINT),
               CAST(COALESCE(SUM(n) FILTER (WHERE n < {_K_ANON}), 0)
                    AS BIGINT)
        FROM l2
    """,
    doc=f"k-anonymity audit (k={_K_ANON}) over the customer "
        "quasi-identifiers (nation, segment, account-balance kilobucket) "
        "at three generalization levels — the lattice walk a governance "
        "review does before releasing a dataset: how many QI groups "
        "exist, the smallest group, and how many rows sit in "
        "re-identifiable (< k) groups at each level. Coarsening the QI "
        "set shrinks risk; the level whose risk is acceptable is the "
        "release cut. Complements the PII scrub (corpus_pipeline): scrub "
        "removes direct identifiers, this measures the indirect ones. "
        "All exact bigint; the balance bucket floors an exact-operand "
        "double division (never integer div — negative balances exist "
        "and the engines' div semantics differ below zero). Plan: one "
        "scan feeds three rollups of at most |groups| rows each",
)
def k_anonymity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    q = cust.select(
        F.col("c_nationkey").alias("nat"),
        F.col("c_mktsegment").alias("seg"),
        F.floor(F.col("c_acctbal") / F.lit(1000.0)).cast("long").alias(
            "balk"
        ),
    )

    def level(name: str, keys: list[str]) -> DataFrame:
        g = q.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
        risky = F.col("n") < _K_ANON
        return g.agg(
            F.lit(name).alias("qi_level"),
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.min("n").cast("long").alias("min_group"),
            F.sum(F.when(risky, 1).otherwise(0)).cast("long").alias(
                "n_risky_groups"
            ),
            F.coalesce(
                F.sum(F.when(risky, F.col("n"))), F.lit(0)
            ).cast("long").alias("n_rows_at_risk"),
        )

    return (
        level("nat+seg+balk", ["nat", "seg", "balk"])
        .unionByName(level("nat+seg", ["nat", "seg"]))
        .unionByName(level("seg", ["seg"]))
    )
