"""SQL-surface wave 2: recursive CTEs (Spark 4 `WITH RECURSIVE`).

Spark's recursion currently supports UNION ALL only (UNION-distinct
raises UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE), so both queries here
recurse over structures that terminate without distinct-ing: a DAG (the
id-oriented near-dup graph) and a bounded date spine. Cyclic transitive
closure stays with the iterative/star operators in ``operators/graph.py``
— that is the scalable path anyway (each recursive step is a full
self-join shuffle, fine for bounded-depth analytics, wrong for
diameter-unbounded graphs)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from youtube_etl_project_spark.plans.corpus_pipeline import _PAIRS_CTE
from youtube_etl_project_spark.operators.checkpointing import pin
from youtube_etl_project_spark.registry import register
from youtube_etl_project_spark.sources import load_table
from youtube_etl_project_spark.sql import sql


@register(
    "sql_recursive_dup_paths",
    oracle=f"""
        WITH RECURSIVE {_PAIRS_CTE.strip()},
        paths (s, e, len) AS (
            SELECT id_a, id_b, 1 FROM pairs
            UNION ALL
            SELECT p.s, q.id_b, p.len + 1
            FROM paths p JOIN pairs q ON q.id_a = p.e
        )
        SELECT CAST(MAX(len) AS BIGINT) AS max_chain,
               CAST(COUNT(*) AS BIGINT) AS n_paths
        FROM paths
    """,
    doc="Spark-4 recursive CTE over the id-oriented near-dup DAG: every "
        "strictly-increasing duplicate chain, its maximum length, and the "
        "total path count — 'how chained are my duplicate clusters' "
        "without materializing components. Terminates under UNION ALL "
        "because edges are oriented id_a < id_b (a DAG by construction); "
        "identical recursion runs on DuckDB over the exact-Jaccard pair "
        "CTE",
)
def sql_recursive_dup_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from youtube_etl_project_spark.operators import dedup

    docs = load_table(spark, sf_dir, "documents")
    # localCheckpoint before registering the view: a temp view is a logical
    # plan, and the recursion references it once PER STEP — un-materialized,
    # every recursive step re-runs the whole shingle→Jaccard pipeline
    # (measured 21x: 15.0s → 0.7s at sf0.1). Same rule as the CC loop in
    # operators/graph.py.
    dedup.ngram_jaccard_pairs(
        docs, "doc_id", "text", shingle_k=3, threshold=0.5
    ).transform(pin).createOrReplaceTempView("__dup_pairs")
    return spark.sql(
        """
        WITH RECURSIVE paths (s, e, len) AS (
            SELECT id_a, id_b, 1 FROM __dup_pairs
            UNION ALL
            SELECT p.s, q.id_b, p.len + 1
            FROM paths p JOIN __dup_pairs q ON q.id_a = p.e
        )
        SELECT CAST(MAX(len) AS BIGINT) AS max_chain,
               CAST(COUNT(*) AS BIGINT) AS n_paths
        FROM paths
        """
    )


@register(
    "sql_recursive_date_spine",
    oracle="""
        WITH RECURSIVE bounds AS (
            SELECT CAST(MIN(ts) AS DATE) AS lo, CAST(MAX(ts) AS DATE) AS hi
            FROM events
        ), spine (d) AS (
            SELECT lo FROM bounds
            UNION ALL
            SELECT d + 1 FROM spine WHERE d < (SELECT hi FROM bounds)
        ), daily AS (
            SELECT CAST(ts AS DATE) AS d, COUNT(*) AS n
            FROM events GROUP BY 1
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(SUM(CASE WHEN daily.n IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_silent_days
        FROM spine LEFT JOIN daily USING (d)
    """,
    doc="Recursive date-spine completeness check: generate every calendar "
        "day between the first and last event, count days with zero "
        "traffic (the monitoring hole-detector; the recursive twin of "
        "events_gap_fill_ffill's sequence() spine). Bounded recursion — "
        "depth = span in days",
)
def sql_recursive_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql(
        spark,
        sf_dir,
        """
        WITH RECURSIVE bounds AS (
            SELECT CAST(MIN(ts) AS DATE) AS lo, CAST(MAX(ts) AS DATE) AS hi
            FROM events
        ), spine (d) AS (
            SELECT lo FROM bounds
            UNION ALL
            SELECT date_add(d, 1) FROM spine WHERE d < (SELECT hi FROM bounds)
        ), daily AS (
            SELECT CAST(ts AS DATE) AS d, COUNT(*) AS n
            FROM events GROUP BY 1
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(SUM(CASE WHEN daily.n IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_silent_days
        FROM spine LEFT JOIN daily USING (d)
        """,
    )


@register(
    "sql_parameterized",
    oracle="""
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users
        FROM events
        WHERE value >= 250.0 AND event_type IN ('view', 'click')
        GROUP BY event_type
    """,
    doc="Parameterized spark.sql (named-parameter binding, the injection-"
        "safe replacement for the reference's f-string SQL assembly — "
        "its param fan-out interpolates region/keyword strings directly). "
        "Parameters bind as typed literals in the plan, so Catalyst still "
        "constant-folds and pushes the predicate to the scan",
)
def sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    from youtube_etl_project_spark.sql import register_catalog

    register_catalog(spark, sf_dir)
    return spark.sql(
        """
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users
        FROM events
        WHERE value >= :min_value AND event_type IN (:t1, :t2)
        GROUP BY event_type
        """,
        args={"min_value": 250.0, "t1": "view", "t2": "click"},
    )


@register(
    "sql_lateral_topk",
    oracle="""
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer c
        CROSS JOIN LATERAL (
            SELECT o_orderkey, o_totalprice
            FROM orders o
            WHERE o.o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 2
        ) AS t
        WHERE c.c_acctbal > 9900
    """,
    doc="LATERAL correlated subquery: top-2 orders per (high-balance) "
        "customer written as a per-row dependent subquery instead of a "
        "window — the SQL surface ORMs and analysts reach for. Spark "
        "decorrelates the LATERAL LIMIT into the same ranked-window plan "
        "O3 uses, so the 'per-row subquery' never actually executes "
        "per row",
)
def sql_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from youtube_etl_project_spark.sql import sql

    return sql(
        spark,
        sf_dir,
        """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer c
        JOIN LATERAL (
            SELECT o_orderkey, o_totalprice
            FROM orders o
            WHERE o.o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 2
        ) AS t
        WHERE c.c_acctbal > 9900
        """,
    )
