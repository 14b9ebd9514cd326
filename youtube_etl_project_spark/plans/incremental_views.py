"""Incremental materialized-view maintenance under the oracle gate
(operators/mv.py): the refreshed view computed INCREMENTALLY on the Spark
side must hash-match a from-scratch recomputation in DuckDB — equality
with the full rebuild is the entire correctness claim of incremental
maintenance, so the driver's value-hash comparison is the exact right
judge for it.

Two queries, one per strategy:

* ``mv_additive_merge`` — insert-only day-close: the view (orders per
  customer with revenue) was materialized at the 2000-01-01 cut; the
  later orders arrive as a delta. The delta is aggregated alone and
  full-outer-merged into the old view — the base partition of the table
  is NEVER rescanned, which at 100 TB is the difference between a
  minutes-long delta job and a full-table rebuild.

* ``mv_scoped_refresh`` — upsert day-close: a simulated correction batch
  re-prices every 97th order (same keys, new totals), which additive
  merging cannot absorb. The view is refreshed by recomputing ONLY the
  customers the delta touches (~1/97 of keys) and anti-join-stitching
  them onto the untouched remainder.

Exactness: measures ride Spark's decimal domain through the merge and
cast to double once at output (an old-view double + delta double would
re-round differently than the oracle's single decimal sum; see
registry.py rules — including never OUTPUTTING decimals).

Reference parity: the reference rebuilds its daily aggregates from
scratch each run (`src/snowflake_loader.py:136-155` delete-today +
reinsert; `azure-functions/function_app.py:275-528` re-runs full query
text on a timer); these queries implement the upgrade path a warehouse
takes when that rebuild stops fitting the window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from youtube_etl_project_spark.operators.mv import (
    additive_merge,
    scoped_refresh,
)
from youtube_etl_project_spark.registry import register
from youtube_etl_project_spark.sources import load_table

_CUT = "2000-01-01"  # orders span 1995-01..2001-08; ~3/4 base, 1/4 delta


def _order_agg(orders: DataFrame) -> DataFrame:
    """The view grain: per-customer order count + exact-decimal revenue.
    Revenue stays decimal here (merged exactly); callers cast at output."""
    return orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("rev_dec"),
    )


@register(
    "mv_additive_merge",
    oracle="""
        SELECT o_custkey AS custkey, c_name,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                   AS revenue
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1, 2
    """,
    doc="Incremental view maintenance, insert-only case: the per-customer "
        "revenue view materialized at the 2000-01-01 cut is brought "
        "current by aggregating ONLY the post-cut delta and full-outer "
        "merging it in (operators/mv.additive_merge — Blakeley'86 "
        "self-maintainability: the delta of an additive aggregate is the "
        "aggregate of the delta). The base slice is never rescanned; at "
        "100 TB the refresh costs O(|delta|)+O(|view|) instead of a "
        "full-table rebuild. The oracle recomputes from scratch — "
        "incremental == full rebuild IS the correctness claim. Measures "
        "merge in the decimal domain, one double cast at output; the "
        "customer dim broadcasts",
)
def mv_additive_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    cut = F.lit(_CUT).cast("timestamp")
    old_view = _order_agg(orders.filter(F.col("o_orderdate") < cut))
    delta_agg = _order_agg(orders.filter(F.col("o_orderdate") >= cut))
    merged = additive_merge(
        old_view,
        delta_agg,
        keys=["o_custkey"],
        measures={
            "n_orders": F.lit(0).cast("long"),
            # Spark's SUM(decimal(18,4)) is decimal(28,4); the neutral
            # zero must match so coalesce+add stays in one exact type.
            "rev_dec": F.lit(0).cast("decimal(28,4)"),
        },
    )
    return (
        merged.join(
            F.broadcast(cust),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            F.col("o_custkey").alias("custkey"),
            "c_name",
            "n_orders",
            F.col("rev_dec").cast("double").alias("revenue"),
        )
    )


@register(
    "mv_scoped_refresh",
    oracle="""
        SELECT o_custkey AS custkey,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CASE WHEN o_orderkey % 97 = 0
                             THEN CAST(o_totalprice AS DECIMAL(18,4)) * 2
                             ELSE CAST(o_totalprice AS DECIMAL(18,4))
                        END) AS DOUBLE) AS revenue
        FROM orders
        GROUP BY 1
    """,
    doc="Incremental view maintenance, upsert case: a correction batch "
        "re-prices every 97th order (same keys, doubled totals) — "
        "additive merging cannot absorb an UPDATE, so the view is "
        "refreshed by recomputing only the ~1/97 of customers the batch "
        "touches and anti-join-stitching onto the untouched remainder "
        "(operators/mv.scoped_refresh). The affected-key set broadcasts "
        "into the base scan as a semi-filter, so recompute cost follows "
        "the delta's key footprint, not the base's 100 TB. Oracle "
        "recomputes the post-upsert truth from scratch; stale rows for "
        "touched keys cannot survive the anti-join",
)
def mv_scoped_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    is_upd = F.col("o_orderkey") % 97 == 0
    delta = orders.filter(is_upd)
    # The stale materialization: built before the correction batch.
    old_view = _order_agg(orders)

    def recompute(keyset: DataFrame) -> DataFrame:
        touched = orders.join(
            keyset.withColumnRenamed("o_custkey", "k"),
            F.col("o_custkey") == F.col("k"),
        ).drop("k")
        price = F.col("o_totalprice").cast("decimal(18,4)")
        return touched.groupBy("o_custkey").agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(F.when(is_upd, price * 2).otherwise(price)).alias(
                "rev_dec"
            ),
        )

    refreshed = scoped_refresh(
        old_view,
        affected_keys=delta.select("o_custkey"),
        recompute=recompute,
        keys=["o_custkey"],
    )
    return refreshed.select(
        F.col("o_custkey").alias("custkey"),
        "n_orders",
        F.col("rev_dec").cast("double").alias("revenue"),
    )
