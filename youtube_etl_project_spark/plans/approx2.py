"""Wave 6 analytics: per-group z-score normalization (exact, windowed) and
mergeable HLL sketches (the map-side-combinable distinct-count shape that
replaces exact countDistinct at 100 TB)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from youtube_etl_project_spark.registry import register
from youtube_etl_project_spark.sources import load_table


@register(
    "zscore_by_type",
    oracle="""
        WITH stats AS (
            SELECT event_id, event_type, value,
                   CAST(SUM(CAST(value AS DECIMAL(18,6)))
                        OVER (PARTITION BY event_type) AS DOUBLE) AS s1,
                   CAST(SUM(CAST(value AS DECIMAL(28,10))
                            * CAST(value AS DECIMAL(28,10)))
                        OVER (PARTITION BY event_type) AS DOUBLE) AS s2,
                   COUNT(value) OVER (PARTITION BY event_type) AS n
            FROM events
        )
        SELECT event_id, event_type,
               ROUND((value - s1 / n)
                     / NULLIF(sqrt(GREATEST(s2 - s1 * s1 / n, 0)
                                   / (n - 1)), 0), 6) AS z
        FROM stats
    """,
    doc="Per-group z-score normalization — the feature-scaling pass. "
        "Mean/variance come from decimal-exact sum and sum-of-squares "
        "(never STDDEV built-ins: their accumulation order differs between "
        "engines), derived per row via an unordered window partition — one "
        "shuffle on the group key, no join-back",
)
def zscore_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type")
    d6 = F.col("value").cast("decimal(18,6)")
    d10 = F.col("value").cast("decimal(28,10)")
    s1 = F.sum(d6).over(w).cast("double")
    s2 = F.sum(d10 * d10).over(w).cast("double")
    n = F.count("value").over(w)
    # Clamp variance at 0: for all-equal groups floating cancellation can
    # push (s2 - s1²/n) slightly negative — DuckDB's sqrt then *errors*
    # (hard gate crash) while Spark returns NaN. Zero variance → NULL z on
    # both engines (NULLIF / when-guard), since ÷0 semantics also differ.
    var = F.greatest(s2 - s1 * s1 / n, F.lit(0.0)) / (n - 1)
    den = F.sqrt(var)
    z = F.when(den > 0, (F.col("value") - s1 / n) / den)
    return ev.select("event_id", "event_type", F.round(z, 6).alias("z"))


@register(
    "approx_hll_sketch_merge",
    oracle=None,  # Apache DataSketches HLL binary — no DuckDB twin;
    # tests/test_approx_sketch.py pins estimates and error vs exact
    doc="X7 scale path: per-day HLL sketches of distinct users, merged "
        "with hll_union_agg into a total estimate. Sketches are mergeable "
        "partial aggregates — map-side combine + rollup reuse without "
        "re-scanning raw data, the only distinct-count shape that "
        "composes across 100 TB of daily partitions",
)
def approx_hll_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sketch"),
        F.countDistinct("user_id").cast("long").alias("exact_distinct"),
    )
    per_day = daily.select(
        "day",
        F.hll_sketch_estimate("sketch").cast("long").alias("approx_distinct"),
        "exact_distinct",
    )
    total = daily.agg(
        F.lit(None).cast("date").alias("day"),
        F.hll_sketch_estimate(F.hll_union_agg("sketch"))
        .cast("long")
        .alias("approx_distinct"),
        F.lit(None).cast("long").alias("exact_distinct"),
    )
    return per_day.unionByName(total)


@register(
    "approx_cms_token_counts",
    oracle="""
        WITH tok AS (
            SELECT unnest(list_filter(
                regexp_split_to_array(lower(text), '\\s+'),
                x -> x <> '')) AS tok
            FROM documents
        ), rs AS (
            SELECT unnest(range(0, 4)) AS r
        ), cells AS (
            SELECT rs.r AS row,
                   ('0x' || substr(md5(rs.r::VARCHAR || '~' || tok), 1, 8))
                       ::BIGINT % 2048 AS col,
                   CAST(COUNT(*) AS BIGINT) AS cnt
            FROM tok CROSS JOIN rs
            GROUP BY 1, 2
        ), top AS (
            SELECT tok, CAST(COUNT(*) AS BIGINT) AS exact_count
            FROM tok GROUP BY 1
            ORDER BY exact_count DESC, tok ASC LIMIT 50
        ), probes AS (
            SELECT t.tok, t.exact_count, rs.r AS row,
                   ('0x' || substr(md5(rs.r::VARCHAR || '~' || t.tok), 1, 8))
                       ::BIGINT % 2048 AS col
            FROM top t CROSS JOIN rs
        )
        SELECT p.tok, p.exact_count,
               CAST(MIN(COALESCE(c.cnt, 0)) AS BIGINT) AS cms_count
        FROM probes p
        LEFT JOIN cells c ON c.row = p.row AND c.col = p.col
        GROUP BY 1, 2
    """,
    doc="X7 frequency twin of the HLL sketch: count-min sketch (4 × 2048 "
        "counters, kept as a cell DataFrame, never collected) over "
        "document tokens; outputs the exact top-50 tokens with their "
        "exact and CM-estimated counts side by side. Probe columns live "
        "in the md5 domain, so build AND estimate are reproduced in "
        "DuckDB and the sketch itself is ORACLE-CHECKED (converted from "
        "rows-only in round 4). Build is one explode + groupBy shuffle; "
        "estimates broadcast-join the probe cells — the mergeable-"
        "partial-aggregate frequency shape for 100 TB corpora",
)
def approx_cms_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from youtube_etl_project_spark.functions.text import tokens
    from youtube_etl_project_spark.operators import sketches
    from youtube_etl_project_spark.registry import cnt

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(F.explode(tokens(F.lower(F.col("text")))).alias("tok"))
    sketch = sketches.cms_build(tok, "tok")
    top = (
        tok.groupBy("tok")
        .agg(cnt("exact_count"))
        .orderBy(F.col("exact_count").desc(), F.col("tok").asc())
        .limit(50)
    )
    est = sketches.cms_estimate(sketch, top.select("tok"), "tok")
    return top.join(est, "tok").select("tok", "exact_count", "cms_count")
