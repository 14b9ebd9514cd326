"""Corpus-engineering wave 4: temperature-based source mixing (the
UniMax / multilingual-C4 α-sampling shape) and deterministic per-source
reservoir sampling (exact K-per-group without RNG state).

Cross-engine determinism notes:
* the temperature weight uses α = 0.5 computed as ``sqrt`` — IEEE-754
  square root is correctly rounded on both engines, so the weights are
  bit-identical (a general ``pow(x, α)`` is NOT correctly rounded and
  can differ in the last ulp between libm implementations; α beyond 0.5
  would need the exp/ln decomposition plus an output round).
* weights round to 6 dp BEFORE the normalizing sum, which then runs in
  the decimal domain — a ≤6 dp double casts to DECIMAL(28,6) exactly on
  both engines, making the sum associative and order-independent.
* per-doc acceptance reuses the md5-hex-prefix threshold from
  corpus_source_budget_sample: the compare stays in the hex-string
  domain, deterministic across engines, runs, and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from youtube_etl_project_spark.registry import cnt, register
from youtube_etl_project_spark.sources import load_table


@register(
    "corpus_temperature_mix",
    oracle="""
        WITH stats AS (
            SELECT source, CAST(SUM(n_chars) AS BIGINT) AS chars_src
            FROM documents GROUP BY source
        ), w AS (
            SELECT source, chars_src,
                   ROUND(sqrt(CAST(chars_src AS DOUBLE)), 6) AS w6
            FROM stats
        ), tot AS (
            SELECT CAST(SUM(CAST(w6 AS DECIMAL(28,6))) AS DOUBLE) AS wsum,
                   CAST(SUM(chars_src) AS BIGINT) AS chars_all
            FROM w
        ), rated AS (
            SELECT source, chars_src,
                   LEAST(1.0, ((w6 / wsum) * (chars_all / 2.0)) / chars_src)
                       AS rate
            FROM w, tot
        ), flagged AS (
            SELECT d.source, d.n_chars, r.rate,
                   (r.rate >= 1.0
                    OR substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)
                       < printf('%08x',
                                CAST(FLOOR(r.rate * 4294967296.0) AS BIGINT)))
                       AS keep
            FROM documents d JOIN rated r USING (source)
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_kept,
               CAST(SUM(CASE WHEN keep THEN n_chars ELSE 0 END) AS BIGINT)
                   AS chars_kept,
               ROUND(MIN(rate), 6) AS keep_rate
        FROM flagged GROUP BY source
    """,
    doc="Temperature-based data mixing (the UniMax / mC4 α-sampling "
        "shape): each source's share of a half-corpus character budget is "
        "∝ chars^α with α = 0.5, flattening the source distribution — "
        "big sources downsample hard, small sources survive nearly whole "
        "— instead of corpus_source_budget_sample's fully-equal budgets. "
        "α = 0.5 is computed as sqrt (IEEE-correctly-rounded on both "
        "engines, unlike pow); weights round to 6 dp before the decimal-"
        "domain normalizing sum so the ratio is order-independent. "
        "Per-doc acceptance is the stateless md5-hex threshold — map-side "
        "after a broadcast of the model-sized rate table, so the plan is "
        "two keyed aggregates and zero extra shuffles at any scale",
)
def corpus_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    stats = docs.groupBy("source").agg(
        F.sum("n_chars").cast("long").alias("chars_src")
    )
    w = stats.select(
        "source",
        "chars_src",
        F.round(F.sqrt(F.col("chars_src").cast("double")), 6).alias("w6"),
    )
    tot = w.agg(
        F.sum(F.col("w6").cast("decimal(28,6)")).cast("double").alias("wsum"),
        F.sum("chars_src").cast("long").alias("chars_all"),
    )
    rated = w.join(F.broadcast(tot)).select(
        "source",
        "chars_src",
        F.least(
            F.lit(1.0),
            (F.col("w6") / F.col("wsum"))
            * (F.col("chars_all") / F.lit(2.0))
            / F.col("chars_src"),
        ).alias("rate"),
    )
    thr_hex = F.format_string(
        "%08x", F.floor(F.col("rate") * F.lit(4294967296.0)).cast("long")
    )
    keep = (F.col("rate") >= 1.0) | (
        F.substring(
            F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 8
        )
        < thr_hex
    )
    return (
        docs.join(F.broadcast(rated), "source")
        .withColumn("keep", keep)
        .groupBy("source")
        .agg(
            cnt("n_docs"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0))
            .cast("long")
            .alias("n_kept"),
            F.sum(F.when(F.col("keep"), F.col("n_chars")).otherwise(0))
            .cast("long")
            .alias("chars_kept"),
            F.round(F.min("rate"), 6).alias("keep_rate"),
        )
    )


@register(
    "corpus_reservoir_sample",
    oracle="""
        WITH ranked AS (
            SELECT doc_id, source,
                   ROW_NUMBER() OVER (
                       PARTITION BY source
                       ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                                    ASC,
                                doc_id ASC
                   ) AS rn
            FROM documents
        )
        SELECT source, doc_id, CAST(rn AS BIGINT) AS rn
        FROM ranked WHERE rn <= 50
    """,
    doc="Deterministic reservoir sampling: an exact uniform-without-"
        "replacement K=50 sample per source, selected by md5-hash order "
        "with a doc_id tiebreak — reproducible across runs, partitionings, "
        "and engines (no RNG state, no seed plumbed to executors), the "
        "eval-holdout / debugging-sample primitive. Plan: one row_number "
        "window per source; at 100 TB with few huge sources, pre-thin "
        "each partition to its local top-K by hash first (rank is "
        "monotone in the hash) or use the rate-based samplers — the "
        "window form is the exact declarative baseline",
)
def corpus_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h = F.substring(
        F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 8
    )
    w = Window.partitionBy("source").orderBy(
        h.asc(), F.col("doc_id").asc()
    )
    return (
        docs.select("source", "doc_id", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 50)
        .select("source", "doc_id", F.col("rn").cast("long").alias("rn"))
    )
