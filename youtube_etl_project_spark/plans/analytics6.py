"""Wave 13: OLS trend fitting per group, character-entropy quality
scoring, and triangle counting over the near-dup graph.

Cross-engine float discipline: the OLS moments are exact BIGINT sums
(counts × day ordinals — no floats until the final division), and the
entropy per-character terms are identical doubles on both engines summed
in the decimal domain (associative → partial-agg order can't diverge)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from youtube_etl_project_spark.plans.corpus_pipeline import _PAIRS_CTE
from youtube_etl_project_spark.operators.checkpointing import pin
from youtube_etl_project_spark.registry import cnt, register
from youtube_etl_project_spark.sources import load_table


@register(
    "trend_slope_by_type",
    oracle="""
        WITH daily AS (
            SELECT event_type,
                   date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                       AS x,
                   COUNT(*) AS y
            FROM events GROUP BY 1, 2
        ), m AS (
            SELECT event_type,
                   COUNT(*) AS n,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(x * x) AS BIGINT) AS sxx,
                   CAST(SUM(x * y) AS BIGINT) AS sxy
            FROM daily GROUP BY event_type
        )
        SELECT event_type,
               ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                     / (n * sxx - sx * sx), 6) AS slope,
               ROUND((sy - CAST(n * sxy - sx * sy AS DOUBLE)
                           / (n * sxx - sx * sx) * sx)
                     / n, 6) AS intercept
        FROM m
    """,
    doc="Per-group OLS trend: slope/intercept of daily event volume over "
        "the day ordinal (the 'is this metric growing' query). Moments "
        "(Σx, Σy, Σxx, Σxy) are exact BIGINT sums — integer arithmetic "
        "is associative, so Spark's partial aggregation and DuckDB's "
        "sequential scan agree bit-for-bit; floats appear only in the "
        "final closed-form division. Two shuffles: daily rollup, then "
        "5-row moment aggregate",
)
def trend_slope_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("x"),
    ).agg(F.count(F.lit(1)).alias("y"))
    m = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = num / den
    return m.select(
        "event_type",
        F.round(slope, 6).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6).alias(
            "intercept"
        ),
    )


@register(
    "text_char_entropy",
    oracle="""
        WITH chars AS (
            SELECT doc_id, unnest(string_split(text, '')) AS ch
            FROM documents
        ), freq AS (
            SELECT doc_id, ch, COUNT(*) AS c FROM chars GROUP BY 1, 2
        ), tot AS (
            SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n FROM freq GROUP BY 1
        )
        SELECT f.doc_id,
               ROUND(CAST(SUM(CAST(
                   -(CAST(f.c AS DOUBLE) / t.n)
                       * ln(CAST(f.c AS DOUBLE) / t.n)
                   AS DECIMAL(28,12))) AS DOUBLE), 6) AS entropy
        FROM freq f JOIN tot t USING (doc_id)
        GROUP BY f.doc_id
    """,
    doc="Character-level Shannon entropy per document (nats) — the cheap "
        "gibberish/boilerplate detector (near-zero entropy = repeated "
        "chars, unusually high = random bytes; both are removal signals "
        "alongside the Gopher repetition filters). Explode to chars, "
        "count per (doc, char), one -p·ln p term per distinct char summed "
        "in the decimal domain so engine aggregation order can't diverge",
)
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    chars = docs.select(
        "doc_id", F.explode(F.split("text", "")).alias("ch")
    ).filter(F.col("ch") != "")
    freq = chars.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("c"))
    tot = freq.groupBy("doc_id").agg(F.sum("c").cast("long").alias("n"))
    p = F.col("c").cast("double") / F.col("n")
    return (
        freq.join(tot, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum((-p * F.log(p)).cast("decimal(28,12)")).cast("double"),
                6,
            ).alias("entropy")
        )
    )


@register(
    "graph_triangle_count",
    oracle=f"""
        WITH {_PAIRS_CTE.strip()},
        e AS (SELECT id_a AS a, id_b AS b FROM pairs)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
        FROM e e1
        JOIN e e2 ON e2.a = e1.b
        JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    """,
    doc="Triangle count over the near-dup pair graph (a < b < c edge "
        "orientation makes each triangle appear exactly once) — the "
        "clustering-coefficient numerator, i.e. 'are near-dup clusters "
        "cliques or chains?', which decides whether min-label CC "
        "converges in 2 rounds or needs the star variant. Edge "
        "orientation by id bounds the join fan-out to the out-degree of "
        "the smaller endpoint (the standard MapReduce triangle trick)",
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from youtube_etl_project_spark.operators import dedup

    docs = load_table(spark, sf_dir, "documents")
    # The edge list is referenced THREE times below (e1/e2/e3) —
    # checkpoint it so the quadratic Jaccard edge generation runs once,
    # not per reference (module invariant; measured 2-3x on this query).
    e = (
        dedup.ngram_jaccard_pairs(
            docs, "doc_id", "text", shingle_k=3, threshold=0.5
        )
        .select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
        .transform(pin)
    )
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = e1.join(e2, F.col("e2.a") == F.col("e1.b")).join(
        e3,
        (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")),
    )
    return tri.agg(cnt("n_triangles"))


_MEASURES = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def _corr_oracle() -> str:
    pair_rows = []
    for i, a in enumerate(_MEASURES):
        for b in _MEASURES[i + 1:]:
            pair_rows.append(f"""
        SELECT '{a}' AS m_a, '{b}' AS m_b,
               ROUND((n * s_{a}_{b} - s_{a} * s_{b})
                     / NULLIF(sqrt(GREATEST(n * s_{a}_{a} - s_{a} * s_{a}, 0))
                              * sqrt(GREATEST(n * s_{b}_{b} - s_{b} * s_{b}, 0)),
                              0), 6) AS pearson_r
        FROM m""")
    sums = ["COUNT(*) AS n"]
    for i, a in enumerate(_MEASURES):
        sums.append(
            f"CAST(SUM(CAST({a} AS DECIMAL(18,4))) AS DOUBLE) AS s_{a}"
        )
        for b in _MEASURES[i:]:
            sums.append(
                f"CAST(SUM(CAST({a} AS DECIMAL(28,8))"
                f" * CAST({b} AS DECIMAL(28,8)))"
                f" AS DOUBLE) AS s_{a}_{b}"
            )
    return (
        "WITH m AS (SELECT " + ", ".join(sums) + " FROM lineitem)"
        + " UNION ALL ".join(pair_rows)
    )


@register(
    "lineitem_corr_matrix",
    oracle=_corr_oracle(),
    doc="Pairwise Pearson correlation across the four lineitem measures "
        "(the EDA feature-redundancy screen). ONE scan computes all 4 "
        "sums + 10 cross-moments as decimal-domain aggregates (associative "
        "— engine partial-agg order can't diverge); the 6 correlations "
        "are scalar arithmetic over that 1-row moment table, variance "
        "terms clamped ≥ 0 before sqrt. The single-pass moment pattern is "
        "what survives 100 TB — never one pass per pair",
)
def lineitem_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    aggs = [F.count(F.lit(1)).alias("n")]
    for i, a in enumerate(_MEASURES):
        aggs.append(
            F.sum(F.col(a).cast("decimal(18,4)")).cast("double").alias(f"s_{a}")
        )
        for b in _MEASURES[i:]:
            aggs.append(
                F.sum(
                    F.col(a).cast("decimal(28,8)")
                    * F.col(b).cast("decimal(28,8)")
                )
                .cast("double")
                .alias(f"s_{a}_{b}")
            )
    # Round 12 (guide §2.4 + §2.2): the 6 correlations come off the
    # ONE-row moment frame as a literal-struct explode instead of a
    # 6-branch union — each union branch re-planned the whole moment
    # aggregate, so the plan carried SIX identical lineitem scans
    # (measured: 6 Scan parquet nodes, no exchange reuse at planning
    # time). The decimal cross-moments are the CPU cost and lineitem is
    # ONE small parquet file (~2 effective scan tasks), so the measures
    # are spread across the cores first — the dedup.spread rule; the
    # decimal sums are associative, so partition order cannot diverge.
    from youtube_etl_project_spark.operators.dedup import spread

    m = spread(li.select(*_MEASURES)).agg(*aggs)

    def corr(a: str, b: str):
        n = F.col("n")
        num = n * F.col(f"s_{a}_{b}") - F.col(f"s_{a}") * F.col(f"s_{b}")
        va = F.greatest(
            n * F.col(f"s_{a}_{a}") - F.col(f"s_{a}") * F.col(f"s_{a}"),
            F.lit(0.0),
        )
        vb = F.greatest(
            n * F.col(f"s_{b}_{b}") - F.col(f"s_{b}") * F.col(f"s_{b}"),
            F.lit(0.0),
        )
        return F.struct(
            F.lit(a).alias("m_a"),
            F.lit(b).alias("m_b"),
            F.round(
                num / F.nullif(F.sqrt(va) * F.sqrt(vb), F.lit(0.0)), 6
            ).alias("pearson_r"),
        )

    pairs = [
        corr(a, b)
        for i, a in enumerate(_MEASURES)
        for b in _MEASURES[i + 1:]
    ]
    return m.select(F.explode(F.array(*pairs)).alias("s")).select(
        "s.m_a", "s.m_b", "s.pearson_r"
    )


_KCORE_K = 2
_KCORE_ROUNDS = 8  # fixture peels converge in <= 3; gate fails loudly if not


def _kcore_oracle() -> str:
    """Unrolled peel: recursive CTEs can only GROW (each iteration sees
    the delta, not the accumulated set), while peeling SHRINKS — so the
    oracle chains a fixed number of peel rounds instead. If the fixture
    ever needed more rounds than the unroll, the Spark side (true
    fixpoint via operators/graph.k_core) would disagree and the gate
    would fail loudly — convergence within the unroll is itself under
    test. tests/test_graph_kcore.py additionally pins the operator
    against a long-path graph that NEEDS many rounds."""
    steps = []
    prev = "peel0"
    for i in range(1, _KCORE_ROUNDS + 1):
        steps.append(f"""
        peel{i} AS MATERIALIZED (
            SELECT v FROM (
                SELECT x.v, COUNT(*) AS d
                FROM {prev} x
                JOIN sym s ON s.u = x.v
                JOIN {prev} y ON y.v = s.w
                GROUP BY x.v
            ) WHERE d >= {_KCORE_K}
        )""")
        prev = f"peel{i}"
    chain = ",".join(steps)
    return f"""
        WITH {_PAIRS_CTE.strip()},
        sym AS MATERIALIZED (
            SELECT id_a AS u, id_b AS w FROM pairs
            UNION
            SELECT id_b AS u, id_a AS w FROM pairs
        ),
        peel0 AS MATERIALIZED (SELECT DISTINCT u AS v FROM sym),
        {chain}
        SELECT x.v AS doc_id, CAST(COUNT(*) AS BIGINT) AS deg_in_core
        FROM {prev} x
        JOIN sym s ON s.u = x.v
        JOIN {prev} y ON y.v = s.w
        GROUP BY x.v
    """


@register(
    "graph_kcore_docs",
    oracle=_kcore_oracle(),
    doc=f"{_KCORE_K}-core of the near-dup pair graph "
        "(operators/graph.k_core): peel nodes of degree < k, recompute "
        "degrees in the survivor-induced subgraph, repeat to fixpoint — "
        "the density filter separating genuinely clustered documents "
        "(cycles/cliques that survive) from dangling chain links that "
        "peel away; on interaction graphs, high cores flag bot rings. "
        "Convergence is detected by survivor COUNT (a shrinking set with "
        "unchanged count IS the fixpoint) and non-convergence raises — "
        "a truncated peel would overstate the core. Every round's "
        "survivor set is pinned (branch-then-checkpoint; reliable "
        "checkpoint under SPARK_GRAFT_CHECKPOINT_DIR). The oracle "
        f"unrolls {_KCORE_ROUNDS} peel rounds as chained CTEs (recursive "
        "CTEs only grow; peels shrink), so gate agreement also proves "
        "the fixture converged within the unroll",
)
def graph_kcore_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from youtube_etl_project_spark.operators import dedup
    from youtube_etl_project_spark.operators.graph import k_core

    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(
        docs, "doc_id", "text", shingle_k=3, threshold=0.5
    )
    core = k_core(pairs, _KCORE_K, src="id_a", dst="id_b")
    return core.select(F.col("id").alias("doc_id"), "deg_in_core")
