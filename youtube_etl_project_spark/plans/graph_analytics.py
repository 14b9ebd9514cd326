"""Graph analytics over the event stream: weighted PageRank on the
event-type transition graph (the Markov-chain centrality of each event
type — which steps user journeys flow through).

Cross-engine determinism: the rank iteration is a fixed-point loop over
doubles, which would normally diverge between engines through sum order
and round() half-modes. Discipline used here:

* transition probabilities are single divisions of exact bigint counts
  (identical doubles on both engines);
* every per-edge contribution is snapped to an exact INTEGER grid —
  ``FLOOR(r·p·1e12 + 0.5)`` as BIGINT — so the per-node sums are exact
  integer sums (associative, partial-aggregation-proof);
* each iteration's rank re-enters as ``snapped/1e12`` (bigint→double is
  exact below 2^53, the division is one correctly-rounded op);
* ``floor(x+0.5)`` replaces ROUND everywhere (floor is exact on both
  engines; round()'s half-mode on computed doubles is not — see
  text_bigram_logprob).

Dangling nodes (event types that only ever end sequences) receive the
teleport term but redistribute no mass — total rank < 1, identically on
both engines; the ranking is unaffected (standard simplified PageRank).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from youtube_etl_project_spark.operators import dedup
from youtube_etl_project_spark.operators.checkpointing import pin
from youtube_etl_project_spark.registry import register
from youtube_etl_project_spark.sources import load_table

_D = 0.85
_ITERS = 5


def _pagerank_oracle() -> str:
    ctes = ["""
        WITH seq AS (
            SELECT user_id, event_type AS src,
                   LEAD(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                   ) AS dst
            FROM events
        ), w AS (
            SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS w
            FROM seq WHERE dst IS NOT NULL GROUP BY 1, 2
        ), p AS (
            SELECT src, dst,
                   w / CAST(SUM(w) OVER (PARTITION BY src) AS DOUBLE) AS p
            FROM w
        ), nodes AS (
            SELECT src AS node FROM w
            UNION SELECT dst FROM w
        ), nn AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes
        ), r0 AS (
            SELECT node, 1.0 / n AS r FROM nodes, nn
        )"""]
    for i in range(1, _ITERS + 1):
        ctes.append(f"""
        , c{i} AS (
            SELECT p.dst,
                   SUM(CAST(FLOOR(r{i-1}.r * p.p * 1e12 + 0.5) AS BIGINT))
                       AS s
            FROM r{i-1} JOIN p ON r{i-1}.node = p.src
            GROUP BY p.dst
        ), r{i} AS (
            SELECT node,
                   FLOOR(({1.0 - _D} / n
                          + {_D} * (COALESCE(s, 0) / 1e12)) * 1e12 + 0.5)
                       / 1e12 AS r
            FROM nodes CROSS JOIN nn LEFT JOIN c{i} ON node = c{i}.dst
        )""")
    ctes.append(f"""
        SELECT node AS event_type,
               FLOOR(r * 1e8 + 0.5) / 1e8 AS pagerank
        FROM r{_ITERS}
    """)
    return "".join(ctes)


@register(
    "events_markov_pagerank",
    oracle=_pagerank_oracle(),
    doc="Weighted PageRank (damping 0.85, 5 power iterations) over the "
        "event-type transition graph: edges = consecutive event pairs per "
        "user (lag window, (ts, event_id) tiebreak), weights = transition "
        "counts. The heavy work — sequencing and edge aggregation — is "
        "one shuffle each and fully distributed; the iterations then run "
        "on the aggregated |types|² graph (model-sized, like IVF "
        "centroids). Contributions snap to an exact 1e-12 integer grid "
        "each round so both engines' sums are associative-exact; all "
        "rounding is floor(x+0.5). Oracle = the same 5 iterations "
        "unrolled as CTEs",
)
def events_markov_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    seq_w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    edges = (
        events.select(
            F.col("event_type").alias("src"),
            F.lead("event_type").over(seq_w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    p = edges.select(
        "src",
        "dst",
        (
            F.col("w")
            / F.sum("w").over(Window.partitionBy("src")).cast("double")
        ).alias("p"),
    ).transform(pin)  # reused every iteration
    nodes = (
        p.select(F.col("src").alias("node"))
        .union(p.select("dst"))
        .distinct()
        .transform(pin)
    )
    nn = nodes.agg(F.count(F.lit(1)).cast("long").alias("n"))
    r = nodes.join(F.broadcast(nn)).select(
        "node", "n", (F.lit(1.0) / F.col("n")).alias("r")
    )
    for _ in range(_ITERS):
        contrib = (
            r.join(p, r["node"] == p["src"])
            .select(
                "dst",
                F.floor(
                    F.col("r") * F.col("p") * F.lit(1e12) + F.lit(0.5)
                ).alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        r = (
            nodes.join(F.broadcast(nn))
            .join(contrib, F.col("node") == F.col("dst"), "left")
            .select(
                "node",
                "n",
                (
                    F.floor(
                        (
                            F.lit(1.0 - _D) / F.col("n")
                            + F.lit(_D)
                            * (F.coalesce(F.col("s"), F.lit(0)) / F.lit(1e12))
                        )
                        * F.lit(1e12)
                        + F.lit(0.5)
                    )
                    / F.lit(1e12)
                ).alias("r"),
            )
        )
    return r.select(
        F.col("node").alias("event_type"),
        (F.floor(F.col("r") * F.lit(1e8) + F.lit(0.5)) / F.lit(1e8)).alias(
            "pagerank"
        ),
    )


_DECON_ORACLE = """
    WITH toks AS (
        SELECT doc_id, source,
               list_filter(regexp_split_to_array(text, '\\s+'),
                           x -> x <> '') AS t
        FROM documents
    ), sh AS (
        SELECT doc_id, source,
               list_distinct(list_transform(range(1, len(t) - 1),
                   i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingles
        FROM toks WHERE len(t) >= 3
    ), bench AS (
        SELECT DISTINCT unnest(shingles) AS s
        FROM sh WHERE source = 'src0'
    ), corpus_sh AS (
        SELECT doc_id, unnest(shingles) AS s
        FROM sh WHERE source <> 'src0'
    ), seeds AS (
        SELECT c.doc_id
        FROM corpus_sh c JOIN bench b ON c.s = b.s
        GROUP BY c.doc_id
        HAVING COUNT(*) >= 8
    ), rare AS (
        SELECT s FROM corpus_sh GROUP BY s HAVING COUNT(*) <= 5
    ), kept AS (
        SELECT c.doc_id, c.s FROM corpus_sh c JOIN rare USING (s)
    ), sizes AS (
        SELECT doc_id, COUNT(*) AS n_sh FROM kept GROUP BY doc_id
    ), inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
        FROM kept a JOIN kept b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ), edges AS (
        SELECT id_a, id_b
        FROM inter
        JOIN sizes sa ON id_a = sa.doc_id
        JOIN sizes sb ON id_b = sb.doc_id
        WHERE n_inter / (sa.n_sh + sb.n_sh - n_inter) >= 0.5
    ), und AS (
        SELECT id_a AS src, id_b AS dst FROM edges
        UNION ALL
        SELECT id_b AS src, id_a AS dst FROM edges
    ), h0 AS (
        SELECT doc_id FROM seeds
    ), h1 AS (
        SELECT DISTINCT und.dst AS doc_id
        FROM und JOIN h0 ON und.src = h0.doc_id
        WHERE und.dst NOT IN (SELECT doc_id FROM h0)
    ), h2 AS (
        SELECT DISTINCT und.dst AS doc_id
        FROM und JOIN h1 ON und.src = h1.doc_id
        WHERE und.dst NOT IN (SELECT doc_id FROM h0)
          AND und.dst NOT IN (SELECT doc_id FROM h1)
    )
    SELECT doc_id, CAST(0 AS BIGINT) AS hop FROM h0
    UNION ALL
    SELECT doc_id, CAST(1 AS BIGINT) AS hop FROM h1
    UNION ALL
    SELECT doc_id, CAST(2 AS BIGINT) AS hop FROM h2
"""


@register(
    "decontaminate_transitive",
    oracle=_DECON_ORACLE,
    doc="Transitive benchmark decontamination (the RefinedWeb/FineWeb "
        "hygiene rule): docs sharing >= 8 distinct 3-gram shingles with "
        "the held-out set (source='src0') are hop-0 contaminated, and "
        "quarantine spreads <= 2 BFS hops through the near-dup graph "
        "(exact df-cut Jaccard >= 0.5 among corpus docs) — a paraphrased "
        "copy of a contaminated doc is itself contaminated even with "
        "zero direct benchmark overlap. Seeds and edges are the existing "
        "guarded one-shuffle-per-stage builds; each BFS hop is one join "
        "against the checkpointed edge list (frontier sizes are corpus "
        "fractions, never the corpus). Oracle unrolls the two hops as "
        "CTEs over string shingles (hash-id vs string shingle sets "
        "intersect identically)",
)
def decontaminate_transitive(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != F.lit(""))
    sh = dedup.spread(docs).select(
        "doc_id",
        "source",
        dedup.word_shingle_ids(toks, 3).alias("shingles"),
    ).filter(F.size("shingles") > 0).transform(
        pin  # shingled ONCE; bench, seeds, and edges all derive
    )

    bench = (
        sh.filter(F.col("source") == "src0")
        .select(F.explode("shingles").alias("s"))
        .distinct()
    )
    corpus_sh = sh.filter(F.col("source") != "src0").select(
        "doc_id", F.explode("shingles").alias("s")
    )
    seeds = (
        corpus_sh.join(bench, "s")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= 8)
        .select("doc_id")
        .transform(pin)  # reused as h0 filter in both hops
    )

    # edge build = dedup._shingle_intersections' df-cut path, inlined on
    # the SAME exploded frame the seeds used (the pre-refactor form
    # re-tokenized and re-shingled the corpus a second time)
    kept = dedup.df_cut(
        corpus_sh.withColumnRenamed("doc_id", "doc"), "s", 5
    ).withColumn("n_sh", F.count(F.lit(1)).over(Window.partitionBy("doc")))
    le, ri = kept.alias("l"), kept.alias("r")
    edges = (
        le.join(
            ri,
            (F.col("l.s") == F.col("r.s")) & (F.col("l.doc") < F.col("r.doc")),
        )
        .groupBy(F.col("l.doc").alias("id_a"), F.col("r.doc").alias("id_b"))
        .agg(
            F.count(F.lit(1)).alias("n_inter"),
            F.first(F.col("l.n_sh")).alias("n_a"),
            F.first(F.col("r.n_sh")).alias("n_b"),
        )
        .filter(
            F.col("n_inter")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
            >= 0.5
        )
        .select("id_a", "id_b")
        .transform(pin)  # both directions + both hops
    )
    und = edges.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).unionAll(edges.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))

    h0 = seeds
    h1 = (
        und.join(h0.withColumnRenamed("doc_id", "src"), "src")
        .select(F.col("dst").alias("doc_id"))
        .distinct()
        .join(h0, "doc_id", "left_anti")
        .transform(pin)  # frontier for hop 2 + anti filter
    )
    h2 = (
        und.join(h1.withColumnRenamed("doc_id", "src"), "src")
        .select(F.col("dst").alias("doc_id"))
        .distinct()
        .join(h0, "doc_id", "left_anti")
        .join(h1, "doc_id", "left_anti")
    )
    hop = F.lit(0).cast("long").alias("hop")
    return (
        h0.select("doc_id", hop)
        .unionAll(h1.select("doc_id", F.lit(1).cast("long").alias("hop")))
        .unionAll(h2.select("doc_id", F.lit(2).cast("long").alias("hop")))
    )


_MARKOV_ACC_ORACLE = """
    WITH bounds AS (
        SELECT MIN(CAST(FLOOR(epoch_ms(ts) / 86400000) AS BIGINT)) AS d0,
               MAX(CAST(FLOOR(epoch_ms(ts) / 86400000) AS BIGINT)) AS d1
        FROM events
    ), thr AS (
        SELECT CAST(FLOOR(d0 + 0.8 * (d1 - d0)) AS BIGINT) AS t FROM bounds
    ), train AS (
        SELECT user_id, ts, event_id, event_type FROM events, thr
        WHERE CAST(FLOOR(epoch_ms(ts) / 86400000) AS BIGINT) < t
    ), test AS (
        SELECT user_id, ts, event_id, event_type FROM events, thr
        WHERE CAST(FLOOR(epoch_ms(ts) / 86400000) AS BIGINT) >= t
    ), train_pairs AS (
        SELECT event_type AS src,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts ASC, event_id ASC
               ) AS dst
        FROM train
    ), model AS (
        SELECT src, dst,
               ROW_NUMBER() OVER (
                   PARTITION BY src
                   ORDER BY COUNT(*) DESC, dst ASC
               ) AS rn
        FROM train_pairs WHERE dst IS NOT NULL GROUP BY src, dst
    ), pred AS (
        SELECT src, dst AS predicted FROM model WHERE rn = 1
    ), test_pairs AS (
        SELECT event_type AS src,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts ASC, event_id ASC
               ) AS dst
        FROM test
    )
    SELECT tp.src AS event_type, p.predicted,
           CAST(COUNT(*) AS BIGINT) AS n_test,
           CAST(SUM(CASE WHEN tp.dst = p.predicted THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct,
           FLOOR(SUM(CASE WHEN tp.dst = p.predicted THEN 1 ELSE 0 END)
                 * 1e6 / COUNT(*)) / 1e6 AS top1_acc
    FROM test_pairs tp JOIN pred p ON tp.src = p.src
    WHERE tp.dst IS NOT NULL
    GROUP BY tp.src, p.predicted
"""


@register(
    "events_markov_next_acc",
    oracle=_MARKOV_ACC_ORACLE,
    doc="Temporal-split model evaluation: train a next-event-type "
        "predictor (per-src argmax transition count, lexicographic "
        "tiebreak) on the first 80% of the event time range, score top-1 "
        "accuracy on held-out later events — the time-based eval split "
        "every forecasting pipeline needs (a random split would leak "
        "future behaviour into training). The split threshold is exact "
        "integer epoch-day arithmetic; train/test sequences re-sequence "
        "within their own period; accuracy is one bigint division "
        "floored to 1e-6. The trained model is |types|² rows — "
        "broadcast-sized — while sequencing stays fully distributed",
)
def events_markov_next_acc(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    day = (F.unix_timestamp("ts") / F.lit(86400)).cast("long")
    bounds = events.agg(
        F.min(day).alias("d0"), F.max(day).alias("d1")
    )
    thr = bounds.select(
        F.floor(F.col("d0") + 0.8 * (F.col("d1") - F.col("d0")))
        .cast("long")
        .alias("t")
    )
    staged = events.join(F.broadcast(thr)).withColumn("__day", day)
    train = staged.filter(F.col("__day") < F.col("t"))
    test = staged.filter(F.col("__day") >= F.col("t"))

    seq_w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )

    def pairs(df: DataFrame) -> DataFrame:
        return (
            df.select(
                F.col("event_type").alias("src"),
                F.lead("event_type").over(seq_w).alias("dst"),
            )
            .filter(F.col("dst").isNotNull())
        )

    rank_w = Window.partitionBy("src").orderBy(
        F.col("n").desc(), F.col("dst").asc()
    )
    pred = (
        pairs(train)
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("rn", F.row_number().over(rank_w))
        .filter(F.col("rn") == 1)
        .select("src", F.col("dst").alias("predicted"))
    )
    return (
        pairs(test)
        .join(F.broadcast(pred), "src")
        .groupBy(F.col("src").alias("event_type"), "predicted")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.sum((F.col("dst") == F.col("predicted")).cast("long"))
            .cast("long")
            .alias("n_correct"),
        )
        .withColumn(
            "top1_acc",
            F.floor(F.col("n_correct") * F.lit(1e6) / F.col("n_test"))
            / F.lit(1e6),
        )
    )
