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
    ).localCheckpoint(eager=True)  # reused every iteration
    nodes = (
        p.select(F.col("src").alias("node"))
        .union(p.select("dst"))
        .distinct()
        .localCheckpoint(eager=True)
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
