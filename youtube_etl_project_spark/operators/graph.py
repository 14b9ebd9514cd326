"""Distributed connected components over an edge DataFrame.

The missing piece between near-dup *pair* detection (``operators/dedup.py``)
and an actual deduplicated corpus: transitively-closed cluster ids, so that
A~B and B~C land A, B, C in one cluster even when A~C was never emitted as a
pair (the standard MinHash→LSH→CC pipeline used by large-scale training-data
dedup, cf. the public descriptions of C4/RefinedWeb/Dolma pipelines).

Algorithm: iterative min-label propagation — every node repeatedly adopts the
smallest label among itself and its neighbors until a fixed point.

Scale posture (100 TB / 1000-executor notes):

* Each iteration is one shuffle join (labels ⋈ edges on dst) + one shuffle
  groupBy (min per src). Rounds needed = graph diameter. Near-dup graphs are
  overwhelmingly tiny star/clique clusters (diameter ≤ ~3), so this
  converges in a handful of rounds; for adversarial long-path graphs switch
  to the large-star/small-star variant (Kiveris et al., "Connected
  Components in MapReduce and Beyond"), which this module's propagation
  primitive composes into.
* ``localCheckpoint(eager=True)`` after every round truncates the lineage —
  without it the plan doubles per iteration and Catalyst analysis time
  explodes by round ~8.
* Convergence is detected with a count of changed labels: a scalar driver
  aggregate (one long), NOT a data collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 15,
) -> DataFrame:
    """Return ``(id, cluster_id)`` — cluster_id = min node id reachable.

    ``edges`` is undirected input (each pair once is fine); symmetrized
    internally. Nodes appearing only as isolated points must be unioned by
    the caller (left-join the full entity table against this result).
    """
    # Checkpoint the raw edges FIRST: the input is typically the tail of an
    # expensive pipeline (LSH or all-pairs Jaccard), and every downstream
    # branch below references it — without this cut the pair pipeline
    # re-executes once per branch (measured 4x at sf0.1).
    edges = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).localCheckpoint(eager=True)
    sym = (
        edges.union(edges.select(F.col("b"), F.col("a")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = sym.select(F.col("a").alias("id")).distinct().withColumn(
        "cluster_id", F.col("id")
    )

    for _ in range(max_iter):
        # min label among neighbors: edges(a,b) ⋈ labels(b) → min per a
        nbr_min = (
            sym.join(labels.withColumnRenamed("id", "b"), "b")
            .groupBy("a")
            .agg(F.min("cluster_id").alias("nbr_min"))
            .withColumnRenamed("a", "id")
        )
        new_labels = (
            labels.join(nbr_min, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("cluster_id"), F.coalesce("nbr_min", "cluster_id")
                ).alias("cluster_id"),
                (
                    F.coalesce("nbr_min", "cluster_id") < F.col("cluster_id")
                ).alias("_changed"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.agg(
            F.sum(F.col("_changed").cast("long")).alias("n")
        ).first()["n"]
        labels = new_labels.drop("_changed")
        if not changed:
            break
    return labels
