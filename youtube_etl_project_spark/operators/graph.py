"""Distributed connected components over an edge DataFrame.

The missing piece between near-dup *pair* detection (``operators/dedup.py``)
and an actual deduplicated corpus: transitively-closed cluster ids, so that
A~B and B~C land A, B, C in one cluster even when A~C was never emitted as a
pair (the standard MinHash→LSH→CC pipeline used by large-scale training-data
dedup, cf. the public descriptions of C4/RefinedWeb/Dolma pipelines).

Two algorithms over the same edge-list contract:

* ``connected_components`` — iterative min-label propagation: every node
  repeatedly adopts the smallest label among itself and its neighbors until a
  fixed point. Rounds = graph diameter; ideal for near-dup graphs (tiny
  stars/cliques, diameter ≤ ~3).
* ``connected_components_star`` — the alternating large-star/small-star
  algorithm (Kiveris et al., "Connected Components in MapReduce and Beyond",
  SoCC'14): each round rewires edges toward per-neighborhood minima, halving
  path lengths, so adversarial long-path graphs converge in O(log n) rounds
  instead of O(diameter).

Scale posture (100 TB / 1000-executor notes):

* Each iteration is one shuffle join (labels ⋈ edges on dst) + one shuffle
  groupBy (min per src). Rounds needed = graph diameter. Near-dup graphs are
  overwhelmingly tiny star/clique clusters (diameter ≤ ~3), so this
  converges in a handful of rounds; for adversarial long-path graphs switch
  to the large-star/small-star variant (Kiveris et al., "Connected
  Components in MapReduce and Beyond"), which this module's propagation
  primitive composes into.
* ``checkpointing.pin`` after every round truncates the lineage — without
  it the plan doubles per iteration and Catalyst analysis time explodes by
  round ~8. In local mode pin() is a localCheckpoint; on a real cluster
  set ``SPARK_GRAFT_CHECKPOINT_DIR`` and every pinned round becomes a
  RELIABLE checkpoint, so an executor lost mid-loop re-reads the round's
  edge/label partitions from durable storage instead of killing the job
  (the recovery contract is in the ``checkpointing`` module docstring).
* Convergence is detected with a count of changed labels: a scalar driver
  aggregate (one long), NOT a data collect.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from youtube_etl_project_spark.operators.checkpointing import pin


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 15,
    on_nonconverge: str = "escalate",
) -> DataFrame:
    """Return ``(id, cluster_id)`` — cluster_id = min node id reachable.

    ``edges`` is undirected input (each pair once is fine); symmetrized
    internally. Nodes appearing only as isolated points must be unioned by
    the caller (left-join the full entity table against this result).

    If the fixed point is not reached within ``max_iter`` rounds (graph
    diameter > max_iter — adversarial long-path inputs), the partial
    labels are WRONG (clusters split). ``on_nonconverge`` controls the
    reaction:

    * ``"escalate"`` (default) — self-heal: rerun the input through
      :func:`connected_components_star`, which converges in O(log n)
      rounds on any graph. Near-dup graphs (diameter ≤ ~3) never hit
      this, so the common case keeps min-label's cheaper per-round cost
      and early exit; adversarial chains pay one star pass instead of
      returning split clusters.
    * ``"warn"`` — emit a ``RuntimeWarning`` and return the split labels.
    * ``"raise"`` — raise ``RuntimeError``.
    """
    # Checkpoint the raw edges FIRST: the input is typically the tail of an
    # expensive pipeline (LSH or all-pairs Jaccard), and every downstream
    # branch below references it — without this cut the pair pipeline
    # re-executes once per branch (measured 4x at sf0.1).
    edges = pin(edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ))
    sym = pin(
        edges.union(edges.select(F.col("b"), F.col("a"))).distinct()
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
        )
        new_labels = pin(new_labels)
        changed = new_labels.agg(
            F.sum(F.col("_changed").cast("long")).alias("n")
        ).first()["n"]
        labels = new_labels.drop("_changed")
        if not changed:
            break
    else:
        if on_nonconverge == "escalate":
            # Star labels only edge-endpoint nodes with a != b; preserve
            # this function's contract (self-loop-only nodes become
            # singletons) by re-attaching the full node set.
            star = connected_components_star(edges, src="a", dst="b")
            return (
                labels.select("id")
                .join(star, "id", "left")
                .select(
                    "id", F.coalesce("cluster_id", F.col("id")).alias("cluster_id")
                )
            )
        msg = (
            f"connected_components did not converge in {max_iter} rounds "
            f"({changed} labels still changing) — cluster ids are split. "
            "Raise max_iter or use connected_components_star."
        )
        if on_nonconverge == "raise":
            raise RuntimeError(msg)
        warnings.warn(msg, RuntimeWarning, stacklevel=2)
    return labels


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 30,
) -> DataFrame:
    """Alternating large-star/small-star CC — ``(id, cluster_id)`` output
    identical to ``connected_components``, but O(log n) rounds on any graph.

    Per round (Kiveris et al. SoCC'14, Algorithm 3):

    * **large-star**: for every node u, connect each strictly-larger
      neighbor to ``m = min(N(u) ∪ {u})`` — one shuffle groupBy for the
      minima, one shuffle join to rewire.
    * **small-star**: orient edges (big, small); connect each node's
      smaller neighbors *and the node itself* to its minimum.

    Each phase at least halves the distance from any node to its component
    minimum, so path graphs converge logarithmically (pinned by
    ``tests/test_graph_star.py`` on a 10k chain). Convergence = edge set
    unchanged, detected by a scalar (count, xxhash64-sum) fingerprint — no
    data collect. At the fixed point every edge is (node, component-min);
    labels fall out by orienting once more.
    """
    e = pin(
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    nodes = pin(
        e.select(F.col("a").alias("id")).union(e.select("b")).distinct()
    )

    def _fingerprint(df: DataFrame) -> tuple:
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            # decimal-domain sum: long-sum of 64-bit hashes overflows ANSI
            F.sum(F.xxhash64("a", "b").cast("decimal(38,0)")).alias("h"),
        ).first()
        return (row["n"], row["h"])

    def _large_star(cur: DataFrame) -> DataFrame:
        sym = cur.union(cur.select(F.col("b").alias("a"), F.col("a").alias("b")))
        mins = sym.groupBy("a").agg(F.min("b").alias("nb")).select(
            "a", F.least("nb", "a").alias("m")
        )
        return (
            sym.join(mins, "a")
            .filter(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )

    def _small_star(cur: DataFrame) -> DataFrame:
        oriented = cur.select(
            F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
        )
        mins = oriented.groupBy("a").agg(F.min("b").alias("m"))
        rewired = oriented.join(mins, "a").select(
            F.col("b").alias("a"), F.col("m").alias("b")
        )
        self_edge = mins.select(F.col("a"), F.col("m").alias("b"))
        return (
            rewired.union(self_edge)
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )

    prev_fp = _fingerprint(e)
    for _ in range(max_iter):
        e = pin(_small_star(_large_star(e)))
        fp = _fingerprint(e)
        if fp == prev_fp:
            break
        prev_fp = fp
    else:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iter} "
            "rounds — this should be impossible for max_iter ≥ log2(n)."
        )

    # Fixed point: edges are (member, component-min). Orient and attach
    # minima; star centers (and isolated callers' nodes) label themselves.
    stars = e.select(
        F.greatest("a", "b").alias("id"), F.least("a", "b").alias("m")
    ).groupBy("id").agg(F.min("m").alias("m"))
    return nodes.join(stars, "id", "left").select(
        "id", F.coalesce("m", "id").alias("cluster_id")
    )


def incremental_components(
    old_labels: DataFrame,
    new_edges: DataFrame,
    new_ids: DataFrame | None = None,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Update ``(id, cluster_id)`` labels when new edges arrive, without
    re-clustering the corpus — contract-and-solve:

    1. map each new-edge endpoint to its representative (its old
       cluster_id if known, else itself — a new node),
    2. run :func:`connected_components` on the contracted edge set, whose
       size is ∝ |new edges|, never ∝ |corpus|,
    3. join the representative relabeling back onto ``old_labels``
       (map-side: the contracted component table is touched-clusters
       sized) and label arriving nodes (isolated ones become
       singletons).

    PRECONDITION: ``old_labels`` must use min-member-id labels (what the
    CC functions in this module emit). Then the contracted minimum equals
    the global minimum, and the result is identical to re-running CC on
    the full old∪new edge set — pinned by
    tests/test_incremental_components.py, including the case where one
    new edge bridges (merges) two existing corpus clusters.

    ``new_ids``: optional one-column frame of ALL arriving node ids, so
    edge-less newcomers get singleton labels; endpoints of ``new_edges``
    are included automatically.
    """
    edges = pin(new_edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ))  # referenced for both endpoint maps

    lab = old_labels.select("id", "cluster_id")
    amap = lab.select(
        F.col("id").alias("a"), F.col("cluster_id").alias("rep_a")
    )
    bmap = lab.select(
        F.col("id").alias("b"), F.col("cluster_id").alias("rep_b")
    )
    contracted = (
        edges.join(amap, "a", "left")
        .join(bmap, "b", "left")
        .select(
            F.coalesce("rep_a", "a").alias("src"),
            F.coalesce("rep_b", "b").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
    )
    comp = connected_components(contracted)  # (id=rep, cluster_id=new)
    relabel = comp.select(
        F.col("id").alias("cluster_id"), F.col("cluster_id").alias("new_cl")
    )

    out_old = old_labels.join(relabel, "cluster_id", "left").select(
        "id", F.coalesce("new_cl", "cluster_id").alias("cluster_id")
    )

    arrivals = edges.select(F.col("a").alias("id")).unionByName(
        edges.select(F.col("b").alias("id"))
    )
    if new_ids is not None:
        arrivals = arrivals.unionByName(
            new_ids.select(F.col(new_ids.columns[0]).alias("id"))
        )
    arrivals = arrivals.distinct().join(
        lab.select("id"), "id", "left_anti"
    )
    out_new = (
        arrivals.join(comp, "id", "left")
        .select("id", F.coalesce("cluster_id", "id").alias("cluster_id"))
    )
    return out_old.unionByName(out_new)


def k_core(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 100,
) -> DataFrame:
    """The k-core: the maximal subgraph where every node keeps degree ≥ k
    — computed by the standard peel (drop all nodes of degree < k,
    recompute degrees in the survivor-induced subgraph, repeat to
    fixpoint). Returns ``(id, deg_in_core)`` for the surviving nodes.

    The density filter of graph analysis: on a near-dup graph the 2-core
    separates genuinely clustered documents (cycles/cliques) from
    dangling chain links; on interaction graphs high cores flag
    bot/spam rings. Convergence: the survivor set shrinks monotonically,
    so an unchanged count IS the fixpoint (count equality implies set
    equality for a shrinking set) — no fingerprint comparison needed.
    Peeling can take O(n) rounds on adversarial paths (each round only
    exposes the next endpoints), hence the generous ``max_iter`` and a
    hard error on non-convergence — a truncated peel silently OVERSTATES
    the core, the wrong direction for a spam/dup filter.

    Scale shape: each round is two survivor semi-joins + one map-side
    count per edge endpoint; every survivor set is pinned
    (``checkpointing.pin`` — branch-then-checkpoint, same discipline as
    the CC loops above: the set is referenced by both the degree join
    and the convergence count, and on a cluster the pin upgrades to a
    reliable checkpoint under SPARK_GRAFT_CHECKPOINT_DIR).
    """
    e = pin(edges.select(F.col(src).alias("a"), F.col(dst).alias("b")))
    sym = pin(e.union(e.select(F.col("b"), F.col("a"))).distinct())
    alive = sym.select(F.col("a").alias("id")).distinct()
    n_alive = alive.count()
    for _ in range(max_iter):
        deg = (
            sym.join(alive.withColumnRenamed("id", "a"), "a")
            .join(
                alive.select(F.col("id").alias("b")), "b"
            )
            .groupBy("a")
            .agg(F.count(F.lit(1)).cast("long").alias("deg_in_core"))
        )
        survivors = pin(
            deg.filter(F.col("deg_in_core") >= k)
        )
        n_next = survivors.count()
        if n_next == n_alive:
            return survivors.select(
                F.col("a").alias("id"), "deg_in_core"
            )
        alive = survivors.select(F.col("a").alias("id"))
        n_alive = n_next
        if n_alive == 0:
            return survivors.select(
                F.col("a").alias("id"), "deg_in_core"
            )
    raise RuntimeError(
        f"k_core did not converge within {max_iter} peel rounds "
        f"({n_alive} nodes still alive) — raise max_iter; a truncated "
        "peel would overstate the core"
    )
