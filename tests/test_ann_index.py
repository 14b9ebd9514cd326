"""Persisted IVF index: results identical to the in-memory twin, appends
are O(batch) under the frozen quantizer, and probing is real partition
pruning (only the probed cells' files are read)."""

from pyspark.sql import functions as F

from youtube_etl_project_spark.operators import similarity
from youtube_etl_project_spark.operators.ann_index import (
    ivf_append,
    ivf_build,
    ivf_cell_stats,
    ivf_centroids,
    ivf_query,
)
from youtube_etl_project_spark.sources import load_table

K = 8
N_QUERIES = 10


def _emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )


def _queries(emb):
    return emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def test_persisted_index_matches_inmemory_twin(spark, sf_dir, tmp_path):
    emb = _emb(spark, sf_dir)
    path = str(tmp_path / "ivf")
    ivf_build(emb, path, k=K, iters=2)

    got = sorted(
        map(tuple, ivf_query(_queries(emb), path, k=5, n_probe=4).collect())
    )
    centroids = similarity.kmeans_centroids(emb, k=K, iters=2)
    want = sorted(
        map(
            tuple,
            similarity.ivf_topk(
                _queries(emb),
                emb.select(F.col("vec_id").alias("neighbor_id"), "embedding"),
                centroids,
                k=5,
                n_probe=4,
            ).collect(),
        )
    )
    assert got == want
    # stored quantizer round-trips exactly
    assert ivf_centroids(spark, path) == centroids


def test_append_is_incremental_and_exact(spark, sf_dir, tmp_path):
    emb = _emb(spark, sf_dir)
    half_a = emb.filter(F.col("vec_id") % 2 == 0)
    half_b = emb.filter(F.col("vec_id") % 2 == 1)
    path = str(tmp_path / "ivf")

    ivf_build(half_a, path, k=K, iters=2)
    n_before = ivf_cell_stats(spark, path).agg(F.sum("n_vectors")).first()[0]
    ivf_append(half_b, path)
    n_after = ivf_cell_stats(spark, path).agg(F.sum("n_vectors")).first()[0]
    assert n_before == half_a.count()
    assert n_after == emb.count()

    # Query over build+append == in-memory IVF over the full corpus with
    # the SAME (half-A-trained, frozen) centroids — appending must not
    # change any result vs assigning everything up front.
    got = sorted(
        map(tuple, ivf_query(_queries(emb), path, k=5, n_probe=4).collect())
    )
    frozen = similarity.kmeans_centroids(half_a, k=K, iters=2)
    want = sorted(
        map(
            tuple,
            similarity.ivf_topk(
                _queries(emb),
                emb.select(F.col("vec_id").alias("neighbor_id"), "embedding"),
                frozen,
                k=5,
                n_probe=4,
            ).collect(),
        )
    )
    assert got == want


def test_probe_prunes_partitions(spark, sf_dir, tmp_path):
    emb = _emb(spark, sf_dir)
    path = str(tmp_path / "ivf")
    ivf_build(emb, path, k=K, iters=2)

    one_query = _queries(emb).limit(1)
    result = ivf_query(one_query, path, k=5, n_probe=2)
    # the plan carries the probe set as a PARTITION filter on the
    # assignments scan (pruned before any file is opened)
    import re

    plan = result._jdf.queryExecution().executedPlan().toString()
    # several scans appear (embeddings, centroids, assignments) — the
    # assignments one must carry the cell probe set as a partition filter
    assert re.search(r"PartitionFilters: \[[^\]]*cell[^\]]*IN", plan), (
        plan[:2000]
    )

    # physically: the probed-cells scan reads a strict subset of the
    # index's files (replicating the filter ivf_query pushes down)
    import numpy as np

    from youtube_etl_project_spark.operators.ann_index import ivf_centroids

    C = np.asarray(ivf_centroids(spark, path))
    qv = np.asarray(one_query.first().embedding, dtype=float)
    probe_cells = np.argsort(((C - qv) ** 2).sum(axis=1))[:2].tolist()
    assignments = spark.read.parquet(f"{path}/assignments")
    read = (
        assignments.filter(F.col("cell").isin(probe_cells))
        .select(F.input_file_name().alias("f")).distinct().count()
    )
    total = assignments.select(F.input_file_name()).distinct().count()
    assert 0 < read < total, (read, total)
    # and the query's own results only come from those cells
    got_cells = {
        r.cell
        for r in assignments.join(
            result.select(F.col("neighbor_id").alias("id")), "id"
        ).select("cell").distinct().collect()
    }
    assert got_cells <= set(probe_cells), (got_cells, probe_cells)


def test_streaming_ann_ingest_builds_then_appends(spark, sf_dir, tmp_path):
    from youtube_etl_project_spark.streaming.pipeline import (
        streaming_ann_ingest,
    )

    emb = _emb(spark, sf_dir)
    half_a = emb.filter(F.col("vec_id") % 2 == 0)
    half_b = emb.filter(F.col("vec_id") % 2 == 1)
    src = str(tmp_path / "src")
    idx = str(tmp_path / "ivf")
    ckpt = str(tmp_path / "ckpt")

    half_a.coalesce(1).write.mode("append").parquet(src)
    q = streaming_ann_ingest(spark, src, emb.schema, idx, ckpt, k=K)
    q.awaitTermination(120)
    n1 = ivf_cell_stats(spark, idx).agg(F.sum("n_vectors")).first()[0]
    assert n1 == half_a.count()
    frozen = ivf_centroids(spark, idx)

    half_b.coalesce(1).write.mode("append").parquet(src)
    q2 = streaming_ann_ingest(spark, src, emb.schema, idx, ckpt, k=K)
    q2.awaitTermination(120)
    assert (
        ivf_cell_stats(spark, idx).agg(F.sum("n_vectors")).first()[0]
        == emb.count()
    )
    # append did NOT retrain: quantizer frozen from the first batch
    assert ivf_centroids(spark, idx) == frozen

    # exactly-once: re-draining with no new files changes nothing
    q3 = streaming_ann_ingest(spark, src, emb.schema, idx, ckpt, k=K)
    q3.awaitTermination(120)
    assert (
        ivf_cell_stats(spark, idx).agg(F.sum("n_vectors")).first()[0]
        == emb.count()
    )

    # the streamed index answers queries exactly like the in-memory twin
    # under the same frozen centroids
    got = sorted(
        map(tuple, ivf_query(_queries(emb), idx, k=5, n_probe=4).collect())
    )
    want = sorted(
        map(
            tuple,
            similarity.ivf_topk(
                _queries(emb),
                emb.select(F.col("vec_id").alias("neighbor_id"), "embedding"),
                frozen,
                k=5,
                n_probe=4,
            ).collect(),
        )
    )
    assert got == want


def test_registered_query_matches_inmemory_twin(spark, sf_dir):
    """The REGISTERED serving query (embed_ivf_index_ann, rows-only in the
    gate) is pinned result-identical to the float in-memory IVF twin at
    the same frozen geometry (auto K, 2 Lloyd rounds, seeded init) ->
    same centroids -> same probes -> same top-k. (Until round 7 the pin
    target was the registered embed_ivf_ann; that query now trains on
    the exact integer grid and scores by quantized MIPS under its own
    DuckDB oracle, so the float persisted path pins against the float
    ivf_topk twin directly.)"""
    from youtube_etl_project_spark.registry import load_all_plans
    from youtube_etl_project_spark.sources import load_table

    plans = load_all_plans()
    served = plans["embed_ivf_index_ann"].fn(spark, sf_dir)

    emb = load_table(spark, sf_dir, "embeddings")
    k_cells, n_probe = similarity.auto_ivf_geometry(emb.count())
    cents = similarity.kmeans_centroids(emb, k=k_cells, iters=2)
    twin = similarity.ivf_topk(
        _queries(_emb(spark, sf_dir)),
        emb.select(F.col("vec_id").alias("neighbor_id"), "embedding"),
        cents,
        k=5,
        n_probe=n_probe,
    )
    assert sorted(map(tuple, served.collect())) == sorted(
        map(tuple, twin.collect())
    )
    assert served.schema == twin.schema


def test_streaming_nsw_ingest_bootstrap_insert_parity(spark, sf_dir, tmp_path):
    """The graph twin of the IVF streaming ingest: first batch
    bootstraps the persisted NSW index, later batches attach online.
    Parity evidence (the incremental_components pattern): (1) every
    inserted vector's out-edges equal its beam-search top-m recomputed
    against a frozen copy of the pre-insert index; (2) every touched
    neighbor's edge list equals the batch-recomputed top-deg_cap of its
    old edges plus the capped reverse edges; (3) re-draining with no new
    files changes nothing (exactly-once)."""
    import shutil

    from youtube_etl_project_spark.operators import ann_index
    from youtube_etl_project_spark.plans.exact_kmeans import quantize_vectors
    from youtube_etl_project_spark.streaming.pipeline import (
        streaming_nsw_ingest,
    )

    emb = _emb(spark, sf_dir)
    half_a = emb.filter(F.col("vec_id") % 2 == 0)
    half_b = emb.filter((F.col("vec_id") % 2 == 1) & (F.col("vec_id") < 40))
    src = str(tmp_path / "src")
    idx = str(tmp_path / "nsw")
    ckpt = str(tmp_path / "ckpt")

    half_a.coalesce(1).write.mode("append").parquet(src)
    q = streaming_nsw_ingest(spark, src, emb.schema, idx, ckpt)
    q.awaitTermination(300)
    e0 = spark.read.parquet(f"{idx}/edges")
    assert e0.select("src").distinct().count() == half_a.count()

    pre = str(tmp_path / "pre")
    shutil.copytree(idx, pre)

    half_b.coalesce(1).write.mode("append").parquet(src)
    q2 = streaming_nsw_ingest(spark, src, emb.schema, idx, ckpt)
    q2.awaitTermination(300)

    new_ids = {r.vec_id for r in half_b.collect()}
    e1 = spark.read.parquet(f"{idx}/edges")

    # (1) inserted out-edges == beam-search top-m on the frozen snapshot
    qe_b = quantize_vectors(half_b, "vec_id", "embedding")
    want_rows = ann_index.nsw_query(qe_b, pre, topk=8).collect()
    want = {(r.query_id, r.neighbor_id, r.dist_q) for r in want_rows}
    got = {
        (r.src, r.dst, r.d)
        for r in e1.collect()
        if r.src in new_ids
    }
    assert got == want and want

    # (2) touched neighbors: old edges + reverse edges, re-capped at 16
    old: dict = {}
    for r in spark.read.parquet(f"{pre}/edges").collect():
        old.setdefault(r.src, []).append((r.d, r.dst))
    rev: dict = {}
    for qid, nid, d in want:
        rev.setdefault(nid, []).append((d, qid))
    e1_rows: dict = {}
    for r in e1.collect():
        if r.src not in new_ids:
            e1_rows.setdefault(r.src, []).append((r.d, r.dst))
    for u, extra in rev.items():
        expect = sorted(old.get(u, []) + extra)[:16]
        assert sorted(e1_rows[u]) == expect, u

    # (3) exactly-once: re-drain with no new files changes nothing
    n_edges = e1.count()
    q3 = streaming_nsw_ingest(spark, src, emb.schema, idx, ckpt)
    q3.awaitTermination(300)
    assert spark.read.parquet(f"{idx}/edges").count() == n_edges

    # the updated index serves: new nodes are reachable as results
    res = ann_index.nsw_query(qe_b, idx, topk=5).collect()
    per_q: dict = {}
    for r in res:
        per_q.setdefault(r.query_id, []).append(r.rank)
    assert set(per_q) == new_ids
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per_q.values())


def _nsw_index_from(spark, df, idx):
    from youtube_etl_project_spark.operators import ann_index
    from youtube_etl_project_spark.plans.graph_ann import (
        nsw_graph_from_vectors,
    )

    edges, qe, assign, cb = nsw_graph_from_vectors(df)
    ann_index.nsw_build(edges, assign, qe, cb, idx)


def _nsw_state(spark, idx):
    e = {
        tuple(r)
        for r in spark.read.parquet(f"{idx}/edges")
        .select("src", "dst", "d", "dst_cell", "cell")
        .collect()
    }
    c = {
        tuple(r)
        for r in spark.read.parquet(f"{idx}/components")
        .select("id", "pos", "q", "cell")
        .collect()
    }
    return e, c


def test_nsw_insert_replay_is_idempotent(spark, sf_dir, tmp_path):
    """foreachBatch is at-least-once: replaying an nsw_insert batch —
    whether the previous attempt completed fully or landed only some of
    its writes — must converge to the exact single-run state (ADVICE
    r10: duplicated (id,pos) component rows would silently DOUBLE
    nsw_query's sum-over-pos distances)."""
    from youtube_etl_project_spark.operators import ann_index

    emb = _emb(spark, sf_dir)
    base = emb.filter(F.col("vec_id") % 2 == 0)
    batch = emb.filter((F.col("vec_id") % 2 == 1) & (F.col("vec_id") < 40))
    idx = str(tmp_path / "nsw")
    _nsw_index_from(spark, base, idx)

    ann_index.nsw_insert(batch, idx)
    want = _nsw_state(spark, idx)
    assert want[0] and want[1]

    # full replay (crash after everything but the checkpoint commit)
    ann_index.nsw_insert(batch, idx)
    assert _nsw_state(spark, idx) == want

    # partial replay: simulate a crash that landed ONLY the components
    # append of a second batch, then replay the whole batch
    from youtube_etl_project_spark.plans.exact_kmeans import quantize_vectors

    batch2 = emb.filter(
        (F.col("vec_id") % 2 == 1)
        & (F.col("vec_id") >= 40) & (F.col("vec_id") < 60)
    )
    idx2 = str(tmp_path / "nsw2")
    _nsw_index_from(spark, base, idx2)
    ann_index.nsw_insert(batch2, idx2)
    want2 = _nsw_state(spark, idx2)

    idx3 = str(tmp_path / "nsw3")
    _nsw_index_from(spark, base, idx3)
    # crash-landed components only (what step 2 of the insert writes)
    qe_b = quantize_vectors(batch2, "vec_id", "embedding")
    cb = spark.read.parquet(f"{idx3}/coarse")
    qq = qe_b.withColumnRenamed("id", "query_id")
    from pyspark.sql import Window

    dc = F.col("q") - F.col("cq")
    wq = Window.partitionBy("query_id").orderBy(F.asc("dist"), F.asc("cell"))
    assign_new = (
        qq.join(F.broadcast(cb), "pos")
        .groupBy("query_id", "cell")
        .agg(F.sum(dc * dc).cast("long").alias("dist"))
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") == 1)
        .select(F.col("query_id").alias("id"), "cell")
    )
    qe_b.join(assign_new, "id").write.mode("append").partitionBy(
        "cell"
    ).parquet(f"{idx3}/components")
    # replay the whole batch on top of the partial state
    ann_index.nsw_insert(batch2, idx3)
    assert _nsw_state(spark, idx3) == want2


def test_nsw_insert_empty_cell_attaches_via_second_cell(
    spark, sf_dir, tmp_path
):
    """VERDICT r10 #7: a new vector whose nearest coarse cell has no
    indexed members must attach through its second-nearest cell (the
    build's 2-nearest-cells rule) instead of being inserted edgeless."""
    import shutil

    from youtube_etl_project_spark.operators import ann_index

    emb = _emb(spark, sf_dir)
    base = emb.filter(F.col("vec_id") % 2 == 0)
    idx = str(tmp_path / "nsw")
    _nsw_index_from(spark, base, idx)

    # drain one cell: pick the cell of the first held-out vector, remove
    # its partitions so that vector's nearest cell is guaranteed empty
    held = emb.filter(F.col("vec_id") % 2 == 1).limit(1)
    from youtube_etl_project_spark.plans.exact_kmeans import quantize_vectors

    qe_h = quantize_vectors(held, "vec_id", "embedding")
    probe = ann_index.nsw_query(qe_h, idx, topk=1, include_cell=True)
    # cell of the held vector under the persisted codebook = entry cell
    cb = spark.read.parquet(f"{idx}/coarse")
    qq = qe_h.withColumnRenamed("id", "query_id")
    dc = F.col("q") - F.col("cq")
    dists = (
        qq.join(F.broadcast(cb), "pos")
        .groupBy("query_id", "cell")
        .agg(F.sum(dc * dc).cast("long").alias("dist"))
        .orderBy("dist", "cell")
        .collect()
    )
    nearest_cell = dists[0].cell
    import os

    for ds in ("edges", "components"):
        p = f"{idx}/{ds}/cell={nearest_cell}"
        if os.path.isdir(p):
            shutil.rmtree(p)
    assert probe is not None  # pre-drain the index served normally

    ann_index.nsw_insert(held, idx)
    new_id = held.first().vec_id
    out = (
        spark.read.parquet(f"{idx}/edges")
        .filter(F.col("src") == new_id)
        .count()
    )
    assert out > 0, "empty-cell insert must attach via the 2nd cell"
    # and its neighbors live in the second-nearest (non-drained) cell
    second_cell = dists[1].cell
    dst_cells = {
        r.dst_cell
        for r in spark.read.parquet(f"{idx}/edges")
        .filter(F.col("src") == new_id)
        .select("dst_cell")
        .collect()
    }
    assert nearest_cell not in dst_cells
    assert second_cell in dst_cells


def test_nsw_compact_reduces_files_preserves_results(
    spark, sf_dir, tmp_path
):
    """VERDICT r10 #6: repeated nsw_insert batches fragment cell
    partitions; nsw_compact rewrites ONLY fragmented cells down to one
    file each and every nsw_query trace is bit-identical before/after."""
    from youtube_etl_project_spark.operators import ann_index
    from youtube_etl_project_spark.plans.exact_kmeans import quantize_vectors

    emb = _emb(spark, sf_dir)
    base = emb.filter(F.col("vec_id") % 3 == 0)
    idx = str(tmp_path / "nsw")
    _nsw_index_from(spark, base, idx)
    for m in (1, 2):
        ann_index.nsw_insert(
            emb.filter(
                (F.col("vec_id") % 3 == m) & (F.col("vec_id") < 60)
            ),
            idx,
        )

    before = ann_index.nsw_file_stats(idx)
    assert any(
        n > 1 for ds in before.values() for n in ds.values()
    ), before

    qs = quantize_vectors(
        emb.filter(F.col("vec_id") < N_QUERIES), "vec_id", "embedding"
    )
    want = sorted(map(tuple, ann_index.nsw_query(qs, idx).collect()))
    health_want = sorted(
        map(tuple, ann_index.nsw_cell_stats(spark, idx).collect())
    )

    done = ann_index.nsw_compact(spark, idx)
    assert sum(done.values()) > 0

    after = ann_index.nsw_file_stats(idx)
    for ds, cells in after.items():
        for c, n in cells.items():
            assert n == 1, (ds, c, n)
    assert sorted(map(tuple, ann_index.nsw_query(qs, idx).collect())) == want
    assert (
        sorted(map(tuple, ann_index.nsw_cell_stats(spark, idx).collect()))
        == health_want
    )
    # idempotent: a second pass finds nothing fragmented
    assert sum(ann_index.nsw_compact(spark, idx).values()) == 0


def test_adjacency_cache_widens_on_insert_and_stamps_foreign_writes(
    spark, sf_dir, tmp_path
):
    """Round 12 (ADVICE r11 #1/#3): nsw_insert WIDENS the cached cell
    adjacency with its known (cell, dst_cell) additions instead of
    dropping it (no full edges re-scan per micro-batch), and the cache
    revalidates against an edges-dir metadata stamp so any OTHER writer
    invalidates it loudly instead of silently under-pruning."""
    import os

    from youtube_etl_project_spark.operators import ann_index

    emb = _emb(spark, sf_dir)
    base = emb.filter(F.col("vec_id") % 2 == 0)
    batch = emb.filter((F.col("vec_id") % 2 == 1) & (F.col("vec_id") < 40))
    idx = str(tmp_path / "nsw_adj")
    _nsw_index_from(spark, base, idx)
    key = (spark.sparkContext.applicationId, idx)

    # prime the cache, then insert: the widened entry must equal a cold
    # rebuild from the post-insert edge list (a missing pair would drop
    # frontier distance rows silently)
    ann_index._nsw_cell_adjacency(spark, idx)
    ann_index.nsw_insert(batch, idx)
    assert key in ann_index._NSW_ADJ_CACHE, "insert dropped the entry"
    widened = {
        c: set(d) for c, d in ann_index._NSW_ADJ_CACHE[key][1].items()
    }
    ann_index._NSW_ADJ_CACHE.pop(key)
    cold = ann_index._nsw_cell_adjacency(spark, idx)
    for cell, dsts in cold.items():
        assert dsts <= widened.get(cell, set()), (
            f"cell {cell}: widened cache missing {dsts - widened.get(cell, set())}"
        )

    # a foreign write to {path}/edges changes the stamp -> next lookup
    # rebuilds instead of serving the (possibly under-pruning) entry
    stamped = ann_index._NSW_ADJ_CACHE[key]
    marker = os.path.join(idx, "edges", "_foreign_touch")
    with open(marker, "w") as fh:
        fh.write("x")
    try:
        ann_index._nsw_cell_adjacency(spark, idx)
        assert ann_index._NSW_ADJ_CACHE[key][0] != stamped[0]
    finally:
        os.remove(marker)
