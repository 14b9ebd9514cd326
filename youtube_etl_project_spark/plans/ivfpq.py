"""IVF-PQ composed ANN (X3 capstone, round 8): the canonical
billion-scale index layout — an exact-grid-TRAINED coarse quantizer
(IVF) whose per-vector RESIDUALS are product-quantized by a second
exact-grid Lloyd trainer, searched via per-probed-cell ADC lookup
tables, with the ADC shortlist re-ranked by EXACT grid distance. This
is the FAISS ``IndexIVFPQ`` + refine architecture (reference
analogue: the repo's embed_ivf_ann coarse path composed with the
embed_pq_* residual coding and the embed_pq_rerank_topk refine), re-
expressed as pure DataFrame joins — no Python stage anywhere in the
plan.

Why it is oracle-expressible end-to-end: residuals of int64 grid
components against int64 grid centroids are themselves exact int64
values, so the SECOND training loop (PQ over residuals) inherits the
same term-for-term DuckDB reproducibility as the first — seeds by id
rank, argmin with lowest-cell tiebreak, FLOOR(SUM/COUNT + 0.5) means,
empty-cell carry-forward. Every LUT entry and ADC sum is exact bigint
arithmetic (|rq| <= 2e6 on the 1e6 grid, per-sub dist <= 8*(4e6)^2
~ 1.3e14, ADC sum over 8 subs ~ 1e15 — well inside int64).

Scale shape (100 TB posture): coarse training touches only K*dim-row
models on the driver; residual building is one broadcast-centroid
join; PQ training is 2 rounds of broadcast-codebook joins with
m*k*dsub-row collects; search is probes (queries x n_probe) joined
against the cell-partitioned encoded corpus — candidate cost is
n_probe/K of the corpus per query, never all-pairs, and the LUT
(queries x n_probe x m x k rows) is broadcast-sized by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from youtube_etl_project_spark.operators.checkpointing import pin
from youtube_etl_project_spark.operators.quantization import (
    pq_train_exact_rows,
)
from youtube_etl_project_spark.registry import register
from youtube_etl_project_spark.sources import load_table

_M, _DIM, _KPQ, _ITERS = 8, 64, 16, 2
_DSUB = _DIM // _M
_N_QUERIES, _TOPK = 10, 5
# ADC shortlist size for the exact refine stage. 32-bit PQ codes on
# distance-concentrated unit vectors shuffle the top of the ranking
# (measured ADC-only recall@5 = 0.30 at sf0.001 / 0.18 at sf0.1
# against brute force, vs 0.92 / 0.90 IVF probe ceilings); re-ranking
# the ADC top-R by EXACT grid distance recovers most of the ceiling —
# the FAISS IndexIVFPQ + refine layout. R follows the corpus with an
# integer rule shared by both engines (min(n, max(40, n // 25)):
# recall@5 = 0.74 at n=500, 0.70 at n=2000 — the full R sweep is in
# RECALL.md). Per-query refine cost stays R x dim rows — n/25 keeps
# the shortlist a fixed ~4% of the corpus' ADC candidates, and a
# deployment pins R at whatever latency budget allows, exactly as
# n_probe caps the coarse fan-out.
_R_FLOOR, _R_DIV = 40, 25
_RERANK_OVERRIDE: int | None = None  # tools/ivfpq_recall_sweep.py only


def _refine_r(n: int) -> int:
    """Refine shortlist size for an n-vector corpus (integer rule —
    mirrored verbatim in the oracle's rr CTE)."""
    if _RERANK_OVERRIDE is not None:
        return min(n, _RERANK_OVERRIDE)
    return min(n, max(_R_FLOOR, n // _R_DIV))

# Trained residual codebooks are deterministic in the data alone (the
# coarse model is memoized in similarity_queries._IVF_BOOK_CACHE; the
# residual Lloyd loop is exact integer arithmetic), so the PQ book is
# safely memoized per fixture dir — the ANN query and the compression
# report share one training run per gate/bench pass.
_IVFPQ_BOOK_CACHE: dict[str, dict[tuple[int, int, int], int]] = {}


def _ivfpq_parts_uncached(spark: SparkSession, sf_dir: str):
    """Shared trained inputs: pinned grid rows qe(id, pos, q), the coarse
    codebook / assignment, the pinned residual rows qer(id, sub, pos, q)
    and the trained residual PQ codebook (sub, cell, pos, cq)."""
    from youtube_etl_project_spark.plans.exact_kmeans import (
        centroid_df,
        kmeans_assign_exact,
    )
    from youtube_etl_project_spark.plans.similarity_queries import (
        _ivf_trained_parts,
    )

    qe, books, _k_cells, n_probe = _ivf_trained_parts(spark, sf_dir)
    cb = centroid_df(spark, books)
    assign = pin(kmeans_assign_exact(qe, cb))
    qer = pin(
        assign.join(qe, "id")
        .join(F.broadcast(cb), ["cell", "pos"])
        .select(
            "id",
            (F.col("pos") / _DSUB).cast("long").alias("sub"),
            (F.col("pos") % _DSUB).alias("spos"),
            (F.col("q") - F.col("cq")).alias("rq"),
        )
        .withColumnsRenamed({"spos": "pos", "rq": "q"})
    )
    pq_books = _IVFPQ_BOOK_CACHE.get(sf_dir)
    if pq_books is None:
        pq_books = pq_train_exact_rows(qer, k=_KPQ, iters=_ITERS)
        _IVFPQ_BOOK_CACHE[sf_dir] = pq_books
    pqcb = spark.createDataFrame(
        [(s, c, p, q) for (s, c, p), q in pq_books.items()],
        "sub long, cell int, pos int, cq long",
    )
    return qe, cb, assign, qer, pqcb, n_probe


def _ivfpq_frames_path(spark: SparkSession, sf_dir: str) -> str:
    """Round 12 (VERDICT r11 #7): per-fixture derived-FRAME cache for the
    capstone's trained intermediates — qe(id,pos,q), assign(id,cell),
    qer(id,sub,pos,q) and enc(id,sub,code), all exact int64 so the
    parquet round trip is bit-exact. The MODEL dicts were already
    memoized (`_IVF_BOOK_CACHE`/`_IVFPQ_BOOK_CACHE`); what re-ran per
    call were these frames' pins (quantize + assign + residual joins +
    the encode window). The oracle still trains AND encodes in SQL every
    gate run. Building also fills the model-dict memos (same process),
    so readers can take pqcb/cb from them afterwards."""
    from youtube_etl_project_spark.operators import fixture_cache

    def _build(path: str) -> None:
        qe, _cb, assign, qer, pqcb, _n_probe = _ivfpq_parts_uncached(
            spark, sf_dir
        )
        qe.repartition(1).write.mode("overwrite").parquet(f"{path}/qe")
        assign.repartition(1).write.mode("overwrite").parquet(
            f"{path}/assign"
        )
        qer.repartition(1).write.mode("overwrite").parquet(f"{path}/qer")
        _encode(qer, pqcb).repartition(1).write.mode("overwrite").parquet(
            f"{path}/enc"
        )

    return fixture_cache.cached_build(
        "ivfpq_frames_", sf_dir, _build, marker="enc/_SUCCESS"
    )


def _ivfpq_parts(spark: SparkSession, sf_dir: str):
    """Frame-cached variant of :func:`_ivfpq_parts_uncached` plus the
    pre-built enc frame: returns (qe, cb, assign, qer, pqcb, n_probe,
    enc) with the four frames read from the per-fixture parquet cache."""
    from youtube_etl_project_spark.plans.exact_kmeans import centroid_df
    from youtube_etl_project_spark.plans.similarity_queries import (
        _IVF_BOOK_CACHE,
    )

    path = _ivfpq_frames_path(spark, sf_dir)
    # model dicts are warm after the frames build (same process) — read
    # them directly rather than via _ivf_trained_parts, whose per-call
    # qe pin is exactly what the frame cache removes
    _k_cells, n_probe, books = _IVF_BOOK_CACHE[sf_dir]
    cb = centroid_df(spark, books)
    pq_books = _IVFPQ_BOOK_CACHE[sf_dir]
    pqcb = spark.createDataFrame(
        [(s, c, p, q) for (s, c, p), q in pq_books.items()],
        "sub long, cell int, pos int, cq long",
    )
    qe = spark.read.parquet(f"{path}/qe")
    assign = spark.read.parquet(f"{path}/assign")
    qer = spark.read.parquet(f"{path}/qer")
    enc = spark.read.parquet(f"{path}/enc")
    return qe, cb, assign, qer, pqcb, n_probe, enc


def _encode(qer: DataFrame, pqcb: DataFrame) -> DataFrame:
    """(id, sub, code): residual subvectors -> nearest PQ centroid,
    lowest cell on exact-int ties (the pq_train_exact assignment rule)."""
    d = F.col("q") - F.col("cq")
    w = Window.partitionBy("id", "sub").orderBy(F.asc("dist"), F.asc("cell"))
    return (
        qer.join(F.broadcast(pqcb), ["sub", "pos"])
        .groupBy("id", "sub", "cell")
        .agg(F.sum(d * d).cast("long").alias("dist"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("id", "sub", F.col("cell").alias("code"))
    )


def _pq_residual_ctes(iters: int = _ITERS) -> str:
    """DuckDB twin of the residual PQ train + encode: the caller's WITH
    list must already define qe(id, pos, q), kassign(id, cell) and the
    final coarse book c2 (from exact_kmeans.kmeans_exact_ctes at
    iters=2). Appends qer (residual components), the unrolled Lloyd
    rounds (pd_i/pa_i/pm_i/p_i — p-prefixed to avoid the coarse CTE
    names) and the final codes penc(id, sub, code)."""
    parts = [
        f""", qer AS MATERIALIZED (
            SELECT a.id, qe.pos // {_DSUB} AS sub, qe.pos % {_DSUB} AS pos,
                   qe.q - c.cq AS q
            FROM kassign a
            JOIN qe ON qe.id = a.id
            JOIN c2 c ON c.cell = a.cell AND c.pos = qe.pos
        ), pseed AS (
            SELECT id, CAST(ROW_NUMBER() OVER (ORDER BY id) - 1 AS INT)
                       AS cell
            FROM (SELECT DISTINCT id FROM qer)
        ), p0 AS MATERIALIZED (
            SELECT qer.sub, s.cell, qer.pos, qer.q AS cq
            FROM qer JOIN pseed s ON s.id = qer.id
            WHERE s.cell < {_KPQ}
        )"""
    ]
    for i in range(1, iters + 1):
        parts.append(
            f""", pd{i} AS (
            SELECT qer.id, qer.sub, c.cell,
                   CAST(SUM((qer.q - c.cq) * (qer.q - c.cq)) AS BIGINT)
                       AS dist
            FROM qer JOIN p{i - 1} c ON c.sub = qer.sub AND c.pos = qer.pos
            GROUP BY 1, 2, 3
        ), pa{i} AS (
            SELECT id, sub, cell FROM (
                SELECT id, sub, cell,
                       ROW_NUMBER() OVER (PARTITION BY id, sub
                                          ORDER BY dist ASC, cell ASC)
                           AS rn
                FROM pd{i}
            ) WHERE rn = 1
        ), pm{i} AS (
            SELECT a.sub, a.cell, qer.pos,
                   CAST(FLOOR(CAST(SUM(qer.q) AS DOUBLE) / COUNT(*) + 0.5)
                        AS BIGINT) AS cq
            FROM pa{i} a
            JOIN qer ON qer.id = a.id AND qer.sub = a.sub
            GROUP BY 1, 2, 3
        ), p{i} AS MATERIALIZED (
            SELECT c.sub, c.cell, c.pos, COALESCE(m.cq, c.cq) AS cq
            FROM p{i - 1} c LEFT JOIN pm{i} m
              ON m.sub = c.sub AND m.cell = c.cell AND m.pos = c.pos
        )"""
        )
    parts.append(
        f""", pdf AS MATERIALIZED (
            SELECT qer.id, qer.sub, c.cell,
                   CAST(SUM((qer.q - c.cq) * (qer.q - c.cq)) AS BIGINT)
                       AS dist
            FROM qer JOIN p{iters} c ON c.sub = qer.sub AND c.pos = qer.pos
            GROUP BY 1, 2, 3
        ), penc AS MATERIALIZED (
            SELECT id, sub, cell AS code FROM (
                SELECT id, sub, cell,
                       ROW_NUMBER() OVER (PARTITION BY id, sub
                                          ORDER BY dist ASC, cell ASC)
                           AS rn
                FROM pdf
            ) WHERE rn = 1
        )"""
    )
    return "".join(parts)


def _ivfpq_front() -> str:
    """Shared oracle front: corpus count -> integer-twin auto geometry
    (kk/npct, proven equal to auto_ivf_geometry by tests/test_ivf.py),
    grid rows qe, the unrolled coarse k-means (kdists/kassign/c2) and
    the residual PQ train + encode CTEs."""
    from youtube_etl_project_spark.plans.exact_kmeans import (
        kmeans_exact_ctes,
    )

    pows = ", ".join(f"({4 * 2**i})" for i in range(11))  # 4 .. 4096
    return f"""
        WITH cnt AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n FROM embeddings
        ), kk AS (
            SELECT COALESCE(MIN(p), 4096) AS k
            FROM (VALUES {pows}) pows(p), cnt
            WHERE CAST(p AS BIGINT) * p * 125 >= 4 * n
        ), npct AS (
            SELECT LEAST(k, 1 + (11 * (k - 1) + 20) // 21) AS np FROM kk
        ), qe AS MATERIALIZED (
            SELECT vec_id AS id, u.pos - 1 AS pos,
                   CAST(FLOOR(CAST(u.v AS DOUBLE) * 1000000 + 0.5)
                        AS BIGINT) AS q
            FROM embeddings e CROSS JOIN LATERAL (
                SELECT unnest(e.embedding) AS v,
                       generate_subscripts(e.embedding, 1) AS pos
            ) AS u
            WHERE e.embedding IS NOT NULL
        ){kmeans_exact_ctes("(SELECT k FROM kk)")}{_pq_residual_ctes()}"""


def _ivfpq_search_ctes() -> str:
    """Oracle CTEs for the search half (probes -> ADC -> exact-refined
    candidate scores ``refined(query_id, neighbor_id, dist_q)``) —
    shared by the capstone's final top-5 and the ANN->MMR composition
    (plans/diversify.embed_ann_mmr_diversify)."""
    return f"""
        probes AS MATERIALIZED (
            SELECT id AS query_id, cell FROM (
                SELECT id, cell,
                       ROW_NUMBER() OVER (PARTITION BY id
                                          ORDER BY dist ASC, cell ASC)
                           AS rn
                FROM kdists WHERE id < {_N_QUERIES}
            ) WHERE rn <= (SELECT np FROM npct)
        ), rqp AS (
            SELECT p.query_id, p.cell, qe.pos // {_DSUB} AS sub,
                   qe.pos % {_DSUB} AS spos, qe.q - c.cq AS rq
            FROM probes p
            JOIN qe ON qe.id = p.query_id
            JOIN c2 c ON c.cell = p.cell AND c.pos = qe.pos
        ), lut AS MATERIALIZED (
            SELECT r.query_id, r.cell, r.sub, b.cell AS code,
                   CAST(SUM((r.rq - b.cq) * (r.rq - b.cq)) AS BIGINT) AS d
            FROM rqp r JOIN p2 b ON b.sub = r.sub AND b.pos = r.spos
            GROUP BY 1, 2, 3, 4
        ), cand AS (
            SELECT p.query_id, a.id AS neighbor_id, p.cell
            FROM probes p JOIN kassign a ON a.cell = p.cell
            WHERE p.query_id <> a.id
        ), adc AS (
            SELECT c.query_id, c.neighbor_id,
                   CAST(SUM(l.d) AS BIGINT) AS adist_q
            FROM cand c
            JOIN penc e ON e.id = c.neighbor_id
            JOIN lut l ON l.query_id = c.query_id AND l.cell = c.cell
                      AND l.sub = e.sub AND l.code = e.code
            GROUP BY 1, 2
        ), rr AS (
            SELECT LEAST(n, GREATEST({_R_FLOOR}, n // {_R_DIV})) AS r
            FROM cnt
        ), shortlist AS MATERIALIZED (
            SELECT query_id, neighbor_id FROM (
                SELECT query_id, neighbor_id,
                       ROW_NUMBER() OVER (PARTITION BY query_id
                                          ORDER BY adist_q ASC,
                                                   neighbor_id ASC) AS rn
                FROM adc
            ) WHERE rn <= (SELECT r FROM rr)
        ), refined AS (
            SELECT s.query_id, s.neighbor_id,
                   CAST(SUM((qq.q - nq.q) * (qq.q - nq.q)) AS BIGINT)
                       AS dist_q
            FROM shortlist s
            JOIN qe qq ON qq.id = s.query_id
            JOIN qe nq ON nq.id = s.neighbor_id AND nq.pos = qq.pos
            GROUP BY 1, 2
        )"""


def _ivfpq_ann_oracle() -> str:
    return f"""{_ivfpq_front()},{_ivfpq_search_ctes()}
        SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rank, dist_q
        FROM (
            SELECT query_id, neighbor_id, dist_q,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY dist_q ASC,
                                               neighbor_id ASC) AS rnk
            FROM refined
        ) WHERE rnk <= {_TOPK}
    """


_IVFPQ_DOC = (
    "X3 capstone (round 8), ORACLE-CHECKED INCLUDING BOTH TRAINING "
        "LOOPS: IVF-PQ composed ANN — the FAISS IndexIVFPQ layout. An "
        "exact-grid coarse quantizer (auto (K, n_probe) geometry, the "
        "embed_ivf_ann model, memoized) partitions the corpus into "
        "cells; each vector's RESIDUAL against its centroid is product-"
        "quantized by a second exact-grid Lloyd trainer (residuals of "
        "int64 grid values are int64 — the whole second loop stays "
        "oracle-expressible); search probes n_probe cells per query, "
        "builds a per-(query, cell) exact-int LUT (m*k rows each), "
        "scores candidates by ADC (sum of per-sub LUT distances over "
        "their codes), then re-ranks the ADC top-R by EXACT grid "
        "distance (the FAISS refine stage; R = min(n, max(40, n//25)) "
        "as an integer rule in both engines — lifts recall@5 from the "
        "0.30/0.18 ADC-only floors to 0.74/0.70 at sf0.001/sf0.1, "
        "pinned by tests/test_ivfpq.py, full sweep in RECALL.md), "
    "top-5 by (dist_q asc, id). No Python stage; candidates are "
    "n_probe/K of the corpus per query, LUT and shortlist are "
    "broadcast-sized by construction"
)


def ivfpq_refined(
    spark: SparkSession, sf_dir: str
) -> "tuple[DataFrame, DataFrame]":
    """The capstone's search pipeline up to the exact-refined candidate
    scores: (refined(query_id, neighbor_id, dist_q), pinned grid rows
    qe(id, pos, q)). embed_ivfpq_ann takes the top-5; the ANN->MMR
    composition (plans/diversify) takes the top-20 as its shortlist."""
    from youtube_etl_project_spark.plans.exact_kmeans import (
        kmeans_dists_exact,
    )

    qe, cb, assign, qer, pqcb, n_probe, enc = _ivfpq_parts(spark, sf_dir)
    # parquet-metadata count (same driver-side action dedup_semantic
    # uses to size k — fine at any scale); feeds the integer R rule
    rerank = _refine_r(load_table(spark, sf_dir, "embeddings").count())
    wq = Window.partitionBy("id").orderBy(F.asc("dist"), F.asc("cell"))
    probes = (
        kmeans_dists_exact(qe.filter(F.col("id") < _N_QUERIES), cb)
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= n_probe)
        .select(F.col("id").alias("query_id"), "cell")
    )
    rqp = (
        probes.join(
            qe.filter(F.col("id") < _N_QUERIES).withColumnRenamed(
                "id", "query_id"
            ),
            "query_id",
        )
        .join(F.broadcast(cb), ["cell", "pos"])
        .select(
            "query_id",
            "cell",
            (F.col("pos") / _DSUB).cast("long").alias("sub"),
            (F.col("pos") % _DSUB).alias("spos"),
            (F.col("q") - F.col("cq")).alias("rq"),
        )
        .withColumnRenamed("spos", "pos")
    )
    d = F.col("rq") - F.col("cq")
    lut = (
        rqp.join(
            F.broadcast(pqcb.withColumnRenamed("cell", "code")),
            ["sub", "pos"],
        )
        .groupBy("query_id", "cell", "sub", "code")
        .agg(F.sum(d * d).cast("long").alias("d"))
    )
    cand = (
        probes.join(assign.withColumnRenamed("id", "neighbor_id"), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "cell")
    )
    adc = (
        cand.join(enc.withColumnRenamed("id", "neighbor_id"), "neighbor_id")
        .join(F.broadcast(lut), ["query_id", "cell", "sub", "code"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("d").cast("long").alias("adist_q"))
    )
    ws = Window.partitionBy("query_id").orderBy(
        F.asc("adist_q"), F.asc("neighbor_id")
    )
    shortlist = (
        adc.withColumn("rn", F.row_number().over(ws))
        .filter(F.col("rn") <= rerank)
        .select("query_id", "neighbor_id")
    )
    # Exact refine: re-score the constant-size ADC shortlist by the true
    # grid distance (R x dim rows per query — broadcast-joinable against
    # the component frame at any corpus size).
    qq = qe.select(F.col("id").alias("query_id"), "pos", F.col("q").alias("qq"))
    nq = qe.select(F.col("id").alias("neighbor_id"), "pos", F.col("q").alias("nq"))
    dd = F.col("qq") - F.col("nq")
    refined = (
        shortlist.join(qq, "query_id")
        .join(nq, ["neighbor_id", "pos"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum(dd * dd).cast("long").alias("dist_q"))
    )
    return refined, qe


@register("embed_ivfpq_ann", oracle=_ivfpq_ann_oracle(), doc=_IVFPQ_DOC)
def embed_ivfpq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    refined, _qe = ivfpq_refined(spark, sf_dir)
    wr = Window.partitionBy("query_id").orderBy(
        F.asc("dist_q"), F.asc("neighbor_id")
    )
    return (
        refined.withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= _TOPK)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rnk").cast("long").alias("rank"),
            "dist_q",
        )
    )


# Built persisted IVF-PQ indexes — like similarity_queries'
# _ivf_index_path, the registered query below is the "probe many" half
# of build-once/probe-many: repeated gate/bench runs probe the SAME
# materialized index instead of retraining per call. Cache validity +
# cleanup via operators.fixture_cache (ADVICE r10).


def _ivfpq_index_path(spark: SparkSession, sf_dir: str) -> str:
    from youtube_etl_project_spark.operators import ann_index, fixture_cache

    def _build(path: str) -> None:
        qe, cb, assign, qer, pqcb, n_probe, enc = _ivfpq_parts(
            spark, sf_dir
        )
        # raw row count INCLUDING null-embedding rows: the rerank rule's
        # oracle twin (cnt CTE) and the in-memory capstone both count raw
        # rows (ADVICE r9 — assign.count() would diverge under nulls)
        n_raw = load_table(spark, sf_dir, "embeddings").count()
        ann_index.ivfpq_build(
            assign, qe, _encode(qer, pqcb), cb, pqcb, n_probe, path,
            n_vectors=n_raw,
        )

    return fixture_cache.cached_build(
        "ivfpq_index_", sf_dir, _build, marker="codes"
    )


@register(
    "embed_ivfpq_index_ann",
    oracle=_ivfpq_ann_oracle(),
    doc="X3 serving path (round 9): the PERSISTED IVF-PQ index "
        "(operators/ann_index.ivfpq_build/ivfpq_query) — the build-once/"
        "probe-many twin of the embed_ivfpq_ann capstone. The trained "
        "coarse + residual-PQ codebooks persist as model-sized parquet; "
        "codes AND grid components persist PARTITIONED BY coarse cell, so "
        "a probe's ADC scan and its exact-refine scan both carry cell IN "
        "(probed) partition filters and physically read n_probe/K of the "
        "index files (every shortlisted neighbor lives in a probed cell "
        "by construction — the refine never leaves the pruned set; "
        "PartitionFilters asserted by tests/test_ivfpq.py). Because the "
        "whole model is exact-grid int64, the persisted probe is BIT-"
        "IDENTICAL to the in-memory capstone and shares its full DuckDB "
        "oracle INCLUDING both training loops — a stronger gate than the "
        "float embed_ivf_index_ann's result-equality pin",
)
def embed_ivfpq_index_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from youtube_etl_project_spark.operators import ann_index
    from youtube_etl_project_spark.plans.exact_kmeans import quantize_vectors

    path = _ivfpq_index_path(spark, sf_dir)
    n, n_probe = ann_index.ivfpq_meta(spark, path)
    emb = load_table(spark, sf_dir, "embeddings")
    queries_qe = quantize_vectors(
        emb.filter(F.col("vec_id") < _N_QUERIES), "vec_id", "embedding"
    )
    return ann_index.ivfpq_query(
        queries_qe, path, n_probe=n_probe, topk=_TOPK, rerank=_refine_r(n)
    )
