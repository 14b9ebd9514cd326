"""Chunker boundary pinning: stride/window arithmetic on constructed
token counts (shorter-than-window, exact-boundary, one-past-boundary),
plus reconstruction — stitching chunks at stride offsets reproduces the
original token stream exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from youtube_etl_project_spark.plans.sequences import _CHUNK, _STRIDE
from youtube_etl_project_spark.registry import load_all_plans


def _chunks_for(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    df.createOrReplaceTempView("__chunk_docs")
    # Reuse the registered plan's logic by replicating its expression over
    # the constructed frame (the plan itself is bound to the catalog).
    toks = df.select("doc_id", F.split("text", " ").alias("t"))
    return (
        toks.select(
            "doc_id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, cast(ceil(cast(greatest(size(t) - {_CHUNK}, 0) as double) / {_STRIDE}) as bigint)),"
                    f" s -> array_join(slice(t, 1 + s * {_STRIDE},"
                    f" least(s * {_STRIDE} + {_CHUNK}, size(t)) - s * {_STRIDE}), ' '))"
                )
            ).alias("chunk_idx", "chunk"),
        )
        .collect()
    )


def _mk(n):
    return " ".join(f"w{i}" for i in range(n))


def test_boundary_chunk_counts(spark):
    # (n_tokens, expected_chunks): short doc -> 1; exact window -> 1;
    # one past -> 2; exact second boundary (window + stride) -> 2.
    cases = {5: 1, _CHUNK: 1, _CHUNK + 1: 2, _CHUNK + _STRIDE: 2,
             _CHUNK + _STRIDE + 1: 3}
    rows = _chunks_for(spark, [_mk(n) for n in cases])
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, n in enumerate(cases):
        assert len(by_doc[doc_id]) == cases[n], (n, len(by_doc[doc_id]))


def test_chunks_reconstruct_original(spark):
    n = 3 * _CHUNK + 7
    rows = sorted(_chunks_for(spark, [_mk(n)]), key=lambda r: r["chunk_idx"])
    toks = _mk(n).split(" ")
    for r in rows:
        start = r["chunk_idx"] * _STRIDE
        want = toks[start : min(start + _CHUNK, n)]
        assert r["chunk"].split(" ") == want
    # Full coverage: last chunk reaches the final token.
    last = rows[-1]
    assert last["chunk"].split(" ")[-1] == toks[-1]


def test_registered_plan_covers_every_token(spark, sf_dir):
    fn = load_all_plans()["chunk_tokens_stride"].fn
    got = fn(spark, sf_dir)
    # Sum of NEW tokens per chunk (stride per non-final chunk, remainder
    # for the final one) must equal each doc's token count.
    per_doc = got.groupBy("doc_id").agg(
        F.max("chunk_idx").alias("mx"), F.sum("n_tokens").alias("s")
    )
    from youtube_etl_project_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n")
    )
    j = per_doc.join(docs, "doc_id").collect()
    for r in j:
        overlap = (_CHUNK - _STRIDE) * r["mx"]
        assert r["s"] - overlap == r["n"], r
