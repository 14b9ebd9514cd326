"""Streaming incremental dedup: two availableNow drains over arriving
document files must leave the corpus near-dup-free at the operator's own
threshold, never reprocess a file (exactly-once via checkpoint), and
keep the index in lockstep with the corpus."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from youtube_etl_project_spark.operators import dedup
from youtube_etl_project_spark.sources import load_table
from youtube_etl_project_spark.streaming.pipeline import (
    streaming_incremental_dedup,
)

PARAMS = dict(shingle_k=3, n_hashes=32, n_bands=8, threshold=0.5)


def test_streaming_incremental_dedup(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    h = F.substring(
        F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 1
    )
    seed = docs.filter(h < "8")
    wave1 = docs.filter((h >= "8") & (h < "c"))
    wave2 = docs.filter(h >= "c")
    assert wave1.count() > 0 and wave2.count() > 0

    src = str(tmp_path / "src")
    idx = str(tmp_path / "idx")
    out = str(tmp_path / "corpus")
    chk = str(tmp_path / "chk")
    os.makedirs(src)

    # day 0: seed corpus + its index
    seed.write.parquet(out)
    dedup.lsh_index(
        seed, "doc_id", "text", PARAMS["shingle_k"], PARAMS["n_hashes"]
    ).write.parquet(idx)

    schema = docs.schema

    def drain(wave, name):
        if wave is not None:
            wave.coalesce(1).write.parquet(os.path.join(src, name))
        q = streaming_incremental_dedup(
            spark, src, schema, idx, out, chk, **PARAMS
        )
        q.awaitTermination()

    drain(wave1, "wave1")
    n_after_1 = spark.read.parquet(out).count()
    drain(wave2, "wave2")
    n_after_2 = spark.read.parquet(out).count()
    assert n_after_2 >= n_after_1

    # exactly-once: draining with no new files changes nothing
    drain(None, "")
    assert spark.read.parquet(out).count() == n_after_2

    final = spark.read.parquet(out)
    # every survivor appears once, and the index mirrors the corpus
    assert final.select("doc_id").distinct().count() == final.count()
    assert spark.read.parquet(idx).count() == final.count()
    # no surviving pair touches a streamed doc — the stream dedups
    # arrivals against everything already present; pairs internal to the
    # (never-deduplicated) seed corpus are out of scope by design
    seed_ids = {r.doc_id for r in seed.select("doc_id").collect()}
    leftover = dedup.minhash_lsh_pairs(
        final, "doc_id", "text", **PARAMS
    ).collect()
    assert all(
        r.id_a in seed_ids and r.id_b in seed_ids for r in leftover
    )
    # and something was actually dropped across the waves (the fixture
    # has near-dups by construction)
    assert n_after_2 < docs.count()
