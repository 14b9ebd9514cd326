"""Measure suffix-rank dedup cost AGAINST SPAN LENGTH L (VERDICT r10
#3: the O(N·log L) claim demonstrated, not asserted).

For each L, times end-to-end (noop write):
* the prefix-doubling plan (plans/suffix_dedup._spans_df) — log2(L)
  rounds of integer rank rows, O(N·log L) rows total;
* the windowed ground-truth plan (dedup_exact_substring's shape:
  materialize every L-token window as TEXT and group) — O(N·L)
  characters shuffled.

Usage:  python tools/suffix_scaling.py [sf_dir] [L ...]
Prints markdown rows for SCALE.md. Best-of-2 per cell; run on a quiet
host (timing artifact).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
LS = [int(a) for a in sys.argv[2:]] or [16, 32, 64, 128]


def windowed_spans(spark, sf_dir: str, L: int):
    """The O(N·L) ground-truth plan (dedup_exact_substring's shape)."""
    from youtube_etl_project_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split("text", " ").alias("t")).filter(
        F.size("t") >= L
    )
    spans = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(t) - {L} + 1),"
                f" i -> array_join(slice(t, i, {L}), ' '))"
            )
        ).alias("span"),
    )
    return (
        spans.groupBy("span")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_occ"),
        )
        .filter(F.col("n_docs") > 1)
    )




def _shuffle_write_bytes(spark) -> int:
    """Total shuffle WRITE bytes across all completed stages so far —
    read from the live UI REST API. Wall time on local[32] has zero
    network cost, so byte volume is the honest 100 TB proxy: a cluster
    pays for every shuffled byte cross-rack."""
    import json as _json
    import urllib.request

    sc = spark.sparkContext
    url = (f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}"
           f"/stages?status=complete")
    with urllib.request.urlopen(url) as r:
        stages = _json.load(r)
    return sum(st.get("shuffleWriteBytes", 0) for st in stages)


def main() -> None:
    from youtube_etl_project_spark.plans import suffix_dedup
    from youtube_etl_project_spark.session import get_spark

    spark = get_spark("suffix-scaling")
    spark.sparkContext.setLogLevel("ERROR")

    def timed(mk) -> tuple[float, int]:
        best, n = float("inf"), -1
        for _ in range(2):
            t0 = time.time()
            df = mk()
            n = df.count()
            best = min(best, time.time() - t0)
        return best, n

    print(f"| L | suffix-rank s | windowed s | dup groups | ({SF}) |")
    print("|---|---|---|---|---|")
    for L in LS:
        s_sec, s_n = timed(lambda: suffix_dedup._spans_df(spark, SF, L))
        w_sec, w_n = timed(lambda: windowed_spans(spark, SF, L))
        assert s_n == w_n, (L, s_n, w_n)
        print(
            f"| {L} | {s_sec:.1f} | {w_sec:.1f} | {s_n} |  |",
            flush=True,
        )


if __name__ == "__main__" and not os.environ.get("SUFFIX_LONGDOCS"):
    main()


def longdoc_fixture(spark, sf_dir: str, repeat: int, out: str) -> None:
    """Long-boilerplate corpus: each document's text repeated
    ``repeat``× (space-joined) — token counts grow ``repeat``×, so the
    windowed plan's O(N·L) span-text shuffle grows with BOTH knobs
    while the suffix path still moves O(N·log L) integer rows. This is
    the regime the module exists for (Lee et al. long-boilerplate
    corpora); the stock fixtures' ~100-token docs never leave the
    constant-dominated regime."""
    from youtube_etl_project_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    long_docs = docs.select(
        "doc_id",
        F.array_join(
            F.array_repeat(F.col("text"), repeat), " "
        ).alias("text"),
    )
    long_docs.write.mode("overwrite").parquet(f"{out}/documents.parquet")


def main_longdocs() -> None:
    from youtube_etl_project_spark.plans import suffix_dedup
    from youtube_etl_project_spark.session import get_spark

    import tempfile

    repeat = int(os.environ.get("SUFFIX_REPEAT", "16"))
    # the repo session disables the UI; this tool needs the status REST
    # API for shuffle-byte readings — pre-set the conf so get_spark's
    # getOrCreate binds a UI-enabled context
    from pyspark.sql import SparkSession

    SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    ).config("spark.ui.enabled", "true").appName(
        "suffix-scaling-long"
    ).getOrCreate()
    spark = get_spark("suffix-scaling-long")
    assert spark.sparkContext.uiWebUrl, "UI must be up for byte readings"
    spark.sparkContext.setLogLevel("ERROR")
    out = tempfile.mkdtemp(prefix="longdocs_")
    longdoc_fixture(spark, SF, repeat, out)

    def timed(mk) -> tuple[float, int, float]:
        best, n = float("inf"), -1
        b0 = _shuffle_write_bytes(spark)
        for _ in range(2):
            t0 = time.time()
            n = mk().count()
            best = min(best, time.time() - t0)
        mb = (_shuffle_write_bytes(spark) - b0) / 2 / 1e6  # per run
        return best, n, mb

    print(f"| L | suffix s | suffix shuffle MB | windowed s "
          f"| windowed shuffle MB | dup groups | ({SF} ×{repeat}) |")
    print("|---|---|---|---|---|---|---|")
    for L in LS:
        s_sec, s_n, s_mb = timed(
            lambda: suffix_dedup._spans_df(spark, out, L)
        )
        w_sec, w_n, w_mb = timed(lambda: windowed_spans(spark, out, L))
        assert s_n == w_n, (L, s_n, w_n)
        print(f"| {L} | {s_sec:.1f} | {s_mb:.0f} | {w_sec:.1f} "
              f"| {w_mb:.0f} | {s_n} |  |", flush=True)


if __name__ == "__main__" and os.environ.get("SUFFIX_LONGDOCS"):
    main_longdocs()
    sys.exit(0)
