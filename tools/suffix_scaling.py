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


if __name__ == "__main__":
    main()
