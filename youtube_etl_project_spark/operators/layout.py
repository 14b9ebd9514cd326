"""Data-layout operators: Z-order (Morton) clustering for multi-column
file skipping.

The 100 TB problem this solves: a table range-partitioned (or sorted) on
one column prunes scans on THAT column only — a predicate on a second
column touches every file. Interleaving the bits of both columns into one
Morton key and range-partitioning + sorting on it gives every file a
small min/max hyper-rectangle in BOTH dimensions, so engines that prune
on column statistics (parquet row-group stats; Delta/Iceberg file stats
— the lakehouse ``OPTIMIZE ZORDER BY`` feature this re-expresses) skip
most files for 2-d box predicates. Spark itself prunes parquet row
groups via pushed filters, so the benefit shows up without any table
format: `tests/test_layout.py` measures overlap fractions directly from
per-file min/max.

Everything here is pure column arithmetic (bit shifts/masks inside
whole-stage codegen) — no UDFs, no driver state; the write is one
range-shuffle, exactly what a sorted write costs anyway.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_key(a: Column | str, b: Column | str, bits: int = 10) -> Column:
    """Interleave the low ``bits`` bits of two non-negative integer
    columns into one Z-value: bit i of ``a`` lands at position 2i, bit i
    of ``b`` at 2i+1. Locality in (a, b) becomes locality in the key —
    the reason a range-partition on it yields tight per-file bounding
    boxes in both dimensions. Pure shift/mask expression: codegen-able,
    and spelled identically in ANSI SQL (see ``morton_sql``) so the
    oracle matches bit-for-bit."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    ca = ca.cast("long")
    cb = cb.cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(ca, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(cb, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def morton_sql(a: str, b: str, bits: int = 10) -> str:
    """The DuckDB/ANSI twin of ``morton_key`` — same term order, same
    left-fold addition, integer-exact on both engines."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    bits: int = 10,
    n_files: int = 16,
) -> None:
    """Write ``df`` as parquet clustered on the Z-order of (col_a, col_b):
    range-partition on the Morton key (one shuffle — the same cost as any
    sorted write), sort within partitions so parquet row-group stats are
    tight too, and drop the key before writing. ``n_files`` bounds output
    file count; at cluster scale pick it from target file size
    (~1 GB/file), not executor count."""
    keyed = df.withColumn("__z", morton_key(col_a, col_b, bits))
    (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_stats(df: DataFrame, cols: "list[str]") -> DataFrame:
    """Per-file min/max of ``cols`` — the statistics a lakehouse manifest
    (or parquet footer) would hold, computed here explicitly so layout
    quality is measurable without a table format. One aggregation grouped
    by ``input_file_name()``."""
    aggs = []
    for c in cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    return df.groupBy(F.input_file_name().alias("file")).agg(*aggs)


def overlap_fraction(
    stats: DataFrame, box: "dict[str, tuple[float, float]]"
) -> float:
    """Fraction of files whose min/max rectangle intersects the query
    box — the fraction a stats-pruning scan planner would have to read.
    Driver-side over the (small) per-file stats frame."""
    cond = F.lit(True)
    for c, (lo, hi) in box.items():
        cond = cond & (F.col(f"max_{c}") >= lo) & (F.col(f"min_{c}") <= hi)
    total = stats.count()
    return stats.filter(cond).count() / total if total else 0.0
