"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash). Queries live in ``youtube_etl_project_spark/plans/*`` and
register themselves into a single registry that keeps each Spark plan and
its DuckDB oracle SQL side by side.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from youtube_etl_project_spark.registry import load_all_plans  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (reference A1/J1 daily aggregate re-expressed on the
    star schema) on /root/testdata/sf0.001; driver checks rows>0."""
    from youtube_etl_project_spark.plans.relational import flagship_df

    return flagship_df(spark, SF_SMOKE)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in load_all_plans().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twins; entries without SQL-expressible semantics
    (hash-seeded LSH, approx sketches) are omitted → rows-only check."""
    return {
        name: spec.oracle
        for name, spec in load_all_plans().items()
        if spec.oracle is not None
    }
