"""S10 warehouse connector: a REAL DataFrameWriter.jdbc round trip into
embedded Derby (the JDBC driver Spark already bundles for its Hive
metastore) — write an aggregate, read it back, value-compare. Reference
analog: src/snowflake_loader.py's staging/fact loads."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from youtube_etl_project_spark.sources import load_table
from youtube_etl_project_spark.sources.jdbc_sink import (
    derby_url,
    read_jdbc,
    write_jdbc,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def db(tmp_path_factory):
    return derby_url(str(tmp_path_factory.mktemp("warehouse") / "db"))


def _daily_agg(spark):
    orders = load_table(spark, SF, "orders")
    return (
        orders.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
            .cast("double")
            .alias("revenue"),
        )
    )


def test_jdbc_write_read_roundtrip(spark, db):
    agg = _daily_agg(spark)
    write_jdbc(agg, db, "daily_agg", max_connections=2)
    back = read_jdbc(spark, db, "daily_agg")
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, agg.collect())
    )


def test_jdbc_overwrite_is_idempotent(spark, db):
    """The reference re-runs a day's load after truncating staging
    (src/snowflake_loader.py:171-176); mode=overwrite is the JDBC
    equivalent — a double write must not double the rows."""
    agg = _daily_agg(spark)
    write_jdbc(agg, db, "daily_agg_idem")
    write_jdbc(agg, db, "daily_agg_idem")
    assert read_jdbc(spark, db, "daily_agg_idem").count() == agg.count()


def test_jdbc_predicate_partitioned_readback(spark, db):
    """predicates=... turns the read-back into pruned parallel queries —
    one JDBC partition per predicate, union == full table."""
    agg = _daily_agg(spark)
    write_jdbc(agg, db, "daily_agg_pred")
    # Spark creates the Derby table with quoted (case-exact) identifiers,
    # so predicates must quote them too
    preds = ['"n_orders" >= 120', '"n_orders" < 120']
    back = read_jdbc(spark, db, "daily_agg_pred", predicates=preds)
    assert back.rdd.getNumPartitions() == 2
    assert back.count() == agg.count()
