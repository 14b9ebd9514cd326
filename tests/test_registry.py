"""Driver-contract invariants: every query runs at sf0.001 with a stable
schema; oracle keys ⊆ query keys; entry() returns rows."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod


def test_oracle_keys_subset_of_queries():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 40


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_runs_and_schema_stable(spark, sf_dir, name):
    fn = entrymod.queries()[name]
    df = fn(spark, sf_dir)
    schema1 = df.schema.simpleString()
    assert df.count() >= 0
    df2 = fn(spark, sf_dir)
    assert df2.schema.simpleString() == schema1
