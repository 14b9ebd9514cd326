"""Every registered oracle must at least PLAN in DuckDB against the
fixture views — a seconds-fast syntax/binding gate, so an oracle edit
that breaks SQL (reserved word, renamed CTE, bad cast) fails here
instead of minutes into the full hash gate."""

from __future__ import annotations

import os

import duckdb
import pytest

from youtube_etl_project_spark.registry import load_all_plans

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()
SF = os.environ.get("SPARK_GRAFT_PARSE_SF", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF),
    reason=f"fixture dir {SF} not present on this machine",
)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM read_parquet('{SF}/{t}.parquet')"
        )
    return c


def test_all_oracles_plan_in_duckdb(con):
    bad = []
    for name, spec in load_all_plans().items():
        if spec.oracle is None:
            continue
        try:
            con.execute(f"EXPLAIN {spec.oracle}")
        except Exception as e:  # noqa: BLE001 - collect every failure
            bad.append((name, str(e).splitlines()[0][:120]))
    assert not bad, f"oracles that fail to plan: {bad}"
