"""SCD2 upsert semantics (operators/upsert.py::scd2_upsert): history
preservation, idempotence, and version chaining — the invariants the
oracle query (scd2_upsert_customers) can't see across multiple applies."""

from __future__ import annotations

from datetime import date

from pyspark.sql import functions as F

from youtube_etl_project_spark.operators.upsert import scd2_upsert

COLS = ["id", "val", "valid_from", "valid_to"]


def _target(spark):
    return spark.createDataFrame(
        [
            (1, "a", date(2000, 1, 1), None),
            (2, "b", date(2000, 1, 1), None),
            # key 3 already has history: one closed + one current version
            (3, "c0", date(1999, 1, 1), date(2000, 1, 1)),
            (3, "c1", date(2000, 1, 1), None),
        ],
        "id int, val string, valid_from date, valid_to date",
    )


def _source(spark, rows):
    return spark.createDataFrame(rows, "id int, val string, eff date")


def _apply(spark, target, rows):
    return scd2_upsert(
        target,
        _source(spark, rows),
        keys=["id"],
        attrs=["val"],
        effective="eff",
    )


def test_change_closes_and_inserts(spark):
    out = _apply(
        spark, _target(spark), [(1, "a2", date(2001, 6, 1))]
    )
    rows = {(r["id"], r["val"]): r for r in out.collect()}
    assert len(rows) == 5
    assert rows[(1, "a")]["valid_to"] == date(2001, 6, 1)  # closed
    assert rows[(1, "a2")]["valid_from"] == date(2001, 6, 1)
    assert rows[(1, "a2")]["valid_to"] is None  # new current
    assert rows[(2, "b")]["valid_to"] is None  # untouched
    assert rows[(3, "c0")]["valid_to"] == date(2000, 1, 1)  # history kept
    assert rows[(3, "c1")]["valid_to"] is None


def test_unchanged_source_is_idempotent(spark):
    target = _target(spark)
    once = _apply(spark, target, [(1, "a2", date(2001, 6, 1))])
    twice = _apply(spark, once, [(1, "a2", date(2001, 6, 1))])
    a = sorted(tuple(r) for r in once.select(*COLS).collect())
    b = sorted(tuple(r) for r in twice.select(*COLS).collect())
    assert a == b


def test_version_chain_over_two_changes(spark):
    target = _target(spark)
    v1 = _apply(spark, target, [(2, "b2", date(2001, 1, 1))])
    v2 = _apply(spark, v1, [(2, "b3", date(2002, 1, 1))])
    chain = sorted(
        (
            (r["val"], r["valid_from"], r["valid_to"])
            for r in v2.filter(F.col("id") == 2).collect()
        ),
        key=lambda r: r[1],
    )
    assert chain == [
        ("b", date(2000, 1, 1), date(2001, 1, 1)),
        ("b2", date(2001, 1, 1), date(2002, 1, 1)),
        ("b3", date(2002, 1, 1), None),
    ]


def test_new_key_inserts_current(spark):
    out = _apply(spark, _target(spark), [(9, "z", date(2001, 1, 1))])
    row = out.filter(F.col("id") == 9).collect()
    assert len(row) == 1
    assert row[0]["valid_from"] == date(2001, 1, 1)
    assert row[0]["valid_to"] is None


# -- property: random change streams agree with a pure-Python SCD2 model ----

from hypothesis import given, settings, strategies as st  # noqa: E402

_KEYS = st.integers(min_value=1, max_value=3)
_VALS = st.sampled_from(["a", "b", "c"])
# a batch = one row per key (SCD2's pre-deduped-source contract)
_BATCH = st.dictionaries(_KEYS, _VALS, min_size=1, max_size=3)


def _model_apply(table, batch, eff):
    """Pure-Python SCD2: table = {key: [(val, from, to), ...]}."""
    for k, v in batch.items():
        versions = table.setdefault(k, [])
        current = next((i for i, r in enumerate(versions) if r[2] is None), None)
        if current is None:
            versions.append((v, eff, None))
        elif versions[current][0] != v:
            cv, cf, _ = versions[current]
            versions[current] = (cv, cf, eff)
            versions.append((v, eff, None))


@settings(max_examples=10, deadline=None)
@given(st.lists(_BATCH, min_size=1, max_size=3))
def test_scd2_agrees_with_python_model(batches):
    import tests.conftest as _c  # session fixture not injectable under @given
    from youtube_etl_project_spark.session import get_spark

    spark = get_spark("tests", shuffle_partitions=8)
    sdf = spark.createDataFrame(
        [], "id int, val string, valid_from date, valid_to date"
    )
    model: dict = {}
    for i, batch in enumerate(batches):
        eff = date(2001, 1, 1 + i)  # strictly increasing effective dates
        sdf = _apply(spark, sdf, [(k, v, eff) for k, v in batch.items()])
        # localCheckpoint: chained full-outer joins otherwise re-execute
        # the whole lineage per iteration (the operators/graph.py rule)
        sdf = sdf.localCheckpoint(eager=True)
        _model_apply(model, batch, eff)
    got = sorted(
        (r["id"], r["val"], r["valid_from"], r["valid_to"])
        for r in sdf.collect()
    )
    want = sorted(
        (k, v, f, t) for k, vs in model.items() for (v, f, t) in vs
    )
    assert got == want
