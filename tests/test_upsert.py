"""Mutable-table layer tests: merge join-rewrites, atomic version swap,
partition overwrite, truncate."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from youtube_etl_project_spark.operators.upsert import (
    ParquetTable,
    insert_only_merge,
    merge_upsert,
    overwrite_partitions,
)


def test_merge_upsert_source_wins(spark):
    target = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "k int, name string, v int"
    )
    source = spark.createDataFrame(
        [(2, "B", 99), (3, "c", 30)], "k int, name string, v int"
    )
    out = {r.k: (r.name, r.v) for r in merge_upsert(target, source, ["k"]).collect()}
    assert out == {1: ("a", 10), 2: ("B", 99), 3: ("c", 30)}


def test_insert_only_merge_keeps_target(spark):
    target = spark.createDataFrame([(1, 10), (2, 20)], "k int, v int")
    source = spark.createDataFrame([(2, 999), (3, 30), (3, 31)], "k int, v int")
    out = {r.k: r.v for r in insert_only_merge(target, source, ["k"]).collect()}
    assert out[1] == 10 and out[2] == 20  # immutable
    assert out[3] in (30, 31)  # new key inserted once (source deduped)
    assert insert_only_merge(target, source, ["k"]).count() == 3


def test_parquet_table_atomic_swap_and_truncate(spark, tmp_path):
    t = ParquetTable(spark, str(tmp_path / "t"))
    assert not t.exists()
    t.write(spark.range(5).withColumn("x", F.lit("a")))
    assert t.read().count() == 5
    v1 = t.current_path()
    t.write(spark.range(3).withColumn("x", F.lit("b")))
    assert t.read().count() == 3
    assert t.current_path() != v1  # new version, old dir gone
    t.truncate()
    assert t.read().count() == 0
    assert t.read().columns == ["id", "x"]  # schema preserved


def test_overwrite_partitions_replaces_only_named(spark, tmp_path):
    t = ParquetTable(spark, str(tmp_path / "agg"))
    t.write(
        spark.createDataFrame(
            [("2024-01-01", "US", 1), ("2024-01-02", "US", 2)],
            "d string, r string, n int",
        )
    )
    fresh = spark.createDataFrame([("2024-01-02", "GB", 99)], "d string, r string, n int")
    overwrite_partitions(t, fresh, "d")
    rows = sorted(map(tuple, t.read().collect()))
    assert rows == [("2024-01-01", "US", 1), ("2024-01-02", "GB", 99)]


def test_crash_between_write_and_swap(spark, tmp_path, monkeypatch):
    """Kill the writer after the data write but before the pointer swap:
    readers must still see the old version, a re-run must converge, and
    vacuum must reclaim the orphaned directory."""
    import os

    from youtube_etl_project_spark.operators import upsert as upsert_mod

    t = ParquetTable(spark, str(tmp_path / "tbl"))
    t.write(spark.createDataFrame([(1, "old")], "k int, v string"))
    committed = t.current_path()

    real_replace = os.replace

    def crash_on_commit(src, dst, *a, **kw):
        if dst.endswith("_CURRENT"):
            raise OSError("simulated crash before pointer swap")
        return real_replace(src, dst, *a, **kw)

    monkeypatch.setattr(upsert_mod.os, "replace", crash_on_commit)
    try:
        t.write(spark.createDataFrame([(2, "new")], "k int, v string"))
        raise AssertionError("write should have crashed at the swap")
    except OSError:
        pass
    monkeypatch.undo()

    # pointer untouched -> readers see the old committed version
    assert t.current_path() == committed
    assert [(r.k, r.v) for r in t.read().collect()] == [(1, "old")]
    # the crashed write left a full-but-uncommitted version dir
    orphans = [
        d for d in os.listdir(t.root)
        if d.startswith("v_")
        and os.path.join(t.root, d) != committed
    ]
    assert len(orphans) == 1

    # re-run converges
    t.write(spark.createDataFrame([(2, "new")], "k int, v string"))
    assert [(r.k, r.v) for r in t.read().collect()] == [(2, "new")]

    # vacuum reclaims every non-current dir (the orphan; the pre-crash
    # version was already GC'd inline by the successful write)
    t.vacuum()
    left = [d for d in os.listdir(t.root) if d.startswith("v_")]
    assert os.path.join(t.root, left[0]) == t.current_path()
    assert len(left) == 1
    assert [(r.k, r.v) for r in t.read().collect()] == [(2, "new")]


def test_time_travel_reads_previous_versions(spark, tmp_path):
    t = ParquetTable(spark, str(tmp_path / "tt"), keep_versions=3)
    for i in range(4):
        t.write(spark.range(i, i + 10).toDF("id"))
    # current + two back retained; three back pruned
    assert t.read_version(0).agg({"id": "min"}).collect()[0][0] == 3
    assert t.read_version(1).agg({"id": "min"}).collect()[0][0] == 2
    assert t.read_version(2).agg({"id": "min"}).collect()[0][0] == 1
    assert len(t.history()) == 3
    import pytest as _pytest

    with _pytest.raises(ValueError):
        t.read_version(3)


def test_default_retention_keeps_only_current(spark, tmp_path):
    t = ParquetTable(spark, str(tmp_path / "one"))
    t.write(spark.range(5).toDF("id"))
    t.write(spark.range(7).toDF("id"))
    assert len(t.history()) == 1
    assert t.read().count() == 7
    import os

    dirs = [d for d in os.listdir(t.root) if d.startswith("v_")]
    assert len(dirs) == 1  # old version pruned eagerly


def test_vacuum_respects_retention(spark, tmp_path):
    import os

    t = ParquetTable(spark, str(tmp_path / "vr"), keep_versions=2)
    t.write(spark.range(1).toDF("id"))
    t.write(spark.range(2).toDF("id"))
    # orphan dir (simulated crashed writer) must go; history must stay
    os.makedirs(os.path.join(t.root, "v_orphan"))
    t.vacuum()
    assert not os.path.exists(os.path.join(t.root, "v_orphan"))
    assert len(t.history()) == 2
    assert t.read_version(1).count() == 1


def test_history_recovers_pre_log_table(spark, tmp_path):
    """A table committed by pre-_LOG code (pointer exists, no log file):
    history()/read_version(0) must serve the pointer's version, and the
    next write must prune it under the retention policy (ADVICE r2)."""
    import os

    t = ParquetTable(spark, str(tmp_path / "legacy"))
    t.write(spark.range(5).toDF("id"))
    os.remove(t._log)  # simulate a pre-_LOG commit

    assert t.history() == [os.path.basename(t.current_path())]
    assert t.read_version(0).count() == 5
    old_dir = t.current_path()
    t.write(spark.range(3).toDF("id"))  # retention must reclaim old dir
    assert not os.path.exists(old_dir)
    assert t.read().count() == 3


def test_history_recovers_crash_between_swap_and_log(spark, tmp_path):
    """Crash window of the swap-then-log protocol: pointer moved, log
    append lost. The pointer is the newest commit; logged predecessors
    stay as history."""
    import os

    t = ParquetTable(spark, str(tmp_path / "cw"), keep_versions=3)
    t.write(spark.range(1).toDF("id"))
    t.write(spark.range(2).toDF("id"))
    # strip the newest entry from the log = crashed before the append
    with open(t._log) as f:
        entries = [ln for ln in f.read().splitlines() if ln]
    cur_name = os.path.basename(t.current_path())
    assert entries[-1] == cur_name
    with open(t._log, "w") as f:
        f.write("\n".join(entries[:-1]) + "\n")

    hist = t.history()
    assert hist[0] == cur_name and len(hist) == 2
    assert t.read_version(0).count() == 2
    assert t.read_version(1).count() == 1


def test_history_trims_legacy_orphan_tail(spark, tmp_path):
    """Log entries after the pointer's entry (a pre-swap-then-log writer
    crashed between its log append and its pointer swap) are uncommitted
    orphans and must not be served as history."""
    t = ParquetTable(spark, str(tmp_path / "ot"), keep_versions=3)
    t.write(spark.range(1).toDF("id"))
    with open(t._log, "a") as f:
        f.write("v_deadbeef0000\n")  # orphan tail entry, no dir, no pointer
    import os

    assert t.history() == [os.path.basename(t.current_path())]
    assert t.read_version(0).count() == 1


def test_delete_where(spark, tmp_path):
    """DELETE semantics: TRUE rows go, FALSE and NULL rows stay, the
    delete is a real commit (history grows, time travel sees pre-state),
    and a no-match delete commits nothing."""
    from pyspark.sql import functions as F

    t = ParquetTable(spark, str(tmp_path / "dw"), keep_versions=3)
    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 30)], "id long, v long"
    )
    t.write(df)

    # NULL predicate rows survive
    assert t.delete_where(F.col("v") > 15) == 1
    assert sorted(r["id"] for r in t.read().collect()) == [1, 2]

    # string conditions work; time travel still sees the pre-delete rows
    assert t.delete_where("id = 1") == 1
    assert t.read_version(2).count() == 3
    assert t.read_version(1).count() == 2
    assert [r["id"] for r in t.read().collect()] == [2]

    # no matching rows -> zero removed, no new version committed
    depth = len(t.history())
    assert t.delete_where("id = 99") == 0
    assert len(t.history()) == depth


def test_concurrent_writer_loses_cleanly(spark, tmp_path):
    """Two interleaved writers: exactly one commits, the loser raises
    ConcurrentWriteError, its version directory is discarded, and the
    table serves the winner's data uncorrupted (VERDICT r4 #6)."""
    import pytest

    from youtube_etl_project_spark.operators.upsert import (
        ConcurrentWriteError,
    )

    t = ParquetTable(spark, str(tmp_path / "race"), keep_versions=3)
    t.write(spark.createDataFrame([(1, "base")], "id long, v string"))

    # writer A starts: snapshots its CAS base and writes its data dir
    base_a = t._pointer_version()
    prior_a = t.history()
    v_a = "v_writer_a_dir"
    spark.createDataFrame([(2, "a")], "id long, v string").write.parquet(
        os.path.join(t.root, v_a)
    )

    # writer B commits in between (a full, normal write)
    t.write(spark.createDataFrame([(3, "b")], "id long, v string"))
    winner = t._pointer_version()

    # writer A's commit must detect the moved pointer and fail cleanly
    with pytest.raises(ConcurrentWriteError, match="advanced"):
        t._commit(v_a, base_a, prior_a)

    assert t._pointer_version() == winner  # pointer untouched by loser
    assert [r["v"] for r in t.read().collect()] == ["b"]
    assert not os.path.exists(os.path.join(t.root, v_a))  # orphan gone
    assert not os.path.exists(t._lock)  # lock released


def test_concurrent_writer_force_overwrites(spark, tmp_path):
    """force=True opts a blind overwrite out of the CAS (it genuinely
    doesn't care what it replaces)."""
    t = ParquetTable(spark, str(tmp_path / "force"))
    t.write(spark.createDataFrame([(1, "x")], "id long, v string"))
    base_a = t._pointer_version()
    prior_a = t.history()
    v_a = "v_forced_dir"
    spark.createDataFrame([(2, "forced")], "id long, v string").write.parquet(
        os.path.join(t.root, v_a)
    )
    t.write(spark.createDataFrame([(3, "mid")], "id long, v string"))
    t._commit(v_a, base_a, prior_a, force=True)
    assert [r["v"] for r in t.read().collect()] == ["forced"]


def test_commit_lock_contention_and_staleness(spark, tmp_path):
    """A live competitor's lock blocks until timeout; a dead writer's
    stale lock is stolen."""
    import pytest

    from youtube_etl_project_spark.operators.upsert import (
        ConcurrentWriteError,
    )

    t = ParquetTable(spark, str(tmp_path / "lock"))
    df = spark.createDataFrame([(1, "x")], "id long, v string")

    # fresh (live) foreign lock -> the writer times out cleanly
    t.lock_timeout_sec = 0.3
    with open(t._lock, "w"):
        pass
    with pytest.raises(ConcurrentWriteError, match="commit lock"):
        t.write(df)
    os.unlink(t._lock)

    # stale lock (dead writer) -> stolen, write proceeds
    with open(t._lock, "w"):
        pass
    old = time.time() - 3600
    os.utime(t._lock, (old, old))
    t.write(df)
    assert t.read().count() == 1
    assert not os.path.exists(t._lock)


def test_stale_lock_steal_is_atomic_across_waiters(spark, tmp_path):
    """Two waiters racing a stale lock: the rename-based steal admits
    exactly one at a time (round-5 advice: check-then-unlink let waiter B
    remove waiter A's FRESH lock and put both inside the section)."""
    import threading

    root = str(tmp_path / "atomic_steal")
    os.makedirs(root, exist_ok=True)
    # a dead writer's stale lock both waiters will try to steal
    lock = os.path.join(root, "_LOCK")
    with open(lock, "w"):
        pass
    old = time.time() - 3600
    os.utime(lock, (old, old))

    busy, max_busy, errs = [0], [0], []
    gate = threading.Barrier(2)

    def worker():
        t = ParquetTable(spark, root)
        t.lock_stale_sec = 0.01
        t.lock_timeout_sec = 5.0
        gate.wait(5)
        try:
            with t._commit_lock():
                busy[0] += 1
                max_busy[0] = max(max_busy[0], busy[0])
                time.sleep(0.05)
                busy[0] -= 1
        except Exception as e:  # noqa: BLE001 — collected for the assert
            errs.append(e)

    threads = [threading.Thread(target=worker) for _ in range(2)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(10)
    assert not errs
    assert max_busy[0] == 1  # never two writers inside the section
    assert not os.path.exists(lock)


def test_release_after_steal_leaves_stealers_lock(spark, tmp_path):
    """A holder paused past lock_stale_sec whose lock was stolen must not
    unlink the stealer's fresh lock on release (token check)."""
    import threading

    root = str(tmp_path / "steal_release")
    holder = ParquetTable(spark, root)
    stealer = ParquetTable(spark, root)
    holder.lock_stale_sec = stealer.lock_stale_sec = 0.05

    entered = threading.Event()
    release = threading.Event()
    done = []

    def hold():
        with holder._commit_lock():
            entered.set()
            release.wait(5)  # simulate a GC/SIGSTOP pause past staleness
        done.append(True)

    th = threading.Thread(target=hold)
    th.start()
    entered.wait(5)
    time.sleep(0.1)  # age the holder's lock past lock_stale_sec
    with stealer._commit_lock():  # steals the "stale" lock
        release.set()
        th.join(5)
        assert done  # holder released without error...
        assert os.path.exists(stealer._lock)  # ...and left OUR lock alone
        assert stealer._lock_is_mine()
    assert not os.path.exists(stealer._lock)


def test_paused_writer_aborts_after_lock_stolen(spark, tmp_path):
    """A writer that re-acquires consciousness after its lock was stolen
    must abort the commit (ConcurrentWriteError), not double-swap."""
    import pytest

    from youtube_etl_project_spark.operators.upsert import (
        ConcurrentWriteError,
    )

    t = ParquetTable(spark, str(tmp_path / "paused"))
    t.write(spark.createDataFrame([(1, "base")], "id long, v string"))
    base = t._pointer_version()
    prior = t.history()
    v_a = "v_paused_dir"
    spark.createDataFrame([(2, "late")], "id long, v string").write.parquet(
        os.path.join(t.root, v_a)
    )

    real_pv = ParquetTable._pointer_version

    def steal_mid_commit(self):
        # simulate a competitor stealing the lock between acquisition and
        # the pointer swap (i.e. while this writer was stalled)
        with open(self._lock, "w") as f:
            f.write("someone-elses-token")
        return real_pv(self)

    t._pointer_version = steal_mid_commit.__get__(t)
    with pytest.raises(ConcurrentWriteError, match="stolen"):
        t._commit(v_a, base, prior)
    t._pointer_version = real_pv.__get__(t)

    assert t._pointer_version() == base  # pointer untouched
    assert not os.path.exists(os.path.join(t.root, v_a))  # version discarded


def test_force_overwrite_prunes_interleaved_competitor(spark, tmp_path):
    """force=True with an interleaved competitor commit must include the
    superseded competitor version in the retention sweep (round-5 advice:
    the stale pre-write history snapshot leaked its data dir forever)."""
    t = ParquetTable(spark, str(tmp_path / "forceleak"))  # keep_versions=1
    t.write(spark.createDataFrame([(1, "x")], "id long, v string"))
    base = t._pointer_version()
    prior = t.history()
    v_a = "v_forced_dir"
    spark.createDataFrame([(2, "forced")], "id long, v string").write.parquet(
        os.path.join(t.root, v_a)
    )
    t.write(spark.createDataFrame([(3, "mid")], "id long, v string"))
    mid_dir = t.current_path()
    t._commit(v_a, base, prior, force=True)
    assert [r["v"] for r in t.read().collect()] == ["forced"]
    assert not os.path.exists(mid_dir)  # superseded competitor pruned
    vdirs = [d for d in os.listdir(t.root) if d.startswith("v_")]
    assert vdirs == [v_a]
