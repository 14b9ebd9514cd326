"""operators/fixture_cache: content-fingerprint keying (ADVICE r10 —
a fixture dir whose contents change in-process must miss, not serve a
stale build) and cleanup registration. Pure-filesystem tests."""

import os
import time

from youtube_etl_project_spark.operators import fixture_cache


def _write(d, name, body):
    p = os.path.join(d, name)
    with open(p, "w") as f:
        f.write(body)
    return p


def test_hit_miss_and_fingerprint_invalidation(tmp_path):
    src = tmp_path / "fixture"
    src.mkdir()
    _write(str(src), "a.parquet", "one")

    builds = []

    def build(path):
        builds.append(path)
        _write(path, "_SUCCESS", "")

    p1 = fixture_cache.cached_build("t_", str(src), build)
    p2 = fixture_cache.cached_build("t_", str(src), build)
    assert p1 == p2 and len(builds) == 1  # warm hit, no rebuild

    # deleting the marker forces a rebuild even at the same fingerprint
    os.remove(os.path.join(p1, "_SUCCESS"))
    p3 = fixture_cache.cached_build("t_", str(src), build)
    assert len(builds) == 2

    # changing the fixture's CONTENT (mtime_ns differs) invalidates
    time.sleep(0.01)
    _write(str(src), "a.parquet", "two!")
    p4 = fixture_cache.cached_build("t_", str(src), build)
    assert len(builds) == 3
    assert p4 != p3

    # every minted dir is registered for atexit reclaim
    assert {p1, p3, p4} <= set(fixture_cache._MINTED)

    # distinct prefixes never collide on the same fixture
    p5 = fixture_cache.cached_build("u_", str(src), build)
    assert p5 != p4 and len(builds) == 4


def test_fingerprint_is_content_sensitive(tmp_path):
    d = tmp_path / "f"
    d.mkdir()
    _write(str(d), "x", "abc")
    f1 = fixture_cache.fingerprint(str(d))
    assert f1 == fixture_cache.fingerprint(str(d))  # stable
    time.sleep(0.01)
    _write(str(d), "x", "abcd")
    assert fixture_cache.fingerprint(str(d)) != f1
