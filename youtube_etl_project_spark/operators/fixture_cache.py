"""Per-fixture materialization cache for derived frames and indexes.

Several registered queries are the "probe many" half of a
build-once/probe-many pair (persisted IVF / IVF-PQ / LSH / NSW indexes)
or compose an expensive deterministic frame (the feature-hashed
embedding). Each used to keep its own ``dict[sf_dir, mkdtemp-path]``
cache; ADVICE r10 flagged the shared weaknesses: the temp dirs were
never cleaned (a long-lived session accumulates disk) and validity was
"directory exists", so an in-process change to the fixture's contents
would serve a stale graph/frame.

This module is the one shared implementation: cache keys include a
cheap CONTENT fingerprint of the fixture dir (sorted relpath + size +
mtime_ns of its data files — no data read), and every temp dir this
module mints is removed at interpreter exit. A fingerprint change
simply mints a new dir; the stale one is reclaimed by the same atexit
hook.

At 100 TB the same contract holds with the paths swapped for durable
storage: the "fingerprint" becomes the source table's snapshot/commit
id and the cache dict becomes a small catalog table — the in-process
shape here is deliberately identical so only the path provider changes.
"""

from __future__ import annotations

import atexit
import hashlib
import os
import shutil
import tempfile
from typing import Callable

# Every temp dir ever minted (including ones superseded by a fingerprint
# change) — reclaimed at interpreter exit.
_MINTED: list[str] = []

# (prefix, sf_dir, fingerprint) -> cache dir path.
_CACHE: dict[tuple[str, str, str], str] = {}


def fingerprint(sf_dir: str) -> str:
    """Cheap content fingerprint of a fixture dir: the sha256 of the
    sorted (relative path, size, mtime_ns) listing of its files. Reads
    directory metadata only — never file contents — so it is safe to
    evaluate per query call."""
    h = hashlib.sha256()
    for root, dirs, files in os.walk(sf_dir):
        dirs.sort()
        for name in sorted(files):
            p = os.path.join(root, name)
            try:
                st = os.stat(p)
            except OSError:  # racing writer; fold the miss into the key
                h.update(f"{p}:gone;".encode())
                continue
            rel = os.path.relpath(p, sf_dir)
            h.update(f"{rel}:{st.st_size}:{st.st_mtime_ns};".encode())
    return h.hexdigest()[:16]


def cached_build(
    prefix: str,
    sf_dir: str,
    build: Callable[[str], None],
    marker: str = "_SUCCESS",
) -> str:
    """Return the cache dir for ``(prefix, sf_dir)`` at the fixture's
    CURRENT fingerprint, invoking ``build(path)`` to populate a fresh
    temp dir on miss. ``marker`` is a path relative to the dir whose
    existence revalidates a hit (e.g. ``edges`` for a persisted graph,
    ``_SUCCESS`` for a single parquet frame)."""
    key = (prefix, sf_dir, fingerprint(sf_dir))
    path = _CACHE.get(key)
    if path is not None and os.path.exists(os.path.join(path, marker)):
        return path
    path = tempfile.mkdtemp(prefix=prefix)
    _MINTED.append(path)
    build(path)
    _CACHE[key] = path
    return path


@atexit.register
def _cleanup() -> None:  # pragma: no cover - interpreter teardown
    for d in _MINTED:
        shutil.rmtree(d, ignore_errors=True)
    _MINTED.clear()
    _CACHE.clear()
