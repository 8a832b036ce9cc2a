"""Tracked persist/unpersist for operator-internal cached tables.

Some operators persist an intermediate that feeds two downstream joins
(simhash fingerprints, the IVF assignment table, the LM token counts).
In a long-lived session (bench loops, gate reruns) those cached blocks
would otherwise accumulate in executor storage memory forever — the
operator can't unpersist them itself because the returned DataFrame is
lazy and still references them.

Contract: operators route every internal ``.persist()`` through
:func:`tracked_persist`; callers release once the returned DataFrame
has been materialized — either with the :func:`persist_scope` context
manager (preferred: releases exactly the persists created inside the
block) or with :func:`release_all` (releases the calling thread's
ambient, non-scoped persists).

Tracking is **thread-local**: a shared SparkSession may build and
materialize queries from several threads (bench sweeps, notebook
users), and a flat process-global list would let one caller's
``release_all()`` unpersist another thread's in-flight intermediates
mid-query. At production scale these intermediates would be
checkpointed Iceberg tables and the question disappears.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager

from pyspark.sql import DataFrame

_local = threading.local()


def _scopes() -> list[list[DataFrame]]:
    if not hasattr(_local, "scopes"):
        # slot 0 is the thread's ambient (release_all) list; entering
        # persist_scope pushes a fresh list that captures subsequent
        # tracked_persist calls on this thread
        _local.scopes = [[]]
    return _local.scopes


def tracked_persist(df: DataFrame) -> DataFrame:
    df = df.persist()
    _scopes()[-1].append(df)
    return df


def _release(tracked: list[DataFrame]) -> None:
    while tracked:
        df = tracked.pop()
        try:
            df.unpersist()
        except Exception:
            pass


@contextmanager
def persist_scope():
    """Release exactly the persists tracked inside the block — other
    threads' and enclosing scopes' intermediates are untouched."""
    scopes = _scopes()
    scope: list[DataFrame] = []
    scopes.append(scope)
    try:
        yield scope
    finally:
        try:
            scopes.remove(scope)
        except ValueError:
            pass
        _release(scope)


def release_all() -> None:
    """Unpersist every intermediate tracked on THIS thread outside any
    active persist_scope (safe to call repeatedly)."""
    _release(_scopes()[0])
