"""Persist-tracking contract: scoping + thread isolation.

A shared SparkSession can build queries from several threads; tracked
persists must be releasable without one caller unpersisting another's
in-flight intermediates (the round-2 global-list hazard).
"""

from __future__ import annotations

import threading


def test_release_all_is_thread_isolated(spark):
    """release_all() on one thread must not unpersist intermediates
    tracked by another thread."""
    from azure_pdf_parser_spark.caching import release_all, tracked_persist

    holder = {}

    def worker():
        df = tracked_persist(spark.range(100))
        df.count()
        holder["df"] = df

    t = threading.Thread(target=worker)
    t.start()
    t.join()
    assert holder["df"].storageLevel.useMemory

    release_all()  # main thread's ambient list — worker's persist survives
    assert holder["df"].storageLevel.useMemory
    holder["df"].unpersist()


def test_persist_scope_releases_exactly_its_own(spark):
    """A persist_scope releases persists created inside the block and
    nothing else; ambient persists stay until release_all()."""
    from azure_pdf_parser_spark.caching import (
        persist_scope,
        release_all,
        tracked_persist,
    )

    ambient = tracked_persist(spark.range(10))
    ambient.count()
    with persist_scope():
        inner = tracked_persist(spark.range(20))
        inner.count()
        assert inner.storageLevel.useMemory
    assert not inner.storageLevel.useMemory
    assert ambient.storageLevel.useMemory

    release_all()
    assert not ambient.storageLevel.useMemory


def test_persist_scope_nests(spark):
    from azure_pdf_parser_spark.caching import persist_scope, tracked_persist

    with persist_scope():
        outer = tracked_persist(spark.range(5))
        outer.count()
        with persist_scope():
            inner = tracked_persist(spark.range(6))
            inner.count()
        assert not inner.storageLevel.useMemory
        assert outer.storageLevel.useMemory
    assert not outer.storageLevel.useMemory


def test_operator_persists_are_scope_capturable(spark):
    """An operator's internal tracked persists land in the caller's
    active scope — the bench/gate runner can wrap any registry query in
    persist_scope() and leak nothing."""
    from azure_pdf_parser_spark.caching import persist_scope
    from azure_pdf_parser_spark.operators.lm import lm_surprisal

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma {i}") for i in range(50)], "doc_id long, text string"
    )
    with persist_scope() as scope:
        lm_surprisal(docs).count()
        assert len(scope) >= 1  # the vocab/counts persists were captured
        persisted = list(scope)
    assert all(not df.storageLevel.useMemory for df in persisted)
