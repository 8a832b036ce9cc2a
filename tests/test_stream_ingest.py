"""Exactly-once streaming ingest: foreachBatch + the atomic run-commit
protocol (streaming/stream_ingest.py). The committed view must contain
every document exactly once across drains, restarts, re-delivered
files, and crash replays."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from tests.conftest import SF_DIR

STREAM_TIMEOUT_S = 300


def _drain(q):
    if not q.awaitTermination(STREAM_TIMEOUT_S):
        q.stop()
        raise TimeoutError("ingest stream did not drain")


@pytest.fixture()
def dirs():
    tmp = tempfile.mkdtemp(prefix="stream_ingest_")
    try:
        d = {
            k: os.path.join(tmp, k) for k in ("in", "out", "manifest", "ckpt")
        }
        os.makedirs(d["in"])
        yield d
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _seed(dst: str, name: str = "part-000.parquet") -> None:
    shutil.copy(os.path.join(SF_DIR, "documents.parquet"), os.path.join(dst, name))


def test_ingest_matches_batch_and_restart_is_noop(spark, dirs):
    from pyspark.sql import functions as F

    from azure_pdf_parser_spark.plans import manifest as mf
    from azure_pdf_parser_spark.streaming.stream_ingest import start_ingest

    _seed(dirs["in"])
    _drain(
        start_ingest(spark, dirs["in"], dirs["out"], dirs["manifest"], dirs["ckpt"])
    )

    n_docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).count()
    committed = mf.read_parser_output(spark, dirs["out"], dirs["manifest"])
    assert committed.count() == n_docs
    assert committed.select("doc_id").distinct().count() == n_docs
    runs1 = mf.committed_run_ids(dirs["manifest"])
    assert runs1  # at least one committed stream run

    # restart with the same checkpoint and NO new files: no new runs,
    # no new rows — the checkpoint makes the drain a true no-op
    _drain(
        start_ingest(spark, dirs["in"], dirs["out"], dirs["manifest"], dirs["ckpt"])
    )
    assert mf.committed_run_ids(dirs["manifest"]) == runs1
    assert (
        mf.read_parser_output(spark, dirs["out"], dirs["manifest"]).count()
        == n_docs
    )

    # a RE-DELIVERED copy of the same file is a new stream batch, but the
    # doc-level resume anti-join drops every already-committed doc: the
    # new run commits zero rows and the view stays exactly-once
    _seed(dirs["in"], "part-001-redelivery.parquet")
    _drain(
        start_ingest(spark, dirs["in"], dirs["out"], dirs["manifest"], dirs["ckpt"])
    )
    committed = mf.read_parser_output(spark, dirs["out"], dirs["manifest"])
    assert committed.count() == n_docs
    assert committed.select("doc_id").distinct().count() == n_docs

    # lineage: every committed doc has a manifest row in a committed run
    done = mf.completed_doc_ids(spark, dirs["manifest"])
    assert done.count() == n_docs
    # spans in the committed view reconcile with the lineage metrics
    span_total = committed.agg(F.sum("span_count")).collect()[0][0]
    metric_total = (
        mf.partition_metrics(spark, dirs["manifest"])
        .where(F.col("run_id").isin(mf.committed_run_ids(dirs["manifest"])))
        .agg(F.sum("total_spans"))
        .collect()[0][0]
    )
    assert metric_total == span_total


def test_ingest_replay_after_precommit_crash_is_exactly_once(spark, dirs):
    """Simulate the worst crash window: a batch attempt that wrote its
    run-scoped output dir (and manifest rows) but died BEFORE the marker
    rename. The replay must reclaim the orphan and publish exactly once."""
    from pyspark.sql import functions as F

    from azure_pdf_parser_spark.plans import manifest as mf
    from azure_pdf_parser_spark.plans.extract import run_extract
    from azure_pdf_parser_spark.streaming.stream_ingest import (
        ingest_batch,
        stream_run_id,
    )

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    run_id = stream_run_id(0)

    # crashed attempt: full run EXCEPT the marker (simulated by running
    # the protocol and deleting the marker it published)
    run_extract(spark, docs, dirs["out"], dirs["manifest"], run_id=run_id, spanize=True)
    os.remove(os.path.join(dirs["manifest"], "_commits", run_id))
    assert mf.read_parser_output(spark, dirs["out"], dirs["manifest"]).count() == 0

    # replay of the same batch_id: reclaims the orphan dir, re-runs,
    # publishes — exactly one committed copy of every doc
    assert ingest_batch(spark, docs, 0, dirs["out"], dirs["manifest"]) == run_id
    committed = mf.read_parser_output(spark, dirs["out"], dirs["manifest"])
    assert committed.count() == docs.count()
    assert committed.select("doc_id").distinct().count() == docs.count()

    # replay AFTER publish (post-commit crash): skipped outright
    assert ingest_batch(spark, docs, 0, dirs["out"], dirs["manifest"]) is None
    assert (
        mf.read_parser_output(spark, dirs["out"], dirs["manifest"]).count()
        == docs.count()
    )
    # output rows for the run exist exactly once on disk too (the replay
    # rewrote the reclaimed dir, it did not append to it)
    raw = spark.read.parquet(dirs["out"])
    assert raw.groupBy("doc_id").count().where(F.col("count") > 1).count() == 0
