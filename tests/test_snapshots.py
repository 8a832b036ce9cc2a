"""Snapshot-diff properties (gate parity is covered by
tests/test_queries_vs_oracle.py::test_query_matches_oracle[snapshot_diff])."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from azure_pdf_parser_spark.operators.snapshots import (
    NEW_ABSENT,
    OLD_ABSENT,
    REVISED,
    REVISED_PREFIX,
    snapshot_diff,
)
from tests.conftest import SF_DIR


def _route(doc_id: str) -> str:
    return hashlib.md5(doc_id.encode()).hexdigest()


def test_statuses_match_per_doc_reference(spark):
    """Every document's status must equal the Python restatement of
    the spec: presence from the md5 strata, 'changed' from actual
    content-hash inequality (so short revised docs stay unchanged)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    truth = {}
    for r in docs.collect():
        doc_id = str(r.doc_id)
        h = _route(doc_id)
        in_old, in_new = h[0] not in OLD_ABSENT, h[0] not in NEW_ABSENT
        if not in_old and not in_new:
            continue
        if not in_old:
            truth[doc_id] = "added"
        elif not in_new:
            truth[doc_id] = "removed"
        else:
            old_text = (
                r.text[:REVISED_PREFIX]
                if (h[1] in REVISED and r.text is not None)
                else r.text
            )
            truth[doc_id] = "changed" if old_text != r.text else "unchanged"
    got = {
        str(r.doc_id): r.status
        for r in snapshot_diff(
            docs.withColumn("doc_id", F.col("doc_id").cast("string"))
        ).collect()
    }
    assert got == truth
    # the fixture must exercise all four statuses
    assert set(truth.values()) == {"added", "removed", "changed", "unchanged"}


def test_one_row_per_present_doc(spark):
    """OLD_ABSENT and NEW_ABSENT are disjoint strata, so every doc is
    in at least one snapshot and appears exactly once in the diff."""
    assert not (set(OLD_ABSENT) & set(NEW_ABSENT))
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    diff = snapshot_diff(docs)
    assert diff.count() == docs.count()
    assert diff.select("doc_id").distinct().count() == docs.count()


def test_diff_plan_has_no_cartesian_and_thin_exchange(spark):
    """The diff is an equi-join on doc_id over (doc_id, md5)
    projections — no cartesian/nested-loop, and the join inputs must
    already be hashed projections (text never crosses the exchange:
    md5 is computed map-side, so no plan node carries `text` above a
    scan)."""
    from tests.test_physical_plans import _nodes, _plan

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan(snapshot_diff(docs))
    nodes = _nodes(plan)
    assert "CartesianProduct" not in nodes, nodes
    assert "BroadcastNestedLoopJoin" not in nodes, nodes
    # every Exchange's output schema is hashes/flags only, never the
    # raw text column (word-boundary match: 'text#<exprId>' is how a
    # real column reference renders; substrings like chunk_text or
    # regexp_extract must not trip this)
    import re

    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert not re.search(r"(?<![\w_])text#\d+", line), line


def test_delta_dedup_probes_only_the_delta(spark):
    """Every probe-side doc_id must be an added/changed doc from the
    diff, changed docs with text beyond the revision prefix should
    re-match their own prior revision, and the probe must reach the
    index as a broadcast join (the index side never shuffles)."""
    from azure_pdf_parser_spark.operators.snapshots import (
        snapshot_delta_dedup,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    diff = {r.doc_id: r.status for r in snapshot_diff(docs).collect()}
    rows = snapshot_delta_dedup(docs).collect()
    assert rows
    for r in rows:
        assert diff[r.doc_id] in ("added", "changed"), (r.doc_id, diff[r.doc_id])
        assert 1 <= r.n_shared_bands <= 4
    self_matches = [r for r in rows if r.doc_id == r.dup_of]
    assert self_matches, "changed docs should re-match their prior revision"
    assert all(diff[r.doc_id] == "changed" for r in self_matches)

    from tests.test_physical_plans import _nodes, _plan

    nodes = _nodes(_plan(snapshot_delta_dedup(docs)))
    assert "BroadcastHashJoin" in nodes, nodes
    assert "CartesianProduct" not in nodes, nodes
