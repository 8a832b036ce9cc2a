"""Regression pins for the bench harness's accounting logic.

Two consecutive review rounds found defects here (warm-drop
over-counting; duplicated rep-timing policy between the sweep and the
post-sweep retry pass), so the rules now live under test:

* ``warm_dropped`` records a query ONLY when a warm was genuinely
  suppressed by the pace check — never driver-profile EAGER_BUILD
  queries (their reps are always cold rebuilds, no warm exists to
  drop) and never queries that errored before reaching their warm.
* ``retry_outliers`` reports min(sweep, retry) and skips failed
  retries, keeping the sweep's number.
* ``_time_one_rep`` is the single rep-timing definition: EAGER_BUILD
  queries rebuild inside the timer on every call; non-EAGER queries
  time a pre-built plan and never re-invoke the builder.

The tests drive the real bench functions with fake registry entries
(injected via monkeypatch into the real QUERIES dict) so no sf-dir
data or multi-second operators are involved.
"""

from __future__ import annotations

import pytest

import bench
from azure_pdf_parser_spark.plans.queries import QUERIES


def _fresh_state() -> dict:
    return {
        "timings": {},
        "flagship_sec": None,
        "flagship_runs": [],
        "n_amplified": None,
        "scaling": None,
        "skipped": [],
    }


@pytest.fixture()
def harness(monkeypatch, spark):
    """Driver-profile harness with three fake queries: a normal one, an
    EAGER_BUILD one (rebuilds inside the timer), and one that raises."""
    calls = {"normal": 0, "eager": 0}

    def q_normal(s, sf_dir):
        calls["normal"] += 1
        return s.range(50).selectExpr("id", "id * 2 AS v")

    def q_eager(s, sf_dir):
        calls["eager"] += 1
        return s.range(50).selectExpr("id", "id + 1 AS v")

    def q_broken(s, sf_dir):
        raise RuntimeError("synthetic failure")

    monkeypatch.setitem(QUERIES, "fake_normal", q_normal)
    monkeypatch.setitem(QUERIES, "fake_eager", q_eager)
    monkeypatch.setitem(QUERIES, "fake_broken", q_broken)
    monkeypatch.setattr(
        bench, "BENCH_QUERIES", ["fake_normal", "fake_eager", "fake_broken"]
    )
    monkeypatch.setattr(
        bench, "EAGER_BUILD", bench.EAGER_BUILD | {"fake_eager"}
    )
    monkeypatch.setattr(bench, "PROFILE", "driver")
    monkeypatch.setattr(bench, "TIMED_REPS", 1)
    monkeypatch.setattr(bench, "_STATE", _fresh_state())
    return calls


def test_warm_drop_excludes_eager_and_errored(monkeypatch, spark, harness):
    # pace always below the floor -> every warm is suppressed
    monkeypatch.setattr(bench, "BUDGET_SEC", 10**6)
    monkeypatch.setattr(bench, "PACE_MIN_SEC", float("inf"))
    bench.bench_queries(spark)
    assert set(bench._STATE["timings"]) == {"fake_normal", "fake_eager"}
    assert "fake_broken" in bench._STATE["errors"]
    # only the query whose warm was genuinely suppressed is recorded
    assert bench._STATE["warm_dropped"] == ["fake_normal"]


def test_no_warm_drop_on_healthy_pace(monkeypatch, spark, harness):
    monkeypatch.setattr(bench, "BUDGET_SEC", 10**6)
    monkeypatch.setattr(bench, "PACE_MIN_SEC", 0.0)
    bench.bench_queries(spark)
    assert set(bench._STATE["timings"]) == {"fake_normal", "fake_eager"}
    assert "warm_dropped" not in bench._STATE


def test_retry_reports_min_and_keeps_sweep_number_on_error(
    monkeypatch, spark, harness
):
    monkeypatch.setattr(bench, "BUDGET_SEC", 0)
    # sweep numbers impossibly fast: the retry rep can't beat them, so
    # min() must keep them
    # (0.001, not smaller: the harness rounds timings to 3 decimals)
    bench._STATE["timings"] = {"fake_normal": 0.001, "fake_broken": 7.0}
    bench._STATE["retry_candidates"] = ["fake_normal", "fake_broken"]
    bench.retry_outliers(spark)
    assert bench._STATE["timings"]["fake_normal"] == 0.001
    # the failed retry keeps the sweep's number and is not marked retried
    assert bench._STATE["timings"]["fake_broken"] == 7.0
    assert bench._STATE["retried"] == ["fake_normal"]


def test_time_one_rep_eager_rebuilds_nonager_does_not(spark, harness):
    calls = harness
    df = QUERIES["fake_normal"](spark, "")
    built = calls["normal"]
    sec = bench._time_one_rep(spark, QUERIES, "fake_normal", df)
    assert sec > 0 and calls["normal"] == built  # pre-built plan reused

    before = calls["eager"]
    bench._time_one_rep(spark, QUERIES, "fake_eager")
    bench._time_one_rep(spark, QUERIES, "fake_eager")
    assert calls["eager"] == before + 2  # rebuilt inside the timer each rep
