"""Text normalization semantics (oracle parity via
tests/test_queries_vs_oracle.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from azure_pdf_parser_spark.functions.normalize import (
    normalize_expr,
    normalize_text,
)
from tests.conftest import SF_DIR


def test_rule_semantics(spark):
    cases = spark.createDataFrame(
        [
            ("“quoted” and ‘single’", '"quoted" and \'single\''),
            ("a – b — c", "a - b - c"),
            ("wait…", "wait..."),
            ("nb sp", "nb sp"),
            ("ctl\x07\x1fchars", "ctlchars"),
            ("line1\nline2\tcol", "line1 line2 col"),
            ("  runs   of    space  ", "runs of space"),
            ("already clean", "already clean"),
        ],
        "text string, expected string",
    )
    for r in cases.select(
        "expected", normalize_expr(F.col("text")).alias("got")
    ).collect():
        assert r.got == r.expected, (r.got, r.expected)


def test_normalize_is_idempotent_and_map_only(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    df = normalize_text(docs)
    twice = df.select(
        "text_norm", normalize_expr(F.col("text_norm")).alias("again")
    )
    assert twice.where(F.col("again") != F.col("text_norm")).count() == 0
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "Python" not in plan, plan
    # the seam must exercise both outcomes
    flags = {r.changed for r in df.select("changed").distinct().collect()}
    assert flags == {True, False}, flags
