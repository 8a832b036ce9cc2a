"""Every registry query must match its DuckDB oracle — the local mirror
of the driver's correctness gate, run at sf0.001 for speed (the driver
runs sf0.01)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR
from tests.oracle_utils import compare_query


def _names():
    from azure_pdf_parser_spark.plans.queries import ORACLE_SQL

    return sorted(ORACLE_SQL)


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(spark, name):
    compare_query(spark, SF_DIR, name)
