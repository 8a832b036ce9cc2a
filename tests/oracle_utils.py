"""Local mirror of the driver's Spark-vs-DuckDB correctness compare.

Runs a registry query on Spark and its oracle SQL on DuckDB over the
same parquet tables, normalizes (sort columns by name, sort rows,
round floats) and asserts equality — so mismatches are caught before
the driver's CORRECTNESS_r{N}.json does.
"""

from __future__ import annotations

import math
import os

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _norm(v, ndigits: int = 6):
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, ndigits)
    return v


def normalize_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return out


def compare_query(spark, sf_dir: str, name: str) -> None:
    from azure_pdf_parser_spark.caching import release_all
    from azure_pdf_parser_spark.plans.queries import ORACLE_SQL, QUERIES

    try:
        sdf = QUERIES[name](spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
    finally:
        release_all()

    con = duckdb_connection(sf_dir)
    res = con.execute(ORACLE_SQL[name])
    dcols = [d[0] for d in res.description]
    drows = [tuple(r) for r in res.fetchall()]

    assert sorted(scols) == sorted(dcols), (
        f"{name}: column mismatch spark={sorted(scols)} duckdb={sorted(dcols)}"
    )
    assert len(srows) == len(drows), (
        f"{name}: row count mismatch spark={len(srows)} duckdb={len(drows)}"
    )
    s_norm = normalize_rows(scols, srows)
    d_norm = normalize_rows(dcols, drows)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_norm, d_norm)) if a != b
    ]
    assert not mismatches, f"{name}: {len(mismatches)} row mismatches; first 3: {mismatches[:3]}"
