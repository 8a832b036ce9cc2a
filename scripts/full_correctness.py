#!/usr/bin/env python
"""Regenerate the FULL correctness record across every registry gate.

The external driver's correctness harness caps at ~50 rows per round;
the registry rotates gates through that cap on the written schedule in
``plans/queries.py``. This script produces the uncapped record so the
externally-consumed evidence never silently shrinks its gate set: every
``queries()`` entry runs on Spark at sf0.01 and, where an oracle
exists, its ``oracle_sql()`` on DuckDB over the same parquet tables,
with the driver's own normalization (columns sorted by name, rows
sorted, floats rounded) before compare.

Usage:
    python scripts/full_correctness.py [OUT_JSON]

Writes ``CORRECTNESS_FULL_r04.json``-style rows:
    {name: {rows_match, schema_match, hash_match, spark_rows,
            oracle_rows, err}}
Gates without an oracle entry record the weaker rows-only shape
(oracle_rows = null) exactly as the driver does.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

SF_DIR = os.environ.get("SPARK_GRAFT_CORRECTNESS_SF", "/root/testdata/sf0.01")


def _hash_rows(norm_rows) -> str:
    h = hashlib.sha256()
    for row in norm_rows:
        h.update(repr(row).encode())
    return h.hexdigest()[:16]


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "CORRECTNESS_FULL_r04.json"
    )
    from oracle_utils import duckdb_connection, normalize_rows

    from azure_pdf_parser_spark.caching import release_all
    from azure_pdf_parser_spark.plans.queries import ORACLE_SQL, QUERIES
    from bench import make_session

    spark = make_session(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    con = duckdb_connection(SF_DIR)
    record: dict[str, dict] = {}
    t_start = time.monotonic()
    try:
        for name, fn in QUERIES.items():
            row: dict = {
                "rows_match": None,
                "schema_match": None,
                "hash_match": None,
                "spark_rows": None,
                "oracle_rows": None,
                "err": None,
            }
            try:
                sdf = fn(spark, SF_DIR)
                scols = sdf.columns
                srows = [tuple(r) for r in sdf.collect()]
                row["spark_rows"] = len(srows)
                if name in ORACLE_SQL:
                    res = con.execute(ORACLE_SQL[name])
                    dcols = [d[0] for d in res.description]
                    drows = [tuple(r) for r in res.fetchall()]
                    row["oracle_rows"] = len(drows)
                    row["rows_match"] = len(srows) == len(drows)
                    row["schema_match"] = sorted(scols) == sorted(dcols)
                    row["hash_match"] = _hash_rows(
                        normalize_rows(scols, srows)
                    ) == _hash_rows(normalize_rows(dcols, drows))
                else:
                    # weaker rows-only check, mirroring the driver: the
                    # query ran and collected (no oracle to compare to)
                    row["rows_match"] = row["spark_rows"] is not None
            except Exception as exc:  # noqa: BLE001 - record, keep sweeping
                row["err"] = f"{type(exc).__name__}: {exc}"[:300]
            finally:
                release_all()
            record[name] = row
            status = (
                "ERR"
                if row["err"]
                else (
                    "ok"
                    if row["hash_match"] or row["oracle_rows"] is None
                    else "MISMATCH"
                )
            )
            print(
                f"  {name}: {status} ({row['spark_rows']} rows)"
                f" [t+{time.monotonic() - t_start:.0f}s]",
                file=sys.stderr,
                flush=True,
            )
    finally:
        spark.stop()

    with open(out_path, "w") as f:
        json.dump(record, f, indent=1)
    n_oracled = sum(1 for r in record.values() if r["oracle_rows"] is not None)
    n_green = sum(1 for r in record.values() if r["hash_match"])
    n_err = sum(1 for r in record.values() if r["err"])
    print(
        json.dumps(
            {
                "gates": len(record),
                "oracled": n_oracled,
                "hash_green": n_green,
                "errors": n_err,
                "sf_dir": SF_DIR,
                "out": out_path,
            }
        )
    )


if __name__ == "__main__":
    main()
