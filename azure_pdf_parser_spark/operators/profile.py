"""One-pass table profiling: per-column data-quality statistics.

Every 100 TB ingest needs a cheap observability pass — row counts,
null rates, distinct cardinalities, value ranges — BEFORE expensive
curation runs, both to catch schema drift (a column suddenly 90% null)
and to size downstream joins. Reference analog: none; engine addition
alongside the manifest/metrics layer.

Scale shape: ONE scan. All per-column aggregates collapse into a
single Aggregate over the table (map-side partials, one single-row
exchange), and the wide one-row result is exploded to long format
driver-free. The exception is the distinct count: multiple exact
COUNT(DISTINCT col) in one Aggregate plan via Expand — the scan is
replicated once per distinct column, which is the honest cost of
exactness. At crawl scale you swap exactness for the mergeable HLL
register sketch (operators/sketches.py) column-by-column; the output
contract (one n_distinct per column) is unchanged — that seam is why
the profiler and the sketch live side by side.

All output columns are integers or strings (avg length is reported in
exact milli-chars) so the oracle comparison is bit-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PROFILE_COLUMNS = ("doc_id", "text", "lang", "source", "n_chars")


def profile_table(
    df: DataFrame, columns: tuple[str, ...] = PROFILE_COLUMNS
) -> DataFrame:
    """One row per profiled column: (column, n_rows, n_null,
    n_distinct, min_value, max_value, avg_len_milli) — values compared
    as strings (exact, engine-identical for int/str payloads)."""
    aggs = [F.count("*").alias("_n")]
    for c in columns:
        s = F.col(c).cast("string")
        aggs += [
            F.count(c).alias(f"_nn_{c}"),
            F.countDistinct(c).alias(f"_nd_{c}"),
            F.min(s).alias(f"_min_{c}"),
            F.max(s).alias(f"_max_{c}"),
            F.sum(F.length(s)).alias(f"_len_{c}"),
        ]
    wide = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n").cast("bigint").alias("n_rows"),
                (F.col("_n") - F.col(f"_nn_{c}")).cast("bigint").alias("n_null"),
                F.col(f"_nd_{c}").cast("bigint").alias("n_distinct"),
                F.col(f"_min_{c}").alias("min_value"),
                F.col(f"_max_{c}").alias("max_value"),
                F.when(
                    F.col(f"_nn_{c}") > 0,
                    F.expr(f"(_len_{c} * 1000) div _nn_{c}"),
                ).cast("bigint").alias("avg_len_milli"),
            )
            for c in columns
        ]
    )
    return wide.select(F.explode(rows).alias("r")).select("r.*")


def profile_table_sql(columns: tuple[str, ...] = PROFILE_COLUMNS) -> str:
    per_col = []
    for c in columns:
        per_col.append(
            f"""SELECT '{c}' AS "column",
       CAST(n AS BIGINT) AS n_rows,
       CAST(n - nn_{c} AS BIGINT) AS n_null,
       CAST(nd_{c} AS BIGINT) AS n_distinct,
       min_{c} AS min_value,
       max_{c} AS max_value,
       CAST(CASE WHEN nn_{c} > 0 THEN (len_{c} * 1000) // nn_{c} END AS BIGINT)
           AS avg_len_milli
FROM s"""
        )
    agg_terms = ",\n           ".join(
        f"count({c}) AS nn_{c}, count(DISTINCT {c}) AS nd_{c}, "
        f"min(CAST({c} AS VARCHAR)) AS min_{c}, "
        f"max(CAST({c} AS VARCHAR)) AS max_{c}, "
        f"sum(len(CAST({c} AS VARCHAR))) AS len_{c}"
        for c in columns
    )
    return (
        f"WITH s AS (\n    SELECT count(*) AS n,\n           {agg_terms}\n"
        "    FROM documents\n)\n" + "\nUNION ALL\n".join(per_col)
    )
