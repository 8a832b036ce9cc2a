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


# --- Exact distributed percentiles --------------------------------------------

PERCENTILES_MILLI = (500, 900, 990)  # p50 / p90 / p99


def value_percentiles(
    df: DataFrame,
    group_col: str = "source",
    value_col: str = "n_chars",
    percentiles_milli: tuple[int, ...] = PERCENTILES_MILLI,
) -> DataFrame:
    """(group, n, p50, p90, p99): EXACT discrete percentiles per group
    — the smallest value whose cumulative count reaches ceil(p·n) —
    computed without ever sorting the corpus through one reducer.

    The naive exact percentile is a global sort (or a single-partition
    percentile aggregate buffering every value). This is the
    curriculum-order machinery turned into an order statistic:

    1. one map-side-combined groupBy on (group, value) — output rows =
       distinct values per group, bounded by the value DOMAIN, not the
       corpus;
    2. cumulative counts via a window over that aggregated table,
       partitioned by group (each partition = one group's distinct
       values — bounded the same way);
    3. the percentile is a min() over values meeting their rank
       threshold: integer arithmetic end-to-end, bit-exact oracle.

    ceil(p·n) uses integer ceil ((n·p + 999) div 1000) — no float rank.
    At crawl scale this is how you get exact length/score percentiles
    per language/domain in two bounded shuffles; for unbounded REAL
    domains you first quantize the value (the HLL/profiler trade in
    this module's neighbors: exactness over the quantized domain).

    NULL values are excluded on BOTH sides (from the ranks and from n):
    a percentile of the present values is the meaningful statistic, and
    the engines disagree on NULL sort position (Spark windows order
    nulls first, DuckDB last) — filtering is also what makes the gate
    deterministic.
    """
    from pyspark.sql.window import Window

    counts = (
        df.where(F.col(value_col).isNotNull())
        .select(F.col(group_col).alias("grp"), F.col(value_col).alias("v"))
        .groupBy("grp", "v")
        .agg(F.count("*").alias("_c"))
    )
    w_cum = (
        Window.partitionBy("grp")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_tot = Window.partitionBy("grp")
    cum = counts.select(
        "grp",
        "v",
        F.sum("_c").over(w_cum).alias("_cum"),
        F.sum("_c").over(w_tot).alias("_n"),
    )
    aggs = [F.max("_n").cast("bigint").alias("n")]
    for pm in percentiles_milli:
        aggs.append(
            F.min(
                F.when(
                    F.col("_cum") >= F.expr(f"(_n * {pm} + 999) div 1000"),
                    F.col("v"),
                )
            ).cast("bigint").alias(f"p{pm}")
        )
    return cum.groupBy("grp").agg(*aggs)


def value_percentiles_sql(
    group_col: str = "source",
    value_col: str = "n_chars",
    percentiles_milli: tuple[int, ...] = PERCENTILES_MILLI,
) -> str:
    terms = ",\n       ".join(
        f"CAST(min(CASE WHEN cum >= (n * {pm} + 999) // 1000 THEN v END) "
        f"AS BIGINT) AS p{pm}"
        for pm in percentiles_milli
    )
    return f"""
WITH counts AS (
    SELECT {group_col} AS grp, {value_col} AS v, count(*) AS c
    FROM documents WHERE {value_col} IS NOT NULL
    GROUP BY {group_col}, {value_col}
),
cum AS (
    SELECT grp, v,
           sum(c) OVER (PARTITION BY grp ORDER BY v
                        ROWS UNBOUNDED PRECEDING) AS cum,
           sum(c) OVER (PARTITION BY grp) AS n
    FROM counts
)
SELECT grp, CAST(max(n) AS BIGINT) AS n,
       {terms}
FROM cum GROUP BY grp
"""


# --- Key-skew diagnostics ------------------------------------------------------


def key_skew_profile(df: DataFrame, key_col: str = "user_id") -> DataFrame:
    """One-row skew report for a prospective shuffle key: row/key counts,
    the hottest key's absolute and per-million share, exact p50/p99 of
    the per-key count distribution, skew-vs-mean ×1000, and the number
    of keys hotter than 2× the mean.

    This is the measurement that decides the engine's salting story
    (plans/extract.py): BEFORE keying a 100 TB shuffle on a column, run
    this profile on a sample or the full table and read off whether the
    key needs salting (top_share_ppm / skew_x1000) and how wide
    (max_cnt vs mean). All arithmetic is integer (ppm / ×1000 fixed
    point) so the oracle is bit-exact.

    Scale shape: ONE map-side-combined groupBy(key) — the only shuffle
    proportional to data — then percentiles over the per-key counts via
    a second groupBy on the COUNT VALUE (distinct count values are
    O(hundreds) even when keys are billions: counts cluster) and a
    window over that tiny table. No global sort, no single-partition
    pass over keys.
    """
    from pyspark.sql.window import Window

    counts = df.groupBy(F.col(key_col).alias("k")).agg(
        F.count("*").alias("cnt")
    )
    # histogram of the count distribution: rows = distinct count VALUES
    hist = counts.groupBy("cnt").agg(F.count("*").alias("n_keys_at"))
    w_cum = Window.orderBy("cnt").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        "cnt",
        "n_keys_at",
        F.sum("n_keys_at").over(w_cum).alias("_cum"),
        F.sum("n_keys_at").over(Window.partitionBy()).alias("_nk"),
        F.sum(F.col("cnt") * F.col("n_keys_at"))
        .over(Window.partitionBy())
        .alias("_nr"),
    )
    return cum.agg(
        F.max("_nr").cast("bigint").alias("n_rows"),
        F.max("_nk").cast("bigint").alias("n_keys"),
        F.max("cnt").cast("bigint").alias("max_cnt"),
        F.min(
            F.when(F.col("_cum") >= F.expr("(_nk * 500 + 999) div 1000"), F.col("cnt"))
        ).cast("bigint").alias("p50_cnt"),
        F.min(
            F.when(F.col("_cum") >= F.expr("(_nk * 990 + 999) div 1000"), F.col("cnt"))
        ).cast("bigint").alias("p99_cnt"),
        F.expr("max(cnt) * 1000000 div max(_nr)").cast("bigint").alias("top_share_ppm"),
        F.expr("max(cnt) * max(_nk) * 1000 div max(_nr)").cast("bigint").alias("skew_x1000"),
        F.sum(
            F.when(
                F.col("cnt") * F.col("_nk") > F.col("_nr") * 2,
                F.col("n_keys_at"),
            ).otherwise(F.lit(0))
        ).cast("bigint").alias("hot_keys"),
    )


def key_skew_profile_sql(table: str = "events", key_col: str = "user_id") -> str:
    return f"""
WITH counts AS (
    SELECT {key_col} AS k, count(*) AS cnt FROM {table} GROUP BY {key_col}
),
hist AS (
    SELECT cnt, count(*) AS n_keys_at FROM counts GROUP BY cnt
),
cum AS (
    SELECT cnt, n_keys_at,
           sum(n_keys_at) OVER (ORDER BY cnt ROWS UNBOUNDED PRECEDING) AS cum,
           sum(n_keys_at) OVER () AS nk,
           sum(cnt * n_keys_at) OVER () AS nr
    FROM hist
)
SELECT CAST(max(nr) AS BIGINT) AS n_rows,
       CAST(max(nk) AS BIGINT) AS n_keys,
       CAST(max(cnt) AS BIGINT) AS max_cnt,
       CAST(min(CASE WHEN cum >= (nk * 500 + 999) // 1000 THEN cnt END) AS BIGINT) AS p50_cnt,
       CAST(min(CASE WHEN cum >= (nk * 990 + 999) // 1000 THEN cnt END) AS BIGINT) AS p99_cnt,
       CAST(max(cnt) * 1000000 // max(nr) AS BIGINT) AS top_share_ppm,
       CAST(max(cnt) * max(nk) * 1000 // max(nr) AS BIGINT) AS skew_x1000,
       CAST(sum(CASE WHEN cnt * nk > nr * 2 THEN n_keys_at ELSE 0 END) AS BIGINT) AS hot_keys
FROM cum
"""
