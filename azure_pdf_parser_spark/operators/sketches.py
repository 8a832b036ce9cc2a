"""Mergeable summary sketches: deterministic HyperLogLog (cardinality),
Count-Min (point frequency), and HDR log-linear histogram (quantiles).

At 100 TB, ``COUNT(DISTINCT token)`` per group is the classic shuffle
bomb: the exchange carries every distinct (group, token) pair — at
crawl scale that is the token stream itself. The HLL register table
replaces it with a groupBy on (group, register) whose map-side partial
is a max — the shuffle carries at most ``groups × m`` rows (m = 256
here) no matter how many tokens flow in. The register table IS the
sketch: persist it per shard/day and merging is another max-groupBy,
which is how production pipelines keep running distinct-counts over a
growing corpus without ever rescanning it.

Spark has ``approx_count_distinct`` (its own HLL++); this module
exists because (a) the REGISTER TABLE is exposed as a first-class
mergeable artifact rather than an opaque aggregate, and (b) the whole
construction is deterministic integer arithmetic on md5 — identical
in DuckDB — so the correctness gate can demand bit-exact equality,
which no builtin-vs-builtin estimator pair can offer.

Construction (Flajolet et al. 2007, HyperLogLog):
- register index = first 8 bits of md5(token) → m = 256 registers
- rho = leading-zero count of the next 32 bits, plus 1; computed as
  ``33 - length(bin(w))`` — ``bin()`` (minimal-length binary string)
  is exact-integer in both engines, no float log2 near power-of-two
  boundaries
- estimate = alpha_m * m^2 / sum_j 2^(-M_j), evaluated in pure int64:
  each register contributes ``2^(40 - M_j)`` (absent registers, M_j=0,
  contribute 2^40), and the alpha_m * m^2 * 2^40 numerator is a single
  precomputed integer literal shared verbatim with the oracle SQL.

Deviation (documented): the small-range linear-counting correction is
omitted — it needs a float ln() whose cross-engine bit-identity is not
guaranteed, and the sketch's purpose is large cardinalities where the
raw estimator is the right branch anyway. The gate reports the exact
distinct count alongside (cheap at test scale; at production scale the
exact column is what you could NOT afford — drop it) so the ~6.5%
standard error (1.04/sqrt(256)) is visible in the output itself.

Reference analog: none (azure-pdf-parser has no aggregation layer);
engine addition alongside the LM/TF-IDF corpus-statistics suite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

P_BITS = 8
M = 1 << P_BITS  # 256 registers
_W_BITS = 32  # width of the rho window
_SHIFT = 40  # fixed-point scale exponent for the harmonic sum
# alpha_m for m >= 128: 0.7213 / (1 + 1.079/m); numerator of the
# estimator as one integer literal = round(alpha_m * m^2 * 2^SHIFT)
ALPHA_NUM = round(0.7213 / (1 + 1.079 / M) * M * M * (1 << _SHIFT))


def hll_registers(rows: DataFrame, group_col: str, item_col: str) -> DataFrame:
    """(group, reg, rho): the mergeable sketch — max rho per register.
    Merging two sketches = union + the same max-groupBy."""
    h = F.md5(F.col(item_col))
    reg = F.conv(F.substring(h, 1, 2), 16, 10).cast("int").alias("reg")
    w = F.conv(F.substring(h, 3, 8), 16, 10).cast("bigint")
    rho = (
        F.when(w == 0, F.lit(_W_BITS + 1))
        .otherwise(F.lit(_W_BITS + 1) - F.length(F.bin(w)))
        .cast("int")
    )
    return (
        rows.select(F.col(group_col).alias("grp"), reg, rho.alias("rho_raw"))
        .groupBy("grp", "reg")
        .agg(F.max("rho_raw").alias("rho"))
    )


def hll_estimate(registers: DataFrame) -> DataFrame:
    """(grp, hll_estimate): integer-exact raw-HLL estimator over a
    register table (one tiny groupBy: ≤ m rows per group in)."""
    return registers.groupBy("grp").agg(
        F.expr(
            f"{ALPHA_NUM}L div (sum(shiftleft(1L, {_SHIFT} - rho))"
            f" + ({M} - count(*)) * shiftleft(1L, {_SHIFT}))"
        ).alias("hll_estimate")
    )


def hll_distinct_tokens(documents: DataFrame) -> DataFrame:
    """Gate: per-source distinct-token cardinality — HLL estimate next
    to the exact count, with the absolute error in permille. All-int64
    output, bit-exact vs the oracle."""
    tok = documents.where(F.col("text").isNotNull()).select(
        "source", F.explode(F.split("text", " ")).alias("token")
    )
    est = hll_estimate(hll_registers(tok, "source", "token"))
    exact = tok.groupBy("source").agg(
        F.countDistinct("token").alias("n_exact")
    )
    return (
        exact.join(est, exact.source == est.grp)
        .select(
            "source",
            "n_exact",
            "hll_estimate",
            F.expr("abs(hll_estimate - n_exact) * 1000 div n_exact").alias(
                "err_permille"
            ),
        )
    )


HLL_DISTINCT_SQL = f"""
WITH tok AS (
    SELECT source, UNNEST(string_split(text, ' ')) AS token
    FROM documents WHERE text IS NOT NULL
),
hashed AS (
    SELECT source,
           CAST(('0x' || substr(md5(token), 1, 2)) AS INT) AS reg,
           CAST(('0x' || substr(md5(token), 3, 8)) AS BIGINT) AS w
    FROM tok
),
regs AS (
    SELECT source, reg,
           max(CASE WHEN w = 0 THEN {_W_BITS + 1}
                    ELSE {_W_BITS + 1} - length(bin(w)) END) AS rho
    FROM hashed GROUP BY source, reg
),
est AS (
    SELECT source,
           {ALPHA_NUM} // (sum(1::BIGINT << ({_SHIFT} - rho))
               + ({M} - count(*)) * (1::BIGINT << {_SHIFT})) AS hll_estimate
    FROM regs GROUP BY source
),
exact AS (
    SELECT source, count(DISTINCT token) AS n_exact FROM tok GROUP BY source
)
SELECT exact.source,
       CAST(n_exact AS BIGINT) AS n_exact,
       CAST(hll_estimate AS BIGINT) AS hll_estimate,
       CAST(abs(hll_estimate - n_exact) * 1000 // n_exact AS BIGINT)
           AS err_permille
FROM exact JOIN est ON exact.source = est.source
"""


# --- Count-Min sketch ----------------------------------------------------------

CMS_DEPTH = 4     # independent hash rows
CMS_WIDTH = 1024  # counters per row


def _cms_col(token, j: int):
    """Row-j counter index: an independent md5 per row (salted), first
    32 bits mod width — same construction as the minhash family."""
    h = F.md5(F.concat(token, F.lit(f":cms{j}")))
    return (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % CMS_WIDTH
    ).cast("int")


def cms_cells(rows: DataFrame, item_col: str) -> DataFrame:
    """(row_idx, col, c): the Count-Min sketch as a table — ≤
    depth×width rows no matter the input size. Mergeable: union two
    sketches and re-sum.

    Scale shape: the token stream collapses through ONE groupBy on the
    item first (map-side partials eat the Zipf head), so the per-row
    expansion ×depth runs over DISTINCT items and the second groupBy's
    exchange carries ≤ depth×width cells per map task. The CMS answers
    point frequency queries with ε = e/width overcount (never under)
    using constant memory — the frequency twin of the HLL register
    table above.
    """
    counts = (
        rows.select(F.col(item_col).alias("item"))
        .groupBy("item")
        .agg(F.count("*").alias("n"))
    )
    cells = counts.select(
        "n",
        F.posexplode(
            F.array(*[_cms_col(F.col("item"), j) for j in range(CMS_DEPTH)])
        ).alias("row_idx", "col"),
    )
    return cells.groupBy("row_idx", "col").agg(F.sum("n").alias("c"))


def cms_point_estimates(documents: DataFrame, k: int = 20) -> DataFrame:
    """Gate: sketch the corpus token stream, then point-query the k
    true-top tokens — (token, true_n, cms_estimate, overestimate).
    The CMS guarantee (estimate ≥ truth, overcount bounded by the
    colliding mass) is visible in the output; all-integer, bit-exact.

    The true counts are the verification column (exact top-k via
    TakeOrdered — affordable here, the thing you could NOT afford at
    crawl scale, where the sketch is the only frequency table and the
    probe side is whatever token set you care about)."""
    tok = documents.where(F.col("text").isNotNull()).select(
        F.explode(F.split("text", " ")).alias("token")
    )
    sketch = cms_cells(tok, "token")
    top = (
        tok.groupBy("token")
        .agg(F.count("*").alias("true_n"))
        .orderBy(F.col("true_n").desc(), F.col("token").asc())
        .limit(k)
    )
    probes = top.select(
        "token",
        "true_n",
        F.posexplode(
            F.array(*[_cms_col(F.col("token"), j) for j in range(CMS_DEPTH)])
        ).alias("row_idx", "col"),
    )
    return (
        probes.join(F.broadcast(sketch), ["row_idx", "col"])
        .groupBy("token", "true_n")
        .agg(F.min("c").alias("cms_estimate"))
        .select(
            "token",
            F.col("true_n").cast("bigint").alias("true_n"),
            F.col("cms_estimate").cast("bigint").alias("cms_estimate"),
            (F.col("cms_estimate") - F.col("true_n"))
            .cast("bigint")
            .alias("overestimate"),
        )
    )


def cms_point_estimates_sql(k: int = 20) -> str:
    def _cols(ident: str) -> str:
        return ", ".join(
            f"CAST(CAST(('0x' || substr(md5({ident} || ':cms{j}'), 1, 8)) AS "
            f"BIGINT) % {CMS_WIDTH} AS INT)"
            for j in range(CMS_DEPTH)
        )

    col_exprs = _cols("item")
    probe_cols = _cols("token")
    return f"""
WITH tok AS (
    SELECT UNNEST(string_split(text, ' ')) AS item
    FROM documents WHERE text IS NOT NULL
),
counts AS (SELECT item, count(*) AS n FROM tok GROUP BY item),
cells AS (
    SELECT row_idx, col, sum(n) AS c FROM (
        SELECT n, UNNEST(range({CMS_DEPTH})) AS row_idx,
               UNNEST([{col_exprs}]) AS col
        FROM counts
    ) GROUP BY row_idx, col
),
top AS (
    SELECT item AS token, n AS true_n FROM counts
    ORDER BY n DESC, item ASC LIMIT {k}
),
probes AS (
    SELECT token, true_n, UNNEST(range({CMS_DEPTH})) AS row_idx,
           UNNEST([{probe_cols}]) AS col
    FROM top
)
SELECT p.token,
       CAST(p.true_n AS BIGINT) AS true_n,
       CAST(min(c.c) AS BIGINT) AS cms_estimate,
       CAST(min(c.c) - p.true_n AS BIGINT) AS overestimate
FROM probes p JOIN cells c ON p.row_idx = c.row_idx AND p.col = c.col
GROUP BY p.token, p.true_n
"""


# --- HDR (log-linear) quantile sketch -------------------------------------------

HDR_SUB_BITS = 4  # 16 sub-buckets per octave → rel. error ≤ 2^-4 = 6.25%
_HDR_SUB = 1 << HDR_SUB_BITS


def hdr_quantile_sketch(
    rows: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """(grp, bucket, cnt): the mergeable sketch — bounded bucket
    counts per group (≤ ~1k rows/group for the full int64 domain, vs
    the value DOMAIN for the exact table in operators/profile.py).
    Merging two sketches = union + re-sum, same as the CMS cells.

    Bucket id (HDR Histogram, log-linear): values < 2^S map to
    themselves (exact); above, octave ``e = floor(log2 v)`` holds 2^S
    sub-buckets of width 2^(e-S). The octave comes from
    ``length(bin(v))`` — exact-integer in both engines, same trick as
    the HLL rho — never a float log2 near power-of-two boundaries."""
    v = F.col("_v")
    e = F.length(F.bin(v)) - F.lit(1 + HDR_SUB_BITS)
    bucket = (
        F.when(v < _HDR_SUB, v)
        .otherwise(
            e.cast("bigint") * _HDR_SUB
            + F.expr(
                f"_v div shiftleft(1L, length(bin(_v)) - {1 + HDR_SUB_BITS})"
            )
        )
        .cast("bigint")
    )
    return (
        rows.where(F.col(value_col).isNotNull())
        .select(
            F.col(group_col).alias("grp"),
            F.col(value_col).cast("bigint").alias("_v"),
        )
        .select("grp", bucket.alias("bucket"))
        .groupBy("grp", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def _hdr_lower_bound() -> "F.Column":
    """Smallest value mapping into the ``bucket`` column (the sketch's
    quantile answer — an underestimate by at most the sub-bucket
    width, i.e. relative error ≤ 2^-S). Integer arithmetic only;
    resolves the input column by the fixed name ``bucket`` (the
    sketch-table schema), taking no argument so a caller can't half-
    rename it."""
    bucket = F.col("bucket")
    k = F.expr(f"bucket div {_HDR_SUB} - 1")
    return F.when(bucket < _HDR_SUB, bucket).otherwise(
        (bucket - k * _HDR_SUB)
        * F.expr(f"shiftleft(1L, cast(bucket div {_HDR_SUB} - 1 as int))")
    )


def hdr_quantiles(
    documents: DataFrame,
    group_col: str = "source",
    value_col: str = "n_chars",
    percentiles_milli: tuple[int, ...] = (500, 900, 990),
) -> DataFrame:
    """Gate: sketch per-group value quantiles, report them NEXT TO the
    exact percentiles (operators/profile.py machinery) with the error
    in permille — the quantile member of the sketch trio (HLL =
    cardinality, CMS = frequency, HDR = quantiles).

    Why a third quantile path exists (vs value_percentiles, which is
    exact): the exact table's shuffle is bounded by the value DOMAIN —
    fine for n_chars, unbounded for e.g. byte sizes or latencies at
    crawl scale. The HDR bucket table is ≤ ~1k rows per group for the
    ENTIRE int64 domain, mergeable across shards/days by re-sum, and
    the rank-select over it is the identical cumulative-window +
    integer-ceil threshold — so you keep running quantiles over a
    growing corpus without rescanning it, at a guaranteed ≤ 2^-S
    relative error that the gate output makes visible per row.
    """
    from pyspark.sql.window import Window

    from azure_pdf_parser_spark.operators.profile import value_percentiles

    sketch = hdr_quantile_sketch(documents, group_col, value_col)
    w_cum = (
        Window.partitionBy("grp")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = sketch.select(
        "grp",
        _hdr_lower_bound().cast("bigint").alias("lb"),
        F.sum("cnt").over(w_cum).alias("_cum"),
        F.sum("cnt").over(Window.partitionBy("grp")).alias("_n"),
    )
    aggs = [F.max("_n").cast("bigint").alias("n")]
    for pm in percentiles_milli:
        aggs.append(
            F.min(
                F.when(
                    F.col("_cum") >= F.expr(f"(_n * {pm} + 999) div 1000"),
                    F.col("lb"),
                )
            )
            .cast("bigint")
            .alias(f"p{pm}_est")
        )
    est = cum.groupBy("grp").agg(*aggs)
    exact = value_percentiles(
        documents, group_col, value_col, percentiles_milli
    )
    err = [
        F.expr(f"abs(p{pm} - p{pm}_est) * 1000 div greatest(p{pm}, 1)")
        .cast("bigint")
        .alias(f"err{pm}_permille")
        for pm in percentiles_milli
    ]
    return est.join(exact, ["grp"]).select(
        "grp",
        est.n.alias("n"),
        *[F.col(f"p{pm}_est") for pm in percentiles_milli],
        *[F.col(f"p{pm}").cast("bigint").alias(f"p{pm}") for pm in percentiles_milli],
        *err,
    )


def hdr_quantiles_sql(
    group_col: str = "source",
    value_col: str = "n_chars",
    percentiles_milli: tuple[int, ...] = (500, 900, 990),
) -> str:
    s = HDR_SUB_BITS
    sub = _HDR_SUB
    est_terms = ",\n       ".join(
        f"CAST(min(CASE WHEN cum >= (n * {pm} + 999) // 1000 THEN lb END) "
        f"AS BIGINT) AS p{pm}_est"
        for pm in percentiles_milli
    )
    exact_terms = ",\n       ".join(
        f"CAST(min(CASE WHEN cum >= (n * {pm} + 999) // 1000 THEN v END) "
        f"AS BIGINT) AS p{pm}"
        for pm in percentiles_milli
    )
    err_terms = ",\n       ".join(
        f"CAST(abs(p{pm} - p{pm}_est) * 1000 // greatest(p{pm}, 1) AS BIGINT) "
        f"AS err{pm}_permille"
        for pm in percentiles_milli
    )
    return f"""
WITH vals AS (
    SELECT {group_col} AS grp, CAST({value_col} AS BIGINT) AS v
    FROM documents WHERE {value_col} IS NOT NULL
),
sketch AS (
    SELECT grp,
           CASE WHEN v < {sub} THEN v
                ELSE (length(bin(v)) - {1 + s}) * {sub}
                     + v // (1::BIGINT << (length(bin(v)) - {1 + s}))
           END AS bucket,
           count(*) AS cnt
    FROM vals GROUP BY 1, 2
),
cum AS (
    SELECT grp,
           CASE WHEN bucket < {sub} THEN bucket
                ELSE (bucket - (bucket // {sub} - 1) * {sub})
                     * (1::BIGINT << CAST(bucket // {sub} - 1 AS INT))
           END AS lb,
           sum(cnt) OVER (PARTITION BY grp ORDER BY bucket
                          ROWS UNBOUNDED PRECEDING) AS cum,
           sum(cnt) OVER (PARTITION BY grp) AS n
    FROM sketch
),
est AS (
    SELECT grp, CAST(max(n) AS BIGINT) AS n,
       {est_terms}
    FROM cum GROUP BY grp
),
exact_cum AS (
    SELECT grp, v,
           sum(c) OVER (PARTITION BY grp ORDER BY v
                        ROWS UNBOUNDED PRECEDING) AS cum,
           sum(c) OVER (PARTITION BY grp) AS n
    FROM (SELECT grp, v, count(*) AS c FROM vals GROUP BY grp, v)
),
exact AS (
    SELECT grp,
       {exact_terms}
    FROM exact_cum GROUP BY grp
)
SELECT est.grp, est.n,
       {", ".join(f"p{pm}_est" for pm in percentiles_milli)},
       {", ".join(f"p{pm}" for pm in percentiles_milli)},
       {err_terms}
FROM est JOIN exact ON est.grp = exact.grp
"""
