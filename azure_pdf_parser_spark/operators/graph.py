"""Link-graph authority scoring: distributed PageRank.

Production crawl pipelines rank hosts/pages by link authority to
prioritize the crawl frontier and to weight corpus sampling (Common
Crawl publishes exactly this as its harmonic-centrality / PageRank
host ranks). Reference analog: none (azure-pdf-parser sees documents
one at a time with no link structure); this module is an engine
addition alongside the URL/domain curation suite in
``operators/urls.py``.

Edge source
-----------
The sandbox ``documents`` table carries no link column, so
:func:`synthesize_edges` derives a deterministic graph — doc ``i``
links to ``(i*17 + 3 + 7j) mod n`` for ``j in 1..degree`` (self-loops
dropped) — the same derivation-seam pattern as ``urls.synthesize_url``.
``n`` enters the plan as a broadcast one-row aggregate, never a driver
collect. In production the edge table comes straight off the crawl
record (href extraction) and :func:`pagerank` runs unchanged on it:
it takes any ``nodes(node)`` + ``edges(src, dst)`` pair and computes
real out-degrees from the edge table itself.

Determinism / oracle strategy
-----------------------------
All rank arithmetic is 64-bit integer fixed point at scale 10^12
("pico-ranks"): per-edge contributions floor-divide BEFORE the sum, so
every aggregation is an integer sum — order-independent, bit-exact
across Spark and DuckDB. The iteration count is FIXED (no convergence
check), so the oracle is the same recurrence unrolled as chained CTEs.
Dangling nodes (no out-edges — impossible under the synthesis seam but
possible for real crawl graphs) keep the "weakly preferential" variant:
their mass is dropped rather than redistributed, the common choice when
a per-iteration global scalar is not worth its cost.

Scale shape (the 100 TB story)
------------------------------
Per iteration: one equi-join of the rank table (O(nodes) rows) against
the degree-annotated edge table on ``src``, one groupBy ``dst`` with
map-side partial sums (contributions collapse per reducer input
partition), one left join back onto the node base. The edge table is
localCheckpoint-ed ONCE with its out-degrees attached — at production
scale it is a bucketed-by-src Iceberg table, making the per-iteration
rank join exchange ranks only (node-sized, not edge-sized). Lineage is
truncated per round exactly like ``dedup.connected_components``; the
loop is O(iters) jobs with no driver-side data movement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# fixed-point scale: ranks sum to ~10^12; 85 * 10^12 stays far under
# the int64 ceiling, and (1/n)-granularity error is ~10^-9 at n=10^3
RANK_SCALE = 1_000_000_000_000
DAMP_NUM = 85  # damping factor 0.85 as an exact integer ratio
DAMP_DEN = 100
DEFAULT_DEGREE = 3
DEFAULT_ITERS = 4

# synthesis-seam constants (mirrored verbatim in the oracle SQL)
_EDGE_A = 17
_EDGE_B = 3
_EDGE_C = 7


def synthesize_edges(documents: DataFrame, degree: int = DEFAULT_DEGREE) -> DataFrame:
    """(src, dst): deterministic link graph over the documents table —
    derivation seam (see module docstring). ``n`` is attached via a
    broadcast one-row count aggregate so the plan stays fully lazy."""
    n = documents.agg(F.count("*").alias("_n"))
    return (
        documents.select(F.col("doc_id").alias("src"))
        .crossJoin(F.broadcast(n))
        .select(
            "src",
            F.explode(
                F.array(*[F.lit(j) for j in range(1, degree + 1)])
            ).alias("_j"),
            "_n",
        )
        .select(
            "src",
            (
                (F.col("src") * _EDGE_A + _EDGE_B + F.col("_j") * _EDGE_C)
                % F.col("_n")
            ).alias("dst"),
        )
        .where(F.col("dst") != F.col("src"))
    )


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    iters: int = DEFAULT_ITERS,
) -> DataFrame:
    """(node, rank_pico): fixed-iteration integer PageRank.

    ``nodes`` must have a ``node`` column, ``edges`` columns
    ``src``/``dst`` (parallel edges allowed — they weight the link).
    Ranks are pico-scaled bigints (see module docstring); the result
    sums to ≤ RANK_SCALE (dangling/edge-floor mass is dropped).
    """
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    # degree-annotated edges: built once, reused every iteration
    edges_deg = edges.join(deg, "src").localCheckpoint()

    n = nodes.agg(F.count("*").alias("_n"))
    ranks = (
        nodes.select("node")
        .crossJoin(F.broadcast(n))
        .select(
            "node",
            F.expr(f"{RANK_SCALE}L div _n").alias("rank"),
            F.expr(
                f"(({RANK_SCALE}L div _n) * {DAMP_DEN - DAMP_NUM}) div {DAMP_DEN}"
            ).alias("base"),
        )
        .localCheckpoint()
    )

    for _ in range(iters):
        contrib = (
            edges_deg.join(ranks, edges_deg.src == ranks.node)
            .select("dst", F.expr("rank div outdeg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("insum"))
        )
        ranks = (
            ranks.join(contrib, ranks.node == contrib.dst, "left")
            .select(
                "node",
                F.expr(
                    f"base + ({DAMP_NUM} * coalesce(insum, 0L)) div {DAMP_DEN}"
                ).alias("rank"),
                "base",
            )
            .localCheckpoint()
        )
    return ranks.select("node", F.col("rank").alias("rank_pico"))


def pagerank_documents(
    documents: DataFrame,
    degree: int = DEFAULT_DEGREE,
    iters: int = DEFAULT_ITERS,
) -> DataFrame:
    """Gate entry: synthesized edge seam → PageRank over the corpus."""
    nodes = documents.select(F.col("doc_id").alias("node"))
    return pagerank(nodes, synthesize_edges(documents, degree), iters)


def _iter_cte(i: int) -> str:
    """One unrolled oracle iteration: r{i} from r{i-1}."""
    return f"""
r{i} AS (
    SELECT nodes.node,
           (SELECT base FROM b)
             + ({DAMP_NUM} * coalesce(s.insum, 0)) // {DAMP_DEN} AS rank
    FROM nodes
    LEFT JOIN (
        SELECT e.dst AS node, sum(r{i - 1}.rank // deg.outdeg) AS insum
        FROM edges e
        JOIN r{i - 1} ON e.src = r{i - 1}.node
        JOIN deg ON e.src = deg.src
        GROUP BY e.dst
    ) s ON nodes.node = s.node
)"""


def pagerank_sql(degree: int = DEFAULT_DEGREE, iters: int = DEFAULT_ITERS) -> str:
    """Oracle: the identical integer recurrence, iterations unrolled as
    chained CTEs (fixed iteration count makes recursion unnecessary)."""
    js = ", ".join(str(j) for j in range(1, degree + 1))
    head = f"""
WITH nodes AS (SELECT doc_id AS node FROM documents),
nn AS (SELECT count(*) AS n FROM nodes),
edges AS (
    SELECT doc_id AS src,
           (doc_id * {_EDGE_A} + {_EDGE_B} + j * {_EDGE_C})
               % (SELECT n FROM nn) AS dst
    FROM documents
    CROSS JOIN (SELECT UNNEST([{js}]) AS j) js
    WHERE (doc_id * {_EDGE_A} + {_EDGE_B} + j * {_EDGE_C})
              % (SELECT n FROM nn) <> doc_id
),
deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
b AS (
    SELECT (({RANK_SCALE} // (SELECT n FROM nn)) * {DAMP_DEN - DAMP_NUM})
               // {DAMP_DEN} AS base
),
r0 AS (
    SELECT node, {RANK_SCALE} // (SELECT n FROM nn) AS rank FROM nodes
)"""
    body = ",".join(_iter_cte(i) for i in range(1, iters + 1))
    return (
        head
        + ","
        + body
        + f"\nSELECT node, CAST(rank AS BIGINT) AS rank_pico FROM r{iters}"
    )
