"""PageRank operator properties (oracle parity is covered for the
registry gate by tests/test_queries_vs_oracle.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from azure_pdf_parser_spark.operators import graph
from tests.conftest import SF_DIR


def _toy(spark, edges):
    nodes = spark.createDataFrame(
        [(i,) for i in sorted({n for e in edges for n in e})], "node long"
    )
    edf = spark.createDataFrame(edges, "src long, dst long")
    return nodes, edf


def test_rank_mass_conserved_without_dangling(spark):
    # 0→1→2→0 cycle: every node has out-degree 1, so no mass is dropped
    # beyond integer-floor dust; ranks stay equal by symmetry.
    nodes, edges = _toy(spark, [(0, 1), (1, 2), (2, 0)])
    rows = graph.pagerank(nodes, edges, iters=6).collect()
    ranks = {r.node: r.rank_pico for r in rows}
    assert len(set(ranks.values())) == 1  # symmetric cycle → equal ranks
    total = sum(ranks.values())
    assert 0.999 * graph.RANK_SCALE < total <= graph.RANK_SCALE


def test_dangling_node_drops_mass_but_computes(spark):
    # 2 is a sink (no out-edges): its mass is dropped (weakly
    # preferential variant), never a crash or a NULL rank.
    nodes, edges = _toy(spark, [(0, 2), (1, 2)])
    rows = graph.pagerank(nodes, edges, iters=3).collect()
    ranks = {r.node: r.rank_pico for r in rows}
    assert set(ranks) == {0, 1, 2}
    assert all(v is not None and v > 0 for v in ranks.values())
    assert ranks[2] > ranks[0] == ranks[1]
    assert sum(ranks.values()) < graph.RANK_SCALE  # sink mass dropped


def test_parallel_edges_weight_the_link(spark):
    # 0 links twice to 1 and once to 2: 1 must outrank 2.
    nodes, edges = _toy(spark, [(0, 1), (0, 1), (0, 2), (1, 0), (2, 0)])
    ranks = {
        r.node: r.rank_pico
        for r in graph.pagerank(nodes, edges, iters=8).collect()
    }
    assert ranks[1] > ranks[2]


def test_result_invariant_to_input_partitioning(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    base = {
        r.node: r.rank_pico
        for r in graph.pagerank_documents(docs, iters=2).collect()
    }
    shuffled = {
        r.node: r.rank_pico
        for r in graph.pagerank_documents(docs.repartition(13), iters=2).collect()
    }
    assert base == shuffled  # integer fixed point → order-independent


def test_synthesized_edges_have_no_self_loops(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    edges = graph.synthesize_edges(docs)
    assert edges.where(F.col("src") == F.col("dst")).count() == 0
