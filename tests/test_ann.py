"""ANN guardrails: the exact baseline is bounded by design."""

def test_exact_topk_refuses_oversized_input(spark):
    """The O(n²) baseline is bounded: past EXACT_TOPK_MAX_ROWS it fails
    loudly with a pointer to the LSH/IVF scale tiers."""
    import pytest

    from azure_pdf_parser_spark.operators import ann

    vecs = spark.range(10).selectExpr(
        "cast(id as string) AS vec_id",
        "array(cast(id as float), 1.0f) AS embedding",
    )
    with pytest.raises(ValueError, match="lsh_cosine_topk"):
        ann.cosine_topk(vecs, k=2, max_rows=5)
    # within bound and explicitly unbounded both run
    assert ann.cosine_topk(vecs, k=2, max_rows=10).count() > 0
    assert ann.cosine_topk(vecs, k=2, max_rows=None).count() > 0


def test_ivf_index_save_load_query_parity(spark, tmp_path):
    """IVF index lifecycle: the persisted centroid-partitioned index,
    queried with its own vectors, must reproduce the in-memory ivf_topk
    exactly; probing one centroid must prune partitions at planning
    time (the directory layout IS the inverted file)."""
    from pyspark.sql import functions as F

    from azure_pdf_parser_spark.caching import release_all
    from azure_pdf_parser_spark.operators import ann
    from azure_pdf_parser_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    path = str(tmp_path / "ivf_index")
    ann.save_ivf_index(emb, path)
    index = ann.load_ivf_index(spark, path)

    got = ann.ivf_query_topk(index, emb, k=5)
    want = ann.ivf_topk(emb, k=5)
    release_all()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0

    probe = index.where(F.col("centroid_id") == 3)
    plan = probe._sc._jvm.PythonSQLUtils.explainString(
        probe._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan and "centroid_id" in plan, plan
    assert probe.count() > 0
