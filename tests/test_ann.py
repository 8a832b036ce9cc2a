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
