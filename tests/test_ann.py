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


def test_semantic_dedup_keeps_lowest_id_per_group(spark):
    """SemDeDup semantics on a hand-built corpus: near-identical vectors
    land in one cluster and only the lowest vec_id survives; distinct
    directions all survive. (The kept-despite-co-clustering path is
    exercised by the sf0.01 oracle gate, where most within-cluster
    cosines sit below the threshold.)"""
    from azure_pdf_parser_spark.caching import release_all
    from azure_pdf_parser_spark.operators import ann

    rows = [
        # 8 codebook rows (vec_id < N_CENTROIDS): spread directions
        (0, [1.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0]),
        (2, [0.0, 0.0, 1.0]),
        (3, [-1.0, 0.0, 0.0]),
        (4, [0.0, -1.0, 0.0]),
        (5, [0.0, 0.0, -1.0]),
        (6, [1.0, 1.0, 0.0]),
        (7, [1.0, 0.0, 1.0]),
        # a duplicate group near +x: 100 dups 0, 101 dups both
        (100, [0.99, 0.01, 0.0]),
        (101, [0.98, 0.02, 0.0]),
        # near +y but nearly orthogonal to everything in its dup radius
        (200, [0.01, 0.99, 0.02]),
    ]
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows], "vec_id long, embedding array<float>"
    )
    got = {
        r["vec_id"]: (r["centroid_id"], r["keep"])
        for r in ann.semantic_dedup(emb, threshold=0.35).collect()
    }
    release_all()
    assert len(got) == len(rows)
    # 100/101 cluster with centroid 0 and duplicate it: dropped
    assert got[100] == (0, False)
    assert got[101] == (0, False)
    # the codebook rows are their own lowest-id representatives
    assert got[0] == (0, True)
    # 200 clusters with +y (centroid 1) and duplicates it: dropped;
    # centroid 1 itself survives as the group representative
    assert got[200][0] == 1 and got[200][1] is False
    assert got[1] == (1, True)


def test_semantic_dedup_plan_is_equi_join(spark):
    """The within-cluster compare must shuffle on centroid_id (sort-merge
    or hash equi-join) — never a cartesian / broadcast-nested-loop."""
    from azure_pdf_parser_spark.caching import release_all
    from azure_pdf_parser_spark.operators import ann
    from azure_pdf_parser_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    df = ann.semantic_dedup(emb)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    release_all()
    assert "CartesianProduct" not in plan, plan
    # the only BroadcastNestedLoopJoin allowed is the tiny-codebook
    # assignment (ivf_assign); the pair-generation join keys on centroid_id.
    # Count DISTINCT node ids — the persisted `assigned` subtree (and its
    # single BNLJ) is printed at each of its three reuse sites.
    import re

    bnlj_ids = set(re.findall(r"\((\d+)\) BroadcastNestedLoopJoin", plan))
    assert len(bnlj_ids) <= 1, plan
    # and the pair-generation join itself is an equi-join on centroid_id
    assert re.search(
        r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) Inner", plan
    ), plan


def test_kmeans_refine_improves_quantization(spark):
    """Lloyd's refinement must tighten the codebook: the mean
    nearest-centroid cosine of the assignment strictly improves over
    the deterministic seed codebook on the fixed test corpus, and the
    codebook stays exactly N_CENTROIDS strong (empty clusters keep
    their previous centroid — never dropped, never reseeded)."""
    from pyspark.sql import functions as F

    from azure_pdf_parser_spark.caching import release_all
    from azure_pdf_parser_spark.operators import ann
    from tests.conftest import SF_DIR

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    def mean_ccos(cents) -> float:
        base = ann.with_norm(emb)
        scored = base.join(F.broadcast(cents)).select(
            "vec_id",
            (
                ann._dot(F.col("vec"), F.col("cvec"))
                / (F.col("norm") * F.col("cnorm"))
            ).alias("ccos"),
        )
        best = scored.groupBy("vec_id").agg(F.max("ccos").alias("best"))
        return best.agg(F.avg("best")).collect()[0][0]

    try:
        seed = ann.ivf_centroids(emb)
        refined = ann.kmeans_refine(emb)
        assert refined.count() == ann.N_CENTROIDS
        assert mean_ccos(refined) > mean_ccos(seed)
    finally:
        release_all()


def test_kmeans_refine_never_self_joins_vectors(spark):
    """The fit must stay linear in the corpus: every assignment step is
    a broadcast of the (tiny) codebook into the vector table — no
    sort-merge/shuffled join of the vector table against anything, at
    any iteration."""
    from azure_pdf_parser_spark.caching import release_all
    from azure_pdf_parser_spark.operators import ann
    from tests.conftest import SF_DIR

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    try:
        df = ann.kmeans_refine(emb)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        assert "SortMergeJoin" not in plan, plan
        assert "CartesianProduct" not in plan, plan
    finally:
        release_all()


def test_refined_ivf_index_lifecycle(spark, tmp_path):
    """Refined-index lifecycle: save with refine_iters=2 persists the
    fitted codebook; loading it and querying the index's own vectors
    must reproduce the in-memory refined pipeline exactly. Assigning
    the same queries with the SEED codebook instead probes different
    lists — the mismatch load_ivf_codebook exists to prevent."""
    from azure_pdf_parser_spark.caching import release_all
    from azure_pdf_parser_spark.operators import ann
    from tests.conftest import SF_DIR

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    path = str(tmp_path / "ivf_refined")
    try:
        ann.save_ivf_index(emb, path, refine_iters=2)
        index = ann.load_ivf_index(spark, path)
        book = ann.load_ivf_codebook(spark, path, index)

        got = sorted(
            (r.vec_id, r.neighbor_id, r.rank)
            for r in ann.ivf_query_topk(index, emb, k=5, codebook=book).collect()
        )
        # in-memory reference: assign with the refined codebook and
        # run the same within-list top-k
        cents = ann.kmeans_refine(emb, 2)
        assigned = ann.ivf_assign(emb, centroids=cents)
        from pyspark.sql import functions as F
        from pyspark.sql.window import Window

        a, b = assigned.alias("a"), assigned.alias("b")
        pairs = a.join(
            b,
            (F.col("a.centroid_id") == F.col("b.centroid_id"))
            & (F.col("a.vec_id") != F.col("b.vec_id")),
        ).select(
            F.col("a.vec_id").alias("vec_id"),
            F.col("b.vec_id").alias("neighbor_id"),
            F.round(
                ann._dot(F.col("a.vec"), F.col("b.vec"))
                / (F.col("a.norm") * F.col("b.norm")),
                6,
            ).alias("cosine"),
        )
        w = Window.partitionBy("vec_id").orderBy(
            F.col("cosine").desc(), F.col("neighbor_id").asc()
        )
        want = sorted(
            (r.vec_id, r.neighbor_id, r.rank)
            for r in pairs.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= 5)
            .collect()
        )
        assert got == want
        # the persisted codebook is the refined one, not the seed
        seed = {
            (r.centroid_id, tuple(r.cvec))
            for r in ann.ivf_centroids(emb).collect()
        }
        loaded = {(r.centroid_id, tuple(r.cvec)) for r in book.collect()}
        assert loaded != seed
    finally:
        release_all()


def test_pq_codes_are_compact_and_deterministic(spark):
    """PQ index rows: PQ_M codes per vector, each in [0, PQ_K); the
    first PQ_K vectors (the codeword donors) encode to themselves —
    their own subvector is at L2 distance 0."""
    from azure_pdf_parser_spark.caching import release_all
    from azure_pdf_parser_spark.operators import ann
    from azure_pdf_parser_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    try:
        emb = load_table(spark, SF_DIR, "embeddings")
        rows = {r["vec_id"]: r["codes"] for r in ann.pq_encode(emb).collect()}
    finally:
        release_all()
    assert len(rows) == emb.count()
    for vid, codes in rows.items():
        assert len(codes) == ann.PQ_M
        assert all(0 <= c < ann.PQ_K for c in codes)
    for vid in range(ann.PQ_K):
        assert rows[vid] == [vid] * ann.PQ_M, (vid, rows[vid])


def test_ivf_pq_recall_against_exact(spark):
    """ADC ranking over the IVF candidates must correlate with exact
    cosine over the same candidates. With the deterministic STAND-IN
    codewords (unfitted donor subvectors — production fits them, see
    kmeans_refine) on near-uniform synthetic embeddings, measured
    recall@5 vs exact-within-list is ~0.35; picking 5 of a ~60-vector
    centroid list at random would give ~0.08, so the sanity bar is
    0.25 — quantized scoring must carry real signal, not a fitted-
    codebook quality target."""
    from azure_pdf_parser_spark.caching import release_all
    from azure_pdf_parser_spark.operators import ann
    from azure_pdf_parser_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    try:
        emb = load_table(spark, SF_DIR, "embeddings")
        exact = {}
        for r in ann.ivf_topk(emb, k=5).collect():
            exact.setdefault(r["vec_id"], set()).add(r["neighbor_id"])
        pq = {}
        for r in ann.ivf_pq_topk(emb, k=5).collect():
            pq.setdefault(r["vec_id"], set()).add(r["neighbor_id"])
    finally:
        release_all()
    assert set(exact) == set(pq)  # same query set (same candidate lists)
    hits = sum(len(exact[q] & pq[q]) for q in exact)
    total = sum(len(exact[q]) for q in exact)
    assert total > 0
    recall = hits / total
    assert recall > 0.25, f"PQ recall@5 vs exact-within-list = {recall:.3f}"


def test_ivf_pq_plan_broadcasts_codebook_never_vectors(spark):
    """Scale pins: every join in the PQ chain is either a broadcast of
    a bounded-by-construction table (codebook, codebook-map) or an
    equi-join — no cartesian product, no sort-merge of the vector table
    against itself without the centroid key."""
    from azure_pdf_parser_spark.caching import release_all
    from azure_pdf_parser_spark.operators import ann
    from azure_pdf_parser_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    try:
        df = ann.ivf_pq_topk(load_table(spark, SF_DIR, "embeddings"), k=5)
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        release_all()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_semantic_order_is_contiguous_and_cluster_local(spark):
    """semantic_pos must be an exact 1..N permutation with every
    cluster occupying ONE contiguous block (the property a training
    context window relies on), and the corpus-sized rank window must
    shard on the centroid key — never a single-partition global rank."""
    from azure_pdf_parser_spark.operators import ann
    from azure_pdf_parser_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings")
    df = ann.semantic_order(emb)
    rows = df.collect()
    n = emb.count()
    assert sorted(r.semantic_pos for r in rows) == list(range(1, n + 1))
    spans = {}
    for r in rows:
        lo, hi, cnt = spans.get(r.centroid_id, (n + 1, 0, 0))
        spans[r.centroid_id] = (
            min(lo, r.semantic_pos), max(hi, r.semantic_pos), cnt + 1
        )
    for cid, (lo, hi, cnt) in spans.items():
        assert hi - lo + 1 == cnt, (cid, lo, hi, cnt)  # contiguous block

    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(centroid_id" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_rrf_fusion_union_and_score_semantics(spark):
    """Fused candidates must be exactly the union of the two tiers'
    lists (pre-cut), and a neighbor ranked #1 by BOTH tiers must score
    2 * floor(RRF_SCALE / (k0 + 1))."""
    from azure_pdf_parser_spark.operators import ann
    from azure_pdf_parser_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings")
    k = 5
    fused = ann.rrf_fusion(emb, k=k)
    lsh = {(r.vec_id, r.neighbor_id): r.rank for r in ann.lsh_cosine_topk(emb, k).collect()}
    ivf = {(r.vec_id, r.neighbor_id): r.rank for r in ann.ivf_topk(emb, k).collect()}
    rows = fused.collect()
    term = lambda r: ann.RRF_SCALE // (ann.RRF_K0 + r) if r else 0  # noqa: E731
    for r in rows:
        key = (r.vec_id, r.neighbor_id)
        expect = term(lsh.get(key)) + term(ivf.get(key))
        assert r.fused_score == expect, (key, r.fused_score, expect)
    # both-tier agreement surfaces at the double-#1 score somewhere
    both_first = [
        r for r in rows
        if lsh.get((r.vec_id, r.neighbor_id)) == 1
        and ivf.get((r.vec_id, r.neighbor_id)) == 1
    ]
    assert both_first, "no candidate ranked #1 by both tiers at sf0.001?"
    assert all(
        r.fused_score == 2 * (ann.RRF_SCALE // (ann.RRF_K0 + 1))
        for r in both_first
    )
