"""Physical-plan audits: the plan shape IS the 100 TB contract.

Correctness tests prove the small-SF answer; these pin the *execution
strategy* so a regression that silently inserts a shuffle, drops a
broadcast, or widens a scan fails CI — the properties that decide
whether the job survives a 1000-executor run:

* flagship extraction is shuffle-free (pure scan → project),
* the table-cell tag is array-local (no join, no corpus-sized broadcast),
* parquet scans prune to the referenced columns,
* groupBy aggregations do map-side partial aggregation,
* the resume anti-join stays a join (no collect-to-driver).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from contextlib import contextmanager

from tests.conftest import SF_DIR


@contextmanager
def _conf(spark, key: str, value: str):
    """Temporarily override one SQL conf, restoring the prior value."""
    prev = spark.conf.get(key, None)
    spark.conf.set(key, value)
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


import re


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _nodes(plan: str) -> list[str]:
    """Physical operator names from the formatted plan's detail headers
    (each node header appears exactly once as '(n) Name')."""
    return re.findall(r"^\(\d+\) ([A-Za-z]+)", plan, flags=re.M)


def test_flagship_extract_has_no_exchange(spark):
    """extract(derive_spans(...)) must be a single narrow stage: any
    Exchange here multiplies to petabytes of shuffle at full scale."""
    from azure_pdf_parser_spark.operators.extract_spans import extract
    from azure_pdf_parser_spark.sources.spanize import derive_spans

    df = extract(derive_spans(spark.read.parquet(f"{SF_DIR}/documents.parquet")))
    plan = _plan(df)
    assert "Exchange" not in plan, plan
    # the final (md5/language/CASE) projection must be codegen'd so its
    # repeated score references are subexpression-eliminated
    assert "codegen id" in plan, plan
    # staging guard: the kept-spans lambda tree must appear a bounded
    # number of times, not once per language-CASE reference (~50 when
    # the projections collapse into one)
    assert plan.count("lambdafunction") <= 12, plan.count("lambdafunction")


def test_exploded_extract_has_no_exchange(spark):
    from azure_pdf_parser_spark.operators.extract_spans import extract_exploded
    from azure_pdf_parser_spark.sources.spanize import derive_spans

    df = extract_exploded(
        derive_spans(spark.read.parquet(f"{SF_DIR}/documents.parquet"))
    )
    assert "Exchange" not in _plan(df)


def test_table_cell_tagging_is_array_local_no_join(spark):
    """Span keys never cross documents, so the tag must be per-row array
    work: no join of any kind, no Exchange, and — critically — no
    broadcast of a corpus-derived aggregate (round 1 broadcast a
    DISTINCT(doc_id, length) dim whose cardinality grows linearly with
    the corpus; at 100× scale that broadcast OOMs the driver)."""
    from azure_pdf_parser_spark.plans.queries import QUERIES

    plan = _plan(QUERIES["table_cell_tagging"](spark, SF_DIR))
    nodes = _nodes(plan)
    assert "Exchange" not in nodes, nodes
    assert not any("Join" in n for n in nodes), nodes
    assert "BroadcastExchange" not in plan, plan


def test_scan_prunes_columns(spark):
    """A 2-column projection must read 2 columns, not the whole row."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    df = docs.select("doc_id", F.length("text").alias("n"))
    plan = _plan(df)
    # the parquet scan's ReadSchema should mention text but not the
    # unreferenced lang/source/n_chars columns
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schema, plan
    line = read_schema[0]
    assert "text" in line and "doc_id" in line
    assert "lang" not in line and "source" not in line and "n_chars" not in line


def test_filter_pushdown_reaches_scan(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan(docs.filter(F.col("n_chars") > 500).select("doc_id"))
    assert "PushedFilters: [IsNotNull(n_chars), GreaterThan(n_chars,500)]" in plan, plan


def test_dedup_exact_does_partial_aggregation(spark):
    """groupBy(md5).count must partial-aggregate map-side: two
    HashAggregate nodes around one Exchange."""
    from azure_pdf_parser_spark.plans.queries import QUERIES

    nodes = _nodes(_plan(QUERIES["dedup_exact"](spark, SF_DIR)))
    assert nodes.count("HashAggregate") == 2, nodes
    assert nodes.count("Exchange") == 1, nodes


def test_resume_filter_is_anti_join_not_collect(spark, tmp_path):
    """Resume must anti-join against the manifest, never collect doc ids
    to the driver (a 10^12-row manifest cannot be collected)."""
    from azure_pdf_parser_spark.operators.extract_spans import extract
    from azure_pdf_parser_spark.plans import manifest as mf
    from azure_pdf_parser_spark.sources.spanize import derive_spans

    docs = derive_spans(spark.read.parquet(f"{SF_DIR}/documents.parquet"))
    path = str(tmp_path / "manifest")
    mf.append_manifest(extract(docs.limit(10)), path, "r1")
    mf.commit_run(path, "r1")
    todo = mf.resume_filter(docs, spark, path)
    plan = _plan(todo)
    assert "LeftAnti" in plan, plan


def test_tpch_q3_broadcasts_dims_and_takes_ordered(spark):
    """Q3's filtered customer/orders dims must broadcast into the
    lineitem probe (no shuffle of the fact side for the join), and the
    top-10 must plan as TakeOrderedAndProject, never a global sort."""
    from azure_pdf_parser_spark.plans.queries import QUERIES

    plan = _plan(QUERIES["tpch_q3_shipping_priority"](spark, SF_DIR))
    nodes = _nodes(plan)
    assert nodes.count("BroadcastHashJoin") == 2, nodes
    assert "TakeOrderedAndProject" in nodes, nodes
    assert "SortMergeJoin" not in nodes, nodes


def test_tpch_q6_pushdown_reaches_scan(spark):
    """Q6 is the pushdown gate: every predicate must reach the parquet
    reader as a PushedFilter and the ReadSchema must carry only the 4
    referenced columns of lineitem's 11 — at 100 TB this query reads
    row-group stats, not the table."""
    from azure_pdf_parser_spark.plans.queries import QUERIES

    plan = _plan(QUERIES["tpch_q6_forecast_revenue"](spark, SF_DIR))
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert pushed, plan
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert any(col in l for l in pushed), (col, pushed)
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schema, plan
    line = read_schema[0]
    for col in ("l_shipdate", "l_discount", "l_quantity", "l_extendedprice"):
        assert col in line, line
    for col in ("l_orderkey", "l_partkey", "l_comment", "l_returnflag"):
        assert col not in line, line


def test_tpch_q5_broadcasts_every_dim(spark):
    """Q5's six-way star join: at this SF every dim side broadcasts (the
    fixed-cardinality region/nation by explicit hint, supplier/customer
    by the planner's parquet size stats — NO forced hint, so at 100 TB
    they degrade to shuffled equi-joins instead of OOMing a broadcast).
    No cartesian, no nested-loop."""
    from azure_pdf_parser_spark.plans.queries import QUERIES

    nodes = _nodes(_plan(QUERIES["tpch_q5_local_supplier"](spark, SF_DIR)))
    assert nodes.count("BroadcastHashJoin") >= 4, nodes
    assert "CartesianProduct" not in nodes, nodes
    assert "BroadcastNestedLoopJoin" not in nodes, nodes
    # the SF-scaling sides must not carry a forced broadcast hint —
    # asserted at PLAN level (a source grep could be defeated by
    # renaming variables or importing broadcast directly): walk the
    # analyzed logical plan's ResolvedHint nodes and require that no
    # hinted subtree references a supplier or customer relation.
    analyzed = (
        QUERIES["tpch_q5_local_supplier"](spark, SF_DIR)
        ._jdf.queryExecution()
        .analyzed()
        .toString()
    )
    hinted = _hinted_subtrees(analyzed)
    assert len(hinted) == 2, analyzed  # region + nation, nothing else
    for subtree in hinted:
        assert "s_suppkey" not in subtree and "c_custkey" not in subtree, (
            "supplier/customer scale with SF — no forced broadcast:\n"
            + subtree
        )


def _hinted_subtrees(plan: str) -> list[str]:
    """The text under each ResolvedHint node of a logical-plan tree
    string: subsequent lines whose branch marker (`+-`/`:-`) sits
    deeper than the hint's own marker."""

    def depth(line: str) -> int:
        for marker in ("+- ", ":- "):
            if marker in line:
                return line.index(marker)
        return -1

    lines = plan.split("\n")
    out = []
    for i, line in enumerate(lines):
        if "ResolvedHint" not in line:
            continue
        d = depth(line)
        subtree = []
        for nxt in lines[i + 1:]:
            nd = depth(nxt)
            if nd >= 0 and nd <= d:
                break
            subtree.append(nxt)
        out.append("\n".join(subtree))
    return out


def test_range_join_plans_as_equi_join(spark):
    """The interval join must plan as a hash/sort equi-join on
    (user, epoch) — a raw range predicate would be a nested-loop."""
    from azure_pdf_parser_spark.plans.queries import QUERIES

    nodes = _nodes(_plan(QUERIES["events_range_join"](spark, SF_DIR)))
    assert "CartesianProduct" not in nodes, nodes
    assert "BroadcastNestedLoopJoin" not in nodes, nodes


def test_skew_profile_windows_are_over_histogram_only(spark):
    """skew_profile's unpartitioned windows run over the COUNT
    HISTOGRAM (distinct per-key count values), never the raw table or
    the per-key counts: two hash aggregates must sit below the first
    Window node."""
    from azure_pdf_parser_spark.plans.queries import QUERIES

    plan = _plan(QUERIES["skew_profile"](spark, SF_DIR))
    lines = plan.splitlines()
    first_window = next(i for i, l in enumerate(lines) if "Window" in l)
    aggs_below = sum(
        1 for l in lines[first_window:] if "HashAggregate" in l
    )
    assert aggs_below >= 4, plan  # 2 aggregates × partial+final


def test_asof_join_is_single_shuffle(spark):
    """The as-of encoding must be ONE exchange (user_id) feeding both
    window functions — a range/theta join here would be quadratic."""
    from azure_pdf_parser_spark.plans.queries import QUERIES

    nodes = _nodes(_plan(QUERIES["events_asof_join"](spark, SF_DIR)))
    assert nodes.count("Exchange") == 1, nodes
    assert "CartesianProduct" not in nodes and "BroadcastNestedLoopJoin" not in nodes


def test_partitioned_sink_prunes_partitions(spark, tmp_path):
    """The production sink story: parser_output written partitioned by
    language must let a language-filtered read prune whole partitions at
    planning time (PartitionFilters on the scan, not a post-filter) —
    on Iceberg this is the same predicate → partition-spec pushdown."""
    from pyspark.sql import functions as F

    from azure_pdf_parser_spark.operators.extract_spans import extract
    from azure_pdf_parser_spark.sources.spanize import derive_spans

    out = str(tmp_path / "parser_output")
    docs = derive_spans(spark.read.parquet(f"{SF_DIR}/documents.parquet"))
    extract(docs).write.partitionBy("language").mode("overwrite").parquet(out)

    back = spark.read.parquet(out).filter(F.col("language") == "en")
    plan = _plan(back)
    assert "PartitionFilters: [isnotnull(language" in plan, plan
    # the language predicate must NOT appear as a row-level Filter node
    assert "Filter" not in _nodes(plan), _nodes(plan)
    assert back.count() > 0


def test_simhash_is_single_shuffle_aggregation(spark):
    """The 128-bit simhash must stay one groupBy over (doc, token) —
    the bit explode formulation (3 shuffles, ~80M rows) regressed 10×."""
    from azure_pdf_parser_spark.operators.dedup import simhash

    nodes = _nodes(_plan(simhash(spark.read.parquet(f"{SF_DIR}/documents.parquet"))))
    # one exchange for the (doc_id, token) groupBy, one for groupBy(doc_id)
    assert nodes.count("Exchange") <= 2, nodes


def test_bench_list_is_exhaustive_over_registry():
    """Every queries() entry is either benched or excluded-with-reason —
    silent bench gaps read as coverage that isn't there."""
    import bench
    from azure_pdf_parser_spark.plans.queries import QUERIES

    benched = set(bench.BENCH_QUERIES)
    excluded = set(bench.EXCLUDED_QUERIES)
    assert not (benched & excluded)
    missing = set(QUERIES) - benched - excluded
    assert not missing, f"unbenched and undocumented: {sorted(missing)}"
    stale = (benched | excluded) - set(QUERIES)
    assert not stale, f"bench names not in registry: {sorted(stale)}"


def test_pii_scrub_is_map_only(spark):
    """PII scrubbing must fuse into the scan: regexp projection only,
    no Exchange of any kind — at 100 TB this runs as a pass-through."""
    from azure_pdf_parser_spark.plans.queries import QUERIES

    plan = _plan(QUERIES["pii_scrub"](spark, SF_DIR))
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_decontaminate_broadcasts_benchmark_side(spark):
    """The eval-suite shingle set (bounded by contract) must broadcast
    into the corpus probe; the corpus side must never sort-merge or
    cartesian for the overlap."""
    from azure_pdf_parser_spark.plans.queries import QUERIES

    nodes = _nodes(_plan(QUERIES["decontaminate"](spark, SF_DIR)))
    assert "BroadcastHashJoin" in nodes, nodes
    assert "SortMergeJoin" not in nodes, nodes
    assert "CartesianProduct" not in nodes and "BroadcastNestedLoopJoin" not in nodes


def test_decontaminate_bloom_probe_shape(spark):
    """The Bloom sketch rides in as a ONE-row broadcast nested-loop
    join (16 KiB, size-independent of the benchmark); the corpus side
    must not sort-merge, and the only hash joins are broadcasts (the
    exact confirm on survivors + the final doc left join)."""
    from azure_pdf_parser_spark.plans.queries import QUERIES

    nodes = _nodes(_plan(QUERIES["decontaminate_bloom"](spark, SF_DIR)))
    assert "BroadcastNestedLoopJoin" in nodes, nodes
    assert "SortMergeJoin" not in nodes, nodes
    assert "CartesianProduct" not in nodes, nodes


def test_bloom_prunes_most_clean_shingles(spark):
    """The sketch must actually prune: survivors of the bit tests are a
    small fraction of the corpus shingle universe (true overlaps + the
    designed ~0.05% false-positive rate), and every truly contaminated
    doc's shingles survive (no false negatives, by construction)."""
    from pyspark.sql import functions as F

    from azure_pdf_parser_spark.operators.contamination import (
        BLOOM_N_BITS,
        DECON_NGRAM_WORDS,
        build_bloom,
        decontaminate,
        decontaminate_bloom,
        word_ngrams,
        _bloom_positions,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    benchmark = docs.where(F.col("doc_id") % 37 == 0).select("text")

    # exact output parity (the oracle gate also checks this vs DuckDB)
    exact = decontaminate(docs, benchmark).orderBy("doc_id").collect()
    bloom = decontaminate_bloom(docs, benchmark).orderBy("doc_id").collect()
    assert exact == bloom

    # pruning power: count bloom-survivor shingles vs the universe
    sketch = F.broadcast(build_bloom(benchmark, DECON_NGRAM_WORDS, BLOOM_N_BITS))
    grams = word_ngrams(docs, ["doc_id"], DECON_NGRAM_WORDS)
    probed = grams.crossJoin(sketch)
    for i, pos in enumerate(_bloom_positions(BLOOM_N_BITS)):
        probed = probed.withColumn(f"_p{i}", pos)
    hit = None
    for i in range(5):
        test = F.expr(
            f"(element_at(bloom, CAST(shiftright(_p{i}, 6) AS INT) + 1)"
            f" & shiftleft(CAST(1 AS BIGINT), CAST(_p{i} % 64 AS INT))) != 0"
        )
        hit = test if hit is None else hit & test
    n_universe = grams.count()
    n_survivors = probed.where(hit).count()
    n_true = (
        grams.join(
            word_ngrams(benchmark, [], DECON_NGRAM_WORDS).distinct(), "shingle"
        ).count()
    )
    assert n_survivors >= n_true  # no false negatives
    # false positives are bounded well under 1% at 16 bits/shingle
    assert n_survivors - n_true < max(0.01 * n_universe, 10), (
        n_survivors,
        n_true,
        n_universe,
    )


def test_neardup_canonical_argmax_is_window_free(spark):
    """The per-cluster canonical pick must be a partial-aggregatable
    max(struct) groupBy, never a row_number window over cluster_id — a
    window would move a 10⁶-doc boilerplate cluster through one task."""
    from azure_pdf_parser_spark.operators.dedup import neardup_canonical

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    plan = _plan(neardup_canonical(docs))
    assert "Window" not in plan, plan
    # struct min/max is not hash-aggregatable; Spark plans SortAggregate
    # (still partial-aggregated map-side — the property that matters)
    assert "SortAggregate" in plan or "HashAggregate" in plan, plan
    assert "partial_max" in plan or "partial" in plan.lower(), plan


def test_minhash_index_probe_broadcasts_batch_side(spark, tmp_path):
    """The ingest batch's band table (bounded by contract) must
    broadcast into a streamed scan of the index — the index side never
    shuffles or sorts per ingest."""
    from pyspark.sql import functions as F

    from azure_pdf_parser_spark.operators.dedup import (
        load_minhash_index,
        probe_minhash_index,
        save_minhash_index,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    path = str(tmp_path / "bands")
    save_minhash_index(docs.where(F.col("doc_id") % 2 == 0), path)
    index = load_minhash_index(spark, path)
    probe = probe_minhash_index(index, docs.where(F.col("doc_id") % 2 == 1))
    nodes = _nodes(_plan(probe))
    assert "BroadcastHashJoin" in nodes, nodes
    assert "SortMergeJoin" not in nodes, nodes


def test_bucketed_band_selfjoin_has_no_exchange(spark, tmp_path):
    """Corpus-vs-corpus candidate generation over the BUCKETED band
    table: the self-join on (band_idx, band_hash) must read both sides
    pre-partitioned — zero Exchange at or below the join. A 10¹²-doc
    re-dedup otherwise shuffles the full 4×10¹²-row band table every
    run. Control: the same self-join on plain parquet DOES exchange —
    proving the bucketing (not AQE/broadcast) deletes the shuffle."""
    from azure_pdf_parser_spark.operators.dedup import (
        bucketed_band_pairs,
        lsh_bands,
        save_minhash_index_bucketed,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    table = "minhash_bands_bucketed_plan_test"
    with _conf(spark, "spark.sql.autoBroadcastJoinThreshold", "-1"):
        try:
            save_minhash_index_bucketed(
                docs, table, str(tmp_path / "bands")
            )
            pairs = bucketed_band_pairs(spark, table)
            # split off the final .distinct() (its exchange is the
            # pair-dedup aggregate, not the join under test)
            bands = spark.table(table)
            join_only = (
                bands.alias("a")
                .join(bands.alias("b"), on=["band_idx", "band_hash"])
                .where(F.col("a.doc_id") < F.col("b.doc_id"))
            )
            plan = _plan(join_only)
            assert "SortMergeJoin" in plan, plan
            assert "Exchange" not in plan, plan
            # control: identical join over plain parquet must exchange
            plain = lsh_bands(docs)
            ctrl = (
                plain.alias("a")
                .join(plain.alias("b"), on=["band_idx", "band_hash"])
                .where(F.col("a.doc_id") < F.col("b.doc_id"))
            )
            assert "Exchange" in _plan(ctrl)
            assert pairs.count() >= 0
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_sample_splits_is_map_only(spark):
    """Split assignment must fuse into the scan — no Exchange."""
    from azure_pdf_parser_spark.plans.queries import QUERIES

    plan = _plan(QUERIES["sample_splits"](spark, SF_DIR))
    assert "Exchange" not in plan, plan


def test_stratified_sample_is_single_shuffle(spark):
    """Exact stratified sampling: ONE exchange on the stratum key feeding
    both windows (rank + count share the sort)."""
    from azure_pdf_parser_spark.plans.queries import QUERIES

    nodes = _nodes(_plan(QUERIES["sample_stratified"](spark, SF_DIR)))
    assert nodes.count("Exchange") == 1, nodes


def test_lm_vocab_topk_is_take_ordered_not_window(spark):
    """The vocab top-V selection must be TakeOrderedAndProject (a
    per-partition top-V merge), never a rank window with an empty
    partitionBy — that window funnels the FULL distinct-token table
    (O(10^9) rows at 100 TB by Heaps' law) through one reducer."""
    from azure_pdf_parser_spark.caching import release_all
    from azure_pdf_parser_spark.operators.lm import lm_vocab

    try:
        plan = _plan(lm_vocab(spark.read.parquet(f"{SF_DIR}/documents.parquet")))
    finally:
        release_all()
    assert "TakeOrderedAndProject" in plan, plan
    assert "Window" not in plan, plan
    # the corpus total must be a 1-row aggregate, not a global window sum
    assert "Sort" not in [n for n in _nodes(plan)], _nodes(plan)


def test_lm_surprisal_broadcasts_model(spark):
    """The capped-vocab LM probe must broadcast the model into the corpus
    token stream — never sort-merge (the corpus side must not shuffle
    before the per-doc aggregation)."""
    from azure_pdf_parser_spark.caching import release_all
    from azure_pdf_parser_spark.plans.queries import QUERIES

    try:
        plan = _plan(QUERIES["lm_surprisal"](spark, SF_DIR))
    finally:
        release_all()
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_c4_filter_is_map_only(spark):
    """C4 rules must fuse into the scan: pure per-row predicates, no
    Exchange of any kind — a pass-through at any corpus size."""
    from azure_pdf_parser_spark.plans.queries import QUERIES

    plan = _plan(QUERIES["c4_filter"](spark, SF_DIR))
    assert "Exchange" not in plan, plan


def test_widen_for_compute_is_conditional(spark):
    """widen_for_compute spreads an under-parallel scan on doc_id but is
    a strict NO-OP when the input already has >= defaultParallelism
    partitions — at production scale (thousands of splits) it must never
    add an exchange."""
    from pyspark.sql import functions as F

    from azure_pdf_parser_spark.partitioning import widen_for_compute

    par = spark.sparkContext.defaultParallelism
    narrow = spark.range(100).select(F.col("id").cast("string").alias("doc_id")).coalesce(1)
    widened = widen_for_compute(narrow)
    assert widened.rdd.getNumPartitions() == par * 2
    plan = _plan(widened)
    assert "Exchange" in plan and "hashpartitioning(doc_id" in plan

    wide = spark.range(100).select(
        F.col("id").cast("string").alias("doc_id")
    ).repartition(par * 4, "doc_id")
    assert widen_for_compute(wide) is wide


def test_table_profile_is_one_scan(spark):
    """The profiler must profile every column in ONE pass: a single
    parquet scan feeding one Aggregate (Expand for the exact multi-
    distinct is the documented cost), never one job per column."""
    from azure_pdf_parser_spark.plans.queries import QUERIES

    nodes = _nodes(_plan(QUERIES["table_profile"](spark, SF_DIR)))
    assert nodes.count("Scan") == 1, nodes
    assert "Generate" in nodes, nodes  # wide→long explode stays engine-side


def test_langid_agreement_bounded_aggregation(spark):
    """The agreement table's plan must stay detector-then-tiny-aggs:
    no Python eval anywhere, and every exchange carries a key space
    bounded by the language count (source × lang_true × lang_pred ≤
    2×60×60), never corpus-scale data — the union's detector columns
    reduce map-side. Exchange count is pinned so a regression that
    adds a corpus-wide shuffle (e.g. a global window) fails here."""
    from azure_pdf_parser_spark.plans.queries import QUERIES

    plan = _plan(QUERIES["langid_agreement"](spark, SF_DIR))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    nodes = _nodes(plan)
    assert nodes.count("Exchange") <= 6, plan
    assert "Window" not in plan, plan


def test_bm25_is_single_corpus_pass_take_ordered(spark):
    """BM25 topk plan pins: top-k is TakeOrderedAndProject (never a
    global rank window), the fixed-term design never JOINS the
    corpus-sized token table (conditional sums inside the per-doc
    aggregation; the only join is the broadcast 1-row stats
    cross-join), and the persisted per-doc table feeds both consumers
    (no second corpus tokenize)."""
    from azure_pdf_parser_spark.caching import release_all
    from azure_pdf_parser_spark.plans.queries import QUERIES

    try:
        df = QUERIES["bm25_topk"](spark, SF_DIR)
        df.write.mode("overwrite").format("noop").save()
        plan = _plan(df)
        nodes = _nodes(plan)
        assert "TakeOrderedAndProject" in nodes, nodes
        assert "Window" not in nodes, nodes
        assert "SortMergeJoin" not in nodes, nodes
        # one broadcast (the 1-row stats), no other join strategy
        assert nodes.count("BroadcastNestedLoopJoin") == 1, nodes
        assert "BroadcastHashJoin" not in nodes, nodes
        # the per-doc aggregate is reused from cache, not recomputed:
        # after materialization both consumers read InMemoryTableScan
        assert "InMemoryTableScan" in nodes, nodes
    finally:
        release_all()


def test_interleave_operators_are_map_only(spark):
    """media_caption_pairs and interleave_stats are array-local passes
    over the spans column — any Exchange (a per-doc window or a
    media-to-text join would plan one) multiplies to corpus-sized
    shuffle at 100 TB. Both must stay scan → project(/explode)."""
    from azure_pdf_parser_spark.operators.interleave import (
        interleave_segments,
        interleave_stats,
        media_caption_pairs,
        multimodal_pack,
    )
    from azure_pdf_parser_spark.sources.spanize import derive_spans

    spans = derive_spans(spark.read.parquet(f"{SF_DIR}/documents.parquet"))
    for df in (
        media_caption_pairs(spans),
        interleave_stats(spans),
        interleave_segments(spans),
        multimodal_pack(spans),
    ):
        plan = _plan(df)
        nodes = _nodes(plan)
        assert "Exchange" not in plan, plan
        assert "Window" not in nodes, nodes
        assert not any("Join" in n for n in nodes), nodes


def test_vlm_manifest_is_equi_join_never_nested_loop(spark):
    """The manifest join must plan as an equi-join on media_ref: at
    100 TB both sides are corpus-sized, so a BroadcastNestedLoopJoin or
    CartesianProduct here is a cluster-killer. (A BroadcastHashJoin at
    test scale is fine — AQE's size call, still an equi-join.)"""
    from azure_pdf_parser_spark.plans.queries import QUERIES

    df = QUERIES["vlm_training_manifest"](spark, SF_DIR)
    plan = _plan(df)
    nodes = _nodes(plan)
    assert "BroadcastNestedLoopJoin" not in nodes, nodes
    assert "CartesianProduct" not in nodes, nodes
    assert any(
        n in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
        for n in nodes
    ), nodes
    # caption mining stays array-local even inside the join plan
    assert "Window" not in nodes, nodes


def test_media_exact_dedup_does_partial_aggregation(spark):
    """The blob-dedup groupBy on md5(content) must do map-side partial
    aggregation — at 100 TB the shuffle then carries one row per
    distinct payload per task, not one per media blob."""
    from azure_pdf_parser_spark.plans.queries import QUERIES

    plan = _plan(QUERIES["media_exact_dedup"](spark, SF_DIR))
    nodes = _nodes(plan)
    # min(media_ref) is a string buffer, so Spark picks SortAggregate —
    # the structural property pinned here is the partial+final split
    # around exactly one hash Exchange, whatever the aggregate flavor
    aggs = [n for n in nodes if n.endswith("Aggregate")]
    assert len(aggs) >= 2, nodes  # partial + final
    assert nodes.count("Exchange") == 1, nodes
