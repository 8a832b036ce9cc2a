"""HLL sketch properties (gate parity is covered by
tests/test_queries_vs_oracle.py::test_query_matches_oracle[hll_distinct])."""

from __future__ import annotations

from pyspark.sql import functions as F

from azure_pdf_parser_spark.operators import sketches
from tests.conftest import SF_DIR


def _items(spark, lo, hi, grp="g"):
    return spark.range(lo, hi).select(
        F.lit(grp).alias("grp_col"), F.concat(F.lit("tok"), "id").alias("item")
    )


def test_sketch_merge_equals_sketch_of_union(spark):
    """The register table must be mergeable: max-merging the sketches
    of two shards equals the sketch of the concatenated shard — the
    property that lets a 100 TB pipeline keep per-day sketches and
    never rescan."""
    a = sketches.hll_registers(_items(spark, 0, 3000), "grp_col", "item")
    b = sketches.hll_registers(_items(spark, 2000, 6000), "grp_col", "item")
    merged = (
        a.unionByName(b)
        .groupBy("grp", "reg")
        .agg(F.max("rho").alias("rho"))
    )
    whole = sketches.hll_registers(_items(spark, 0, 6000), "grp_col", "item")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_estimate_within_hll_error_band(spark):
    """Raw HLL at m=256 has ~6.5% standard error; demand <20% (≈3σ)
    on a 10k-item set — loose enough to be stable, tight enough to
    catch a broken rho/register construction."""
    regs = sketches.hll_registers(_items(spark, 0, 10_000), "grp_col", "item")
    est = sketches.hll_estimate(regs).collect()[0].hll_estimate
    assert abs(est - 10_000) / 10_000 < 0.20, est


def test_register_table_is_one_exchange(spark):
    """The sketch build must be a single partial-agg groupBy: its
    exchange carries ≤ groups×256 rows — the entire point vs
    COUNT(DISTINCT)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    tok = docs.where(F.col("text").isNotNull()).select(
        "source", F.explode(F.split("text", " ")).alias("token")
    )
    from tests.test_physical_plans import _nodes, _plan

    nodes = _nodes(_plan(sketches.hll_registers(tok, "source", "token")))
    assert nodes.count("Exchange") == 1, nodes
    assert "HashAggregate" in nodes, nodes


def test_value_percentiles_match_sorted_definition(spark):
    """p_k must equal the ceil(p·n)-th smallest value — checked against
    a driver-side sort of a small skewed group."""
    import math

    from azure_pdf_parser_spark.operators.profile import value_percentiles

    vals = [1] * 50 + [2] * 30 + [10] * 15 + [100] * 4 + [10_000]
    df = spark.createDataFrame(
        [("g", v) for v in vals], "source string, n_chars long"
    )
    row = value_percentiles(df).collect()[0]
    s = sorted(vals)
    for pm in (500, 900, 990):
        expected = s[math.ceil(len(s) * pm / 1000) - 1]
        assert row[f"p{pm}"] == expected, (pm, row)
    assert row.n == len(vals)


def test_value_percentiles_never_sorts_the_corpus(spark):
    """Both windows run over the aggregated (group, value) table: the
    plan's only corpus-sized exchange is the groupBy — no global Sort
    without partitioning keys."""
    from azure_pdf_parser_spark.operators.profile import value_percentiles
    from tests.test_physical_plans import _plan

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan(value_percentiles(docs))
    assert "Exchange SinglePartition" not in plan, plan
    assert "hashpartitioning(grp" in plan, plan


def test_cms_never_underestimates_and_merges(spark):
    """The CMS one-sided guarantee (estimate ≥ truth) must hold for
    EVERY token, and the cell table must be mergeable: summing two
    shard sketches equals the sketch of the union."""
    from azure_pdf_parser_spark.operators.sketches import (
        cms_cells,
        cms_point_estimates,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    est = cms_point_estimates(docs, k=50)
    assert est.where(F.col("cms_estimate") < F.col("true_n")).count() == 0

    half_a = docs.where(F.col("doc_id") % 2 == 0)
    half_b = docs.where(F.col("doc_id") % 2 == 1)

    def toks(d):
        return d.where(F.col("text").isNotNull()).select(
            F.explode(F.split("text", " ")).alias("token")
        )

    merged = (
        cms_cells(toks(half_a), "token")
        .unionByName(cms_cells(toks(half_b), "token"))
        .groupBy("row_idx", "col")
        .agg(F.sum("c").alias("c"))
    )
    whole = cms_cells(toks(docs), "token")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


# --- HDR quantile sketch ---------------------------------------------------------


def _py_hdr_bucket(v: int, s: int = 4) -> int:
    """Python reference for the log-linear bucket id."""
    sub = 1 << s
    if v < sub:
        return v
    e = v.bit_length() - 1  # == length(bin(v)) - 1
    return (e - s) * sub + (v >> (e - s))


def _py_hdr_lb(b: int, s: int = 4) -> int:
    sub = 1 << s
    if b < sub:
        return b
    k = b // sub - 1
    return (b - k * sub) << k


def test_hdr_bucket_matches_python_reference(spark):
    """Engine bucket/lower-bound math vs the bit-level Python
    reference, across small values, power-of-two boundaries, and
    large magnitudes; plus the sandwich invariant
    lb(bucket(v)) <= v < lb(bucket(v)+1) and bucket monotonicity."""
    vals = (
        list(range(0, 300))
        + [2**k + d for k in range(4, 62) for d in (-1, 0, 1)]
        + [10**9, 10**12, 2**62]
    )
    df = spark.createDataFrame([(v,) for v in vals], "v: long").select(
        F.lit("g").alias("grp_col"), F.col("v")
    )
    sk = sketches.hdr_quantile_sketch(df, "grp_col", "v")
    got = {
        r.bucket: r.cnt for r in sk.collect()
    }
    want: dict[int, int] = {}
    for v in vals:
        b = _py_hdr_bucket(v)
        want[b] = want.get(b, 0) + 1
        assert _py_hdr_lb(b) <= v, (v, b)
        assert v < _py_hdr_lb(b + 1), (v, b)
    assert got == want
    bs = [_py_hdr_bucket(v) for v in sorted(set(vals))]
    assert bs == sorted(bs)  # monotone in v


def test_hdr_sketch_merge_equals_sketch_of_union(spark):
    """Re-summing two shard sketches == sketch of the whole shard —
    the mergeability that lets quantiles roll forward per day without
    rescanning the corpus."""
    a = spark.range(0, 4000).select(
        F.lit("g").alias("grp_col"), (F.col("id") * 7 % 50_000).alias("v")
    )
    b = spark.range(4000, 9000).select(
        F.lit("g").alias("grp_col"), (F.col("id") * 7 % 50_000).alias("v")
    )
    merged = (
        sketches.hdr_quantile_sketch(a, "grp_col", "v")
        .unionByName(sketches.hdr_quantile_sketch(b, "grp_col", "v"))
        .groupBy("grp", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = sketches.hdr_quantile_sketch(
        a.unionByName(b), "grp_col", "v"
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_hdr_quantiles_error_bound(spark):
    """Estimates are bucket lower bounds: est <= exact and the
    relative error stays within the 2^-4 = 62.5-permille design bound
    (+ a grain for integer rounding) for every group/percentile."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    rows = sketches.hdr_quantiles(docs).collect()
    assert rows
    for r in rows:
        for pm in (500, 900, 990):
            est, exact = r[f"p{pm}_est"], r[f"p{pm}"]
            assert est <= exact, (r.grp, pm, est, exact)
            assert r[f"err{pm}_permille"] <= 63, (r.grp, pm, est, exact)


def test_hdr_sketch_is_one_bounded_exchange(spark):
    """The sketch build is a single partial-agg groupBy on
    (grp, bucket) — ≤ ~1k rows per group through the exchange for the
    entire int64 domain."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    from tests.test_physical_plans import _nodes, _plan

    nodes = _nodes(_plan(sketches.hdr_quantile_sketch(docs, "source", "n_chars")))
    assert nodes.count("Exchange") == 1, nodes
    assert "HashAggregate" in nodes, nodes
