"""URL/domain curation suite (operators/urls.py). Oracle parity for
both gates is covered by tests/test_queries_vs_oracle.py; these pin the
physical plans and the cap semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from azure_pdf_parser_spark.operators.urls import domain_cap, url_features
from tests.conftest import SF_DIR


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_url_features_is_map_only(spark):
    """Provenance features must be a pass-through stage: pure regexp
    codegen, no Exchange, no Python, at any corpus size."""
    plan = _plan(url_features(_docs(spark)))
    assert "Exchange" not in plan, plan
    assert "Python" not in plan, plan


def test_url_features_values(spark):
    rows = url_features(_docs(spark).limit(200)).collect()
    assert rows
    for r in rows:
        assert r["url"].startswith("https://w")
        assert r["url"].endswith(f"/{r['doc_id']}.html")
        assert r["host"].endswith(".example.com")
        assert r["domain"] == ".".join(r["host"].split(".")[-3:])
        assert r["tld"] == "com"
        assert r["path_depth"] == 2
        assert r["blocked"] == any(
            f"/{t}/" in r["url"] for t in ("casino", "xxx", "loan")
        )
    # the synthetic blocklist nibble must produce both outcomes
    assert {r["blocked"] for r in rows} == {True, False}


def test_domain_cap_exact_k_and_growth_stable(spark):
    """Exactly min(k, |domain|) survivors per domain; under corpus
    growth a doc only loses its slot to a NEW doc with a lower hash —
    its rank never decreases."""
    docs = _docs(spark)
    capped = domain_cap(docs, k=5)
    per = capped.groupBy("domain").agg(F.count("*").alias("kept"))
    n_per = dict(
        url_features(docs).groupBy("domain").count().collect()
    )
    kept_per = dict(per.collect())
    assert kept_per
    for dom, kept in kept_per.items():
        assert kept == min(5, n_per[dom])

    # growth stability: rank over the half corpus vs the full corpus —
    # every surviving half-corpus doc that also survives at full scale
    # has full_rank >= half_rank (new docs can only push it DOWN)
    half = docs.where(F.col("doc_id") % 2 == 0)
    half_ranks = {
        r["doc_id"]: r["domain_rank"] for r in domain_cap(half, k=5).collect()
    }
    full_ranks = {
        r["doc_id"]: r["domain_rank"] for r in domain_cap(docs, k=5).collect()
    }
    both = set(half_ranks) & set(full_ranks)
    assert both
    for d in both:
        assert full_ranks[d] >= half_ranks[d]


def test_domain_cap_plan_has_window_group_limit(spark):
    """The rank<=k filter must plan as WindowGroupLimit (map-side local
    top-k before the domain exchange) — the property that makes the
    exact cap survive a hot domain."""
    plan = _plan(domain_cap(_docs(spark), k=5))
    assert "WindowGroupLimit" in plan, plan
    assert plan.count("Exchange") == 1, plan


def test_url_canonicalize_is_map_only(spark):
    from azure_pdf_parser_spark.operators.urls import url_canonicalize

    plan = _plan(url_canonicalize(_docs(spark)))
    assert "Exchange" not in plan, plan
    assert "Python" not in plan, plan


def test_canonicalize_expr_semantics(spark):
    from azure_pdf_parser_spark.operators.urls import canonicalize_expr

    cases = spark.createDataFrame(
        [
            # fragment dropped, host lowered, utm dropped, params sorted
            ("HTTPS://Ex.COM/P/a.html?utm_source=n&b=2&a=1#frag",
             "https://ex.com/P/a.html?a=1&b=2"),
            # all params tracking → no '?'
            ("https://ex.com/x?utm_a=1&utm_b=2", "https://ex.com/x"),
            # no query, no fragment → unchanged
            ("https://ex.com/x", "https://ex.com/x"),
            # path case preserved (only scheme+host lowercase)
            ("HTTP://A.B/KeepCase?z=1", "http://a.b/KeepCase?z=1"),
        ],
        "url string, expected string",
    )
    rows = cases.select(
        "expected", canonicalize_expr(F.col("url")).alias("got")
    ).collect()
    for r in rows:
        assert r.got == r.expected, (r.got, r.expected)


def test_canonicalize_is_idempotent(spark):
    """canonicalize(canonicalize(u)) == canonicalize(u) — the property
    URL-dedup relies on when re-normalizing an already-clean corpus."""
    from azure_pdf_parser_spark.operators.urls import (
        canonicalize_expr,
        url_canonicalize,
    )

    df = url_canonicalize(_docs(spark))
    twice = df.select(
        "canonical_url",
        canonicalize_expr(F.col("canonical_url")).alias("again"),
    )
    assert twice.where(F.col("again") != F.col("canonical_url")).count() == 0
