"""Link-extraction properties (gate parity is covered by
tests/test_queries_vs_oracle.py::test_query_matches_oracle[html_link_extract])."""

from __future__ import annotations

from pyspark.sql import functions as F

from azure_pdf_parser_spark.operators.links import (
    extract_links,
    html_link_extract,
    synthesize_html_with_links,
)
from tests.conftest import SF_DIR


def test_extraction_recovers_every_synthesized_anchor(spark):
    """Round-trip: the regex must recover exactly the anchors the
    synth embedded, in document order, and every canonical form must
    be lowercase-host, fragment-free, utm-free, param-sorted."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    pages = synthesize_html_with_links(docs)
    from azure_pdf_parser_spark.operators.links import HREF_RE

    n_anchors = pages.select(
        F.sum(
            F.size(
                F.regexp_extract_all(F.col("html"), F.lit(HREF_RE), F.lit(1))
            )
        )
    ).collect()[0][0]
    rows = extract_links(pages).collect()
    assert len(rows) == n_anchors
    for r in rows:
        assert r.url.startswith("HTTP://Site"), r.url
        c = r.canonical_url
        assert c.startswith("http://site"), c
        assert "#" not in c and "utm_" not in c, c
        q = c.split("?", 1)[1].split("&")
        assert q == sorted(q) and all(p for p in q), c


def test_extract_links_handles_messy_markup(spark):
    """Attribute extraction over hand-built pages: multiple anchors on
    one line, single-quoted hrefs NOT matched (documented contract),
    an empty href="" yields no row (HREF_RE requires a non-empty
    value), no anchors → no rows."""
    pages = spark.createDataFrame(
        [
            (1, '<a href="http://A.com/x?b=2&a=1#f">x</a><a href="http://b.com/">y</a>'),
            (2, "<a href='http://single.quoted/'>nope</a>"),
            (3, "<p>no links at all</p>"),
            (4, '<a href="">empty</a>'),
        ],
        "doc_id: long, html: string",
    )
    rows = {
        (r.doc_id, r.link_idx): r.canonical_url
        for r in extract_links(pages).collect()
    }
    assert rows == {
        (1, 0): "http://a.com/x?a=1&b=2",
        (1, 1): "http://b.com/",
    }


def test_link_extract_is_map_only(spark):
    """Frontier discovery must fuse into the scan: zero exchanges."""
    from tests.test_physical_plans import _nodes, _plan

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    nodes = _nodes(_plan(html_link_extract(docs)))
    assert "Exchange" not in nodes, nodes
