"""Hyperlink extraction from raw HTML markup → canonical outlink table.

Engine addition — no reference analog (the reference consumes PDFs
one at a time; it has no crawl frontier). Link extraction is the op
that FEEDS everything URL-shaped in this engine: the canonical
outlink table is the edge list of the link graph
(operators/graph.py's PageRank), the input of URL dedup
(operators/urls.py's canonicalize-before-hash pass), and the crawl
frontier itself.

Extraction contract (the crawl-standard fast path): anchors are
``href="…"`` attributes with double-quoted values — one
``regexp_extract_all`` over the raw markup, NO DOM build. A full DOM
parse per page (functions/html.py) is the content-extraction path;
frontier discovery at 10¹² pages runs the regex because it is ~100×
cheaper and link loss from exotic markup is acceptable crawl-side.
Extracted hrefs are immediately canonicalized
(:func:`~.urls.canonicalize_expr`) — the frontier dedups on the
canonical form, never the raw attribute.

Test seam: the sandbox corpus has no markup column, so
:func:`synthesize_html_with_links` derives a page per document with
1–3 anchors whose messy hrefs (upper-cased scheme/host, utm_ tracking
param, unsorted params, fragment) come from md5 nibbles — every
canonicalization rule has both outcomes. The oracle does NOT re-run a
regex: it restates the expected links constructively from the same
md5 formulas, so a divergence in the extraction regex, the explode
order, or the canonicalizer all surface as mismatches.

Scale shape: map-only end to end — synth, regexp_extract_all,
posexplode fan-out (bounded ×3), canonicalize — ZERO exchange
(plan-pinned), fusing into whatever scan carries the raw pages.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from azure_pdf_parser_spark.operators.urls import canonicalize_expr

MAX_LINKS_PER_DOC = 3
HREF_RE = r'href="([^"]+)"'


def _link_href(doc_id: Column, i: Column) -> Column:
    """Deterministic messy href for anchor ``i`` of ``doc_id``:
    mixed-case scheme+host, a utm_ tracking param, params in
    non-sorted order, a fragment — mirrored verbatim in the oracle."""
    h = F.md5(
        F.concat(doc_id.cast("string"), F.lit(":link:"), i.cast("string"))
    )
    return F.concat(
        F.lit("HTTP://Site"),
        F.substring(h, 1, 1),
        F.lit(".Example.ORG/Dir"),
        F.substring(h, 2, 1),
        F.lit("/page"),
        i.cast("string"),
        F.lit("?utm_source=feed&z="),
        F.substring(h, 3, 1),
        F.lit("&a=1#s"),
        F.substring(h, 1, 1),
    )


def _n_links(doc_id: Column) -> Column:
    h = F.md5(F.concat(doc_id.cast("string"), F.lit(":links")))
    return (
        F.conv(F.substring(h, 1, 1), 16, 10).cast("int")
        % MAX_LINKS_PER_DOC
        + 1
    )


def synthesize_html_with_links(documents: DataFrame) -> DataFrame:
    """(doc_id, html): one page per doc with 1–3 derived anchors. The
    transform lambda runs on a ≤3-element synth-side array — the
    operator under test is the extraction below, not this seam."""
    doc_id = F.col("doc_id")
    anchors = F.transform(
        F.sequence(F.lit(0), _n_links(doc_id) - 1),
        lambda i: F.concat(
            F.lit('<a href="'),
            _link_href(doc_id, i),
            F.lit('">ref</a>'),
        ),
    )
    html = F.concat(
        F.lit("<html><body><p>doc "),
        doc_id.cast("string"),
        F.lit("</p>"),
        F.array_join(anchors, ""),
        F.lit("</body></html>"),
    )
    return documents.select("doc_id", html.alias("html"))


def extract_links(pages: DataFrame) -> DataFrame:
    """(doc_id, link_idx, url, canonical_url): every double-quoted
    href in document order, canonicalized. One regexp_extract_all +
    posexplode + string/array ops — map-only, zero exchange."""
    hrefs = F.regexp_extract_all(F.col("html"), F.lit(HREF_RE), F.lit(1))
    return (
        pages.select(
            "doc_id", F.posexplode(hrefs).alias("link_idx", "url")
        )
        .select(
            "doc_id",
            F.col("link_idx").cast("int").alias("link_idx"),
            "url",
            canonicalize_expr(F.col("url")).alias("canonical_url"),
        )
    )


def html_link_extract(documents: DataFrame) -> DataFrame:
    """Gate: synth pages → regex extraction → canonical outlinks."""
    return extract_links(synthesize_html_with_links(documents))


def html_link_extract_sql() -> str:
    """Constructive oracle: the expected link table straight from the
    md5 formulas (never a regex), then the SHARED canonicalize chain
    (:func:`~.urls.canonicalize_sql_ctes`)."""
    from azure_pdf_parser_spark.operators.urls import canonicalize_sql_ctes

    return (
        f"""
WITH fan AS (
    SELECT d.doc_id, t.i AS link_idx,
           md5(CAST(d.doc_id AS VARCHAR) || ':link:' || CAST(t.i AS VARCHAR)) AS h
    FROM documents d
    CROSS JOIN LATERAL (
        SELECT UNNEST(range(
            CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':links'), 1, 1)) AS INT)
            % {MAX_LINKS_PER_DOC} + 1)) AS i
    ) t
),
links AS (
    SELECT doc_id, CAST(link_idx AS INT) AS link_idx,
           'HTTP://Site' || substr(h, 1, 1)
             || '.Example.ORG/Dir' || substr(h, 2, 1)
             || '/page' || CAST(link_idx AS VARCHAR)
             || '?utm_source=feed&z=' || substr(h, 3, 1)
             || '&a=1#s' || substr(h, 1, 1) AS url
    FROM fan
),"""
        + canonicalize_sql_ctes("links", key_cols="doc_id, link_idx")
        + "\n"
    )
