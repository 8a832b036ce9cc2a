"""Raw-byte PDF page-batch split (reference utils.py:117-163).

Pins: the reference's split math (68 pages @ 12 → 6 batches with
1-based inclusive ranges — reference tests/test_utils.py:185-230), the
standalone-ness of each sub-PDF, the split→parse→merge == whole-parse
span-sequence invariant, and the scale property that a 1,000-page doc
fans out across many tasks.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from azure_pdf_parser_spark.functions.pdf import (
    pdf_page_count,
    pdf_to_spans,
    split_pdf,
)


def _make_pdf(n_pages: int, frags_per_page: int = 2) -> bytes:
    """Minimal multi-page PDF, one content stream per page."""
    out = ["%PDF-1.4\n", "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"]
    kids = " ".join(f"{3 + 2 * p} 0 R" for p in range(n_pages))
    out.append(
        f"2 0 obj << /Type /Pages /Kids [{kids}] /Count {n_pages} >> endobj\n"
    )
    for p in range(n_pages):
        stream = "".join(
            f"BT /F1 12 Tf 72 400 Td (page {p + 1} frag {i}) Tj ET\n"
            for i in range(frags_per_page)
        )
        out.append(
            f"{3 + 2 * p} 0 obj << /Type /Page /Parent 2 0 R "
            f"/MediaBox [0 0 612 792] /Contents {4 + 2 * p} 0 R >> endobj\n"
            f"{4 + 2 * p} 0 obj << /Length {len(stream)} >>\nstream\n"
            f"{stream}endstream\nendobj\n"
        )
    out.append("%%EOF\n")
    return "".join(out).encode()


def test_reference_split_math_68_pages_at_12():
    """Reference tests/test_utils.py:185-230: 68@12 → 6 batches."""
    parts = split_pdf(_make_pdf(68), batch_size=12)
    assert [(p["batch_number"], p["first_page"], p["last_page"]) for p in parts] == [
        (0, 1, 12), (1, 13, 24), (2, 25, 36),
        (3, 37, 48), (4, 49, 60), (5, 61, 68),
    ]
    for p in parts:
        assert pdf_page_count(p["content"]) == p["last_page"] - p["first_page"] + 1


def test_split_batch_size_validation():
    with pytest.raises(ValueError, match="greater than 0"):
        split_pdf(_make_pdf(3), batch_size=0)
    with pytest.raises(ValueError, match="missing %PDF"):
        split_pdf(b"not a pdf")


def test_single_batch_when_under_batch_size():
    parts = split_pdf(_make_pdf(5), batch_size=50)
    assert len(parts) == 1
    assert (parts[0]["first_page"], parts[0]["last_page"]) == (1, 5)


def test_split_parse_merge_equals_whole_parse():
    """North-rule invariant: (kind, text, media_ref, order) equality
    between per-batch parsing and whole-document parsing."""
    pdf = _make_pdf(17, frags_per_page=3)
    whole = [(s["kind"], s["text"], s["media_ref"]) for s in pdf_to_spans(pdf)]
    merged = []
    for part in split_pdf(pdf, batch_size=5):
        merged.extend(
            (s["kind"], s["text"], s["media_ref"])
            for s in pdf_to_spans(part["content"])
        )
    assert merged == whole
    assert len(whole) == 17 * 3


def test_nested_page_tree_quarantines():
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        b"3 0 obj << /Type /Pages /Kids [] /Count 0 >> endobj\n"
        b"%%EOF\n"
    )
    with pytest.raises(NotImplementedError, match="nested"):
        split_pdf(pdf)


def test_thousand_page_doc_fans_out_across_tasks(spark):
    """The scale point of the operator: one 1,000-page PDF becomes 20
    batch rows spread over >1 task, and the distributed chain's merged
    sequence equals the single-unit parse."""
    from azure_pdf_parser_spark.operators.pdf_split import (
        parse_split_pdfs,
        split_pdf_pages,
    )

    pdf = _make_pdf(1000, frags_per_page=1)
    raw = spark.createDataFrame(
        [("big", "application/pdf", bytearray(pdf))],
        "doc_id string, content_type string, content binary",
    )
    parts = split_pdf_pages(raw, batch_size=50)
    # explicit partition count: AQE legitimately coalesces a 20-row
    # shuffle to one partition at toy scale; the property under test is
    # that the SPLIT produced independently-schedulable rows
    spread = parts.repartition(8, "doc_id", "batch_number").select(
        F.spark_partition_id().alias("pid")
    )
    assert parts.count() == 20
    assert spread.distinct().count() > 1  # fans out, no single straggler

    rows = (
        parse_split_pdfs(raw, batch_size=50)
        .orderBy("ord")
        .select("ord", "kind", "text", "media_ref", "batch_number")
        .collect()
    )
    whole = pdf_to_spans(pdf)
    assert len(rows) == len(whole) == 1000
    assert [r.ord for r in rows] == list(range(1000))
    assert [(r.kind, r.text, r.media_ref) for r in rows] == [
        (s["kind"], s["text"], s["media_ref"]) for s in whole
    ]
    # batch attribution: span i came from batch i // 50
    assert all(r.batch_number == r.ord // 50 for r in rows)


def test_split_quarantines_non_pdf(spark):
    from azure_pdf_parser_spark.operators.pdf_split import split_pdf_pages

    raw = spark.createDataFrame(
        [("h1", "text/html", bytearray(b"<html></html>")),
         ("p1", "application/pdf", bytearray(b"garbage"))],
        "doc_id string, content_type string, content binary",
    )
    rows = {r.doc_id: r for r in split_pdf_pages(raw).collect()}
    assert rows["h1"].status == "failed" and "content type" in rows["h1"].error
    assert rows["p1"].status == "failed" and "PDF" in rows["p1"].error
