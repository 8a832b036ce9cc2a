"""Unit tests for the dependency-free PDF extractor (functions/pdf.py).

The uncompressed path is additionally gate-checked end-to-end by the
pdf_parse registry query (tests/test_queries_vs_oracle.py); here we pin
the parser-only behaviors the gate can't reach: FlateDecode streams,
escapes, TJ arrays, Tm positioning, unsupported filters, non-PDF bytes.
"""

from __future__ import annotations

import zlib

import pytest

from azure_pdf_parser_spark.functions.pdf import classify_kind, pdf_to_spans


def _wrap(stream: bytes, compress: bool = False) -> bytes:
    filt = b" /Filter /FlateDecode" if compress else b""
    body = zlib.compress(stream) if compress else stream
    return (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"3 0 obj << /Type /Page /MediaBox [0 0 612 792] /Contents 4 0 R >> endobj\n"
        b"4 0 obj << /Length " + str(len(body)).encode() + filt + b" >>\nstream\n"
        + body
        + b"endstream\nendobj\n%%EOF\n"
    )


STREAM = (
    b"BT /F1 18 Tf 72 700 Td (A Title) Tj ET\n"
    b"BT /F1 12 Tf 72 400 Td (body text) Tj ET\n"
    b"/Imdeadbeef Do\n"
    b"BT /F1 9 Tf 72 20 Td (page 1) Tj ET\n"
)


def test_uncompressed_roundtrip():
    spans = pdf_to_spans(_wrap(STREAM))
    assert [s["kind"] for s in spans] == ["title", "Text", "figure", "pageFooter"]
    assert [s["text"] for s in spans] == ["A Title", "body text", None, "page 1"]
    assert spans[2]["media_ref"] == "media://deadbeef"
    # offsets: byte positions of each fragment start in the stream
    assert [s["offset"] for s in spans] == [0, 39, 80, 95]


def test_flate_decode_identical():
    assert pdf_to_spans(_wrap(STREAM, compress=True)) == pdf_to_spans(_wrap(STREAM))


def test_tj_array_and_tm_and_escapes():
    stream = (
        b"BT /F1 14 Tf 1 0 0 1 72 660 Tm [(part one) (\\(two\\))] TJ ET\n"
        b"BT /F1 12 Tf 72 780 Td (top banner) Tj ET\n"
    )
    spans = pdf_to_spans(_wrap(stream))
    assert spans[0]["kind"] == "sectionHeading"
    assert spans[0]["text"] == "part one(two)"
    # position beats size: y=780 is the header band even at body size
    assert spans[1]["kind"] == "pageHeader"


def test_unsupported_filter_quarantines():
    body = b"x"
    pdf = (
        b"%PDF-1.4\n4 0 obj << /Length 1 /Filter /DCTDecode >>\nstream\n"
        + body
        + b"endstream\nendobj\n"
    )
    with pytest.raises(NotImplementedError):
        pdf_to_spans(pdf)


def test_not_a_pdf():
    with pytest.raises(ValueError):
        pdf_to_spans(b"<html></html>")


def test_classify_bands():
    assert classify_kind(12, 756) == "pageHeader"
    assert classify_kind(20, 36) == "pageFooter"
    assert classify_kind(16, 400) == "title"
    assert classify_kind(13, 400) == "sectionHeading"
    assert classify_kind(12.9, 400) == "Text"
