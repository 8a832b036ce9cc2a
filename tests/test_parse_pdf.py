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


# --- stream filter coverage: LZW / ASCII85 / ASCIIHex / RunLength -----------


def _wrap_filtered(body: bytes, filt: bytes) -> bytes:
    return (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"3 0 obj << /Type /Page /MediaBox [0 0 612 792] /Contents 4 0 R >> endobj\n"
        b"4 0 obj << /Length " + str(len(body)).encode() + b" /Filter " + filt
        + b" >>\nstream\n" + body + b"endstream\nendobj\n%%EOF\n"
    )


def _lzw_encode(data: bytes, early_change: int = 1) -> bytes:
    """Reference PDF LZW encoder (MSB-first, 9→12 bits) for round-trip
    testing the decoder — EarlyChange selectable (1 = the PDF default)."""
    table = {bytes([i]): i for i in range(256)}
    next_code, width = 258, 9
    out_bits: list[tuple[int, int]] = [(256, 9)]  # leading clear code
    w = b""
    for b in data:
        wb = w + bytes([b])
        if wb in table:
            w = wb
            continue
        out_bits.append((table[w], width))
        table[wb] = next_code
        next_code += 1
        # encoder widens when the NEXT code to emit could be next_code
        # (EarlyChange=1: one early, mirroring the decoder's bump)
        if next_code + early_change > (1 << width) and width < 12:
            width += 1
        w = bytes([b])
    if w:
        out_bits.append((table[w], width))
    out_bits.append((257, width))  # EOD
    buf = bits = 0
    out = bytearray()
    for code, wd in out_bits:
        buf = (buf << wd) | code
        bits += wd
        while bits >= 8:
            bits -= 8
            out.append((buf >> bits) & 0xFF)
    if bits:
        out.append((buf << (8 - bits)) & 0xFF)
    return bytes(out)


def _rl_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data):
        run = 1
        while i + run < len(data) and data[i + run] == data[i] and run < 128:
            run += 1
        if run > 1:
            out += bytes([257 - run, data[i]])
            i += run
        else:
            j = i + 1
            while (
                j < len(data)
                and j - i < 128
                and not (j + 1 < len(data) and data[j + 1] == data[j])
            ):
                j += 1
            out += bytes([j - i - 1]) + data[i:j]
            i = j
    out.append(128)
    return bytes(out)


def test_ascii_hex_decode():
    body = STREAM.hex().encode() + b">"
    assert pdf_to_spans(_wrap_filtered(body, b"/ASCIIHexDecode")) == pdf_to_spans(
        _wrap(STREAM)
    )


def test_ascii85_decode():
    import base64

    body = base64.a85encode(STREAM, adobe=True)[2:]  # PDF omits the <~ leader
    assert pdf_to_spans(_wrap_filtered(body, b"/ASCII85Decode")) == pdf_to_spans(
        _wrap(STREAM)
    )


def test_lzw_decode_roundtrip():
    # long repetitive stream: forces table growth through a width bump
    stream = STREAM * 30
    body = _lzw_encode(stream)
    assert pdf_to_spans(_wrap_filtered(body, b"/LZWDecode")) == pdf_to_spans(
        _wrap(stream)
    )


def test_lzw_early_change_zero():
    """/DecodeParms << /EarlyChange 0 >> must reach the LZW decoder: a
    stream long enough to cross a code-width boundary decodes to garbage
    if the default EarlyChange=1 bump is applied."""
    stream = STREAM * 30
    body = _lzw_encode(stream, early_change=0)
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"3 0 obj << /Type /Page /MediaBox [0 0 612 792] /Contents 4 0 R >> endobj\n"
        b"4 0 obj << /Length " + str(len(body)).encode()
        + b" /Filter /LZWDecode /DecodeParms << /EarlyChange 0 >> >>\nstream\n"
        + body + b"endstream\nendobj\n%%EOF\n"
    )
    assert pdf_to_spans(pdf) == pdf_to_spans(_wrap(stream))


def test_indirect_length_quarantines():
    """An indirect /Length ('7 0 R') must raise, not parse as inline
    length 7 and silently truncate the stream scan."""
    from azure_pdf_parser_spark.functions.pdf import pdf_page_count

    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n"
        b"4 0 obj << /Length 7 0 R >>\nstream\n" + STREAM
        + b"endstream\nendobj\n"
        b"7 0 obj " + str(len(STREAM)).encode() + b" endobj\n%%EOF\n"
    )
    with pytest.raises(NotImplementedError, match="indirect /Length"):
        pdf_page_count(pdf)


def test_run_length_decode():
    stream = STREAM + b"BT (" + b"a" * 200 + b") Tj ET\n"
    body = _rl_encode(stream)
    assert pdf_to_spans(_wrap_filtered(body, b"/RunLengthDecode")) == pdf_to_spans(
        _wrap(stream)
    )


def test_filter_chain_ascii85_flate():
    import base64

    body = base64.a85encode(zlib.compress(STREAM), adobe=True)[2:]
    pdf = _wrap_filtered(body, b"[/ASCII85Decode /FlateDecode]")
    assert pdf_to_spans(pdf) == pdf_to_spans(_wrap(STREAM))


def test_image_xobject_stream_skipped_not_quarantined():
    """A DCT-compressed image XObject is opaque pixel data: the doc
    parses (text + the /ImX Do media span), instead of quarantining the
    whole document — real-world PDFs are mostly DCT-image-heavy."""
    fake_jpeg = b"\xff\xd8\xff\xe0" + b"\x00" * 20
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"3 0 obj << /Type /Page /MediaBox [0 0 612 792] /Contents 4 0 R >> endobj\n"
        b"4 0 obj << /Length " + str(len(STREAM)).encode() + b" >>\nstream\n"
        + STREAM + b"endstream\nendobj\n"
        b"5 0 obj << /Type /XObject /Subtype /Image /Width 8 /Height 8 "
        b"/Filter /DCTDecode /Length " + str(len(fake_jpeg)).encode()
        + b" >>\nstream\n" + fake_jpeg + b"endstream\nendobj\n%%EOF\n"
    )
    spans = pdf_to_spans(pdf)
    assert [s["text"] for s in spans] == ["A Title", "body text", None, "page 1"]
    assert spans[2]["media_ref"] == "media://deadbeef"


def test_predictor_quarantines():
    body = zlib.compress(STREAM)
    pdf = (
        b"%PDF-1.4\n4 0 obj << /Length " + str(len(body)).encode()
        + b" /Filter /FlateDecode /DecodeParms << /Predictor 12 >> >>\nstream\n"
        + body + b"endstream\nendobj\n"
    )
    with pytest.raises(NotImplementedError):
        pdf_to_spans(pdf)


# --- embedded-image media bridge ---------------------------------------------


def _image_pdf(filters: bytes, body: bytes, name: bytes = b"/Name /Imcafe01") -> bytes:
    return (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"3 0 obj << /Type /Page /MediaBox [0 0 612 792] /Contents 4 0 R >> endobj\n"
        b"4 0 obj << /Length " + str(len(STREAM)).encode() + b" >>\nstream\n"
        + STREAM + b"endstream\nendobj\n"
        b"5 0 obj << /Type /XObject /Subtype /Image " + name
        + b" /Width 8 /Height 8 /Filter " + filters
        + b" /Length " + str(len(body)).encode() + b" >>\nstream\n"
        + body + b"\nendstream\nendobj\n%%EOF\n"
    )


JPEG_HEADER = bytes.fromhex("FFD8FFC00011080020001000")  # 32x16 SOF0


def test_pdf_media_payloads_dct_passthrough():
    """A /DCTDecode stream's body IS the JPEG file — extraction applies
    no codec, and the payload header-parses to the embedded dims."""
    from azure_pdf_parser_spark.functions.pdf import pdf_media_payloads
    from azure_pdf_parser_spark.operators.multimodal import (
        header_dimensions,
        sniff_format,
    )

    out = pdf_media_payloads(_image_pdf(b"/DCTDecode", JPEG_HEADER))
    assert len(out) == 1
    assert out[0]["media_ref"] == "media://cafe01"
    assert out[0]["media_type"] == "image"
    assert sniff_format(out[0]["content"]) == "jpeg"
    assert header_dimensions("jpeg", out[0]["content"]) == (16, 32)


def test_pdf_media_payloads_transport_chain():
    """Transport filters (ASCIIHex here) are undone; the terminal image
    codec is the extraction boundary."""
    from azure_pdf_parser_spark.functions.pdf import pdf_media_payloads

    hex_body = JPEG_HEADER.hex().upper().encode()
    out = pdf_media_payloads(
        _image_pdf(b"[/ASCIIHexDecode /DCTDecode]", hex_body)
    )
    assert len(out) == 1
    assert out[0]["content"] == JPEG_HEADER


def test_pdf_media_payloads_codec_not_last_quarantines():
    from azure_pdf_parser_spark.functions.pdf import pdf_media_payloads

    with pytest.raises(NotImplementedError, match="not last"):
        pdf_media_payloads(
            _image_pdf(b"[/DCTDecode /ASCIIHexDecode]", JPEG_HEADER)
        )


def test_pdf_media_payloads_unnamed_image_skipped():
    from azure_pdf_parser_spark.functions.pdf import pdf_media_payloads

    assert pdf_media_payloads(_image_pdf(b"/DCTDecode", JPEG_HEADER, name=b"")) == []


def test_synth_with_images_content_stream_unchanged(spark):
    """Adding image XObjects must not move a single content-stream byte:
    the parse-side spans (incl. offsets) are identical with and without
    the embedded images."""
    from azure_pdf_parser_spark.functions.pdf import pdf_to_spans
    from azure_pdf_parser_spark.sources.pdfize import (
        synth_pdf_documents,
        synth_pdf_documents_with_images,
    )

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta " * 20) for i in range(24)],
        "doc_id long, text string",
    )
    plain = {r["doc_id"]: bytes(r["content"]) for r in synth_pdf_documents(docs).collect()}
    imaged = {r["doc_id"]: bytes(r["content"]) for r in synth_pdf_documents_with_images(docs).collect()}
    assert any(len(imaged[k]) > len(plain[k]) for k in plain)  # some figures exist
    for k in plain:
        assert pdf_to_spans(imaged[k]) == pdf_to_spans(plain[k])


def test_extract_pdf_media_joins_figure_spans(spark):
    """Every figure span's media_ref resolves to a decodable JPEG payload
    whose parsed dims follow the nibble formula."""
    from pyspark.sql import functions as F

    from azure_pdf_parser_spark.operators.multimodal import (
        extract_media_features,
        extract_pdf_media,
    )
    from azure_pdf_parser_spark.operators.parse import parse_documents
    from azure_pdf_parser_spark.sources.pdfize import (
        synth_pdf_documents_with_images,
    )

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta " * 20) for i in range(24)],
        "doc_id long, text string",
    )
    raw = synth_pdf_documents_with_images(docs)
    figures = (
        parse_documents(raw)
        .select(F.explode("spans").alias("s"))
        .where(F.col("s.kind") == "figure")
        .select(F.col("s.media_ref").alias("media_ref"))
    )
    feats = extract_media_features(
        extract_pdf_media(raw).select("media_ref", "media_type", "content")
    )
    joined = figures.join(feats, "media_ref", "left").collect()
    assert len(joined) > 0
    for r in joined:
        assert r["format"] == "jpeg", r
        assert r["status"] == "ok", r
        h = r["media_ref"][8:]
        nib = "0123456789abcdef"
        assert r["width"] == 16 * (nib.index(h[0]) + 1)
        assert r["height"] == 16 * (nib.index(h[1]) + 1)
