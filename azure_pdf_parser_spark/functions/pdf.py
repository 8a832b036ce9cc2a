"""Dependency-free PDF text extraction (the in-cluster O2 analog for
``application/pdf`` rows).

The reference ships PDF bytes to Azure Document Intelligence and treats
the layout result as a black box (reference azure_wrapper.py:46-61);
the engine parses in-cluster. This module is a minimal real PDF reader
built only on the stdlib:

* object scan: ``<< dict >> stream ... endstream`` blocks; streams with
  ``/FlateDecode`` are inflated with :mod:`zlib`; other filters
  quarantine with ``NotImplementedError`` (no codec libs in this
  environment — same stub contract as multimodal decode).
* content tokenizer: PDF strings ``( ... )`` (with ``\\``-escapes),
  names ``/X``, numbers, and operators, evaluated with an operand stack
  and text state — ``Tf`` (font size), ``Td``/``TD``/``Tm`` (position),
  ``Tj``/``TJ``/``'`` (show text), ``/ImX Do`` (image XObject → media
  span).
* layout heuristic (kind classification — engine-defined, the analog of
  the reference's Azure-assigned paragraph roles):
    - y ≥ 756 (top 0.5" of a US-Letter page) → ``pageHeader``
    - y ≤ 36                                 → ``pageFooter``
    - font size ≥ 16                         → ``title``
    - 13 ≤ size < 16                         → ``sectionHeading``
    - else                                   → ``Text``
  Boilerplate-by-position beats size, mirroring the DOM-path rule of
  the HTML parser.
* offset = byte offset of the span's text object (``BT``) or XObject
  name token within the (decompressed) content stream — strictly
  increasing, unique per doc: the input_hint invariant.

Imported inside the mapInPandas parse stage (operators/parse.py); pure
Python, no third-party deps, so executors need only the --py-files zip.
"""

from __future__ import annotations

import re
import zlib

STREAM_RE = re.compile(rb"<<(.*?)>>\s*stream\r?\n(.*?)endstream", re.DOTALL)
TOKEN_RE = re.compile(
    r"""\((?:\\.|[^\\()])*\)   # literal string
      | /[^\s/\[\]()<>]+       # name
      | [-+]?\d*\.?\d+         # number
      | [A-Za-z'"]{1,3}\*?     # operator
      | \[ | \]
    """,
    re.VERBOSE,
)

_ESCAPES = {"n": "\n", "r": "\r", "t": "\t", "b": "\b", "f": "\f",
            "(": "(", ")": ")", "\\": "\\"}


def _unescape_pdf_string(raw: str) -> str:
    out, i = [], 0
    while i < len(raw):
        c = raw[i]
        if c == "\\" and i + 1 < len(raw):
            nxt = raw[i + 1]
            if nxt in _ESCAPES:
                out.append(_ESCAPES[nxt])
                i += 2
                continue
            if nxt.isdigit():  # octal escape \ddd
                j = i + 1
                while j < len(raw) and j < i + 4 and raw[j].isdigit():
                    j += 1
                out.append(chr(int(raw[i + 1 : j], 8)))
                i = j
                continue
        out.append(c)
        i += 1
    return "".join(out)


def classify_kind(size: float, y: float) -> str:
    if y >= 756:
        return "pageHeader"
    if y <= 36:
        return "pageFooter"
    if size >= 16:
        return "title"
    if size >= 13:
        return "sectionHeading"
    return "Text"


def _decode_ascii_hex(body: bytes) -> bytes:
    data = body.split(b">")[0]
    data = bytes(c for c in data if c not in b" \t\r\n\f\0")
    if len(data) % 2:
        data += b"0"  # PDF spec: odd final digit implies trailing 0
    return bytes.fromhex(data.decode("ascii"))


def _decode_ascii85(body: bytes) -> bytes:
    import base64

    data = body.strip()
    if not data.startswith(b"<~"):
        data = b"<~" + data  # PDF streams omit the Adobe leader
    if not data.endswith(b"~>"):
        data += b"~>"
    return base64.a85decode(data, adobe=True)


def _decode_lzw(body: bytes, early_change: int = 1) -> bytes:
    """PDF LZWDecode: MSB-first variable-width codes, 9→12 bits, clear
    code 256, EOD 257, EarlyChange=1 (width bumps one code early — the
    PDF default)."""
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width, prev = 9, None
    buf = bits = 0
    for byte in body:
        buf = (buf << 8) | byte
        bits += 8
        while bits >= width:
            bits -= width
            code = (buf >> bits) & ((1 << width) - 1)
            if code == 256:  # clear table
                table = table[:258]
                width, prev = 9, None
                continue
            if code == 257:  # EOD
                return bytes(out)
            if code < len(table):
                entry = table[code]
            elif code == len(table) and prev is not None:
                entry = prev + prev[:1]  # KwKwK case
            else:
                raise ValueError(f"corrupt LZW stream (code {code})")
            out += entry
            if prev is not None:
                table.append(prev + entry[:1])
            prev = entry
            if len(table) + early_change >= (1 << width) and width < 12:
                width += 1
    return bytes(out)


def _decode_run_length(body: bytes) -> bytes:
    out, i = bytearray(), 0
    while i < len(body):
        n = body[i]
        if n == 128:  # EOD
            break
        if n < 128:
            out += body[i + 1 : i + 2 + n]
            i += 2 + n
        else:
            out += body[i + 1 : i + 2] * (257 - n)
            i += 2
    return bytes(out)


_FILTER_DECODERS = {
    b"FlateDecode": zlib.decompress,
    b"Fl": zlib.decompress,
    b"LZWDecode": _decode_lzw,
    b"LZW": _decode_lzw,
    b"ASCII85Decode": _decode_ascii85,
    b"A85": _decode_ascii85,
    b"ASCIIHexDecode": _decode_ascii_hex,
    b"AHx": _decode_ascii_hex,
    b"RunLengthDecode": _decode_run_length,
    b"RL": _decode_run_length,
}

_FILTER_LIST_RE = re.compile(rb"/Filter\s*(?:\[([^\]]*)\]|/([A-Za-z0-9]+))")
_NAME_RE = re.compile(rb"/([A-Za-z0-9]+)")


def decode_stream(d: bytes, body: bytes) -> bytes:
    """Apply the stream dict's /Filter chain in order.

    Supported: FlateDecode, LZWDecode, ASCII85Decode, ASCIIHexDecode,
    RunLengthDecode — and any /Filter [A B ...] composition of them
    (e.g. [/ASCII85Decode /FlateDecode]). Image codecs (DCT/JPX/CCITT/
    JBIG2) never appear on *content* streams — image XObject data is
    treated as opaque upstream. Predictors (/DecodeParms /Predictor > 1)
    quarantine: they only occur on image/xref data in practice.
    """
    m = _FILTER_LIST_RE.search(d)
    if not m:
        return body
    names = (
        [n.group(1) for n in _NAME_RE.finditer(m.group(1))]
        if m.group(1) is not None
        else [m.group(2)]
    )
    pm = re.search(rb"/Predictor\s+(\d+)", d)
    if pm and int(pm.group(1)) > 1:
        raise NotImplementedError("PDF stream predictors unsupported")
    # /EarlyChange lives in DecodeParms next to /Predictor; ignoring it
    # would silently mis-decode LZW at every code-width boundary, so it
    # is parsed and threaded through (the decoder implements both).
    em = re.search(rb"/EarlyChange\s+(\d+)", d)
    early_change = int(em.group(1)) if em else 1
    for name in names:
        if name in (b"LZWDecode", b"LZW"):
            body = _decode_lzw(body, early_change=early_change)
            continue
        decoder = _FILTER_DECODERS.get(name)
        if decoder is None:
            raise NotImplementedError(
                f"unsupported PDF stream filter /{name.decode('ascii')}"
            )
        body = decoder(body)
    return body


def content_streams(pdf: bytes) -> list[bytes]:
    """All page content streams, decoded through their /Filter chains
    (Flate/LZW/ASCII85/ASCIIHex/RunLength and compositions thereof).

    ``/Subtype /Image`` streams are opaque pixel data — they carry no
    content operators and are skipped outright, so DCT/JPX-image-heavy
    real-world PDFs parse instead of quarantining (their figures still
    surface as media spans via the ``/ImX Do`` references in the content
    streams). Unsupported filters on a *content* stream still raise →
    per-doc quarantine."""
    streams = []
    for m in STREAM_RE.finditer(pdf):
        d, body = m.group(1), m.group(2)
        if re.search(rb"/Subtype\s*/Image\b", d):
            continue
        # XObject/forms with no text ops just contribute no spans
        streams.append(decode_stream(d, body))
    return streams


# ---------------------------------------------------------------------------
# Embedded-image bridge: image XObject streams → media payloads.
#
# Image codecs (DCT/JPX/...) are the decode boundary — but EXTRACTING
# the compressed payload needs no codec at all: a /DCTDecode stream's
# body IS a JPEG file, so applying only the transport filters
# (ASCIIHex/ASCII85/Flate/LZW/RunLength) and stopping at the image
# codec yields bytes the multimodal header extractor
# (operators/multimodal.py) parses directly. This is how the figure
# spans emitted by the content-stream parser (`/ImX Do` → media_ref)
# get their actual bytes. Reference analog: figures in the golden
# fixtures' bounding regions (tests/data/sample-*.json) — the reference
# never extracts payloads (Azure holds them), so this closes a gap the
# reference cannot.
# ---------------------------------------------------------------------------

_IMAGE_CODECS = frozenset(
    (b"DCTDecode", b"DCT", b"JPXDecode", b"CCITTFaxDecode", b"CCF",
     b"JBIG2Decode")
)
_IMAGE_NAME_RE = re.compile(rb"/Name\s*/(Im[^\s/\[\]()<>]*)")


def decode_image_transport(d: bytes, body: bytes) -> bytes:
    """Apply the transport prefix of an image stream's /Filter chain and
    return the codec payload (e.g. the raw JPEG file for /DCTDecode).
    An image codec anywhere but last in the chain is malformed →
    NotImplementedError (quarantine)."""
    m = _FILTER_LIST_RE.search(d)
    if not m:
        return body
    names = (
        [n.group(1) for n in _NAME_RE.finditer(m.group(1))]
        if m.group(1) is not None
        else [m.group(2)]
    )
    em = re.search(rb"/EarlyChange\s+(\d+)", d)
    early_change = int(em.group(1)) if em else 1
    for idx, name in enumerate(names):
        if name in _IMAGE_CODECS:
            if idx != len(names) - 1:
                raise NotImplementedError(
                    f"image codec /{name.decode('ascii')} not last in "
                    "/Filter chain"
                )
            return body
        if name in (b"LZWDecode", b"LZW"):
            body = _decode_lzw(body, early_change=early_change)
            continue
        decoder = _FILTER_DECODERS.get(name)
        if decoder is None:
            raise NotImplementedError(
                f"unsupported PDF stream filter /{name.decode('ascii')}"
            )
        body = decoder(body)
    return body


def pdf_media_payloads(pdf: bytes) -> list[dict]:
    """[{media_ref, media_type, content}] — one per named image XObject.

    media_ref mirrors the content-stream parser's `/ImX Do` convention
    ('media://' + name minus the 'Im' prefix), so payload rows join the
    figure spans emitted by :func:`pdf_to_spans` on media_ref. Unnamed
    images (no /Name — legal in PDF, the name then lives only in the
    page's /Resources dict) are skipped: resolving /Resources is beyond
    the documented dialect boundary.
    """
    if not pdf.startswith(b"%PDF"):
        raise ValueError("not a PDF (missing %PDF header)")
    out: list[dict] = []
    for m in STREAM_RE.finditer(pdf):
        d, body = m.group(1), m.group(2)
        if not re.search(rb"/Subtype\s*/Image\b", d):
            continue
        nm = _IMAGE_NAME_RE.search(d)
        if nm is None:
            continue
        out.append(
            {
                "media_ref": "media://" + nm.group(1).decode("latin-1")[2:],
                "media_type": "image",
                "content": decode_image_transport(d, body),
            }
        )
    return out


# ---------------------------------------------------------------------------
# O1 on raw bytes: page-batch split (reference utils.py:117-163).
#
# The reference re-serializes a PDF into ≤batch_size-page standalone
# PDFs with pypdf (1-based inclusive ranges, 0-based batch numbers; 68
# pages @ 12 → 6 batches — pinned by reference tests/test_utils.py:
# 185-230). This is the dependency-free analog: a minimal object
# scanner resolves the page tree and per-page content streams, and each
# batch is rebuilt as a standalone catalog→pages→page(s)→contents PDF.
#
# Dialect boundary (documented, quarantine on violation): single-level
# /Kids page tree, direct (inline) /Length, /Contents as a direct ref
# or flat array of refs. Object streams / nested page trees raise
# NotImplementedError → the per-doc quarantine path, same contract as
# exotic stream filters.
# ---------------------------------------------------------------------------

_OBJ_START_RE = re.compile(rb"(\d+)\s+0\s+obj")
_STREAM_START_RE = re.compile(rb"stream\r?\n")
DEFAULT_MEDIABOX = b"[0 0 612 792]"


def _scan_objects(pdf: bytes) -> dict[int, bytes]:
    """num → object body (dict + optional stream, without obj/endobj).

    Stream bodies are skipped via their inline /Length so binary
    (flate) data containing 'endobj' can't truncate the scan."""
    objs: dict[int, bytes] = {}
    pos = 0
    while True:
        m = _OBJ_START_RE.search(pdf, pos)
        if not m:
            break
        start = m.end()
        sm = _STREAM_START_RE.search(pdf, start)
        end_marker = pdf.find(b"endobj", start)
        if sm is not None and (end_marker == -1 or sm.start() < end_marker):
            head = pdf[start : sm.start()]
            # an indirect length ('/Length 7 0 R') would otherwise match
            # the inline pattern as length 7 and silently corrupt the
            # scan — detect it FIRST and quarantine (documented dialect
            # boundary, same contract as nested /Kids)
            if re.search(rb"/Length\s+\d+\s+\d+\s+R", head):
                raise NotImplementedError(
                    "PDF stream with indirect /Length reference unsupported"
                )
            lm = re.search(rb"/Length\s+(\d+)", head)
            if lm is None:
                raise NotImplementedError(
                    "PDF stream object without inline /Length"
                )
            end_marker = pdf.find(b"endobj", sm.end() + int(lm.group(1)))
        if end_marker == -1:
            break
        objs[int(m.group(1))] = pdf[start:end_marker]
        pos = end_marker + len(b"endobj")
    return objs


def _page_ids(objs: dict[int, bytes]) -> list[int]:
    for body in objs.values():
        if re.search(rb"/Type\s*/Pages\b", body) and b"/Kids" in body:
            kids_m = re.search(rb"/Kids\s*\[(.*?)\]", body, re.DOTALL)
            kids = [int(x) for x in re.findall(rb"(\d+)\s+0\s+R", kids_m.group(1))]
            for kid in kids:
                if re.search(rb"/Type\s*/Pages\b", objs.get(kid, b"")):
                    raise NotImplementedError("nested /Pages trees unsupported")
            return kids
    raise ValueError("no /Pages node found")


def _page_contents(objs: dict[int, bytes], page_id: int) -> tuple[list[int], bytes]:
    """(content object ids, MediaBox bytes) for one page object."""
    body = objs[page_id]
    mb = re.search(rb"/MediaBox\s*(\[[^\]]*\])", body)
    mediabox = mb.group(1) if mb else DEFAULT_MEDIABOX
    arr = re.search(rb"/Contents\s*\[(.*?)\]", body, re.DOTALL)
    if arr:
        refs = [int(x) for x in re.findall(rb"(\d+)\s+0\s+R", arr.group(1))]
    else:
        single = re.search(rb"/Contents\s+(\d+)\s+0\s+R", body)
        refs = [int(single.group(1))] if single else []
    return refs, mediabox


def pdf_page_count(pdf: bytes) -> int:
    if not pdf.startswith(b"%PDF"):
        raise ValueError("not a PDF (missing %PDF header)")
    return len(_page_ids(_scan_objects(pdf)))


def _rebuild_pdf(pages: list[tuple[list[bytes], bytes]]) -> bytes:
    """Standalone PDF from [(content stream object bodies, mediabox)].

    Object layout: 1=catalog, 2=pages, then per page an even/odd pair —
    no xref table (the in-cluster reader and lenient readers scan;
    sub-PDFs exist only to feed the parse stage, never as a sink)."""
    out = [b"%PDF-1.4\n"]
    out.append(b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    next_id = 3
    page_entries = []  # (page_id, [content ids], mediabox, [bodies])
    for bodies, mediabox in pages:
        page_id = next_id
        content_ids = list(range(next_id + 1, next_id + 1 + len(bodies)))
        next_id += 1 + len(bodies)
        page_entries.append((page_id, content_ids, mediabox, bodies))
    kids = b" ".join(b"%d 0 R" % (p,) for p, _, _, _ in page_entries)
    out.append(
        b"2 0 obj << /Type /Pages /Kids [" + kids + b"] /Count %d >> endobj\n"
        % (len(page_entries),)
    )
    for page_id, content_ids, mediabox, bodies in page_entries:
        if len(content_ids) == 1:
            contents = b"%d 0 R" % (content_ids[0],)
        else:
            contents = b"[" + b" ".join(b"%d 0 R" % c for c in content_ids) + b"]"
        out.append(
            b"%d 0 obj << /Type /Page /Parent 2 0 R /MediaBox " % (page_id,)
            + mediabox
            + b" /Contents "
            + contents
            + b" >> endobj\n"
        )
        for cid, body in zip(content_ids, bodies):
            out.append(b"%d 0 obj " % (cid,) + body + b"endobj\n")
    out.append(b"%%EOF\n")
    return b"".join(out)


def split_pdf(pdf: bytes, batch_size: int = 50) -> list[dict]:
    """[{batch_number, first_page, last_page, content}] — ≤batch_size
    pages per standalone sub-PDF; 1-based inclusive ranges, 0-based
    batch numbers (reference utils.py:117-163 split math: 68 pages @ 12
    → (1,12)..(61,68))."""
    if batch_size < 1:
        raise ValueError("Batch size must be greater than 0.")
    if not pdf.startswith(b"%PDF"):
        raise ValueError("not a PDF (missing %PDF header)")
    objs = _scan_objects(pdf)
    page_ids = _page_ids(objs)
    batches = []
    for batch_number, start in enumerate(range(0, len(page_ids), batch_size)):
        ids = page_ids[start : start + batch_size]
        pages = []
        for pid in ids:
            refs, mediabox = _page_contents(objs, pid)
            pages.append(([objs[r] for r in refs], mediabox))
        batches.append(
            {
                "batch_number": batch_number,
                "first_page": start + 1,
                "last_page": start + len(ids),
                "content": _rebuild_pdf(pages),
            }
        )
    return batches


def pdf_to_spans(pdf: bytes) -> list[dict]:
    """Parse one PDF into interleaved (kind, text, media_ref, offset).

    Offsets are byte positions within the concatenation of the doc's
    decompressed content streams.
    """
    if not pdf.startswith(b"%PDF"):
        raise ValueError("not a PDF (missing %PDF header)")
    spans: list[dict] = []
    base = 0
    for raw in content_streams(pdf):
        text = raw.decode("latin-1")
        stack: list = []
        size = 0.0
        x = y = 0.0
        bt_pos = 0
        for m in TOKEN_RE.finditer(text):
            tok = m.group(0)
            if tok.startswith("("):
                stack.append(("str", _unescape_pdf_string(tok[1:-1])))
            elif tok.startswith("/"):
                stack.append(("name", tok[1:], m.start()))
            elif tok[0].isdigit() or tok[0] in "+-." and len(tok) > 1:
                stack.append(("num", float(tok)))
            elif tok == "[" or tok == "]":
                continue
            else:  # operator
                if tok == "BT":
                    x = y = 0.0
                    bt_pos = m.start()
                elif tok == "Tf" and stack and stack[-1][0] == "num":
                    size = stack[-1][1]
                elif tok in ("Td", "TD") and len(stack) >= 2:
                    x += stack[-2][1]
                    y += stack[-1][1]
                elif tok == "Tm" and len(stack) >= 6:
                    x, y = stack[-2][1], stack[-1][1]
                elif tok in ("Tj", "'") or tok == "TJ":
                    parts = [
                        s[1] for s in (stack if tok == "TJ" else stack[-1:])
                        if s[0] == "str"
                    ]
                    content = "".join(parts)
                    if content:
                        spans.append(
                            {
                                "kind": classify_kind(size, y),
                                "text": content,
                                "media_ref": None,
                                "offset": base + bt_pos,
                            }
                        )
                elif tok == "Do" and stack and stack[-1][0] == "name":
                    name = stack[-1][1]
                    if name.startswith("Im"):
                        spans.append(
                            {
                                "kind": "figure",
                                "text": None,
                                "media_ref": "media://" + name[2:],
                                "offset": base + stack[-1][2],
                            }
                        )
                stack.clear()
        base += len(raw)
    return spans
