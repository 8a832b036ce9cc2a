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


def content_streams(pdf: bytes) -> list[bytes]:
    """All page content streams, decompressed. Raises NotImplementedError
    on filters other than FlateDecode."""
    streams = []
    for m in STREAM_RE.finditer(pdf):
        d, body = m.group(1), m.group(2)
        if b"/Filter" in d:
            if b"/FlateDecode" in d:
                body = zlib.decompress(body)
            else:
                raise NotImplementedError(
                    "unsupported PDF stream filter (only FlateDecode)"
                )
        # XObject/forms with no text ops just contribute no spans
        streams.append(body)
    return streams


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
