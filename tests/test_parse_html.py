"""HTML DOM parse stage: boilerplate strip heuristics + mapInPandas plumbing."""

from __future__ import annotations

import pytest

from azure_pdf_parser_spark.functions.html import html_to_spans

DOC = """<html><head><title>ignored</title><style>p{color:red}</style></head>
<body>
<header><a href="/">Site Name</a></header>
<nav class="main-nav"><ul><li>Home</li><li>About</li></ul></nav>
<h1>The Document Title</h1>
<div class="content">
  <p>First paragraph of the main content.</p>
  <h2>Section One</h2>
  <p>Body text with an &amp; entity and <b>inline bold</b> run.</p>
  <img src="https://cdn.example/fig1.png" alt="x">
  <table><tr><th>Col A</th><td>val 1</td></tr></table>
  <div class="sidebar-promo">Buy now!</div>
</div>
<script>var x = "<p>not content</p>";</script>
<footer>Copyright 2026</footer>
</body></html>"""


@pytest.fixture(scope="module")
def spans():
    return html_to_spans(DOC)


def test_kinds_and_order(spans):
    got = [(s["kind"], s["text"]) for s in spans]
    assert got == [
        ("pageHeader", "Site Name"),
        ("pageHeader", "Home"),
        ("pageHeader", "About"),
        ("title", "The Document Title"),
        ("Text", "First paragraph of the main content."),
        ("sectionHeading", "Section One"),
        ("Text", "Body text with an & entity and"),
        ("Text", "inline bold"),
        ("Text", "run."),
        ("figure", None),
        ("TableCell", "Col A"),
        ("TableCell", "val 1"),
        ("pageFooter", "Buy now!"),  # class-based DOM-path boilerplate
        ("pageFooter", "Copyright 2026"),
    ]


def test_media_ref_and_offsets(spans):
    figs = [s for s in spans if s["kind"] == "figure"]
    assert figs[0]["media_ref"] == "https://cdn.example/fig1.png"
    offsets = [s["offset"] for s in spans]
    assert offsets == sorted(offsets) and len(set(offsets)) == len(offsets)


def test_head_script_style_dropped(spans):
    texts = " ".join(s["text"] or "" for s in spans)
    assert "ignored" not in texts
    assert "color:red" not in texts
    assert "not content" not in texts


def test_malformed_html_no_crash():
    spans = html_to_spans("<div><p>unclosed <b>nested<br>text</div> tail <<< & junk")
    assert any("unclosed" in (s["text"] or "") for s in spans)
    assert all(s["offset"] >= 0 for s in spans)


def test_empty_and_degenerate():
    assert html_to_spans("") == []
    assert html_to_spans("plain text only") == [
        {"kind": "Text", "text": "plain text only", "media_ref": None, "offset": 0}
    ]


def test_parse_documents_stage(spark):
    """mapInPandas plumbing: Arrow batch in, span rows + quarantine out,
    then straight into the downstream extraction (full seam)."""
    from azure_pdf_parser_spark.operators.extract_spans import extract
    from azure_pdf_parser_spark.operators.parse import parse_documents
    from azure_pdf_parser_spark.schemas import RAW_DOCUMENT

    pdf_ok = (
        b"%PDF-1.4\n4 0 obj << /Length 40 >>\nstream\n"
        b"BT /F1 18 Tf 72 700 Td (A Title) Tj ET\nendstream\nendobj\n"
    )
    pdf_bad = (
        b"%PDF-1.4\n4 0 obj << /Length 1 /Filter /DCTDecode >>\nstream\nx"
        b"endstream\nendobj\n"
    )
    rows = [
        ("h1", "text/html", DOC.encode()),
        ("h2", "text/html", b"<p>tiny</p>"),
        ("p1", "application/pdf", pdf_ok),   # real mini-extractor path
        ("p2", "application/pdf", pdf_bad),  # exotic filter → quarantined
        ("x1", "image/png", b"\x89PNG"),     # unsupported → failed
    ]
    raw = spark.createDataFrame(rows, RAW_DOCUMENT)
    parsed = parse_documents(raw)
    got = {r["doc_id"]: r for r in parsed.collect()}

    assert got["h1"]["status"] == "ok" and len(got["h1"]["spans"]) == 14
    assert got["h2"]["spans"][0]["text"] == "tiny"
    assert got["p1"]["status"] == "ok"
    assert [(s["kind"], s["text"]) for s in got["p1"]["spans"]] == [("title", "A Title")]
    assert got["p2"]["status"] == "failed" and "NotImplementedError" in got["p2"]["error"]
    assert got["x1"]["status"] == "failed" and "unsupported content type" in got["x1"]["error"]

    out = extract(parsed.where("status = 'ok'").select("doc_id", "spans"))
    r = {x["doc_id"]: x for x in out.collect()}
    # boilerplate (header/nav/footer/sidebar) stripped by main-content filter
    kinds = [s["kind"] for s in r["h1"]["spans"]]
    assert "pageHeader" not in kinds and "pageFooter" not in kinds
    assert kinds[0] == "title" and "TableCell" in kinds and "figure" in kinds


def test_fake_pdf_parser_seam(spark):
    """The PDF path's Spark plumbing, exercised via the deterministic fake."""
    from azure_pdf_parser_spark.operators import parse as parse_mod
    from azure_pdf_parser_spark.operators.parse import parse_documents
    from azure_pdf_parser_spark.schemas import RAW_DOCUMENT

    def fake(content: bytes) -> list[dict]:
        return [
            {"kind": "Text", "text": content.decode(), "media_ref": None, "offset": 0}
        ]

    parse_mod.FAKE_PDF_PARSER = fake
    try:
        raw = spark.createDataFrame(
            [("p9", "application/pdf", b"page one text")], RAW_DOCUMENT
        )
        got = parse_documents(raw).collect()[0]
        assert got["status"] == "ok"
        assert got["spans"][0]["text"] == "page one text"
    finally:
        parse_mod.FAKE_PDF_PARSER = None


def test_parse_retry_bounded_attempts(spark):
    """O16 parity: a transiently-failing doc succeeds on a later attempt
    (attempts recorded), a permanently-failing doc quarantines after
    exactly MAX_ATTEMPTS tries — the reference pins 3 attempts per call
    (its tests/test_azure_wrapper.py:34-55)."""
    from azure_pdf_parser_spark.operators import parse as parse_mod
    from azure_pdf_parser_spark.operators.parse import MAX_ATTEMPTS, parse_documents
    from azure_pdf_parser_spark.schemas import RAW_DOCUMENT

    class Flaky:
        """Fails the first N calls per doc payload, then succeeds."""

        def __init__(self):
            self.calls = {}

        def __call__(self, content: bytes) -> list[dict]:
            text = content.decode()
            n = self.calls.get(text, 0) + 1
            self.calls[text] = n
            fail_first = int(text.split(":")[0])
            if n <= fail_first:
                raise IOError(f"transient fault #{n}")
            return [{"kind": "Text", "text": text, "media_ref": None, "offset": 0}]

    parse_mod.FAKE_PDF_PARSER = Flaky()
    try:
        rows = [
            ("ok0", "application/pdf", b"0:clean"),       # first try
            ("ok2", "application/pdf", b"2:flaky"),       # 3rd try succeeds
            ("dead", "application/pdf", b"99:hopeless"),  # never succeeds
        ]
        # single partition → one Python worker → the Flaky call-counter
        # state survives across the retry loop
        raw = spark.createDataFrame(rows, RAW_DOCUMENT).coalesce(1)
        got = {r["doc_id"]: r for r in parse_documents(raw).collect()}
    finally:
        parse_mod.FAKE_PDF_PARSER = None

    assert got["ok0"]["status"] == "ok" and got["ok0"]["attempts"] == 1
    assert got["ok2"]["status"] == "ok" and got["ok2"]["attempts"] == 3
    assert got["ok2"]["spans"][0]["text"] == "2:flaky"
    assert got["dead"]["status"] == "failed"
    assert got["dead"]["attempts"] == MAX_ATTEMPTS
    assert "transient fault #3" in got["dead"]["error"]
