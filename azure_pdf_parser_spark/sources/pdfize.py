"""Deterministic text → PDF synthesis ("pdfize").

Gate-checks the real dependency-free PDF extractor (functions/pdf.py,
run through the mapInPandas parse stage) against the DuckDB oracle.
Each document's text is chunked exactly like spanize (8-word runs,
``h = md5(doc_id || ':' || i)``); chunk i becomes one content-stream
fragment chosen by the first hex char of ``h``:

    'a' → BT /F1 18 Tf 72 700 Td (text) Tj ET   (parser: title)
    'b' → BT /F1 14 Tf 72 660 Td (text) Tj ET   (sectionHeading)
    'c' → BT /F1 9 Tf 72 780 Td (text) Tj ET    (pageHeader — top band)
    'd' → BT /F1 9 Tf 72 20 Td (text) Tj ET     (pageFooter — bottom band)
    'f' → /Im{h} Do                              (figure media span)
    else BT /F1 12 Tf 72 400 Td (text) Tj ET    (Text)

Fragments concatenate into one uncompressed page content stream inside
a minimal single-page PDF (catalog → pages → page → contents), built
entirely with JVM string expressions — the only Python in the gate
query is the parser under test. The parser's offsets are byte positions
in the content stream, so the oracle predicts them with a running-sum
window over the per-fragment lengths (27 + len(size) + len(y) +
len(text) for text ops; 39 for Do ops).

The FlateDecode path (zlib-compressed streams) can't be built JVM-side;
it is pinned by pytest with a Python-synthesized compressed twin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from azure_pdf_parser_spark.sources.spanize import WORDS_PER_SPAN

# hex char → (font size, y, parsed kind)
PDF_KINDS = {
    "a": ("18", "700", "title"),
    "b": ("14", "660", "sectionHeading"),
    "c": ("9", "780", "pageHeader"),
    "d": ("9", "20", "pageFooter"),
}
DEFAULT_SIZE_Y = ("12", "400")

_HEADER = (
    "%PDF-1.4\n"
    "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
    "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
    "3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
    "/Contents 4 0 R >> endobj\n"
    "4 0 obj << /Length "
)


def _fragment_builder(doc_id: Column, words: Column):
    def fragment(i: Column) -> Column:
        chunk_text = F.array_join(
            F.slice(words, i * WORDS_PER_SPAN + 1, WORDS_PER_SPAN), " "
        )
        h = F.md5(F.concat(doc_id.cast("string"), F.lit(":"), i.cast("string")))
        c1 = F.substring(h, 1, 1)

        def text_frag(size: str, y: str) -> Column:
            return F.concat(
                F.lit(f"BT /F1 {size} Tf 72 {y} Td ("),
                chunk_text,
                F.lit(") Tj ET\n"),
            )

        expr = text_frag(*DEFAULT_SIZE_Y)
        for hexc, (size, y, _) in PDF_KINDS.items():
            expr = F.when(c1 == hexc, text_frag(size, y)).otherwise(expr)
        return F.when(
            c1 == "f", F.concat(F.lit("/Im"), h, F.lit(" Do\n"))
        ).otherwise(expr)

    return fragment


def pdf_col(doc_id: Column, text: Column, with_images: bool = False) -> Column:
    """One single-page PDF document (string; encode to binary at the
    source). ``with_images`` appends a real JPEG image XObject per
    figure chunk after the content stream — same content stream, so the
    parse-side span sequence and offsets are byte-identical either way."""
    words = F.split(text, " ")
    n_chunks = F.ceil(F.size(words) / F.lit(float(WORDS_PER_SPAN))).cast("int")
    stream = F.array_join(
        F.transform(F.sequence(F.lit(0), n_chunks - 1), _fragment_builder(doc_id, words)),
        "",
    )
    parts = [
        F.lit(_HEADER),
        F.length(stream).cast("string"),
        F.lit(" >>\nstream\n"),
        stream,
        F.lit("endstream\nendobj\n"),
    ]
    if with_images:
        parts.append(_image_objects_col(doc_id, n_chunks))
    parts.append(F.lit("%%EOF\n"))
    return F.concat(*parts)


def _image_objects_col(doc_id: Column, n_chunks: Column) -> Column:
    """Concatenated image XObject objects (one per 'f' chunk): a real
    12-byte JPEG header (SOI + SOF0, dimensions from the chunk hash's
    first two nibbles — the same nibbles the media oracle predicts
    from) carried as an /ASCIIHexDecode → /DCTDecode stream, so the
    whole object is ASCII and JVM-constructible while the extractor
    exercises a real transport-filter chain. /Name /Im{h} matches the
    content stream's '/Im{h} Do' figure reference."""

    def hex_be16(col: Column) -> Column:
        return F.lpad(F.hex(col), 4, "0")

    def image_obj(i: Column) -> Column:
        h = F.md5(F.concat(doc_id.cast("string"), F.lit(":"), i.cast("string")))
        nib1 = F.instr(F.lit("0123456789abcdef"), F.substring(h, 1, 1)) - 1
        nib2 = F.instr(F.lit("0123456789abcdef"), F.substring(h, 2, 1)) - 1
        width = (16 * (nib1 + 1)).cast("int")
        height = (16 * (nib2 + 1)).cast("int")
        # 24 hex chars = 12 bytes: FFD8 (SOI) FFC0 len=17 precision=8
        # height width + 1 pad byte (same header synth as the
        # media_features_jpeg gate — one prediction formula both sides)
        jpeg_hex = F.concat(
            F.lit("FFD8FFC0001108"), hex_be16(height), hex_be16(width),
            F.lit("00"),
        )
        obj = F.concat(
            (F.lit(5) + i).cast("string"),
            F.lit(" 0 obj << /Type /XObject /Subtype /Image /Name /Im"),
            h,
            F.lit(" /Width "), width.cast("string"),
            F.lit(" /Height "), height.cast("string"),
            F.lit(" /Filter [/ASCIIHexDecode /DCTDecode] /Length 24"
                  " >>\nstream\n"),
            jpeg_hex,
            F.lit("\nendstream endobj\n"),
        )
        return F.when(F.substring(h, 1, 1) == "f", obj).otherwise(F.lit(""))

    return F.array_join(
        F.transform(F.sequence(F.lit(0), n_chunks - 1), image_obj), ""
    )


def synth_pdf_documents_with_images(docs: DataFrame) -> DataFrame:
    """Single-page synth PDFs with REAL embedded JPEG image XObjects for
    every figure chunk — the input of the pdf_media_features gate. The
    content stream (and so the parse-side span sequence and offsets) is
    byte-identical to :func:`synth_pdf_documents`; the image objects sit
    after it and are skipped by the content parser."""
    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.lit("application/pdf").alias("content_type"),
        F.encode(
            pdf_col(F.col("doc_id"), F.col("text"), with_images=True), "UTF-8"
        ).alias("content"),
    )


CHUNKS_PER_PAGE = 3


def multipage_pdf_col(
    doc_id: Column, text: Column, chunks_per_page: int = CHUNKS_PER_PAGE
) -> Column:
    """One MULTI-page PDF: chunk i lands on page i // chunks_per_page,
    each page its own object pair (page, content stream) under a
    single-level /Kids tree — the shape the raw-byte page splitter
    (functions/pdf.py::split_pdf) consumes. Page count = ceil(n_chunks /
    chunks_per_page), so the split plan is oracle-predictable from the
    spanize chunk count."""
    words = F.split(text, " ")
    n_chunks = F.ceil(F.size(words) / F.lit(float(WORDS_PER_SPAN))).cast("int")
    n_pages = F.ceil(n_chunks / F.lit(float(chunks_per_page))).cast("int")
    fragment = _fragment_builder(doc_id, words)

    def page_stream(p: Column) -> Column:
        first = p * chunks_per_page
        last = F.least(first + chunks_per_page, n_chunks) - 1
        return F.array_join(F.transform(F.sequence(first, last), fragment), "")

    def page_objs(p: Column) -> Column:
        stream = page_stream(p)
        page_id = (p * 2 + 3).cast("string")
        content_id = (p * 2 + 4).cast("string")
        return F.concat(
            page_id,
            F.lit(
                " 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]"
                " /Contents "
            ),
            content_id,
            F.lit(" 0 R >> endobj\n"),
            content_id,
            F.lit(" 0 obj << /Length "),
            F.length(stream).cast("string"),
            F.lit(" >>\nstream\n"),
            stream,
            F.lit("endstream\nendobj\n"),
        )

    kids = F.array_join(
        F.transform(
            F.sequence(F.lit(0), n_pages - 1),
            lambda p: F.concat((p * 2 + 3).cast("string"), F.lit(" 0 R")),
        ),
        " ",
    )
    body = F.array_join(
        F.transform(F.sequence(F.lit(0), n_pages - 1), page_objs), ""
    )
    return F.concat(
        F.lit(
            "%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
            "2 0 obj << /Type /Pages /Kids ["
        ),
        kids,
        F.lit("] /Count "),
        n_pages.cast("string"),
        F.lit(" >> endobj\n"),
        body,
        F.lit("%%EOF\n"),
    )


def synth_multipage_pdf_documents(
    docs: DataFrame, chunks_per_page: int = CHUNKS_PER_PAGE
) -> DataFrame:
    """(doc_id, content_type='application/pdf', content binary) rows —
    multi-page variant for the raw-byte split path."""
    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.lit("application/pdf").alias("content_type"),
        F.encode(
            multipage_pdf_col(F.col("doc_id"), F.col("text"), chunks_per_page),
            "UTF-8",
        ).alias("content"),
    )


def synth_pdf_documents(docs: DataFrame) -> DataFrame:
    """(doc_id, content_type='application/pdf', content binary) rows."""
    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.lit("application/pdf").alias("content_type"),
        F.encode(pdf_col(F.col("doc_id"), F.col("text")), "UTF-8").alias("content"),
    )


# ---------------------------------------------------------------------------
# Oracle: predicted spans of pdf_to_spans(pdf_col(...)), over the spanize
# CTE (which carries the chunk hash h and chunk text).
# ---------------------------------------------------------------------------

_KIND_CASE = (
    "CASE substr(h, 1, 1) "
    + " ".join(f"WHEN '{c}' THEN '{k}'" for c, (_, _, k) in PDF_KINDS.items())
    + " WHEN 'f' THEN 'figure' ELSE 'Text' END"
)
_FRAGLEN_CASE = (
    "CASE substr(h, 1, 1) "
    + " ".join(
        f"WHEN '{c}' THEN {27 + len(s) + len(y)} + length(text)"
        for c, (s, y, _) in PDF_KINDS.items()
    )
    + " WHEN 'f' THEN 39 "
    + f"ELSE {27 + len(DEFAULT_SIZE_Y[0]) + len(DEFAULT_SIZE_Y[1])} + length(text) END"
)

PDF_PARSE_SQL = f"""
plen AS (
    SELECT doc_id, ord, h, text,
           {_KIND_CASE} AS kind,
           {_FRAGLEN_CASE} AS frag_len
    FROM spanize
)
SELECT doc_id,
       CAST(ord AS INT) AS ord,
       kind,
       CASE WHEN kind = 'figure' THEN NULL ELSE text END AS text,
       CASE WHEN kind = 'figure' THEN 'media://' || h END AS media_ref,
       CAST(coalesce(sum(frag_len) OVER (
           PARTITION BY doc_id ORDER BY ord
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
       ), 0) AS INT) AS "offset"
FROM plen
"""
