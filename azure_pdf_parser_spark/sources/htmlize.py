"""Deterministic text → HTML synthesis ("htmlize").

Gate-checks the real DOM parser (functions/html.py, run through the
mapInPandas parse stage of operators/parse.py) against the DuckDB
oracle: each document's text is chunked exactly like spanize (8-word
runs, ``h = md5(doc_id || ':' || i)``), and chunk i is wrapped in a tag
chosen by the first hex char of ``h``:

    'a' → <h1>        (parser must classify: title)
    'b' → <h2>        (sectionHeading)
    'c' → <nav>       (pageHeader — DOM-path boilerplate)
    'd' → <footer>    (pageFooter)
    'e' → <td>        (TableCell)
    'f' → <img src="media://h">   (figure media span, no text)
    else <p>          (Text)

The fragments are concatenated with no separators, so the parser's
byte offsets are exactly predictable: a text span's offset is the
cumulative length of all prior fragments plus its opening tag length;
an img span's offset is the fragment start (the parser records the tag
start). The oracle computes this with a running-sum window — any
divergence in the tokenizer, the stack-based kind classification, the
boilerplate path rules, or offset accounting mismatches the gate.

The synthesis itself is pure JVM column work (concat/transform), so the
only Python in the query is the parser under test.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from azure_pdf_parser_spark.sources.spanize import WORDS_PER_SPAN

_TAG_BY_HEX = {"a": "h1", "b": "h2", "c": "nav", "d": "footer", "e": "td"}
_KIND_BY_TAG = {
    "h1": "title",
    "h2": "sectionHeading",
    "nav": "pageHeader",
    "footer": "pageFooter",
    "td": "TableCell",
    "p": "Text",
}


def html_col(doc_id: Column, text: Column) -> Column:
    """One HTML document string derived from (doc_id, text)."""
    words = F.split(text, " ")
    n_chunks = F.ceil(F.size(words) / F.lit(float(WORDS_PER_SPAN))).cast("int")

    def fragment(i: Column) -> Column:
        chunk_text = F.array_join(
            F.slice(words, i * WORDS_PER_SPAN + 1, WORDS_PER_SPAN), " "
        )
        h = F.md5(F.concat(doc_id.cast("string"), F.lit(":"), i.cast("string")))
        c1 = F.substring(h, 1, 1)
        expr = F.concat(F.lit("<p>"), chunk_text, F.lit("</p>"))
        for hexc, tag in _TAG_BY_HEX.items():
            expr = F.when(
                c1 == hexc,
                F.concat(F.lit(f"<{tag}>"), chunk_text, F.lit(f"</{tag}>")),
            ).otherwise(expr)
        return F.when(
            c1 == "f", F.concat(F.lit('<img src="media://'), h, F.lit('">'))
        ).otherwise(expr)

    return F.array_join(
        F.transform(F.sequence(F.lit(0), n_chunks - 1), fragment), ""
    )


def synth_html_documents(docs: DataFrame) -> DataFrame:
    """(doc_id, content_type='text/html', content binary) raw rows."""
    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.lit("text/html").alias("content_type"),
        F.encode(html_col(F.col("doc_id"), F.col("text")), "UTF-8").alias("content"),
    )


# ---------------------------------------------------------------------------
# Oracle: predicted spans of html_to_spans(html_col(...)). Appends to the
# spanize CTE (which carries the chunk hash h and chunk text).
# ---------------------------------------------------------------------------

_TAG_CASE = (
    "CASE substr(h, 1, 1) "
    + " ".join(f"WHEN '{c}' THEN '{t}'" for c, t in _TAG_BY_HEX.items())
    + " WHEN 'f' THEN 'img' ELSE 'p' END"
)
_KIND_CASE = (
    "CASE tag "
    + " ".join(f"WHEN '{t}' THEN '{k}'" for t, k in _KIND_BY_TAG.items())
    + " END"
)

HTML_PARSE_SQL_CTES = f"""
hfrag AS (
    SELECT doc_id, ord, h, text, {_TAG_CASE} AS tag
    FROM spanize
),
hlen AS (
    SELECT doc_id, ord, h, text, tag,
           CASE WHEN tag = 'img' THEN 52
                ELSE 2 * length(tag) + 5 + length(text) END AS frag_len,
           CASE WHEN tag = 'img' THEN 0 ELSE length(tag) + 2 END AS open_len
    FROM hfrag
),
hoff AS (
    SELECT doc_id, ord, h, text, tag, open_len,
           coalesce(sum(frag_len) OVER (
               PARTITION BY doc_id ORDER BY ord
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS frag_start
    FROM hlen
)
"""

HTML_PARSE_SQL_SELECT = f"""
SELECT doc_id,
       CAST(ord AS INT) AS ord,
       {_KIND_CASE.replace("CASE tag", "CASE tag WHEN 'img' THEN 'figure'")} AS kind,
       CASE WHEN tag = 'img' THEN NULL ELSE text END AS text,
       CASE WHEN tag = 'img' THEN 'media://' || h END AS media_ref,
       CAST(frag_start + open_len AS INT) AS "offset"
FROM hoff
"""
