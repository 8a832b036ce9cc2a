"""Overlapping-window chunking properties (gate parity is covered by
tests/test_queries_vs_oracle.py::test_query_matches_oracle[chunk_documents])."""

from __future__ import annotations

from pyspark.sql import functions as F

from azure_pdf_parser_spark.operators.chunking import (
    CHUNK_STRIDE,
    CHUNK_WINDOW,
    chunk_documents,
)


def _py_chunks(tokens: list[str], w: int, t: int):
    """Python reference: (chunk_idx, start, chunk_tokens)."""
    n = len(tokens)
    n_chunks = 1 if n <= w else -(-(n - w) // t) + 1
    out = []
    for i in range(n_chunks):
        start = max(0, min(i * t, n - w))
        out.append((i, start, tokens[start : start + w]))
    return out


def _df(spark, texts):
    return spark.createDataFrame(
        [(str(i), t) for i, t in enumerate(texts)], "doc_id: string, text: string"
    )


def test_chunks_match_python_reference(spark):
    """Exact chunk boundaries and text for documents shorter than,
    equal to, and (mis)aligned around the window/stride grid."""
    w, t = CHUNK_WINDOW, CHUNK_STRIDE
    sizes = [0, 1, w - 1, w, w + 1, w + t, w + t + 1, w + 3 * t, 1000]
    texts = [" ".join(f"t{j}" for j in range(n)) for n in sizes]
    got = sorted(
        (r.doc_id, r.chunk_idx, r.start_tok, r.chunk_len, r.chunk_text)
        for r in chunk_documents(_df(spark, texts)).collect()
    )
    want = []
    for i, text in enumerate(texts):
        toks = text.split(" ")  # note: "" splits to [""] like the engine
        for idx, start, chunk in _py_chunks(toks, w, t):
            want.append((str(i), idx, start, len(chunk), " ".join(chunk)))
    assert got == sorted(want)


def test_every_token_is_covered_with_overlap(spark):
    """Union of [start, start+len) must cover [0, n) for every doc,
    and consecutive chunks must overlap by window - stride tokens
    (except the right-aligned final chunk, which may overlap more)."""
    texts = [" ".join(f"w{j}" for j in range(n)) for n in (200, 345, 64, 65)]
    rows = chunk_documents(_df(spark, texts)).collect()
    by_doc: dict[str, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc) == len(texts)
    for doc, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_idx)
        n = chunks[0].doc_tokens
        covered = set()
        for r in chunks:
            covered.update(range(r.start_tok, r.start_tok + r.chunk_len))
        assert covered == set(range(n)), doc
        assert chunks[-1].start_tok + chunks[-1].chunk_len == n, doc
        for a, b in zip(chunks, chunks[1:]):
            overlap = (a.start_tok + a.chunk_len) - b.start_tok
            assert overlap >= CHUNK_WINDOW - CHUNK_STRIDE, (doc, overlap)


def test_null_text_excluded_and_output_sized(spark):
    df = spark.createDataFrame(
        [("a", None), ("b", "x y z")], "doc_id: string, text: string"
    )
    rows = chunk_documents(df).collect()
    assert [r.doc_id for r in rows] == ["b"]
    assert rows[0].chunk_len == 3 and rows[0].chunk_text == "x y z"


def test_chunking_is_map_only(spark):
    """Zero exchanges: the fan-out must ride the corpus partitioning."""
    from tests.conftest import SF_DIR
    from tests.test_physical_plans import _nodes, _plan

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    nodes = _nodes(_plan(chunk_documents(docs)))
    assert "Exchange" not in nodes, nodes
