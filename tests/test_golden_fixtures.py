"""Reference golden fixtures through the real engine chain.

Loads the reference's actual Azure Document Intelligence outputs
(tests/data/sample-one-page.json, sample-sixteen-page.json — the same
files its tests/conftest.py:70-80 pins) via spark.read.json into the
layout IR, runs merge → tag → assemble (O3–O14), and asserts parity
against the pure-Python spec oracle plus the fixtures' known facts:
the 16-page role histogram, 2 tables / 1 table, page dimensions.
"""

from __future__ import annotations

import copy
import json
import os
from collections import Counter

import pytest
from pyspark.sql import functions as F

from azure_pdf_parser_spark import model

GOLDEN_DIR = "/root/reference/tests/data"
FIXTURES = ("sample-one-page", "sample-sixteen-page")

_PARA_FIELDS = ("role", "content", "bounding_regions", "spans")
_CELL_FIELDS = ("kind", "row_index", "column_index", "row_span", "column_span",
                "content", "bounding_regions", "spans")
_TABLE_FIELDS = ("row_count", "column_count", "cells", "bounding_regions", "spans")
_PAGE_FIELDS = ("page_number", "width", "height")


def _trim(d: dict, fields) -> dict:
    return {k: d.get(k) for k in fields}


def _load_python_rows() -> list[dict]:
    """The same fixtures as plain dicts in LAYOUT_BATCH shape (the
    oracle-side load)."""
    rows = []
    for name in FIXTURES:
        with open(os.path.join(GOLDEN_DIR, f"{name}.json")) as f:
            result = json.load(f)[0]
        paragraphs = [
            {**_trim(p, _PARA_FIELDS),
             "bounding_regions": [
                 {"page_number": r["page_number"], "polygon": r["polygon"]}
                 for r in (p.get("bounding_regions") or [])
             ] or None}
            for p in result["paragraphs"]
        ]
        tables = [
            {**_trim(t, _TABLE_FIELDS),
             "cells": [
                 {**_trim(c, _CELL_FIELDS),
                  "bounding_regions": [
                      {"page_number": r["page_number"], "polygon": r["polygon"]}
                      for r in (c.get("bounding_regions") or [])
                  ] or None}
                 for c in t["cells"]
             ],
             "bounding_regions": [
                 {"page_number": r["page_number"], "polygon": r["polygon"]}
                 for r in (t.get("bounding_regions") or [])
             ] or None}
            for t in result["tables"]
        ]
        pages = [_trim(p, _PAGE_FIELDS) for p in result["pages"]]
        rows.append(
            {
                "doc_id": name,
                "batch_number": 0,
                "page_range": {"first": 1, "last": len(pages)},
                "api_version": result["api_version"],
                "model_id": result["model_id"],
                "paragraphs": paragraphs,
                "tables": tables,
                "pages": pages,
            }
        )
    return rows


def _meta(doc_id: str) -> tuple[str, str]:
    return f"{doc_id}.pdf", model.calculate_md5_sum(doc_id.encode())


@pytest.fixture(scope="module")
def golden_engine(spark):
    from azure_pdf_parser_spark.operators.batching import merge_batches
    from azure_pdf_parser_spark.operators.layout import assemble
    from azure_pdf_parser_spark.sources.golden import read_analyze_results

    paths = [os.path.join(GOLDEN_DIR, f"{n}.json") for n in FIXTURES]
    batches = read_analyze_results(spark, paths)
    meta_df = spark.createDataFrame(
        [(n, *_meta(n)) for n in FIXTURES],
        "doc_id string, cdn_object string, md5_sum string",
    )
    assembled = assemble(
        merge_batches(batches).join(F.broadcast(meta_df), "doc_id"),
        experimental_extract_tables=True,
        cdn_object_col="cdn_object",
        md5_sum_col="md5_sum",
    )
    return {r["doc_id"]: r.asDict(recursive=True) for r in assembled.collect()}


@pytest.fixture(scope="module")
def golden_expected():
    expected = {}
    for row in _load_python_rows():
        r = copy.deepcopy(row)
        r["page_range"] = (1, r["page_range"]["last"])
        merged = model.merge_responses([r])
        cdn, md5 = _meta(r["doc_id"])
        out = model.azure_api_response_to_parser_output(
            r["doc_id"], cdn, md5, merged, experimental_extract_tables=True
        )
        expected[r["doc_id"]] = out
    return expected


def test_both_fixtures_load_and_assemble_ok(golden_engine):
    assert set(golden_engine) == set(FIXTURES)
    for doc in golden_engine.values():
        assert doc["status"] == "ok", doc["error"]


def test_text_blocks_match_spec_oracle(golden_engine, golden_expected):
    for name in FIXTURES:
        got = golden_engine[name]["text_blocks"]
        want = golden_expected[name]["text_blocks"]
        assert len(got) == len(want), name
        for gb, eb in zip(got, want):
            assert gb["text_block_id"] == eb["text_block_id"], name
            assert gb["type"] == eb["type"], (name, gb["text_block_id"])
            assert gb["text"] == eb["text"][0], (name, gb["text_block_id"])
            assert gb["page_number"] == eb["page_number"], name
            assert gb["language"] == eb["language"], (name, gb["text_block_id"])
            got_coords = [(c["x"], c["y"]) for c in gb["coords"]]
            assert got_coords == pytest.approx(eb["coords"]), name


def test_sixteen_page_role_histogram(golden_engine):
    """The fixture's known role histogram (230 paragraphs: 212 null →
    'Text', 5 pageFooter, 5 pageNumber, 5 title, 2 pageHeader,
    1 sectionHeading) must survive the chain; blocks whose paragraph has
    no bounding_regions are dropped (convert.py:90-96), so compare
    against the region-bearing subset computed from the raw JSON."""
    with open(os.path.join(GOLDEN_DIR, "sample-sixteen-page.json")) as f:
        result = json.load(f)[0]
    paras = result["paragraphs"]
    # the raw fixture fact (reference tests/conftest.py:70-80)
    assert len(paras) == 230
    assert Counter(p["role"] for p in paras) == Counter(
        {None: 212, "pageFooter": 5, "pageNumber": 5, "title": 5,
         "pageHeader": 2, "sectionHeading": 1}
    )
    # post-tagging: paragraphs mirroring table cells re-tag TableCell
    # (convert.py:220-236) — predict with the spec oracle's harvest
    tagged = model.tag_table_paragraphs(copy.deepcopy(result))
    want = Counter(
        (p["role"] or "Text")
        for p in tagged["paragraphs"]
        if p.get("bounding_regions")
    )
    got = Counter(b["type"] for b in golden_engine["sample-sixteen-page"]["text_blocks"])
    assert got == want
    assert got["TableCell"] == 34  # the 16-page table's mirrored paragraphs


def test_table_blocks_counts(golden_engine, golden_expected):
    assert len(golden_engine["sample-one-page"]["table_blocks"]) == 2
    assert len(golden_engine["sample-sixteen-page"]["table_blocks"]) == 1
    for name in FIXTURES:
        got = golden_engine[name]["table_blocks"]
        want = golden_expected[name]["table_blocks"]
        for g, w in zip(got, want):
            assert g["table_id"] == w["table_id"]
            assert g["row_count"] == w["row_count"]
            assert g["column_count"] == w["column_count"]
            assert [c["content"] for c in g["cells"]] == [
                c["content"] for c in w["cells"]
            ]
            assert [c["cell_type"] for c in g["cells"]] == [
                c["cell_type"] for c in w["cells"]
            ]


def test_page_metadata_real_dimensions(golden_engine, golden_expected):
    """8.5×11in pages scale ×72 → 612×792 px (reference base.py:4)."""
    for name in FIXTURES:
        got = [
            (m["page_number"], m["width"], m["height"])
            for m in golden_engine[name]["page_metadata"]
        ]
        want = [
            (m["page_number"], m["width"], m["height"])
            for m in golden_expected[name]["page_metadata"]
        ]
        assert got == pytest.approx(want), name
    assert golden_engine["sample-one-page"]["page_metadata"][0]["width"] == 612.0
    assert golden_engine["sample-one-page"]["page_metadata"][0]["height"] == 792.0
    assert len(golden_engine["sample-sixteen-page"]["page_metadata"]) == 16


def test_languages_and_md5(golden_engine, golden_expected):
    for name in FIXTURES:
        assert golden_engine[name]["languages"] == golden_expected[name]["languages"]
        assert (
            golden_engine[name]["document_md5_sum"]
            == golden_expected[name]["document_md5_sum"]
        )
