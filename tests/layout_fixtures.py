"""Deterministic layout-IR fixtures (FIXTURES.md §2 shapes).

Builds LAYOUT_BATCH-shaped dicts with every invariant and negative case
the reference's assumption tests pin (tests/test_convert.py:240-298,
tests/conftest.py:316-349): cell spans mirror paragraph spans with
identical content/page/polygon, spans unique, one region per
paragraph/cell — plus injected edge docs: null bounding_regions,
empty/None cell spans, page with null dims, paragraphs=None batch,
page_number=0 quirk, null paragraph element, ≠4-point polygon,
missing/non-pdf cdn_object.
"""

from __future__ import annotations

import copy
import random

from azure_pdf_parser_spark import model

WORDS = (
    "the fast key order sort table scan merge part window small hash join "
    "der und die le et el los data stream batch value"
).split()

VOCAB_ROLES = [None, None, None, None, "title", "sectionHeading", "pageHeader",
               "pageFooter", "pageNumber", "footnote"]


def _polygon(rng: random.Random) -> list[dict]:
    x0, y0 = round(rng.uniform(0, 7), 3), round(rng.uniform(0, 10), 3)
    w, h = round(rng.uniform(0.5, 2), 3), round(rng.uniform(0.1, 0.5), 3)
    return [
        {"x": x0, "y": y0},
        {"x": x0 + w, "y": y0},
        {"x": x0 + w, "y": y0 + h},
        {"x": x0, "y": y0 + h},
    ]


def make_corpus(n_docs: int = 24, seed: int = 7):
    """Returns (batch_rows, doc_meta) — batch_rows shuffled across docs
    and batch numbers so the engine must restore order explicitly."""
    rng = random.Random(seed)
    batch_rows: list[dict] = []
    doc_meta: dict[str, dict] = {}

    for d in range(n_docs):
        doc_id = f"doc{d:03d}"
        n_pages = rng.randint(1, 8)
        batch_size = 3
        plans = model.plan_batches(n_pages, batch_size)
        offset_counter = 0
        cdn = f"{doc_id}.pdf"
        if d == 20:
            cdn = None
        elif d == 21:
            cdn = f"{doc_id}.docx"
        doc_meta[doc_id] = {"cdn_object": cdn, "md5_sum": model.calculate_md5_sum(doc_id.encode())}

        for plan in plans:
            first, last = plan["page_range"]
            local_pages = last - first + 1
            paragraphs: list | None = []
            tables = []
            pages = []
            for lp in range(1, local_pages + 1):
                width, height = 8.5, 11.0
                if d == 12 and lp == 1:
                    width = None  # dropped from page metadata (O10)
                page_number = lp
                if d == 13 and lp == 1 and plan["batch_number"] == 0:
                    page_number = 0  # truthiness quirk (O3)
                pages.append({"page_number": page_number, "width": width, "height": height})
                for _ in range(rng.randint(0, 4)):
                    content = " ".join(rng.choices(WORDS, k=rng.randint(3, 10)))
                    para = {
                        "role": rng.choice(VOCAB_ROLES),
                        "content": content,
                        "bounding_regions": [
                            {"page_number": lp, "polygon": _polygon(rng)}
                        ],
                        "spans": [{"offset": offset_counter, "length": len(content)}],
                    }
                    offset_counter += len(content) + 1
                    paragraphs.append(para)

            # negative cases
            if d == 10 and plan["batch_number"] == 0 and paragraphs:
                paragraphs[0] = {**paragraphs[0], "bounding_regions": None}
            if d == 11 and plan["batch_number"] == 0:
                paragraphs.append(None)  # null paragraph element
            if d == 14 and plan["batch_number"] == 0:
                paragraphs = None  # whole array null (tag no-op path)
            if d == 15 and plan["batch_number"] == 0 and paragraphs:
                # ≠4-point polygon → reference raises; engine quarantines
                bad = copy.deepcopy(paragraphs[0])
                bad["bounding_regions"][0]["polygon"] = bad["bounding_regions"][0]["polygon"][:3]
                paragraphs[0] = bad

            # tables: ~1 in 3 docs get one table in batch 0 whose cells
            # mirror a subset of this batch's paragraphs (span identity)
            if d % 3 == 0 and plan["batch_number"] == 0 and paragraphs:
                candidates = [p for p in paragraphs if p and p.get("spans")]
                n_cells = min(len(candidates), 4)
                cells = []
                for ci, p in enumerate(candidates[:n_cells]):
                    cells.append(
                        {
                            "kind": "columnHeader" if ci == 0 else "content",
                            "row_index": ci // 2,
                            "column_index": ci % 2,
                            "row_span": 1,
                            "column_span": 1,
                            "content": p["content"],
                            "bounding_regions": copy.deepcopy(p["bounding_regions"]),
                            "spans": copy.deepcopy(p["spans"]),
                        }
                    )
                if d == 9 and cells:
                    cells[0] = {**cells[0], "spans": []}     # tags nothing
                    if len(cells) > 1:
                        cells[1] = {**cells[1], "spans": None}  # tags nothing
                if cells:
                    tables.append(
                        {
                            "row_count": (n_cells + 1) // 2,
                            "column_count": 2,
                            "cells": cells,
                            "bounding_regions": copy.deepcopy(
                                cells[0]["bounding_regions"]
                            ),
                            "spans": copy.deepcopy(cells[0]["spans"]) or None,
                        }
                    )

            batch_rows.append(
                {
                    "doc_id": doc_id,
                    "batch_number": plan["batch_number"],
                    "page_range": {"first": first, "last": last},
                    "api_version": "2023-07-31",
                    "model_id": "prebuilt-document",
                    "paragraphs": paragraphs,
                    "tables": tables,
                    "pages": pages,
                }
            )

    rng.shuffle(batch_rows)  # engine must not rely on input order
    return batch_rows, doc_meta


def model_expected(batch_rows, doc_meta):
    """Run the pure-Python oracle per doc: ordered merge → assembly."""
    by_doc: dict[str, list] = {}
    for row in copy.deepcopy(batch_rows):
        r = dict(row)
        r["page_range"] = (r["page_range"]["first"], r["page_range"]["last"])
        by_doc.setdefault(r["doc_id"], []).append(r)

    expected = {}
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r["batch_number"])
        merged = model.merge_responses(rows)
        meta = doc_meta[doc_id]
        try:
            out = model.azure_api_response_to_parser_output(
                doc_id,
                meta["cdn_object"],
                meta["md5_sum"],
                merged,
                experimental_extract_tables=True,
            )
            out["status"], out["error"] = "ok", None
        except ValueError as e:
            out = {"status": "failed", "error": str(e)}
        expected[doc_id] = out
    return expected
