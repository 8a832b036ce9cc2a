"""Randomized model-based tests for the interleave operator family.

A pure-Python reference implementation (third engine, independent of
both the Spark fold/slice formulation and the DuckDB window/recursive-
CTE oracles) evaluated over seeded random corpora that include the
edge shapes the fixtures pin: empty arrays, all-boilerplate docs,
media-first/last, adjacent media, NULL kind (defaults to 'Text'),
empty-string text.
"""

from __future__ import annotations

import random

from azure_pdf_parser_spark.operators.interleave import (
    MEDIA_TOKEN_COST,
    PACK_TOKEN_BUDGET,
    interleave_segments,
    interleave_stats,
    media_caption_pairs,
    multimodal_pack,
)
from azure_pdf_parser_spark.sources.spanize import (
    BOILERPLATE_KINDS,
    SPAN_ARRAY_TYPE,
)

KINDS = [
    "Text", "Text", "Text", None, "title", "sectionHeading", "footnote",
    "TableCell", "pageHeader", "pageFooter", "pageNumber", "figure",
]
WORDS = ["alpha", "beta", "gamma", "delta", "x", ""]


def _random_corpus(seed: int, n_docs: int = 120):
    rng = random.Random(seed)
    docs = {}
    for d in range(n_docs):
        n = rng.choice([0, 1, 2, 3, 5, 8, 13, 21])
        spans = []
        for i in range(n):
            kind = rng.choice(KINDS)
            if kind == "figure":
                spans.append((kind, None, f"media://{d}-{i}", i))
            elif rng.random() < 0.07:
                # contract-violating but schema-legal: non-media span
                # with NULL text (must not poison the packing fold)
                spans.append((kind, None, None, i))
            else:
                text = " ".join(
                    rng.choice(WORDS) for _ in range(rng.randint(1, 4))
                )
                spans.append((kind, text, None, i))
        docs[f"doc{d}"] = spans
    return docs


def _df(spark, docs):
    rows = [
        (doc_id, [{"kind": k, "text": t, "media_ref": m, "offset": o}
                  for (k, t, m, o) in spans])
        for doc_id, spans in docs.items()
    ]
    return spark.createDataFrame(rows, f"doc_id string, spans {SPAN_ARRAY_TYPE}")


def _is_media(kind):
    return kind == "figure"


def _is_candidate(kind, text):
    return text is not None and (kind or "Text") not in BOILERPLATE_KINDS


# -- pure-Python references -------------------------------------------------

def _ref_captions(docs):
    out = set()
    for doc_id, spans in docs.items():
        for i, (k, t, m, o) in enumerate(spans):
            if not _is_media(k):
                continue
            before = next(
                (s[1] for s in reversed(spans[:i]) if _is_candidate(s[0], s[1])),
                None,
            )
            after = next(
                (s[1] for s in spans[i + 1:] if _is_candidate(s[0], s[1])),
                None,
            )
            out.add((doc_id, i, m, before, after))
    return out


def _ref_stats(docs):
    out = set()
    for doc_id, spans in docs.items():
        if not spans:
            continue
        n = len(spans)
        media = [_is_media(k) for k, *_ in spans]
        n_media = sum(media)
        n_text = sum(1 for _, t, *_ in spans if t is not None)
        trans = sum(1 for a, b in zip(media, media[1:]) if a != b)
        best = cur = 0
        for m in media:
            cur = 0 if m else cur + 1
            best = max(best, cur)
        out.add((doc_id, n, n_media, n_text, trans, best,
                 int(1000.0 * n_media / n // 1)))
    return out


def _ref_segments(docs):
    out = set()
    for doc_id, spans in docs.items():
        media = [(i, s) for i, s in enumerate(spans) if _is_media(s[0])]
        n_media = len(media)
        if not spans:
            continue
        mb = []
        c = 0
        for k, *_ in spans:
            mb.append(c)
            c += _is_media(k)
        for seg in range(n_media + 1):
            texts = [
                t for (k, t, m, o), b in zip(spans, mb)
                if _is_candidate(k, t) and b == seg
            ]
            seg_text = " ".join(texts) if texts else None
            nxt = next((s[1][2] for s in media if mb[s[0]] == seg), None)
            if seg_text is None and nxt is None:
                continue
            out.add((doc_id, seg, seg_text, nxt))
    return out


def _ref_pack(docs, budget=PACK_TOKEN_BUDGET, media_cost=MEDIA_TOKEN_COST):
    out = set()
    for doc_id, spans in docs.items():
        acc, seq = 0, -1
        for i, (k, t, m, o) in enumerate(spans):
            if (k or "Text") in BOILERPLATE_KINDS:
                continue
            cost = media_cost if _is_media(k) else len((t or "").split(" "))
            if acc == 0 or acc + cost > budget:
                seq += 1
                acc = cost
            else:
                acc += cost
            out.add((doc_id, i, k, cost, seq))
    return out


# -- the model tests --------------------------------------------------------

def test_captions_match_python_reference(spark):
    docs = _random_corpus(seed=7)
    got = {
        (r["doc_id"], r["ord"], r["media_ref"],
         r["caption_before"], r["caption_after"])
        for r in media_caption_pairs(_df(spark, docs)).collect()
    }
    assert got == _ref_captions(docs)


def test_stats_match_python_reference(spark):
    docs = _random_corpus(seed=11)
    got = {
        tuple(r[c] for c in ("doc_id", "n_spans", "n_media", "n_text",
                             "n_transitions", "max_text_run",
                             "media_permille"))
        for r in interleave_stats(_df(spark, docs)).collect()
    }
    assert got == _ref_stats(docs)


def test_segments_match_python_reference(spark):
    docs = _random_corpus(seed=13)
    got = {
        (r["doc_id"], r["segment_id"], r["segment_text"],
         r["next_media_ref"])
        for r in interleave_segments(_df(spark, docs)).collect()
    }
    assert got == _ref_segments(docs)


def test_pack_matches_python_reference_and_invariants(spark):
    docs = _random_corpus(seed=17)
    rows = multimodal_pack(_df(spark, docs)).collect()
    got = {
        (r["doc_id"], r["ord"], r["kind"], r["cost"], r["seq_id"])
        for r in rows
    }
    assert got == _ref_pack(docs)
    # packing invariant: a sequence's total cost only exceeds the
    # budget when it holds a single oversized span
    totals: dict = {}
    for r in rows:
        key = (r["doc_id"], r["seq_id"])
        totals.setdefault(key, []).append(r["cost"])
    for costs in totals.values():
        assert sum(costs) <= PACK_TOKEN_BUDGET or len(costs) == 1


def test_segment_texts_reassemble_candidate_stream(spark):
    """Concatenating segment texts in order reproduces exactly the
    doc's caption-candidate text stream — segmentation loses nothing
    and invents nothing."""
    docs = _random_corpus(seed=23)
    segs: dict = {}
    for r in interleave_segments(_df(spark, docs)).collect():
        segs.setdefault(r["doc_id"], []).append(
            (r["segment_id"], r["segment_text"])
        )
    for doc_id, spans in docs.items():
        expected = " ".join(
            t for k, t, m, o in spans if _is_candidate(k, t)
        )
        got = " ".join(
            t for _, t in sorted(segs.get(doc_id, [])) if t is not None
        )
        assert got == expected, doc_id
