"""O2 analog: the in-cluster parse stage (raw bytes → interleaved spans).

The reference ships PDF bytes to Azure Document Intelligence
(reference azure_wrapper.py:46-61) and treats the response as a black
box; the engine computes in-cluster instead: a ``mapInPandas`` stage
takes Arrow batches of (doc_id, content_type, content) and emits the
input_hint span rows. Per-document failures never kill the task —
they surface as status='failed' rows (reference skip-on-error
semantics, run.py:27-39).

* HTML: the dependency-free DOM parser in functions/html.py — real and
  fully tested (gate query: html_parse).
* PDF: the dependency-free mini extractor in functions/pdf.py —
  uncompressed + FlateDecode content streams, text-state machine, image
  XObject media spans (gate query: pdf_parse). Exotic stream filters
  (DCT, LZW, …) quarantine with NotImplementedError; ``FAKE_PDF_PARSER``
  remains the test seam for injecting synthetic layout results.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Callable, Optional

import pandas as pd

from pyspark.sql import DataFrame

PARSED_SCHEMA = (
    "doc_id string, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, "
    "status string, error string, attempts int"
)

# Reference parity (O16): the reference pins exactly 3 attempts per
# Azure call (reference azure_wrapper.py retry wrapper, pinned by its
# tests/test_azure_wrapper.py:34-55). In-cluster the retry guards
# transient faults (object-store reads, OOM-killed codec subprocesses);
# a deterministic parse error fails identically all 3 times and then
# quarantines — same observable semantics as the reference's
# retry-then-skip.
MAX_ATTEMPTS = 3

# test seam: set to a callable bytes -> list[span dict] to fake PDF decode
FAKE_PDF_PARSER: Optional[Callable[[bytes], list[dict]]] = None


def _parse_pdf_bytes(content: bytes, fake_parser=None) -> list[dict]:
    if fake_parser is not None:
        return fake_parser(content)
    # dependency-free mini PDF extractor (functions/pdf.py): uncompressed
    # and FlateDecode content streams, Tf/Td/Tm/Tj/TJ text state, ImX Do
    # media spans, size/position kind classification. Unsupported stream
    # filters raise NotImplementedError → per-doc quarantine.
    from azure_pdf_parser_spark.functions.pdf import pdf_to_spans

    return pdf_to_spans(content)


def parse_documents(
    raw: DataFrame,
    passthrough: tuple[str, ...] = (),
    max_attempts: int = MAX_ATTEMPTS,
) -> DataFrame:
    """(doc_id, content_type, content binary) →
    (doc_id, spans, status, error, attempts).

    Vectorized: one Python invocation per Arrow batch, not per row; all
    decode errors are caught per document and retried up to
    ``max_attempts`` times (reference O16 semantics: 3 attempts, then
    skip-and-continue). ``attempts`` records how many tries the doc
    took — lineage for spotting flaky inputs at scale. ``passthrough``
    names extra input columns carried verbatim into the output (e.g.
    batch_number for the page-split chain) — their Arrow types are
    taken from the input schema.
    """

    # captured at plan-build time so cloudpickle ships the test fake to
    # executor workers (a module global would not survive re-import there)
    fake_parser = FAKE_PDF_PARSER

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from azure_pdf_parser_spark.functions.html import html_to_spans

        def parse_one(ctype, content):
            if ctype == "text/html":
                return html_to_spans(
                    bytes(content).decode("utf-8", errors="replace")
                )
            if ctype == "application/pdf":
                return _parse_pdf_bytes(bytes(content), fake_parser)
            raise ValueError(f"unsupported content type: {ctype}")

        for pdf_batch in batches:
            out = []
            extra_cols = [pdf_batch[c] for c in passthrough]
            for doc_id, ctype, content, *extras in zip(
                pdf_batch["doc_id"],
                pdf_batch["content_type"],
                pdf_batch["content"],
                *extra_cols,
            ):
                for attempt in range(1, max_attempts + 1):
                    try:
                        spans = parse_one(ctype, content)
                        out.append((doc_id, *extras, spans, "ok", None, attempt))
                        break
                    except Exception as e:
                        if attempt == max_attempts:
                            # per-doc quarantine, task survives
                            out.append(
                                (doc_id, *extras, None, "failed",
                                 f"{type(e).__name__}: {e}", attempt)
                            )
            yield pd.DataFrame(
                out,
                columns=["doc_id", *passthrough, "spans", "status", "error",
                         "attempts"],
            )

    in_types = dict(raw.dtypes)
    extra_schema = "".join(f"{c} {in_types[c]}, " for c in passthrough)
    schema = PARSED_SCHEMA.replace("doc_id string, ", f"doc_id string, {extra_schema}")
    return raw.mapInPandas(run, schema=schema)
