"""K1 JSON export sink: round-trip parity with the parquet output.

Reference analog: run.py:88 writes one ``{import_id}.json`` ParserOutput
per doc; the engine exports line-delimited JSON with identical per-row
payloads (see sinks/json_export.py for the scale rationale).
"""

import tempfile

import pytest

from tests.conftest import SF_DIR


def test_json_export_round_trip(spark):
    from azure_pdf_parser_spark.operators.extract_spans import extract
    from azure_pdf_parser_spark.sinks.json_export import (
        export_json,
        read_json_export,
    )
    from azure_pdf_parser_spark.sources.spanize import derive_spans
    from azure_pdf_parser_spark.sources.tables import load_table

    out = extract(derive_spans(load_table(spark, SF_DIR, "documents")))
    with tempfile.TemporaryDirectory() as tmp:
        export_json(out, f"{tmp}/export", mode="overwrite")
        back = read_json_export(spark, f"{tmp}/export", out.schema)

        # schema re-validates exactly (declared read schema + FAILFAST);
        # JSON read flattens nullability flags, so compare names + types
        assert back.schema.simpleString() == out.schema.simpleString()
        assert back.count() == out.count()
        # value parity: every row round-trips byte-identically, including
        # the nested spans array and explicit nulls
        a = out.select("doc_id", "document_md5_sum", "language", "span_count",
                       "spans")
        b = back.select("doc_id", "document_md5_sum", "language", "span_count",
                        "spans")
        assert a.exceptAll(b).count() == 0
        assert b.exceptAll(a).count() == 0


def test_json_export_single_doc_payload(spark):
    """One exported line is one complete self-describing ParserOutput
    object — the reference's per-doc payload contract."""
    import glob
    import gzip
    import json

    from azure_pdf_parser_spark.operators.extract_spans import extract
    from azure_pdf_parser_spark.sinks.json_export import export_json
    from azure_pdf_parser_spark.sources.spanize import derive_spans
    from azure_pdf_parser_spark.sources.tables import load_table

    docs = derive_spans(load_table(spark, SF_DIR, "documents")).limit(1)
    out = extract(docs)
    [expected] = out.collect()
    with tempfile.TemporaryDirectory() as tmp:
        export_json(out.coalesce(1), f"{tmp}/one", mode="overwrite")
        [f] = glob.glob(f"{tmp}/one/part-*.json.gz")
        lines = gzip.open(f, "rt").read().splitlines()
        assert len(lines) == 1
        payload = json.loads(lines[0])
        assert payload["doc_id"] == expected["doc_id"]
        assert payload["document_md5_sum"] == expected["document_md5_sum"]
        assert payload["span_count"] == expected["span_count"]
        assert payload["status"] == "ok" and payload["translated"] is False
        # explicit null fields survive (ignoreNullFields=false)
        assert all("kind" in s and "media_ref" in s for s in payload["spans"])


def test_json_export_failfast_on_corrupt_line(spark):
    import gzip
    import os

    from azure_pdf_parser_spark.sinks.json_export import read_json_export
    from azure_pdf_parser_spark.schemas import PARSER_OUTPUT

    with tempfile.TemporaryDirectory() as tmp:
        os.makedirs(f"{tmp}/bad")
        with gzip.open(f"{tmp}/bad/part-00000.json.gz", "wt") as f:
            f.write('{"doc_id": "a", "status": "ok"}\n')
            f.write("this is not json\n")
        with pytest.raises(Exception):
            read_json_export(spark, f"{tmp}/bad", PARSER_OUTPUT).collect()


def test_raw_ir_sink_replays_identically(spark):
    """K2: the persisted LAYOUT_BATCH IR must replay through
    merge->assemble to the byte-identical ParserOutput the live chain
    produces (reference analog: save_raw_azure_response, run.py:97)."""
    from azure_pdf_parser_spark.operators.batching import merge_batches
    from azure_pdf_parser_spark.operators.layout import assemble
    from azure_pdf_parser_spark.sinks.raw_ir import replay, write_raw_ir
    from azure_pdf_parser_spark.sources.layoutize import derive_layout_batches
    from azure_pdf_parser_spark.sources.tables import load_table

    batches = derive_layout_batches(load_table(spark, SF_DIR, "documents"))
    live = assemble(merge_batches(batches))

    with tempfile.TemporaryDirectory() as tmp:
        write_raw_ir(batches, f"{tmp}/ir", mode="overwrite")
        replayed = replay(spark, f"{tmp}/ir")
        assert replayed.schema.simpleString() == live.schema.simpleString()
        # full-row equality including nested text_blocks/page_metadata
        assert replayed.exceptAll(live).count() == 0
        assert live.exceptAll(replayed).count() == 0


def test_jsonl_documents_ingest_row_identical(spark):
    """S1 JSONL ingest parity at row granularity (the gate's aggregate
    form is jsonl_documents_roundtrip): every documents row survives
    the gzip-JSONL write→schema'd read cycle byte-identically —
    unicode text, lang/source strings, int64s."""
    from azure_pdf_parser_spark.sinks.json_export import (
        export_json,
        read_json_export,
    )
    from azure_pdf_parser_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    with tempfile.TemporaryDirectory() as tmp:
        export_json(docs, f"{tmp}/docs", mode="overwrite")
        back = read_json_export(spark, f"{tmp}/docs", docs.schema)
        cols = sorted(docs.columns)
        orig = sorted(tuple(r) for r in docs.select(*cols).collect())
        rt = sorted(tuple(r) for r in back.select(*cols).collect())
        assert len(orig) == len(rt) and orig == rt


def test_jsonl_roundtrip_gate_matches_oracle(spark):
    from tests.oracle_utils import compare_query

    compare_query(spark, SF_DIR, "jsonl_documents_roundtrip")
