"""Streaming exact dedup: distinct-within-watermark semantics.

The gate (stream_dedup_exact) pins batch parity with a far-behind
watermark; these tests pin the state-BOUNDING behavior: a duplicate
inside the lookback is suppressed, a duplicate arriving after the
watermark expired its key is re-emitted (bounded memory buys bounded
lookback — the documented trade).
"""

from __future__ import annotations

import os
import tempfile
import time

import pyarrow as pa
import pyarrow.parquet as pq


def _write(path, rows):
    # FLAT_DOCUMENTS shape: (doc_id, text, lang, source, n_chars);
    # doc_id doubles as the synthetic ingest clock (unix seconds)
    table = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["xx"] * len(rows), pa.string()),
            "source": pa.array(["t"] * len(rows), pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(table, path)
    time.sleep(0.05)  # distinct mtimes → deterministic file pickup order


def test_stream_dedup_suppresses_within_and_readmits_after_watermark(spark):
    from azure_pdf_parser_spark.streaming.stream_dedup import start_stream_dedup

    HOUR = 3600
    with tempfile.TemporaryDirectory() as tmp:
        in_dir, out_dir, ckpt = f"{tmp}/in", f"{tmp}/out", f"{tmp}/ckpt"
        os.makedirs(in_dir)
        # t≈0: two distinct texts (above the initial watermark of 0)
        _write(f"{in_dir}/f0.parquet", [(10, "alpha"), (11, "beta")])
        # duplicate of alpha inside the 1h lookback → suppressed
        _write(f"{in_dir}/f1.parquet", [(12, "alpha")])
        # t=+48h: advances the watermark far past alpha's state entry
        _write(f"{in_dir}/f2.parquet", [(48 * HOUR, "gamma")])
        # spacer batch: state EVICTION runs at batch COMMIT, so the
        # 47h watermark purges alpha only after this batch finishes
        _write(f"{in_dir}/f3.parquet", [(48 * HOUR + 60, "delta")])
        # alpha again — its key expired → RE-emitted
        _write(f"{in_dir}/f4.parquet", [(48 * HOUR + 120, "alpha")])

        q = start_stream_dedup(spark, in_dir, out_dir, ckpt, watermark_delay="1 hour")
        assert q.awaitTermination(300)

        texts = [r["text"] for r in spark.read.parquet(out_dir).collect()]
        assert sorted(texts) == ["alpha", "alpha", "beta", "delta", "gamma"]
