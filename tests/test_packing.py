"""Sequence packing (operators/packing.py): tiling invariants,
reconstruction, determinism, and the shard-local plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from azure_pdf_parser_spark.operators.packing import pack_sequences
from tests.conftest import SF_DIR


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_every_pack_is_full_except_shard_tails(spark):
    """Within a shard every pack except the last must hold exactly
    `budget` tokens — concat-and-chunk leaves no internal slack."""
    segs = pack_sequences(_docs(spark), budget=64).persist()
    try:
        fill = segs.groupBy("shard", "pack_id").agg(
            F.sum("seg_len").alias("fill")
        )
        last = segs.groupBy("shard").agg(F.max("pack_id").alias("last_pack"))
        bad = (
            fill.join(last, "shard")
            .where((F.col("pack_id") < F.col("last_pack")) & (F.col("fill") != 64))
            .count()
        )
        assert bad == 0
        # tails are non-empty and never overfull
        tails = fill.join(last, "shard").where(
            F.col("pack_id") == F.col("last_pack")
        )
        assert tails.where((F.col("fill") <= 0) | (F.col("fill") > 64)).count() == 0
    finally:
        segs.unpersist()


def test_segments_tile_each_pack_without_gaps(spark):
    """Segment [pos_in_pack, pos_in_pack+seg_len) intervals must tile
    [0, fill) exactly: starts unique, each next start = previous end."""
    segs = pack_sequences(_docs(spark), budget=64)
    from pyspark.sql import Window

    w = Window.partitionBy("shard", "pack_id").orderBy("pos_in_pack")
    gaps = (
        segs.withColumn("prev_end", F.lag(F.col("pos_in_pack") + F.col("seg_len")).over(w))
        .where(
            (F.col("prev_end").isNotNull() & (F.col("prev_end") != F.col("pos_in_pack")))
            | (F.col("prev_end").isNull() & (F.col("pos_in_pack") != 0))
        )
        .count()
    )
    assert gaps == 0


def test_doc_reconstruction_from_segments(spark):
    """Concatenating a doc's segments in seg_begin order must rebuild
    its exact token stream — nothing dropped or duplicated at pack
    boundaries."""
    docs = _docs(spark).limit(200)
    segs = pack_sequences(docs, budget=32)
    rebuilt = (
        segs.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("seg_begin", "seg_text"))
                    ),
                    lambda s: s.seg_text,
                ),
                " ",
            ).alias("rebuilt")
        )
    )
    joined = docs.where(F.length("text") > 0).join(rebuilt, "doc_id", "left")
    assert joined.where(
        F.col("rebuilt").isNull() | (F.col("rebuilt") != F.col("text"))
    ).count() == 0


def test_empty_docs_pack_nothing_and_no_empty_segments(spark):
    docs = spark.createDataFrame(
        [("a", ""), ("b", "one two three"), ("c", "x")], ["doc_id", "text"]
    )
    segs = pack_sequences(docs, budget=2)
    rows = {r.doc_id for r in segs.select("doc_id").distinct().collect()}
    assert rows == {"b", "c"}
    assert segs.where(F.col("seg_len") <= 0).count() == 0


def test_monster_doc_spans_many_packs(spark):
    text = " ".join(f"t{i}" for i in range(1000))
    docs = spark.createDataFrame([("big", text)], ["doc_id", "text"])
    segs = pack_sequences(docs, budget=64, shards=1).orderBy("pack_id").collect()
    assert len(segs) == 16  # ceil(1000/64)
    assert all(s.seg_len == 64 for s in segs[:-1]) and segs[-1].seg_len == 1000 - 15 * 64
    assert [s.seg_begin for s in segs] == [i * 64 for i in range(16)]


def test_plan_is_one_shard_shuffle_no_global_sort(spark):
    """The only exchange is the hash partition on shard; the window and
    explode are shard-local — no empty-partitionBy window, no global
    Sort outside the shard-partitioned window sort."""
    df = pack_sequences(_docs(spark))
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    exchanges = re.findall(r"Exchange (\w+)", plan)
    assert all(e == "hashpartitioning" for e in exchanges), plan
    assert "SinglePartition" not in plan, plan
    assert plan.count("Exchange") <= 2, plan  # AQE may stage the window read
