"""Benchmark decontamination: n-gram overlap between the training corpus
and an evaluation suite.

The canonical training-data hygiene step (GPT-3 appendix C / Dolma /
FineWeb all ship a variant): a training document is *contaminated* when
it shares at least ``min_overlap`` distinct ``n_words``-word shingles
with any benchmark text. 13 words is the de-facto standard width.

Scale shape: the benchmark side is an eval suite — bounded by contract
(10⁴–10⁶ rows, ≪ corpus), so its distinct-shingle set is broadcast and
the 100 TB corpus side NEVER shuffles for the probe: shingle-explode →
broadcast-hash semi-probe → per-doc count, all map-side until the final
per-doc aggregation on the uniform doc_id key. If you ever pass a
corpus-sized table as ``benchmark``, drop the broadcast hint — that is
the corpus-derived-dim OOM hazard, not this contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DECON_NGRAM_WORDS = 13


def word_ngrams(df: DataFrame, id_cols: list[str], n_words: int) -> DataFrame:
    """Distinct n-word shingles per row; texts shorter than ``n_words``
    words contribute their whole text as the single shingle."""
    words = F.split("text", " ")
    size = F.size(words)
    arr = F.when(size < n_words, F.array(F.col("text"))).otherwise(
        F.transform(
            F.sequence(F.lit(0), size - n_words),
            lambda i: F.array_join(F.slice(words, i + 1, n_words), " "),
        )
    )
    # explode_outer + null-filter: a plain explode gets an inferred
    # size()>0 filter that re-evaluates the array build per row
    return df.select(
        *id_cols, F.explode_outer(F.array_distinct(arr)).alias("shingle")
    ).where(F.col("shingle").isNotNull())


def decontaminate(
    documents: DataFrame,
    benchmark: DataFrame,
    n_words: int = DECON_NGRAM_WORDS,
    min_overlap: int = 1,
) -> DataFrame:
    """(doc_id, n_overlap, contaminated) for EVERY corpus doc.

    ``benchmark`` needs a ``text`` column; ``n_overlap`` counts distinct
    shared shingles. The apply step downstream is
    ``where(~contaminated)`` (drop) or routing to a quarantine table.
    """
    bench_grams = F.broadcast(
        word_ngrams(benchmark, [], n_words).distinct()
    )
    doc_grams = word_ngrams(documents, ["doc_id"], n_words)
    overlap = (
        doc_grams.join(bench_grams, "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_overlap"))
    )
    return (
        documents.select("doc_id")
        .join(overlap, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_overlap", F.lit(0)).alias("n_overlap"),
            (F.coalesce("n_overlap", F.lit(0)) >= min_overlap).alias(
                "contaminated"
            ),
        )
    )


BLOOM_N_BITS = 1 << 17  # 128 Ki bits = 2 Ki longs; size ~16 bits/shingle
BLOOM_N_HASHES = 5


def _bloom_positions(n_bits: int) -> list[Column]:
    """k independent bit positions for column ``shingle``.

    Each position is its own ``xxhash64(shingle, i)`` masked to the
    (power-of-two) table size — k separate hashes instead of the usual
    h1 + i*h2 double hashing because the latter's multiply-add can
    overflow int64, which ANSI mode (Spark 4 default) turns into a
    runtime error. Masking with a positive constant always yields a
    non-negative position, even for negative hash values.
    """
    mask = n_bits - 1
    return [
        F.xxhash64(F.col("shingle"), F.lit(i)).bitwiseAND(F.lit(mask))
        for i in range(BLOOM_N_HASHES)
    ]


def build_bloom(benchmark: DataFrame, n_words: int, n_bits: int) -> DataFrame:
    """ONE row ``(bloom: array<long>)`` — a Bloom filter over the
    benchmark's distinct shingles, packed 64 bits per element.

    Built entirely JVM-side: shingle → k positions (explode) → 64-bit
    word index → ``bit_or`` per word → single-row densify via
    ``sequence``/``element_at``. The single shuffle moves ≤ n_bits/64
    ``(word, bits)`` rows; nothing is ever collected to the driver.
    """
    assert n_bits & (n_bits - 1) == 0, "n_bits must be a power of two"
    grams = word_ngrams(benchmark, [], n_words).distinct()
    packed = (
        grams.select(
            F.explode(F.array(*_bloom_positions(n_bits))).alias("pos")
        )
        .select(
            F.shiftright(F.col("pos"), 6).alias("word"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))"
            ).alias("bit"),
        )
        .groupBy("word")
        .agg(F.bit_or("bit").alias("bits"))
    )
    return packed.agg(
        F.map_from_entries(
            F.collect_list(F.struct("word", "bits"))
        ).alias("words")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_bits // 64 - 1)),
            lambda i: F.coalesce(
                F.element_at(F.col("words"), i), F.lit(0).cast("long")
            ),
        ).alias("bloom")
    )


def decontaminate_bloom(
    documents: DataFrame,
    benchmark: DataFrame,
    n_words: int = DECON_NGRAM_WORDS,
    min_overlap: int = 1,
    n_bits: int = BLOOM_N_BITS,
) -> DataFrame:
    """Same exact output as :func:`decontaminate`, via a Bloom pre-filter.

    Scale motivation: at 100 TB the corpus side explodes to O(10¹³)
    shingles, and even a broadcast-hash semi-probe pays the benchmark
    hash table's memory on every task. The Bloom sketch is n_bits/8
    bytes TOTAL (16 KiB at the default) regardless of benchmark size —
    it rides into every task as a one-row broadcast nested-loop join,
    and the bit tests are pure codegen arithmetic. Only the tiny
    surviving fraction (true overlaps + ~0.05% false positives at
    16 bits/shingle) reaches the exact confirm join, so the final
    result is EXACT — the sketch only prunes, never decides.
    """
    bloom = F.broadcast(build_bloom(benchmark, n_words, n_bits))
    doc_grams = word_ngrams(documents, ["doc_id"], n_words)
    probed = doc_grams.crossJoin(bloom)
    # stage the k positions as real columns (multi-referenced leaves
    # survive CollapseProject; inlined copies would defeat codegen CSE)
    for i, pos in enumerate(_bloom_positions(n_bits)):
        probed = probed.withColumn(f"_p{i}", pos)
    hit = None
    for i in range(BLOOM_N_HASHES):
        test = F.expr(
            f"(element_at(bloom, CAST(shiftright(_p{i}, 6) AS INT) + 1)"
            f" & shiftleft(CAST(1 AS BIGINT), CAST(_p{i} % 64 AS INT)))"
            " != 0"
        )
        hit = test if hit is None else hit & test
    survivors = probed.where(hit).select("doc_id", "shingle")
    bench_grams = F.broadcast(word_ngrams(benchmark, [], n_words).distinct())
    overlap = (
        survivors.join(bench_grams, "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_overlap"))
    )
    return (
        documents.select("doc_id")
        .join(overlap, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_overlap", F.lit(0)).alias("n_overlap"),
            (F.coalesce("n_overlap", F.lit(0)) >= min_overlap).alias(
                "contaminated"
            ),
        )
    )


def _ngram_cte(source_sql: str, id_select: str, n: int) -> str:
    return f"""
    SELECT DISTINCT {id_select} shingle FROM (
        SELECT d.doc_id,
               CASE WHEN len(w.words) < {n} THEN d.text
                    ELSE array_to_string(list_slice(w.words, t.i + 1, t.i + {n}), ' ')
               END AS shingle
        FROM ({source_sql}) d
        CROSS JOIN LATERAL (SELECT string_split(d.text, ' ') AS words) w
        CROSS JOIN LATERAL (
            SELECT UNNEST(range(CAST(greatest(len(w.words) - {n - 1}, 1) AS BIGINT))) AS i
        ) t
    )
    """


# The gate's benchmark table is synthesized deterministically from the
# corpus itself: every doc_id ≡ 0 (mod 37) contributes its text as one
# benchmark row — those docs (and their exact/near dups) must flag.
BENCHMARK_MOD = 37

DECONTAMINATE_SQL = f"""
WITH bench_grams AS ({_ngram_cte(
    f"SELECT doc_id, text FROM documents WHERE doc_id % {BENCHMARK_MOD} = 0",
    "", DECON_NGRAM_WORDS)}),
doc_grams AS ({_ngram_cte(
    "SELECT doc_id, text FROM documents", "doc_id,", DECON_NGRAM_WORDS)}),
overlap AS (
    SELECT g.doc_id, count(*) AS n_overlap
    FROM doc_grams g JOIN bench_grams b USING (shingle)
    GROUP BY g.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(o.n_overlap, 0) AS BIGINT) AS n_overlap,
       coalesce(o.n_overlap, 0) >= 1 AS contaminated
FROM documents d LEFT JOIN overlap o ON d.doc_id = o.doc_id
"""
