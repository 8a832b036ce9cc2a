"""Deduplication suite for large-scale training-data pipelines.

Four tiers, cheapest first — each a standalone DataFrame op over
``documents(doc_id, text)``:

  exact          md5-groupBy (one skew-free shuffle on a uniform hash)
  ngram_jaccard  3-word shingle sets; candidate pairs via shared-shingle
                 equi-join; exact Jaccard on the pair
  minhash_lsh    16 md5 minhashes → 4 bands of 4 → candidates share a
                 band (the scale path: join key count is O(docs·bands),
                 never O(docs²))
  simhash        128-bit simhash over md5 nibbles, token-frequency
                 weighted — near-dup fingerprint for hamming bucketing

Everything is expressed with built-in functions (md5, split, explode,
min, groupBy) so the hot path stays JVM-side; there are no UDFs at all.
At 100 TB scale: the shingle explode is narrow; the only shuffles are
the groupBy on (doc) for signatures and the equi-join on
(band_idx, band_hash) / shingle, whose keys are md5-uniform.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_MINHASH = 16
N_BANDS = 4  # 4 rows per band
SHINGLE_WORDS = 3


# --- shingles ----------------------------------------------------------------


def shingles(documents: DataFrame) -> DataFrame:
    """(doc_id, shingle) — distinct 3-word shingles; docs shorter than 3
    words contribute their whole text as the single shingle."""
    words = F.split("text", " ")
    n = F.size(words)
    shingle_arr = F.when(
        n < SHINGLE_WORDS, F.array(F.col("text"))
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), n - SHINGLE_WORDS),
            lambda i: F.array_join(F.slice(words, i + 1, SHINGLE_WORDS), " "),
        )
    )
    return documents.select(
        "doc_id", F.explode(F.array_distinct(shingle_arr)).alias("shingle")
    )


SHINGLES_SQL_CTE = """
shingles AS (
    SELECT DISTINCT doc_id, shingle FROM (
        SELECT d.doc_id,
               CASE WHEN len(w.words) < 3 THEN d.text
                    ELSE array_to_string(list_slice(w.words, t.i + 1, t.i + 3), ' ')
               END AS shingle
        FROM documents d
        CROSS JOIN LATERAL (SELECT string_split(d.text, ' ') AS words) w
        CROSS JOIN LATERAL (
            SELECT UNNEST(range(CAST(greatest(len(w.words) - 2, 1) AS BIGINT))) AS i
        ) t
    )
)
"""


# --- n-gram Jaccard ----------------------------------------------------------


def ngram_jaccard_pairs(documents: DataFrame, threshold: float = 0.3) -> DataFrame:
    """(doc_a, doc_b, jaccard) for pairs sharing ≥1 shingle with exact
    Jaccard ≥ threshold. The shared-shingle equi-join IS the candidate
    generation — no O(n²) cross join ever materializes."""
    sh = shingles(documents)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(b, on="shingle")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("nb"))
    out = (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_common")
                / (F.col("na") + F.col("nb") - F.col("n_common")).cast("double"),
                6,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return out


NGRAM_JACCARD_SQL = (
    "WITH "
    + SHINGLES_SQL_CTE
    + """,
sizes AS (SELECT doc_id, count(*) AS n_shingles FROM shingles GROUP BY doc_id),
common AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
    FROM shingles a JOIN shingles b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
)
SELECT c.doc_a, c.doc_b,
       round(c.n_common / CAST(sa.n_shingles + sb.n_shingles - c.n_common AS DOUBLE), 6) AS jaccard
FROM common c
JOIN sizes sa ON sa.doc_id = c.doc_a
JOIN sizes sb ON sb.doc_id = c.doc_b
WHERE round(c.n_common / CAST(sa.n_shingles + sb.n_shingles - c.n_common AS DOUBLE), 6) >= {threshold}
"""
)


# --- MinHash + LSH -----------------------------------------------------------


def minhash_signatures(documents: DataFrame) -> DataFrame:
    """(doc_id, mh_00..mh_15): 16 seeded md5 minhashes per doc — one
    groupBy over the shingle explode (single shuffle, map-side partials)."""
    sh = shingles(documents)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{s}:"), F.col("shingle")))).alias(f"mh_{s:02d}")
        for s in range(N_MINHASH)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def lsh_bands(documents: DataFrame) -> DataFrame:
    """(doc_id, band_idx, band_hash): md5 of each 4-minhash band."""
    sig = minhash_signatures(documents)
    rows_per_band = N_MINHASH // N_BANDS
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.md5(
                    F.concat_ws(
                        ",",
                        *[
                            F.col(f"mh_{b * rows_per_band + r:02d}")
                            for r in range(rows_per_band)
                        ],
                    )
                ).alias("band_hash"),
            )
            for b in range(N_BANDS)
        ]
    )
    return sig.select("doc_id", F.explode(bands).alias("band")).select(
        "doc_id", "band.band_idx", "band.band_hash"
    )


def minhash_lsh_candidates(documents: DataFrame) -> DataFrame:
    """(doc_a, doc_b): distinct pairs sharing ≥1 LSH band."""
    bands = lsh_bands(documents)
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(b, on=["band_idx", "band_hash"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def _minhash_sql_aggs() -> str:
    return ",\n           ".join(
        f"min(md5('{s}:' || shingle)) AS mh_{s:02d}" for s in range(N_MINHASH)
    )


MINHASH_LSH_SQL = (
    "WITH "
    + SHINGLES_SQL_CTE
    + f""",
sig AS (
    SELECT doc_id,
           {_minhash_sql_aggs()}
    FROM shingles GROUP BY doc_id
),
bands AS (
    SELECT doc_id, 0 AS band_idx, md5(mh_00 || ',' || mh_01 || ',' || mh_02 || ',' || mh_03) AS band_hash FROM sig
    UNION ALL
    SELECT doc_id, 1, md5(mh_04 || ',' || mh_05 || ',' || mh_06 || ',' || mh_07) FROM sig
    UNION ALL
    SELECT doc_id, 2, md5(mh_08 || ',' || mh_09 || ',' || mh_10 || ',' || mh_11) FROM sig
    UNION ALL
    SELECT doc_id, 3, md5(mh_12 || ',' || mh_13 || ',' || mh_14 || ',' || mh_15) FROM sig
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b
  ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
"""
)


# --- SimHash -----------------------------------------------------------------


def simhash(documents: DataFrame) -> DataFrame:
    """(doc_id, simhash): 128-bit hex fingerprint.

    Token-frequency-weighted simhash over the 128 bits of each token's
    md5: bit b of the fingerprint is 1 iff the weighted sum of
    (±token_count) over tokens is positive. Pure built-ins — the nibble
    decode is instr() on the hex alphabet.
    """
    tokens = (
        documents.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("cnt"))
    )
    # one row per (doc, token) with the 32 md5 nibbles materialized once;
    # then ONE groupBy(doc_id) carrying 128 weighted bit-sums as aggregate
    # expressions (map-side partials). An earlier formulation exploded
    # (doc, token) × 32 positions × 4 bits into ~80M rows through three
    # shuffles and ran 10× slower.
    nibs = tokens.select(
        "doc_id",
        "cnt",
        F.transform(
            F.sequence(F.lit(1), F.lit(32)),
            lambda p: F.instr(
                F.lit("0123456789abcdef"), F.substring(F.md5("token"), p, 1)
            )
            - 1,
        ).alias("nibs"),
    )
    bit_sums = [
        F.sum(
            F.when(
                (
                    F.floor(
                        F.element_at(F.col("nibs"), pos + 1) / F.lit(2**bit)
                    ).cast("int")
                    % 2
                )
                == 1,
                F.col("cnt"),
            ).otherwise(-F.col("cnt"))
        ).alias(f"s_{pos:02d}_{bit}")
        for pos in range(32)
        for bit in range(4)
    ]
    sums = nibs.groupBy("doc_id").agg(*bit_sums)
    nib_chars = [
        F.substring(
            F.lit("0123456789abcdef"),
            sum(
                F.when(F.col(f"s_{pos:02d}_{bit}") > 0, 2**bit).otherwise(0)
                for bit in range(4)
            ).cast("int")
            + 1,
            1,
        )
        for pos in range(32)
    ]
    return sums.select("doc_id", F.concat(*nib_chars).alias("simhash"))


SIMHASH_SQL = """
WITH tokens AS (
    SELECT doc_id, token, count(*) AS cnt FROM (
        SELECT doc_id, UNNEST(string_split(text, ' ')) AS token FROM documents
    ) GROUP BY doc_id, token
),
pos AS (
    SELECT t.doc_id, t.cnt, p.pos,
           instr('0123456789abcdef', substr(md5(t.token), p.pos, 1)) - 1 AS nibble
    FROM tokens t
    CROSS JOIN LATERAL (SELECT UNNEST(range(1, 33)) AS pos) p
),
bits AS (
    SELECT doc_id, pos, b.bit,
           CASE WHEN CAST(floor(nibble / power(2, b.bit)) AS INT) % 2 = 1
                THEN cnt ELSE -cnt END AS w
    FROM pos
    CROSS JOIN LATERAL (SELECT UNNEST(range(0, 4)) AS bit) b
),
nibbles AS (
    SELECT doc_id, pos, CAST(sum(bitval * CAST(power(2, bit) AS INT)) AS INT) AS nib
    FROM (
        SELECT doc_id, pos, bit, CASE WHEN sum(w) > 0 THEN 1 ELSE 0 END AS bitval
        FROM bits GROUP BY doc_id, pos, bit
    ) GROUP BY doc_id, pos
)
SELECT doc_id,
       string_agg(substr('0123456789abcdef', nib + 1, 1), '' ORDER BY pos) AS simhash
FROM nibbles GROUP BY doc_id
"""


# --- winnowing fingerprints ---------------------------------------------------


def winnow_fingerprints(documents: DataFrame, window: int = 4) -> DataFrame:
    """(doc_id, fingerprint): distinct winnowed shingle-hash minima —
    classic document fingerprinting (Schleimer et al., SIGMOD'03 style):
    hash every 3-word shingle, slide a window of 4, keep each window's
    minimum, dedup.

    Implemented as a window-function sliding min over the exploded
    (doc_id, pos, hash) rows. An earlier array-local formulation
    (array_min over slice() per position) was 25× slower: Catalyst
    inlines the hash-array subexpression into every window position, so
    codegen went O(n²) per document. The explode + window form hashes
    each shingle exactly once; the one shuffle keys on doc_id (uniform)."""
    from pyspark.sql.window import Window

    words = F.split("text", " ")
    n = F.size(words)
    shingle_arr = F.when(n < SHINGLE_WORDS, F.array(F.col("text"))).otherwise(
        F.transform(
            F.sequence(F.lit(0), n - SHINGLE_WORDS),
            lambda i: F.array_join(F.slice(words, i + 1, SHINGLE_WORDS), " "),
        )
    )
    hashed = documents.select(
        "doc_id", F.posexplode(shingle_arr).alias("pos", "shingle")
    ).select("doc_id", "pos", F.md5("shingle").alias("h"))
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, window - 1)
    )
    return (
        hashed.select("doc_id", F.min("h").over(w).alias("fingerprint"))
        .distinct()
    )


WINNOW_SQL = (
    """
WITH raw_shingles AS (
    SELECT d.doc_id, t.i,
           CASE WHEN len(w.words) < 3 THEN d.text
                ELSE array_to_string(list_slice(w.words, t.i + 1, t.i + 3), ' ')
           END AS shingle
    FROM documents d
    CROSS JOIN LATERAL (SELECT string_split(d.text, ' ') AS words) w
    CROSS JOIN LATERAL (
        SELECT UNNEST(range(CAST(greatest(len(w.words) - 2, 1) AS BIGINT))) AS i
    ) t
)"""
    + """,
hashes AS (SELECT doc_id, i, md5(shingle) AS h FROM raw_shingles),
mins AS (
    SELECT doc_id,
           min(h) OVER (
               PARTITION BY doc_id ORDER BY i
               ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING
           ) AS fingerprint
    FROM hashes
)
SELECT DISTINCT doc_id, fingerprint FROM mins
"""
)
