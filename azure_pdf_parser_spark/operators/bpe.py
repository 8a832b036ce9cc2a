"""Distributed BPE tokenizer training and application — the missing
piece between token COUNTING (functions/text.py's whitespace + BPE-ish
regex stats) and an actual subword tokenizer: learn the merge table
from the corpus, then encode the corpus with it (the Sennrich
byte-pair-encoding algorithm that GPT/Llama-family tokenizers build
on).

Spec (pinned by tests/test_bpe.py against a pure-Python reference and
by the DuckDB oracles below):

- words are ``[a-z]+`` runs over ``lower(text)`` (the engine-wide
  oracle-safe token pattern, see operators/lm.py);
- a word starts as its character sequence; each training step counts
  ALL adjacent symbol pairs weighted by corpus word frequency
  (overlapping occurrences count, as in Sennrich's reference), picks
  the argmax under the total order (count DESC, lhs ASC, rhs ASC),
  and merges it greedily LEFTMOST-FIRST in every word;
- training stops after ``n_merges`` steps or when no pair reaches
  ``min_count``;
- encoding applies the learned merges by rank (lowest first), which is
  provably identical to replaying them in training order: a merge
  (x,y)->xy only creates adjacencies involving xy, and any merge
  consuming xy was necessarily learned later.

Scale shape (the 100 TB posture):

- the corpus is scanned ONCE, into the distinct-word frequency table
  (Heaps-bounded relative to corpus size; optionally capped to the
  top ``max_words`` by frequency via TakeOrderedAndProject — the
  standard frequency-truncated training corpus);
- every training round runs over that word table only: one
  explode + map-side-partial groupBy for pair counts and a
  ``orderBy().limit(1)`` argmax (TakeOrderedAndProject, 1 row to the
  driver — the same bounded driver traffic as the CC loop's
  convergence probe in operators/dedup.py);
- the merge APPLY is map-only: an ``array_contains`` pre-filter skips
  the untouched words (most of the table, most rounds), and the fold
  itself is a JVM ``aggregate`` lambda — no Python, no shuffle;
- lineage is truncated per round with an eager ``localCheckpoint``
  (operators/dedup.py:connected_components pattern; a production run
  would checkpoint the word table to Iceberg between rounds);
- the driver holds O(n_merges) state — the merge list itself, which
  is the bounded-by-construction broadcast side of the encode stage;
- encoding is a single ``mapInPandas`` pass (Arrow-batched, per-batch
  unique-word cache — the HF-tokenizers fast path) with the merge
  ranks captured in the closure; zero shuffle.

Reference analog: none — azure-pdf-parser counts tokens only through
Azure's billing meters; this is an engine addition for the
training-data pipeline tier (SURVEY.md §2.5).
"""

from __future__ import annotations

import hashlib
import re
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from azure_pdf_parser_spark.operators.lm import TOKEN_PATTERN as _WORD_PATTERN

N_MERGES = 12
MIN_PAIR_COUNT = 2
PAIR_TOP_K = 100

_WORD_RE = re.compile(_WORD_PATTERN)
_TOKEN_OK_RE = re.compile(r"[a-z]+\Z")


def word_counts(documents: DataFrame, max_words: int | None = None) -> DataFrame:
    """(word, freq): corpus word frequencies — the one corpus scan.

    ``max_words`` caps the training vocabulary to the most frequent
    words via ``orderBy().limit()`` (TakeOrderedAndProject), the
    frequency-truncated corpus standard BPE trainers use; None (the
    gate setting) keeps every word so the DuckDB oracle stays capless.
    """
    words = F.regexp_extract_all(F.lower("text"), F.lit(_WORD_PATTERN), 0)
    wc = (
        documents.select(F.explode_outer(words).alias("word"))
        .where(F.col("word").isNotNull())
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )
    if max_words is not None:
        wc = wc.orderBy(F.col("freq").desc(), F.col("word").asc()).limit(max_words)
    return wc


def _chars(col) -> F.Column:
    return F.regexp_extract_all(col, F.lit("."), 0)


# transform index i is 0-based and slice keeps symbols[0..size-2], so
# the struct pairs symbols[i] with symbols[i+1] — every adjacent pair,
# overlapping occurrences included (the Sennrich counting rule)
_ADJACENT_PAIRS = (
    "transform(slice(symbols, 1, size(symbols) - 1),"
    " (x, i) -> struct(x AS lhs, symbols[i + 1] AS rhs))"
)


def _pair_counts(symbol_words: DataFrame) -> DataFrame:
    return (
        symbol_words.select(F.explode(F.expr(_ADJACENT_PAIRS)).alias("p"), "freq")
        .select("p.lhs", "p.rhs", "freq")
        .groupBy("lhs", "rhs")
        .agg(F.sum("freq").cast("bigint").alias("pair_count"))
    )


def bpe_pair_counts(documents: DataFrame, k: int = PAIR_TOP_K) -> DataFrame:
    """(lhs, rhs, pair_count): the top-``k`` adjacent character pairs —
    training step 0's statistics, and the cheap corpus fingerprint that
    decides whether a merge table is worth (re)training.

    Plan: corpus scan → word groupBy (map-side partials collapse the
    Zipf head) → pair explode over DISTINCT words only → pair groupBy →
    ``orderBy().limit(k)`` (TakeOrderedAndProject). The tie at the k
    boundary is deterministic: the order includes (lhs, rhs).
    """
    syms = word_counts(documents).select(
        _chars(F.col("word")).alias("symbols"), "freq"
    )
    return _pair_counts(syms).orderBy(
        F.col("pair_count").desc(), F.col("lhs").asc(), F.col("rhs").asc()
    ).limit(k)


def _merge_apply_expr(lhs: str, rhs: str, merged: str) -> F.Column:
    """Map-only greedy leftmost merge of (lhs, rhs) -> merged over the
    ``symbols`` array: a JVM ``aggregate`` fold whose accumulator tail
    is the only lookback greedy BPE needs. ``array_contains`` skips the
    words the merge cannot touch. Tokens are [a-z]+ by construction
    (asserted), so inlining them as SQL literals is injection-safe."""
    for tok in (lhs, rhs, merged):
        if not _TOKEN_OK_RE.match(tok):
            raise ValueError(f"non-[a-z]+ BPE token {tok!r}")
    return F.expr(
        f"""
        CASE WHEN array_contains(symbols, '{lhs}') THEN
          aggregate(
            symbols,
            cast(array() as array<string>),
            (acc, x) -> CASE
              WHEN size(acc) > 0
                   AND element_at(acc, -1) = '{lhs}'
                   AND x = '{rhs}'
              THEN concat(slice(acc, 1, size(acc) - 1), array('{merged}'))
              ELSE concat(acc, array(x)) END)
        ELSE symbols END
        """
    )


def bpe_train_merges(
    documents: DataFrame,
    n_merges: int = N_MERGES,
    min_count: int = MIN_PAIR_COUNT,
    max_words: int | None = None,
) -> list[tuple[int, str, str, str, int]]:
    """Learn the merge table: [(step, lhs, rhs, merged, pair_count)].

    The iterative core — see the module docstring for the per-round
    plan shape. Driver traffic is exactly one row per round (the
    argmax) plus the O(n_merges) result list.
    """
    # eager=False: the checkpoint materializes inside the NEXT round's
    # argmax job instead of running its own job — one Spark job per
    # merge round instead of two. Lineage truncation is identical (the
    # RDD is checkpointed on first compute), so round N+1 never replays
    # round N's merge.
    syms = (
        word_counts(documents, max_words)
        .select(_chars(F.col("word")).alias("symbols"), "freq")
        .localCheckpoint(eager=False)
    )
    merges: list[tuple[int, str, str, str, int]] = []
    for step in range(1, n_merges + 1):
        top = (
            _pair_counts(syms)
            .where(F.col("pair_count") >= min_count)
            .orderBy(F.col("pair_count").desc(), F.col("lhs").asc(), F.col("rhs").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        lhs, rhs, count = top[0].lhs, top[0].rhs, int(top[0].pair_count)
        merged = lhs + rhs
        merges.append((step, lhs, rhs, merged, count))
        syms = syms.select(
            _merge_apply_expr(lhs, rhs, merged).alias("symbols"), "freq"
        ).localCheckpoint(eager=False)
    return merges


_MERGES_SCHEMA = (
    "step int, lhs string, rhs string, merged string, pair_count bigint"
)


def bpe_train(
    documents: DataFrame,
    n_merges: int = N_MERGES,
    min_count: int = MIN_PAIR_COUNT,
) -> DataFrame:
    """The merge table as a DataFrame — the persistable tokenizer model
    (step, lhs, rhs, merged, pair_count), O(n_merges) rows."""
    spark = documents.sparkSession
    merges = bpe_train_merges(documents, n_merges, min_count)
    # One slice: the model is O(n_merges) driver-sized rows. Letting
    # createDataFrame split it across defaultParallelism slices makes
    # every downstream single-task consumer (coalesce(1) writes) pay
    # ~32 sequential Python-partition evaluations (~140 ms each).
    return spark.createDataFrame(
        spark.sparkContext.parallelize(merges, 1), _MERGES_SCHEMA
    )


def merge_ranks(
    merges: list[tuple[int, str, str, str, int]],
) -> dict[tuple[str, str], int]:
    """Pair → rank. Contract: the list must be CAUSAL — every pair's
    tokens exist before the merge is learned, as any trained list is by
    construction (and a trained list never repeats a pair: once merged,
    a pair's adjacencies are gone and cannot be recreated — new
    adjacencies always involve the new token). Under that contract,
    rank-based encoding equals sequential replay. A hand-built
    ANTI-causal list (a merge referencing a token a later merge
    creates) is out of contract: rank-based encoding would fire the
    later-created token's merge where sequential replay would not.
    Duplicate pairs keep the FIRST rank, mirroring replay order."""
    ranks: dict[tuple[str, str], int] = {}
    for i, (_, lhs, rhs, _, _) in enumerate(merges):
        ranks.setdefault((lhs, rhs), i)
    return ranks


def encode_word(
    word: str,
    ranks: dict[tuple[str, str], int],
    cache: dict[str, list[str]],
) -> list[str]:
    """Greedy rank-based BPE encode of one word (the HF-tokenizers
    algorithm): repeatedly merge the lowest-rank adjacent pair. Proven
    equivalent to replaying merges in training order (module docstring;
    pinned by tests/test_bpe.py::test_rank_encode_equals_sequential)."""
    got = cache.get(word)
    if got is not None:
        return got
    syms = list(word)
    while len(syms) > 1:
        best_rank = None
        best = None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best = r, (syms[i], syms[i + 1])
        if best is None:
            break
        a, b = best
        m = a + b
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(m)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    cache[word] = syms
    return syms


_ENCODE_SCHEMA = (
    "doc_id bigint, n_words bigint, n_bpe_tokens bigint, stream_md5 string"
)


def bpe_encode_with(
    documents: DataFrame, merges: list[tuple[int, str, str, str, int]]
) -> DataFrame:
    """(doc_id, n_words, n_bpe_tokens, stream_md5): encode every doc
    with a trained merge table. ``stream_md5`` is the md5 of the full
    space-joined token stream — the value-bearing column that pins the
    exact segmentation, not just the counts, against the oracle.

    Map-only: one mapInPandas pass, merge ranks in the closure
    (O(n_merges), bounded by construction), per-batch unique-word
    cache. Docs with no [a-z]+ words emit no row (mirroring the
    oracle's inner join)."""
    ranks = merge_ranks(merges)

    def batches(it: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}
        for pdf in it:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                if not isinstance(text, str):
                    continue
                words = _WORD_RE.findall(text.lower())
                if not words:
                    continue
                toks: list[str] = []
                for w in words:
                    toks.extend(encode_word(w, ranks, cache))
                stream = " ".join(toks)
                rows.append(
                    (
                        int(doc_id),
                        len(words),
                        len(toks),
                        hashlib.md5(stream.encode("utf-8")).hexdigest(),
                    )
                )
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=["doc_id", "n_words", "n_bpe_tokens", "stream_md5"],
                )

    return documents.select("doc_id", "text").mapInPandas(
        batches, _ENCODE_SCHEMA
    )


def bpe_encode(
    documents: DataFrame,
    n_merges: int = N_MERGES,
    min_count: int = MIN_PAIR_COUNT,
) -> DataFrame:
    """Train on the corpus, then encode it — the end-to-end gate path.
    Production splits this: train once, persist the merge table, encode
    many corpora with :func:`bpe_encode_with`."""
    return bpe_encode_with(
        documents, bpe_train_merges(documents, n_merges, min_count)
    )


def save_merges(merges_df: DataFrame, path: str) -> None:
    """Persist a trained merge table — the tokenizer model artifact.
    O(n_merges) rows, so one file: the production layout is a tiny
    versioned table next to the corpus it was trained on (Iceberg in
    production, parquet here — the ann.save_ivf_index convention)."""
    # repartition(1), not coalesce(1): coalesce folds every parent
    # partition into ONE task, and on a Python-parallelized source each
    # parent partition costs a sequential Python-worker round-trip
    # (measured 4.5 s for a 12-row model at 32 slices). repartition
    # shuffles 12 rows — trivial — and keeps the parents parallel.
    merges_df.repartition(1).write.mode("overwrite").parquet(path)


def load_merges(spark, path: str) -> list[tuple[int, str, str, str, int]]:
    """Reload a persisted merge table into the driver-side list
    :func:`bpe_encode_with` consumes. The collect is bounded by
    construction (O(n_merges) — the model IS driver-sized; that is
    what makes the encode stage's closure broadcast-free)."""
    rows = spark.read.parquet(path).orderBy("step").collect()
    return [
        (r.step, r.lhs, r.rhs, r.merged, int(r.pair_count)) for r in rows
    ]


# --- DuckDB oracles -----------------------------------------------------------
#
# The train/encode oracles replay the EXACT iterative algorithm in SQL:
# a recursive CTE whose working table is the word/symbol state, whose
# per-step argmax is an aggregate over that working table, and whose
# merge apply is a list_reduce fold with the same
# greedy-leftmost-accumulator semantics as the Spark `aggregate` lambda
# (both validated token-for-token against a pure-Python Sennrich
# reference in tests/test_bpe.py). Recursion stops early exactly like
# the engine: an empty argmax (no pair >= min_count) empties the CROSS
# JOIN and ends the iteration.

_WC_CTE = f"""
wc AS (
  SELECT t.word, count(*) AS freq
  FROM documents d CROSS JOIN LATERAL (
    SELECT UNNEST(regexp_extract_all(lower(d.text), '{_WORD_PATTERN}')) AS word) t
  GROUP BY t.word
)"""

_ST_CTE = f"""
st(step, word, freq, s, a, b, m, c) AS (
  SELECT 0, word, freq, array_to_string(regexp_extract_all(word, '.'), ' '),
         CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
         CAST(NULL AS BIGINT)
  FROM wc
  UNION ALL
  SELECT e.step + 1, e.word, e.freq,
    list_reduce(string_split(e.s, ' '), (acc, x) ->
      CASE WHEN (acc = bp.a OR acc LIKE '%' || ' ' || bp.a) AND x = bp.b
           THEN left(acc, length(acc) - length(bp.a)) || bp.m
           ELSE acc || ' ' || x END),
    bp.a, bp.b, bp.m, bp.c
  FROM st e
  CROSS JOIN (
    SELECT lhs AS a, rhs AS b, lhs || rhs AS m, c FROM (
      SELECT toks[i] AS lhs, toks[i + 1] AS rhs, CAST(sum(freq) AS BIGINT) AS c
      FROM (SELECT freq, string_split(s, ' ') AS toks FROM st) w
      CROSS JOIN LATERAL (
        SELECT UNNEST(generate_series(1, len(w.toks) - 1)) AS i) g
      GROUP BY toks[i], toks[i + 1]
    ) p WHERE c >= {MIN_PAIR_COUNT}
    ORDER BY c DESC, a ASC, b ASC LIMIT 1
  ) bp
  WHERE e.step < {N_MERGES}
)"""

BPE_PAIR_COUNTS_SQL = f"""
WITH {_WC_CTE},
pairs AS (
  SELECT toks[i] AS lhs, toks[i + 1] AS rhs, CAST(sum(freq) AS BIGINT) AS pair_count
  FROM (SELECT freq, regexp_extract_all(word, '.') AS toks FROM wc) w
  CROSS JOIN LATERAL (
    SELECT UNNEST(generate_series(1, len(w.toks) - 1)) AS i) g
  GROUP BY toks[i], toks[i + 1]
)
SELECT lhs, rhs, pair_count
FROM pairs
ORDER BY pair_count DESC, lhs ASC, rhs ASC
LIMIT {PAIR_TOP_K}
"""

BPE_TRAIN_SQL = f"""
WITH RECURSIVE {_WC_CTE}, {_ST_CTE}
SELECT DISTINCT CAST(step AS INT) AS step, a AS lhs, b AS rhs, m AS merged,
       c AS pair_count
FROM st WHERE step >= 1
"""

BPE_ENCODE_SQL = f"""
WITH RECURSIVE {_WC_CTE}, {_ST_CTE},
fin AS (SELECT word, s FROM st WHERE step = (SELECT max(step) FROM st)),
w AS (
  SELECT d.doc_id, t.i AS pos, t.word
  FROM documents d CROSS JOIN LATERAL (
    SELECT UNNEST(regexp_extract_all(lower(d.text), '{_WORD_PATTERN}')) AS word,
           generate_subscripts(regexp_extract_all(lower(d.text), '{_WORD_PATTERN}'), 1) AS i) t
)
SELECT w.doc_id,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(len(string_split(f.s, ' '))) AS BIGINT) AS n_bpe_tokens,
       md5(string_agg(f.s, ' ' ORDER BY w.pos)) AS stream_md5
FROM w JOIN fin f USING (word)
GROUP BY w.doc_id
"""
