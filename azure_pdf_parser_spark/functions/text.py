"""Text-analysis column expressions: language ID, quality, tokens.

The reference delegates language detection to ``langdetect`` with a
pinned seed (reference: src/azure_pdf_parser/experimental_base.py:135-160,
DetectorFactory.seed=0 at :151-152). langdetect is a Python-only,
row-at-a-time library — the engine replaces it with a deterministic
stopword-profile heuristic expressed as pure column expressions, so
language ID runs JVM-side inside whole-stage codegen with zero Python
cost and identical results on any executor count.

Every function here has a Spark (Column) and a SQL (string) form with
bit-identical semantics — the SQL form feeds the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Ordered dict: tie-break is lexicographically smallest language code.
LANG_STOPWORDS = {
    "de": ("der", "die", "das", "und", "ist", "nicht"),
    "en": ("the", "a", "of", "and", "to", "is"),
    "es": ("el", "los", "las", "y", "es", "una"),
    "fr": ("le", "les", "et", "est", "dans", "une"),
}


# Java's \b is Unicode-aware while RE2/DuckDB's is ASCII-only ('aß'
# bounds 'a' in RE2 but not in Java — found by hypothesis). Replacing
# every non-printable-ASCII char with a space BEFORE matching gives both
# engines identical boundary semantics.
_NON_ASCII_PAT = "[^ -~]"


def _ascii(text: Column) -> Column:
    return F.regexp_replace(text, _NON_ASCII_PAT, " ")


def _score(text: Column | str, lang: str) -> Column:
    pat = r"\b(" + "|".join(LANG_STOPWORDS[lang]) + r")\b"
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(_ascii(c), F.lit(pat), 1))


def language_expr(text: Column | str) -> Column:
    """Detected language code, or NULL when no stopword hits.

    argmax over per-language stopword-hit counts; ties go to the
    lexicographically smallest code (deterministic — the analog of the
    reference's seed pinning).

    Built so each per-language score expression appears EXACTLY ONCE:
    argmax = array_max over (score, -lang_index) structs (struct
    comparison is field-order lexicographic, so max score wins and ties
    go to the smallest index), and the winner struct is consumed through
    a single-element transform() whose lambda variable is a cheap slot
    reference. The naive greatest+CASE chain references every score ~6×
    — harmless under whole-stage codegen CSE, but a 6× real cost inside
    array lambdas (per-span voting), where codegen cannot reach.
    """
    ranked = F.array_max(
        F.array(
            *[
                F.struct(_score(text, lang).alias("s"), F.lit(-i).alias("r"))
                for i, lang in enumerate(LANG_STOPWORDS)
            ]
        )
    )
    langs = F.array(*[F.lit(lang) for lang in LANG_STOPWORDS])
    # Null-safe winner branch: NULL text gives NULL scores, which tie on
    # the index field inside array_max (struct comparison) and would
    # otherwise crown the first language. `w.s > 0` is false for both
    # NULL and 0 scores, so each yields NULL — matching the SQL form's
    # `CASE WHEN best = 0 THEN NULL` + SQL NULL propagation.
    return F.element_at(
        F.transform(
            F.array(ranked),
            lambda w: F.when(w.s > 0, F.element_at(langs, -w.r + 1)),
        ),
        1,
    )


def language_sql(text_sql: str) -> str:
    """DuckDB SQL with semantics identical to :func:`language_expr`."""
    ascii_sql = f"regexp_replace({text_sql}, '[^ -~]', ' ', 'g')"
    score = {
        lang: f"len(regexp_extract_all({ascii_sql}, '\\b({'|'.join(words)})\\b', 1))"
        for lang, words in LANG_STOPWORDS.items()
    }
    best = "greatest(" + ", ".join(score.values()) + ")"
    cases = " ".join(
        f"WHEN {score[lang]} = {best} THEN '{lang}'" for lang in LANG_STOPWORDS
    )
    return f"(CASE WHEN {best} = 0 THEN NULL {cases} END)"


def token_count_expr(text: Column | str) -> Column:
    """Whitespace token count (corpus text is single-space joined)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.when(F.length(c) == 0, F.lit(0)).otherwise(F.size(F.split(c, " ")))


TOKEN_COUNT_SQL = "(CASE WHEN length({t}) = 0 THEN 0 ELSE len(string_split({t}, ' ')) END)"

# BPE-ish pre-tokenizer regex (GPT-2-style split classes, simplified to
# the subset whose semantics are identical in Java regex and RE2):
# letter runs, digit runs, single non-alphanumeric-non-space chars.
BPE_TOKEN_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def bpe_token_count_expr(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(BPE_TOKEN_PATTERN), 0))


BPE_TOKEN_COUNT_SQL = "len(regexp_extract_all({t}, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'))"


def quality_exprs(text: Column | str) -> dict[str, Column]:
    """Quality-scoring signals: length, tokens, avg token length,
    stopword ratio, distinct-token ratio. All ratios rounded to 6 dp so
    the DuckDB comparison is stable."""
    c = F.col(text) if isinstance(text, str) else text
    n_chars = F.length(c)
    n_tokens = token_count_expr(c)
    # empty text → 0 tokens → NULL ratios (nullif: ANSI mode would raise
    # on /0, and the DuckDB oracle must agree)
    denom = F.nullif(n_tokens.cast("double"), F.lit(0.0))
    all_stop = _score(c, "en") + _score(c, "de") + _score(c, "es") + _score(c, "fr")
    n_distinct = F.size(F.array_distinct(F.split(c, " ")))
    return {
        "n_chars": n_chars.cast("bigint"),
        "n_tokens": n_tokens.cast("bigint"),
        "avg_token_len": F.round((n_chars - (n_tokens - 1)) / denom, 6),
        "stopword_ratio": F.round(all_stop / denom, 6),
        "distinct_ratio": F.round(n_distinct / denom, 6),
    }


def repetition_stats(documents: "DataFrame") -> "DataFrame":  # noqa: F821
    """Gopher-style repetition signals per doc: total/distinct word
    bigrams, the most-frequent bigram's count, and its share of all
    bigrams (high share ⇒ boilerplate/spam — a standard training-data
    drop rule).

    Plan: bigram explode (narrow) → groupBy(doc, bigram) count →
    groupBy(doc) max/sum/count — two shuffles, both keyed on the
    uniform doc id (the second reuses the first's partitioning modulo
    the bigram column, and both do map-side partial aggregation).
    """
    from pyspark.sql import functions as F

    words = F.split("text", " ")
    n = F.size(words)
    bigrams = F.when(n < 2, F.array(F.col("text"))).otherwise(
        F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.concat_ws(" ", F.element_at(words, i + 1), F.element_at(words, i + 2)),
        )
    )
    per_gram = (
        documents.select("doc_id", F.explode_outer(bigrams).alias("bigram"))
        .where(F.col("bigram").isNotNull())
        .groupBy("doc_id", "bigram")
        .agg(F.count("*").alias("c"))
    )
    return per_gram.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_bigrams"),
        F.count("*").cast("bigint").alias("n_distinct_bigrams"),
        F.max("c").cast("bigint").alias("top_bigram_count"),
        F.round(F.max("c") / F.sum("c"), 6).alias("top_bigram_ratio"),
    )


REPETITION_STATS_SQL = """
WITH grams AS (
    SELECT doc_id, bigram, count(*) AS c FROM (
        SELECT d.doc_id,
               CASE WHEN len(w.words) < 2 THEN d.text
                    ELSE w.words[t.i + 1] || ' ' || w.words[t.i + 2]
               END AS bigram
        FROM documents d
        -- symmetric with the Spark side's NULL-bigram filter: a NULL
        -- text must drop the doc in BOTH engines (advisor-verified
        -- divergence: DuckDB's CASE otherwise emits one NULL bigram row)
        CROSS JOIN LATERAL (SELECT string_split(d.text, ' ') AS words) w
        CROSS JOIN LATERAL (
            SELECT UNNEST(range(CAST(greatest(len(w.words) - 1, 1) AS BIGINT))) AS i
        ) t
        WHERE d.text IS NOT NULL
    ) GROUP BY doc_id, bigram
)
SELECT doc_id,
       CAST(sum(c) AS BIGINT) AS n_bigrams,
       CAST(count(*) AS BIGINT) AS n_distinct_bigrams,
       CAST(max(c) AS BIGINT) AS top_bigram_count,
       round(max(c) / CAST(sum(c) AS DOUBLE), 6) AS top_bigram_ratio
FROM grams GROUP BY doc_id
"""


def vocab_topk(documents: "DataFrame", k: int = 100) -> "DataFrame":  # noqa: F821
    """Corpus vocabulary top-k: global token counts ranked
    (count DESC, token ASC) — the vocab-building pass of a training
    pipeline. One groupBy on the token (map-side partials collapse the
    per-partition duplicates first) and a single-partition window over
    only the k-ish head would be wrong at scale — instead the window
    runs over the full ranked set but Spark's TakeOrderedAndProject
    keeps it bounded; output is k rows.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    counts = (
        documents.select(F.explode_outer(F.split("text", " ")).alias("token"))
        .where(F.col("token").isNotNull())
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )
    w = Window.orderBy(F.col("n").desc(), F.col("token").asc())
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("rank", "token", F.col("n").cast("bigint").alias("n"))
    )


VOCAB_TOPK_SQL = """
WITH counts AS (
    SELECT token, count(*) AS n FROM (
        SELECT UNNEST(string_split(text, ' ')) AS token FROM documents
    ) GROUP BY token
)
SELECT CAST(row_number() OVER (ORDER BY n DESC, token ASC) AS INT) AS rank,
       token, CAST(n AS BIGINT) AS n
FROM counts
ORDER BY n DESC, token ASC
LIMIT {k}
"""


def quality_sql() -> dict[str, str]:
    """DuckDB equivalents of :func:`quality_exprs` over column ``text``."""
    t = "text"
    n_tokens = TOKEN_COUNT_SQL.format(t=t)
    stops = " + ".join(
        f"len(regexp_extract_all(regexp_replace({t}, '[^ -~]', ' ', 'g'), "
        f"'\\b({'|'.join(words)})\\b', 1))"
        for words in LANG_STOPWORDS.values()
    )
    return {
        "n_chars": f"CAST(length({t}) AS BIGINT)",
        "n_tokens": f"CAST({n_tokens} AS BIGINT)",
        "avg_token_len": f"round((length({t}) - ({n_tokens} - 1)) / nullif(CAST({n_tokens} AS DOUBLE), 0), 6)",
        "stopword_ratio": f"round(({stops}) / nullif(CAST({n_tokens} AS DOUBLE), 0), 6)",
        "distinct_ratio": f"round(len(list_distinct(string_split({t}, ' '))) / nullif(CAST({n_tokens} AS DOUBLE), 0), 6)",
    }
