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


def _score(text: Column | str, lang: str) -> Column:
    pat = r"\b(" + "|".join(LANG_STOPWORDS[lang]) + r")\b"
    return F.size(F.regexp_extract_all(F.col(text) if isinstance(text, str) else text, F.lit(pat), 1))


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
    return F.element_at(
        F.transform(
            F.array(ranked),
            lambda w: F.when(w.s == 0, F.lit(None).cast("string")).otherwise(
                F.element_at(langs, -w.r + 1)
            ),
        ),
        1,
    )


def language_sql(text_sql: str) -> str:
    """DuckDB SQL with semantics identical to :func:`language_expr`."""
    score = {
        lang: f"len(regexp_extract_all({text_sql}, '\\b({'|'.join(words)})\\b', 1))"
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
    all_stop = _score(c, "en") + _score(c, "de") + _score(c, "es") + _score(c, "fr")
    n_distinct = F.size(F.array_distinct(F.split(c, " ")))
    return {
        "n_chars": n_chars.cast("bigint"),
        "n_tokens": n_tokens.cast("bigint"),
        "avg_token_len": F.round((n_chars - (n_tokens - 1)) / n_tokens, 6),
        "stopword_ratio": F.round(all_stop / n_tokens, 6),
        "distinct_ratio": F.round(n_distinct / n_tokens, 6),
    }


def quality_sql() -> dict[str, str]:
    """DuckDB equivalents of :func:`quality_exprs` over column ``text``."""
    t = "text"
    n_tokens = TOKEN_COUNT_SQL.format(t=t)
    stops = " + ".join(
        f"len(regexp_extract_all({t}, '\\b({'|'.join(words)})\\b', 1))"
        for words in LANG_STOPWORDS.values()
    )
    return {
        "n_chars": f"CAST(length({t}) AS BIGINT)",
        "n_tokens": f"CAST({n_tokens} AS BIGINT)",
        "avg_token_len": f"round((length({t}) - ({n_tokens} - 1)) / CAST({n_tokens} AS DOUBLE), 6)",
        "stopword_ratio": f"round(({stops}) / CAST({n_tokens} AS DOUBLE), 6)",
        "distinct_ratio": f"round(len(list_distinct(string_split({t}, ' '))) / CAST({n_tokens} AS DOUBLE), 6)",
    }
