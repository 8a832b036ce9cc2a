"""Text normalization: the canonicalize-before-anything pass.

Every crawl pipeline normalizes text before hashing, deduping, or
tokenizing — otherwise typographic variants (curly vs straight quotes,
NBSP vs space, em-dash vs hyphen, doubled whitespace) make identical
content hash differently and pollute every downstream dedup key.
Reference analog: none (azure-pdf-parser passes Azure's text through
verbatim); engine addition at the head of the curation family.

Rules (each one regexp over the row — map-only, zero exchange, fuses
into the scan):
  1. unicode punctuation folding: curly quotes → ASCII, en/em-dash →
     '-', ellipsis → '...'
  2. exotic whitespace (NBSP) and whitespace-class controls
     (TAB/LF/VT/FF/CR) → space — "line1\\nline2" must hash like
     "line1 line2", never glue into "line1line2"
  3. remaining control chars (non-whitespace C0 + DEL) stripped
  4. whitespace runs collapsed to one space, ends trimmed

The sandbox corpus is already-clean synthetic text, so the gate runs
the rules over a deliberately-messied derivation seam (hash-chosen
curly quotes / NBSP / doubled space / control char / trailing ellipsis
— the messy-URL pattern from operators/urls.py), so every rule has
both outcomes under oracle. In production the messy column is the
crawl text itself and :func:`normalize_expr` runs unchanged.

Both engines run the IDENTICAL pattern strings: literal unicode chars,
explicit classes, and \\x hex escapes only — none of the \\s / \\p{...}
/ word-boundary constructs where Java regex (Spark) and RE2 (DuckDB)
diverge.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (pattern, replacement), applied in order; the same strings compile in
# Java regex and RE2
_RULES = (
    ("[“”]", '"'),
    ("[‘’]", "'"),
    ("[–—]", "-"),
    ("…", "..."),
    (" ", " "),
    # whitespace-class controls (TAB LF VT FF CR) FOLD to a space — a
    # production "line1\nline2" must hash like "line1 line2", not glue
    ("[\\x09-\\x0d]", " "),
    # remaining controls (non-whitespace C0 + DEL) are stripped
    ("[\\x00-\\x08\\x0e-\\x1f\\x7f]", ""),
    ("  +", " "),
    ("^ | $", ""),
)


def normalize_expr(text: Column) -> Column:
    out = text
    for pat, rep in _RULES:
        out = F.regexp_replace(out, pat, rep)
    return out


def _sql_rules(expr: str) -> str:
    out = expr
    for pat, rep in _RULES:
        # DuckDB string literals are NOT escape-processed: the pattern
        # text (backslashes included) passes to RE2 verbatim, so only
        # quotes need doubling
        pat_sql = pat.replace("'", "''")
        rep_sql = rep.replace("'", "''")
        out = f"regexp_replace({out}, '{pat_sql}', '{rep_sql}', 'g')"
    return out


def _swap_kth_space(text: Column, k: int, sep: Column) -> Column:
    """Replace the k-th single space with ``sep`` via array splice —
    occurrence-addressed edits exist in neither engine's regexp_replace,
    so both sides splice the split array identically."""
    words = F.split(text, " ")
    return F.when(
        F.size(words) > k,
        F.concat(
            F.array_join(F.slice(words, 1, k), " "),
            sep,
            F.array_join(
                F.slice(words, k + 1, F.size(words) - k), " "
            ),
        ),
    ).otherwise(text)


def messy_text_expr(doc_id: Column, text: Column) -> Column:
    """Derivation seam: deterministically dirty the clean corpus text so
    each normalization rule observes both outcomes. Nibbles of
    md5(doc_id || ':messy') choose the injected defects."""
    h = F.md5(F.concat(doc_id.cast("string"), F.lit(":messy")))

    def nib(i: int) -> Column:
        return F.conv(F.substring(h, i, 1), 16, 10).cast("int")

    out = text
    # 3rd space → NBSP (~1/2), 7th space doubled (~1/4)
    out = F.when(nib(2) < 8, _swap_kth_space(out, 3, F.lit(" "))).otherwise(out)
    out = F.when(nib(4) < 4, _swap_kth_space(out, 7, F.lit("  "))).otherwise(out)
    # curly-quote wrap (~1/2), trailing ellipsis (~1/4), BEL prefix (~1/8)
    out = F.when(
        nib(1) < 8, F.concat(F.lit("“"), out, F.lit("”"))
    ).otherwise(out)
    out = F.when(nib(3) < 4, F.concat(out, F.lit(" …"))).otherwise(out)
    out = F.when(nib(5) < 2, F.concat(F.lit("\x07"), out)).otherwise(out)
    return out


def normalize_text(documents: DataFrame) -> DataFrame:
    """(doc_id, text_messy, text_norm, changed): messy seam in,
    normalized text out, per-row changed flag. Map-only, zero exchange
    (plan-pinned)."""
    messy = messy_text_expr(F.col("doc_id"), F.col("text"))
    return (
        documents.where(F.col("text").isNotNull())
        .select("doc_id", messy.alias("text_messy"))
        .select(
            "doc_id",
            "text_messy",
            normalize_expr(F.col("text_messy")).alias("text_norm"),
        )
        .select(
            "doc_id",
            "text_messy",
            "text_norm",
            (F.col("text_messy") != F.col("text_norm")).alias("changed"),
        )
    )


def _swap_kth_space_sql(expr: str, k: int, sep_sql: str) -> str:
    words = f"string_split({expr}, ' ')"
    return f"""
CASE WHEN len({words}) > {k}
     THEN array_to_string(list_slice({words}, 1, {k}), ' ')
          || {sep_sql}
          || array_to_string(list_slice({words}, {k + 1}, len({words})), ' ')
     ELSE {expr} END"""


def normalize_text_sql() -> str:
    t2 = _swap_kth_space_sql("text", 3, "chr(160)")
    t4 = _swap_kth_space_sql("t2", 7, "'  '")
    norm = _sql_rules("text_messy")
    return f"""
WITH m0 AS (
    SELECT doc_id, text,
           md5(CAST(doc_id AS VARCHAR) || ':messy') AS hm
    FROM documents WHERE text IS NOT NULL
),
m2 AS (
    SELECT doc_id, hm,
           CASE WHEN CAST(('0x' || substr(hm, 2, 1)) AS INT) < 8
                THEN ({t2}) ELSE text END AS t2
    FROM m0
),
m4 AS (
    SELECT doc_id, hm,
           CASE WHEN CAST(('0x' || substr(hm, 4, 1)) AS INT) < 4
                THEN ({t4}) ELSE t2 END AS t4
    FROM m2
),
messy AS (
    SELECT doc_id,
           CASE WHEN CAST(('0x' || substr(hm, 5, 1)) AS INT) < 2
                THEN chr(7) ELSE '' END
           || CASE WHEN CAST(('0x' || substr(hm, 1, 1)) AS INT) < 8
                   THEN chr(8220) ELSE '' END
           || t4
           || CASE WHEN CAST(('0x' || substr(hm, 1, 1)) AS INT) < 8
                   THEN chr(8221) ELSE '' END
           || CASE WHEN CAST(('0x' || substr(hm, 3, 1)) AS INT) < 4
                   THEN ' ' || chr(8230) ELSE '' END AS text_messy
    FROM m4
)
SELECT doc_id, text_messy,
       {norm} AS text_norm,
       text_messy <> {norm} AS changed
FROM messy
"""
