"""PII scrubbing: regex redaction of emails / IPv4s / phone-like runs /
SSN-shaped ids — the training-data hygiene pass that runs before any
corpus leaves the pipeline.

All patterns are pure JVM-side ``regexp_replace``/``regexp_extract_all``
(whole-stage codegen, zero Python) and are written in the common subset
of Java regex and RE2 so the DuckDB oracle runs the IDENTICAL pattern
strings: no ``\\b`` (Unicode-aware in Java, ASCII in RE2 — the known
dual-engine divergence), no lookarounds (RE2 has none). The price is
documented over-matching at token boundaries (an IPv4-shaped substring
inside a longer dotted run still redacts) — for a scrubber,
over-redaction is the safe failure direction.

Scale: narrow map-only projection; at 100 TB this fuses into the scan
stage with no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# order matters: emails first (their local parts contain digit runs a
# phone pattern could partially eat), then SSN before phone (a phone
# match would swallow the hyphenated groups).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", "<IP>"),
    ("ssn", r"[0-9]{3}-[0-9]{2}-[0-9]{4}", "<SSN>"),
    ("phone", r"\+?[0-9][0-9() -]{6,}[0-9]", "<PHONE>"),
]


def scrub_text_col(text: Column) -> Column:
    """Redacted text: every pattern replaced by its token, in order."""
    out = text
    for _, pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def pii_counts(text: Column) -> list[Column]:
    """One count column per category, measured on the PROGRESSIVELY
    scrubbed text (category i counts matches after categories < i were
    redacted — the same occurrences the replace actually consumed)."""
    cols = []
    cur = text
    for name, pat, token in PII_PATTERNS:
        cols.append(
            F.size(F.regexp_extract_all(cur, F.lit(pat), F.lit(0)))
            .cast("bigint")
            .alias(f"n_{name}")
        )
        cur = F.regexp_replace(cur, pat, token)
    return cols


def scrub_pii(documents: DataFrame) -> DataFrame:
    """(doc_id, n_email, n_ipv4, n_ssn, n_phone, scrubbed_md5): redaction
    counts plus the md5 of the scrubbed text (the gate compares content
    equality without hauling full text through the compare)."""
    return documents.select(
        "doc_id",
        *pii_counts(F.col("text")),
        F.md5(scrub_text_col(F.col("text"))).alias("scrubbed_md5"),
    )


def _sql_progressive(col: str, upto: int) -> str:
    """The text after redacting categories [0, upto) — DuckDB side."""
    expr = col
    for name, pat, token in PII_PATTERNS[:upto]:
        expr = f"regexp_replace({expr}, '{pat}', '{token}', 'g')"
    return expr


def scrub_pii_sql(src: str) -> str:
    """The DuckDB mirror of :func:`scrub_pii` over table/CTE ``src``.
    (A function, not a .format template — regex quantifiers like {2,}
    collide with str.format placeholders.)"""
    counts = ", ".join(
        f"CAST(len(regexp_extract_all({_sql_progressive('text', i)}, "
        f"'{pat}')) AS BIGINT) AS n_{name}"
        for i, (name, pat, _) in enumerate(PII_PATTERNS)
    )
    return (
        f"SELECT doc_id, {counts}, "
        f"md5({_sql_progressive('text', len(PII_PATTERNS))}) AS scrubbed_md5 "
        f"FROM {src}"
    )
