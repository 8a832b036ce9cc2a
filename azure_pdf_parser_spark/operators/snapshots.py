"""Crawl-snapshot diff: classify every document across two corpus
snapshots as added / removed / changed / unchanged.

Engine addition — no reference analog. The first question every
incremental crawl pipeline (CommonCrawl-style monthly snapshots)
answers before recomputing anything: which documents actually changed?
Everything downstream — re-parse, re-dedup (operators/dedup.py's
minhash_index_dedup), re-embed — runs over the ``added + changed``
delta only, which is how a 100 TB corpus refresh stays a 1 TB job.

Test fixture: the sandbox has one documents table, so the two
snapshots are DERIVED from it deterministically (md5(doc_id) hex
digits route docs into old-only / new-only / revised strata; the
"revision" truncates the old text to its first ``REVISED_PREFIX``
chars, so short docs legitimately fall back to unchanged — the status
column is computed from content hashes, never from the strata). At
production scale the two sides are two stored snapshot tables; the
derivation below is only the no-external-data test harness.

Scale posture: one equi-join on doc_id (full outer), map-side md5 of
the text on each side — the exchange carries (doc_id, md5) pairs, 48
bytes/doc, NOT the documents. With both snapshots stored bucketed by
doc_id (the minhash_bucketed_pairs pattern, sinks/table_format.py) the
diff is exchange-free: each bucket pair joins locally, which is the
layout a snapshot store should commit in the first place.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# md5(doc_id) hex-digit strata for the derived test snapshots
OLD_ABSENT = ("0", "1")   # first digit: docs NOT in the old snapshot → added
NEW_ABSENT = ("e", "f")   # first digit: docs NOT in the new snapshot → removed
REVISED = ("0", "1", "2", "3", "4", "5")  # second digit: text revised
REVISED_PREFIX = 200      # the old revision = first 200 chars of text


def _route(doc_id):
    return F.md5(doc_id.cast("string"))


def old_snapshot_docs(documents: DataFrame) -> DataFrame:
    """(doc_id, text): the prior crawl's CONTENT — revised docs carry
    their truncated prior text. The single source of the old-side
    routing: :func:`old_snapshot` hashes it for the diff, the dedup
    index (:func:`snapshot_delta_dedup`) shingles it."""
    route = _route(F.col("doc_id"))
    old_text = F.when(
        F.substring(route, 2, 1).isin(*REVISED),
        F.substring(F.col("text"), 1, REVISED_PREFIX),
    ).otherwise(F.col("text"))
    return documents.where(
        ~F.substring(route, 1, 1).isin(*OLD_ABSENT)
    ).select("doc_id", old_text.alias("text"))


def new_snapshot_docs(documents: DataFrame) -> DataFrame:
    """(doc_id, text): the current crawl's content — the single source
    of the new-side routing."""
    route = _route(F.col("doc_id"))
    return documents.where(
        ~F.substring(route, 1, 1).isin(*NEW_ABSENT)
    ).select("doc_id", "text")


def old_snapshot(documents: DataFrame) -> DataFrame:
    """(doc_id, old_md5, in_old): the prior crawl hashed for the diff.
    NULL text hashes to NULL on both engines (and NULL vs NULL
    compares 'unchanged' via IS DISTINCT FROM)."""
    return old_snapshot_docs(documents).select(
        "doc_id",
        F.md5(F.col("text")).alias("old_md5"),
        F.lit(True).alias("in_old"),
    )


def new_snapshot(documents: DataFrame) -> DataFrame:
    """(doc_id, new_md5, in_new): the current crawl hashed for the diff."""
    return new_snapshot_docs(documents).select(
        "doc_id",
        F.md5(F.col("text")).alias("new_md5"),
        F.lit(True).alias("in_new"),
    )


def snapshot_diff(documents: DataFrame) -> DataFrame:
    """(doc_id, status, old_md5, new_md5), one row per doc present in
    either snapshot. status ∈ {added, removed, changed, unchanged};
    'changed' is content-hash inequality (NULL-safe), never the
    routing strata."""
    old = old_snapshot(documents)
    new = new_snapshot(documents)
    d = old.join(new, ["doc_id"], "full_outer")
    status = (
        F.when(F.col("in_old").isNull(), F.lit("added"))
        .when(F.col("in_new").isNull(), F.lit("removed"))
        .when(
            ~(F.col("old_md5").eqNullSafe(F.col("new_md5"))),
            F.lit("changed"),
        )
        .otherwise(F.lit("unchanged"))
    )
    return d.select("doc_id", status.alias("status"), "old_md5", "new_md5")


# shared strata fragments (``{id}`` = the doc_id column reference):
# the Spark expressions above and every oracle below derive from these
_IN = lambda cs: ", ".join(repr(c) for c in cs)  # noqa: E731
_OLD_FILTER = (
    f"substr(md5(CAST({{id}} AS VARCHAR)), 1, 1) NOT IN ({_IN(OLD_ABSENT)})"
)
_NEW_FILTER = (
    f"substr(md5(CAST({{id}} AS VARCHAR)), 1, 1) NOT IN ({_IN(NEW_ABSENT)})"
)
_OLD_TEXT = (
    f"CASE WHEN substr(md5(CAST({{id}} AS VARCHAR)), 2, 1) IN ({_IN(REVISED)}) "
    f"THEN substr({{text}}, 1, {REVISED_PREFIX}) ELSE {{text}} END"
)

_SNAPSHOT_CTES = f"""
old AS (
    SELECT doc_id,
           md5({_OLD_TEXT.format(id="doc_id", text="text")}) AS old_md5,
           TRUE AS in_old
    FROM documents
    WHERE {_OLD_FILTER.format(id="doc_id")}
),
new AS (
    SELECT doc_id, md5(text) AS new_md5, TRUE AS in_new
    FROM documents
    WHERE {_NEW_FILTER.format(id="doc_id")}
),
diff AS (
    SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
           CASE WHEN o.in_old IS NULL THEN 'added'
                WHEN n.in_new IS NULL THEN 'removed'
                WHEN o.old_md5 IS DISTINCT FROM n.new_md5 THEN 'changed'
                ELSE 'unchanged' END AS status,
           o.old_md5, n.new_md5
    FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
)"""

SNAPSHOT_DIFF_SQL = f"""
WITH {_SNAPSHOT_CTES}
SELECT doc_id, status, old_md5, new_md5 FROM diff
"""


def snapshot_delta_dedup(documents: DataFrame) -> DataFrame:
    """Incremental-refresh near-dedup: probe ONLY the delta
    (added+changed docs, straight off :func:`snapshot_diff`) against
    the LSH band index of the PRIOR snapshot's content — the
    composition every monthly-crawl pipeline runs: diff first, then
    dedup the delta, never the corpus.

    Output (doc_id, dup_of, n_shared_bands): doc_id is a delta doc,
    dup_of a prior-snapshot doc sharing ≥1 LSH band. A CHANGED doc
    matching its own prior revision (doc_id == dup_of) is a real and
    expected row — "this update is a near-dup of what we already
    have" is precisely the signal that suppresses re-embedding
    near-identical revisions.

    Scale shape: the delta is bounded by contract (crawl deltas ≪
    corpus) so its band table broadcasts into one streamed scan of
    the index (:func:`~.dedup.probe_minhash_index`); the index side —
    4×10¹² rows at corpus scale — never shuffles. The diff itself
    exchanges only (doc_id, md5) pairs. Each side's shingle df cap is
    scoped to that side (its own skew universe), mirrored in the
    oracle via ``_bands_cte_sql``.
    """
    from azure_pdf_parser_spark.operators import dedup

    diff = snapshot_diff(documents)
    delta_ids = diff.where(
        F.col("status").isin("added", "changed")
    ).select("doc_id")
    delta_docs = new_snapshot_docs(documents).join(
        delta_ids, ["doc_id"], "left_semi"
    )
    index = dedup.lsh_bands(old_snapshot_docs(documents))
    return dedup.probe_minhash_index(index, delta_docs)


def snapshot_delta_dedup_sql() -> str:
    from azure_pdf_parser_spark.operators.dedup import _bands_cte_sql

    old_filter = _OLD_FILTER.format(id="d.doc_id")
    old_text = _OLD_TEXT.format(id="d.doc_id", text="d.text")
    new_filter = (
        _NEW_FILTER.format(id="d.doc_id")
        + " AND d.doc_id IN (SELECT doc_id FROM delta)"
    )
    return (
        f"WITH {_SNAPSHOT_CTES},\n"
        "delta AS (\n"
        "    SELECT doc_id FROM diff WHERE status IN ('added', 'changed')\n"
        "),"
        + _bands_cte_sql("hist", old_filter, text_expr=old_text)
        + ","
        + _bands_cte_sql("probe", new_filter)
        + """
SELECT p.doc_id, x.doc_id AS dup_of,
       CAST(count(DISTINCT p.band_idx) AS BIGINT) AS n_shared_bands
FROM probe_bands p JOIN hist_bands x
  ON p.band_idx = x.band_idx AND p.band_hash = x.band_hash
GROUP BY p.doc_id, x.doc_id
"""
    )
