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


def old_snapshot(documents: DataFrame) -> DataFrame:
    """(doc_id, old_md5, in_old): the prior crawl. Revised docs carry
    the md5 of their truncated prior text; NULL text hashes to NULL on
    both engines (and NULL vs NULL compares 'unchanged' via
    IS DISTINCT FROM)."""
    route = _route(F.col("doc_id"))
    old_text = F.when(
        F.substring(route, 2, 1).isin(*REVISED),
        F.substring(F.col("text"), 1, REVISED_PREFIX),
    ).otherwise(F.col("text"))
    return documents.where(
        ~F.substring(route, 1, 1).isin(*OLD_ABSENT)
    ).select(
        "doc_id",
        F.md5(old_text).alias("old_md5"),
        F.lit(True).alias("in_old"),
    )


def new_snapshot(documents: DataFrame) -> DataFrame:
    """(doc_id, new_md5, in_new): the current crawl, text as stored."""
    route = _route(F.col("doc_id"))
    return documents.where(
        ~F.substring(route, 1, 1).isin(*NEW_ABSENT)
    ).select(
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


SNAPSHOT_DIFF_SQL = f"""
WITH old AS (
    SELECT doc_id,
           md5(CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)
                         IN ({", ".join(repr(c) for c in REVISED)})
                    THEN substr(text, 1, {REVISED_PREFIX})
                    ELSE text END) AS old_md5,
           TRUE AS in_old
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
          NOT IN ({", ".join(repr(c) for c in OLD_ABSENT)})
),
new AS (
    SELECT doc_id, md5(text) AS new_md5, TRUE AS in_new
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
          NOT IN ({", ".join(repr(c) for c in NEW_ABSENT)})
)
SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
       CASE WHEN o.in_old IS NULL THEN 'added'
            WHEN n.in_new IS NULL THEN 'removed'
            WHEN o.old_md5 IS DISTINCT FROM n.new_md5 THEN 'changed'
            ELSE 'unchanged' END AS status,
       o.old_md5, n.new_md5
FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
"""
