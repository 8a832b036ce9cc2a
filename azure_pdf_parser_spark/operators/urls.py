"""URL / domain curation: the provenance-based filter family.

C4 removes documents by URL blocklist, RefinedWeb dedups by URL and
caps per-domain volume, Gopher weights domains — every production
crawl pipeline filters on WHERE a document came from, not only on its
text. Reference analog: none (azure-pdf-parser receives documents
individually and keeps only ``document_source_url`` as an opaque
passthrough field, models.py via ParserInput); this suite is an engine
addition like the quality/dedup neighbors.

URL source
----------
The sandbox ``documents`` table carries ``source`` (a registrar-like
label) but no URL column, so :func:`synthesize_url` derives one
deterministically — ``https://{sub}.{source}.example.com/{seg0}/
{seg1}/{doc_id}.html`` with subdomain and path segments taken from md5
nibbles of the doc_id (the same derivation-seam pattern as layoutize's
``cdn_object``). In production the column comes straight off the crawl
record and every operator below runs unchanged on it.

Operators
---------
* :func:`url_features` — map-only parse: host, registered domain,
  TLD, path depth, and a C4-style blocklist verdict (spammy path
  token). Pure regexp/split codegen, zero exchange: a pass-through
  stage at any corpus size.
* :func:`domain_cap` — RefinedWeb-style per-domain volume cap: keep
  at most ``k`` documents per registered domain, selected by
  deterministic md5 rank (growth-stable: adding documents never evicts
  a kept doc with a lower hash). One shuffle on the domain key;
  the ``row_number() <= k`` filter compiles to WindowGroupLimit, so
  each map task forwards only its local top-k per domain — the
  exchange moves O(domains·k) rows, not the corpus, which is what
  makes an exact cap survive a hot domain with 10⁹ pages.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# path tokens C4-style blocklists catch (spam/adult markers); kept tiny
# and documented — the production seam swaps in a real blocklist table.
BLOCKED_PATH_TOKENS = ("casino", "xxx", "loan")

DEFAULT_DOMAIN_CAP = 100


def _nib(h: Column, i: int) -> Column:
    return F.substring(h, i, 1)


def synthesize_url(doc_id: Column, source: Column) -> Column:
    """Deterministic URL for a (doc_id, source) pair — derivation seam,
    mirrored verbatim in :data:`URL_SQL`. Nibbles 1-3 of
    md5(doc_id || ':url') pick the subdomain and two path segments;
    nibble 4 injects a blocked token into ~3/16 of URLs so the
    blocklist rule has both outcomes to verify against."""
    h = F.md5(F.concat(doc_id.cast("string"), F.lit(":url")))
    sub = F.concat(F.lit("w"), _nib(h, 1))
    seg0 = F.concat(F.lit("s"), _nib(h, 2))
    seg1 = F.when(
        _nib(h, 4).isin("0", "1", "2"),
        F.element_at(
            F.array(*[F.lit(t) for t in BLOCKED_PATH_TOKENS]),
            (F.conv(_nib(h, 4), 16, 10).cast("int") % len(BLOCKED_PATH_TOKENS)) + 1,
        ),
    ).otherwise(F.concat(F.lit("p"), _nib(h, 3)))
    return F.concat_ws(
        "",
        F.lit("https://"),
        sub, F.lit("."), source, F.lit(".example.com/"),
        seg0, F.lit("/"), seg1, F.lit("/"),
        doc_id.cast("string"), F.lit(".html"),
    )


URL_SQL = """concat(
    'https://w', substr(h, 1, 1), '.', source, '.example.com/',
    's', substr(h, 2, 1), '/',
    CASE WHEN substr(h, 4, 1) IN ('0','1','2')
         THEN (['casino','xxx','loan'])[
             CAST(('0x' || substr(h, 4, 1)) AS BIGINT) % 3 + 1]
         ELSE 'p' || substr(h, 3, 1) END, '/',
    CAST(doc_id AS VARCHAR), '.html')"""

URL_SQL_CTE = f"""
urls AS (
    SELECT doc_id, source, {URL_SQL} AS url
    FROM (SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR) || ':url') AS h
          FROM documents)
)
"""


_HOST_RE = r"^https?://([^/]+)/"
# registered domain = last 3 labels here (example.com is the public
# suffix in the synthetic space); a production deployment swaps in a
# public-suffix-list lookup, same column contract.
_DOMAIN_RE = r"([^./]+\.[^./]+\.[^./]+)$"


def url_features(documents: DataFrame) -> DataFrame:
    """(doc_id, url, host, domain, tld, path_depth, blocked) — map-only
    codegen (regexp + split), no exchange of any kind."""
    url = synthesize_url(F.col("doc_id"), F.col("source"))
    host = F.regexp_extract(url, _HOST_RE, 1)
    path = F.regexp_replace(url, r"^https?://[^/]+", "")
    blocked = F.lit(False)
    for tok in BLOCKED_PATH_TOKENS:
        blocked = blocked | path.contains(f"/{tok}/")
    return documents.select(
        "doc_id",
        url.alias("url"),
        host.alias("host"),
        F.regexp_extract(host, _DOMAIN_RE, 1).alias("domain"),
        F.element_at(F.split(host, r"\."), -1).alias("tld"),
        (F.size(F.split(path, "/")) - 2).cast("int").alias("path_depth"),
        blocked.alias("blocked"),
    )


def domain_cap(
    documents: DataFrame, k: int = DEFAULT_DOMAIN_CAP
) -> DataFrame:
    """Keep at most ``k`` docs per registered domain: deterministic
    md5-rank selection (the same growth-stable hash family as
    operators/sampling.py). Returns the SURVIVORS only — (doc_id,
    domain, domain_rank) — because the rank filter is what makes the
    op scale: ``row_number() <= k`` plans as WindowGroupLimit (pinned
    by test), each map task pre-truncates to its local top-k per
    domain before the shuffle, so a domain with 10⁹ pages moves
    n_partitions·k rows through the one domain-keyed exchange, never
    10⁹. The dropped set, when needed for audit, is a left_anti join
    against this output — still bounded by the same exchange.
    """
    from pyspark.sql.window import Window

    feats = url_features(documents).select("doc_id", "domain")
    h = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":cap")))
    w = Window.partitionBy("domain").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        feats.withColumn("domain_rank", F.row_number().over(w).cast("int"))
        .where(F.col("domain_rank") <= k)
        .select("doc_id", "domain", "domain_rank")
    )


def domain_cap_sql(k: int = DEFAULT_DOMAIN_CAP) -> str:
    return f"""
WITH {URL_SQL_CTE.strip()},
feat AS (
    SELECT doc_id,
           regexp_extract(regexp_extract(url, '^https?://([^/]+)/', 1),
                          '([^./]+\\.[^./]+\\.[^./]+)$', 1) AS domain
    FROM urls
),
ranked AS (
    SELECT doc_id, domain,
           CAST(row_number() OVER (
               PARTITION BY domain
               ORDER BY md5(CAST(doc_id AS VARCHAR) || ':cap'), doc_id
           ) AS INT) AS domain_rank
    FROM feat
)
SELECT doc_id, domain, domain_rank
FROM ranked WHERE domain_rank <= {k}
"""


def url_features_sql() -> str:
    blocked = " OR ".join(
        f"path LIKE '%/{tok}/%'" for tok in BLOCKED_PATH_TOKENS
    )
    return f"""
WITH {URL_SQL_CTE.strip()},
parts AS (
    SELECT doc_id, url,
           regexp_extract(url, '^https?://([^/]+)/', 1) AS host,
           regexp_replace(url, '^https?://[^/]+', '') AS path
    FROM urls
)
SELECT doc_id, url, host,
       regexp_extract(host, '([^./]+\\.[^./]+\\.[^./]+)$', 1) AS domain,
       string_split(host, '.')[-1] AS tld,
       CAST(len(string_split(path, '/')) - 2 AS INT) AS path_depth,
       ({blocked}) AS blocked
FROM parts
"""


# --- URL canonicalization -----------------------------------------------------

# tracking params stripped by canonicalization (C4/CCNet-style URL
# dedup normalizes before hashing; production seam: a fuller param
# blocklist table, same column contract)
_TRACKING_PREFIX = "utm_"


def synthesize_messy_url(doc_id: Column, source: Column) -> Column:
    """Derivation seam for :func:`url_canonicalize`: the
    :func:`synthesize_url` URL made deliberately non-canonical by
    nibbles of a SECOND hash — upper-cased scheme+host (~1/2), an
    appended query with hash-ordered params including a tracking param
    (~1/2) and a ref param (~1/4), and a fragment (~1/2) — so every
    canonicalization rule has both outcomes to verify against.
    Mirrored verbatim in :data:`MESSY_URL_SQL_CTE`."""
    base = synthesize_url(doc_id, source)
    h2 = F.md5(F.concat(doc_id.cast("string"), F.lit(":urlq")))
    upper_host = F.conv(_nib(h2, 1), 16, 10).cast("int") < 8
    with_utm = F.conv(_nib(h2, 2), 16, 10).cast("int") < 8
    with_ref = F.conv(_nib(h2, 3), 16, 10).cast("int") < 4
    reversed_order = F.conv(_nib(h2, 4), 16, 10).cast("int") < 8
    with_frag = F.conv(_nib(h2, 5), 16, 10).cast("int") < 8

    cased = F.when(
        upper_host,
        F.concat(
            F.upper(F.regexp_extract(base, r"^([^/]*//[^/]+)", 1)),
            F.regexp_replace(base, r"^[^/]*//[^/]+", ""),
        ),
    ).otherwise(base)
    empty = F.array().cast("array<string>")
    id_p = F.array(F.concat(F.lit("id="), doc_id.cast("string")))
    utm_p = F.when(with_utm, F.array(F.lit("utm_source=news"))).otherwise(empty)
    ref_p = F.when(with_ref, F.array(F.lit("ref=z"))).otherwise(empty)
    params = F.when(
        reversed_order, F.concat(utm_p, ref_p, id_p)
    ).otherwise(F.concat(id_p, ref_p, utm_p))
    return F.concat(
        cased,
        F.lit("?"),
        F.array_join(params, "&"),
        F.when(with_frag, F.lit("#sec")).otherwise(F.lit("")),
    )


MESSY_URL_SQL_CTE = f"""
messy AS (
    SELECT doc_id, source,
           CASE WHEN CAST(('0x' || substr(h2, 1, 1)) AS INT) < 8
                THEN upper(regexp_extract(url, '^([^/]*//[^/]+)', 1))
                     || regexp_replace(url, '^[^/]*//[^/]+', '')
                ELSE url END
           || '?'
           || array_to_string(
                CASE WHEN CAST(('0x' || substr(h2, 4, 1)) AS INT) < 8
                     THEN list_concat(list_concat(utm_p, ref_p), id_p)
                     ELSE list_concat(list_concat(id_p, ref_p), utm_p)
                END, '&')
           || CASE WHEN CAST(('0x' || substr(h2, 5, 1)) AS INT) < 8
                   THEN '#sec' ELSE '' END AS url
    FROM (
        SELECT doc_id, source, url, h2,
               ['id=' || CAST(doc_id AS VARCHAR)] AS id_p,
               CASE WHEN CAST(('0x' || substr(h2, 2, 1)) AS INT) < 8
                    THEN ['utm_source=news'] ELSE []::VARCHAR[] END AS utm_p,
               CASE WHEN CAST(('0x' || substr(h2, 3, 1)) AS INT) < 4
                    THEN ['ref=z'] ELSE []::VARCHAR[] END AS ref_p
        FROM (SELECT doc_id, source, {URL_SQL} AS url,
                     md5(CAST(doc_id AS VARCHAR) || ':urlq') AS h2
              FROM (SELECT doc_id, source,
                           md5(CAST(doc_id AS VARCHAR) || ':url') AS h
                    FROM documents))
    )
)
"""


def canonicalize_expr(url: Column) -> Column:
    """Canonical form of any URL column: drop the fragment, lowercase
    scheme+host, drop ``utm_*`` tracking params, sort the surviving
    query params. Pure codegen string/array ops — map-only, the same
    pass-through shape as :func:`url_features`."""
    no_frag = F.split(url, "#")[0]
    base = F.split(no_frag, r"\?")[0]
    query = F.get(F.split(no_frag, r"\?"), 1)
    lowered = F.concat(
        F.lower(F.regexp_extract(base, r"^([^/]*//[^/]+)", 1)),
        F.regexp_replace(base, r"^[^/]*//[^/]+", ""),
    )
    kept = F.array_sort(
        F.filter(
            F.split(F.coalesce(query, F.lit("")), "&"),
            lambda x: (~x.startswith(_TRACKING_PREFIX)) & (x != ""),
        )
    )
    return F.when(F.size(kept) > 0, F.concat(lowered, F.lit("?"), F.array_join(kept, "&"))).otherwise(lowered)


def url_canonicalize(documents: DataFrame) -> DataFrame:
    """(doc_id, url, canonical_url): the URL-dedup normalization pass.
    Map-only, zero exchange (plan-pinned) — at any corpus size this
    fuses into the scan like the other provenance features."""
    url = synthesize_messy_url(F.col("doc_id"), F.col("source"))
    return documents.select("doc_id", url.alias("url")).select(
        "doc_id",
        "url",
        canonicalize_expr(F.col("url")).alias("canonical_url"),
    )


def canonicalize_sql_ctes(src: str, key_cols: str = "doc_id") -> str:
    """split/canon CTE chain + final SELECT list mirroring
    :func:`canonicalize_expr` over any relation ``src(key_cols…, url)``
    — single-sourced so every gate that canonicalizes (url_canonicalize,
    html_link_extract) shares the exact SQL restatement."""
    return f"""
split AS (
    SELECT {key_cols}, url,
           split_part(split_part(url, '#', 1), '?', 1) AS base,
           split_part(split_part(url, '#', 1), '?', 2) AS query
    FROM {src}
),
canon AS (
    SELECT {key_cols}, url,
           lower(regexp_extract(base, '^([^/]*//[^/]+)', 1))
             || regexp_replace(base, '^[^/]*//[^/]+', '') AS lowered,
           list_sort(list_filter(string_split(query, '&'),
               x -> NOT starts_with(x, '{_TRACKING_PREFIX}') AND x <> '')) AS kept
    FROM split
)
SELECT {key_cols}, url,
       CASE WHEN len(kept) > 0
            THEN lowered || '?' || array_to_string(kept, '&')
            ELSE lowered END AS canonical_url
FROM canon"""


def url_canonicalize_sql() -> str:
    return (
        f"WITH {MESSY_URL_SQL_CTE.strip()},"
        + canonicalize_sql_ctes("messy")
        + "\n"
    )


# --- Domain-level quality curation ---------------------------------------------

DOMAIN_QUALITY_THRESHOLD_MILLI = 0
DOMAIN_QUALITY_MIN_DOCS = 3


def domain_quality(
    documents: DataFrame,
    threshold_milli: int = DOMAIN_QUALITY_THRESHOLD_MILLI,
    min_docs: int = DOMAIN_QUALITY_MIN_DOCS,
) -> DataFrame:
    """(domain, n_docs, n_tokens, weight_sum, keep_domain): DOMAIN-level
    quality curation — aggregate the per-doc classifier signal to the
    registered domain and judge the whole domain, the RefinedWeb/CCNet
    practice of dropping entire hosts whose aggregate quality is junk
    (per-doc filters leak a bad site's best pages; domain verdicts
    don't).

    keep_domain ⇔ n_docs ≥ min_docs (enough evidence) AND the domain's
    MEAN token milli-weight ≥ threshold — compared in exact integer
    cross-multiplication, no division. Scale shape: the per-doc scores
    arrive from one uniform-key aggregation (classifier plan); the
    domain rollup is one more map-side-combined groupBy on the domain
    key; the doc→domain attach is the map-only URL derivation, so no
    join of two corpus-sized tables ever happens.
    """
    from azure_pdf_parser_spark.operators.classifier import classifier_scores

    feats = url_features(documents).select("doc_id", "domain")
    scores = classifier_scores(documents)
    per_doc = scores.join(feats, "doc_id")
    agg = per_doc.groupBy("domain").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        F.sum("weight_sum").cast("bigint").alias("weight_sum"),
    )
    keep = (F.col("n_docs") >= min_docs) & (
        F.col("weight_sum") >= F.lit(threshold_milli) * F.col("n_tokens")
    )
    return agg.select(
        "domain", "n_docs", "n_tokens", "weight_sum", keep.alias("keep_domain")
    )


def domain_quality_sql(
    threshold_milli: int = DOMAIN_QUALITY_THRESHOLD_MILLI,
    min_docs: int = DOMAIN_QUALITY_MIN_DOCS,
) -> str:
    from azure_pdf_parser_spark.operators.classifier import (
        per_doc_score_cte_sql,
    )

    return f"""
WITH {URL_SQL_CTE.strip()},
feat AS (
    SELECT doc_id,
           regexp_extract(regexp_extract(url, '^https?://([^/]+)/', 1),
                          '([^./]+\\.[^./]+\\.[^./]+)$', 1) AS domain
    FROM urls
),
{per_doc_score_cte_sql()},
dom AS (
    SELECT feat.domain,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(per_doc.n_tokens) AS BIGINT) AS n_tokens,
           CAST(sum(per_doc.weight_sum) AS BIGINT) AS weight_sum
    FROM per_doc JOIN feat ON per_doc.doc_id = feat.doc_id
    GROUP BY feat.domain
)
SELECT domain, n_docs, n_tokens, weight_sum,
       (n_docs >= {min_docs} AND weight_sum >= {threshold_milli} * n_tokens)
           AS keep_domain
FROM dom
"""
