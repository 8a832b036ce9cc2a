"""Property-based dual-engine parity: hypothesis-generated documents
(unicode, empty strings, repeated spaces, quotes, long runs) must flow
through the Spark extraction and the DuckDB oracle SQL identically —
the adversarial complement of the fixed-corpus gate.

One Spark session (fixture) serves all examples; each example writes a
tiny parquet and compares two queries end-to-end.
"""

from __future__ import annotations

import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.oracle_utils import compare_query

# text: printable ASCII + some multi-byte unicode + spaces; includes
# SQL-quote and regex metacharacters on purpose
_text = st.one_of(
    # NULL text is a real corpus state (failed parse) — the round-1
    # langid/repetition NULL divergences were invisible because the
    # strategy never generated it
    st.none(),
    st.text(
        alphabet=st.sampled_from(
            list("abcdefgh ij klm'\"%_\\.()[]*+?|^$- ") + ["é", "ß", "中", "𝄞"]
        ),
        min_size=0,
        max_size=120,
    ),
)

_docs = st.lists(
    st.tuples(st.integers(min_value=0, max_value=10**6), _text),
    min_size=1,
    max_size=12,
    unique_by=lambda t: t[0],
)


def _write_sf_dir(rows) -> str:
    tmp = tempfile.mkdtemp(prefix="prop_sf_")
    ids, texts = zip(*rows)
    table = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["xx"] * len(ids), pa.string()),
            "source": pa.array(["prop"] * len(ids), pa.string()),
            "n_chars": pa.array(
                [len(t) if t is not None else 0 for t in texts], pa.int64()
            ),
        }
    )
    pq.write_table(table, os.path.join(tmp, "documents.parquet"))
    return tmp


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_docs)
def test_extract_matches_oracle_on_random_docs(spark, rows):
    sf_dir = _write_sf_dir(rows)
    compare_query(spark, sf_dir, "extract_spans")


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_docs)
def test_parser_output_matches_oracle_on_random_docs(spark, rows):
    sf_dir = _write_sf_dir(rows)
    compare_query(spark, sf_dir, "parser_output")


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_docs)
def test_quality_matches_oracle_on_random_docs(spark, rows):
    sf_dir = _write_sf_dir(rows)
    compare_query(spark, sf_dir, "quality_scores")


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_docs)
def test_token_stats_matches_oracle_on_random_docs(spark, rows):
    """BPE-ish regex token counting: Java regex (UTF-16) vs RE2
    (codepoints) must agree on astral chars, metachars, empties."""
    sf_dir = _write_sf_dir(rows)
    compare_query(spark, sf_dir, "token_stats")


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_docs)
def test_repetition_stats_matches_oracle_on_random_docs(spark, rows):
    sf_dir = _write_sf_dir(rows)
    compare_query(spark, sf_dir, "repetition_stats")


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_docs)
def test_langid_matches_oracle_on_random_docs(spark, rows):
    sf_dir = _write_sf_dir(rows)
    compare_query(spark, sf_dir, "langid")


_pii_fragment = st.sampled_from(
    [
        "bob@example.com",
        "a.b-c_d@mail.co.uk",
        "@not an email",
        "10.0.0.1",
        "999.999.999.999",
        "1.2.3.4.5.6",
        "123-45-6789",
        "12-345-6789",
        "+1 (555) 010-9999",
        "call 5551234567 now",
        "version 1.2.33",
        "x@y.zz",
    ]
)

_pii_text = st.one_of(
    st.none(),
    st.lists(
        st.one_of(
            _pii_fragment,
            st.text(
                alphabet=st.sampled_from(list("ab 0123456789.@-+()")),
                min_size=0,
                max_size=20,
            ),
        ),
        min_size=0,
        max_size=6,
    ).map(" ".join),
)

_pii_docs = st.lists(
    st.tuples(st.integers(min_value=0, max_value=10**6), _pii_text),
    min_size=1,
    max_size=10,
    unique_by=lambda t: t[0],
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_pii_docs)
def test_pii_scrub_matches_oracle_on_adversarial_text(spark, rows):
    """The PII regexes live in the common Java/RE2 subset — hypothesis
    hammers the boundary cases (adjacent matches, over-long IPs, almost-
    SSNs, NULL text) where greedy-match or escape dialects could split
    the two engines."""
    sf_dir = _write_sf_dir(rows)
    compare_query(spark, sf_dir, "pii_scrub")


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_docs)
def test_chunk_documents_matches_oracle_on_random_docs(spark, rows):
    """Chunk boundaries ride string_split semantics: repeated spaces,
    empty strings, and multi-byte tokens must slice identically
    (Spark slice(length) vs DuckDB list_slice(inclusive end))."""
    sf_dir = _write_sf_dir(rows)
    compare_query(spark, sf_dir, "chunk_documents")


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_docs)
def test_snapshot_diff_matches_oracle_on_random_docs(spark, rows):
    """Status classification must agree on NULL text (md5(NULL) → NULL
    on both engines, compared NULL-safe) and on unicode md5 (UTF-8
    bytes on both sides)."""
    sf_dir = _write_sf_dir(rows)
    compare_query(spark, sf_dir, "snapshot_diff")
