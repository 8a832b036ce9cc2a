"""59-language detector: three-mirror parity + accuracy.

The Spark Column form (language_expr), the DuckDB SQL form
(language_sql) and the pure-Python form (model.detect_language) must
produce the same code for every sample sentence — and that code must be
the sentence's own language (the accuracy bar the langid_wide gate's
engine-vs-engine compare alone can't prove).
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from azure_pdf_parser_spark.functions.text import (
    LANG_PROFILES,
    LANGID_WIDE_SENTENCES,
    language_expr,
    language_sql,
)
from azure_pdf_parser_spark.model import detect_language
from tests.conftest import SF_DIR
from tests.oracle_utils import compare_query

EDGE_TEXTS = [
    "",
    None,
    "zzz qqq",
    "中",
    "é ß",
    "𝄞 the and of to",
    "the и не в but the and of",  # mixed-script: en stopwords outnumber ru
    "MixedCase The And Of",  # lowercase-only matching
]


def test_every_sentence_detects_as_its_own_language():
    for lang, sent in LANGID_WIDE_SENTENCES.items():
        assert detect_language(sent) == lang, (lang, detect_language(sent))


def test_profiles_cover_59_languages_sorted():
    assert len(LANG_PROFILES) == 59
    assert list(LANG_PROFILES) == sorted(LANG_PROFILES)
    assert list(LANGID_WIDE_SENTENCES) == list(LANG_PROFILES)


def test_three_mirrors_agree(spark):
    texts = list(LANGID_WIDE_SENTENCES.values()) + EDGE_TEXTS
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id int, text string"
    )
    sp = {
        r.id: r.lang
        for r in df.select("id", language_expr("text").alias("lang")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(id INT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(texts)))
    dk = dict(con.execute(f"SELECT id, {language_sql('text')} FROM t").fetchall())
    for i, t in enumerate(texts):
        py = detect_language(t)
        assert sp[i] == dk[i] == py, (repr(t)[:50], sp[i], dk[i], py)


def test_langid_wide_gate_matches_oracle(spark):
    compare_query(spark, SF_DIR, "langid_wide")
