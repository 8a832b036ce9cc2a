"""BPE tokenizer train/encode vs a pure-Python Sennrich reference.

Three layers:
1. algorithm equivalences the engine RELIES on — rank-based encoding
   equals replaying merges in training order; the Spark `aggregate`
   fold equals greedy leftmost-first merging (including the odd-run
   cases where naive string-replace approaches diverge);
2. exact end-to-end parity on real sf0.001 data — the trained merge
   sequence and every per-doc token stream match the Python reference
   token for token;
3. plan shape — encode is exchange-free, pair-counts top-k is
   TakeOrderedAndProject.

(The Spark-vs-DuckDB oracle parity for all three gates runs in
tests/test_queries_vs_oracle.py like every other registry entry.)
"""

from __future__ import annotations

import hashlib
import random
import re

import pandas as pd
import pytest
from pyspark.sql import functions as F

from azure_pdf_parser_spark.operators import bpe
from tests.conftest import SF_DIR

DOCS = f"{SF_DIR}/documents.parquet"


# --- pure-Python Sennrich reference -------------------------------------------

def greedy_apply(tokens: list[str], a: str, b: str, m: str) -> list[str]:
    out, i = [], 0
    while i < len(tokens):
        if i + 1 < len(tokens) and tokens[i] == a and tokens[i + 1] == b:
            out.append(m)
            i += 2
        else:
            out.append(tokens[i])
            i += 1
    return out


def train_ref(word_freq: dict[str, int], n_merges: int, min_count: int = 2):
    words = [(list(w), f) for w, f in sorted(word_freq.items())]
    merges = []
    for step in range(1, n_merges + 1):
        pairs: dict[tuple[str, str], int] = {}
        for syms, f in words:
            for x, y in zip(syms, syms[1:]):
                pairs[(x, y)] = pairs.get((x, y), 0) + f
        cand = {k: v for k, v in pairs.items() if v >= min_count}
        if not cand:
            break
        (a, b), c = sorted(cand.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        m = a + b
        merges.append((step, a, b, m, c))
        words = [(greedy_apply(s, a, b, m), f) for s, f in words]
    return merges


def encode_ref(word: str, merges) -> list[str]:
    syms = list(word)
    for _, a, b, m, _ in merges:
        syms = greedy_apply(syms, a, b, m)
    return syms


def corpus_word_freq() -> dict[str, int]:
    texts = pd.read_parquet(DOCS, columns=["text"])["text"]
    wf: dict[str, int] = {}
    for t in texts:
        if isinstance(t, str):
            for w in re.findall("[a-z]+", t.lower()):
                wf[w] = wf.get(w, 0) + 1
    return wf


# --- algorithm equivalences ----------------------------------------------------

def test_rank_encode_equals_sequential():
    """Rank-based encoding (the mapInPandas fast path) must equal
    sequential replay of the merge list — the equivalence the encode
    stage is built on. Random multi-level merge sequences over a small
    alphabet hit the overlap/odd-run/nested-token cases."""
    rng = random.Random(42)
    alphabet = ["a", "b", "c"]
    for _ in range(3000):
        word = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 14)))
        vocab = list(alphabet)
        merges = []
        for step in range(rng.randint(0, 6)):
            a, b = rng.choice(vocab), rng.choice(vocab)
            vocab.append(a + b)
            merges.append((step + 1, a, b, a + b, 1))
        ranks = bpe.merge_ranks(merges)
        assert bpe.encode_word(word, ranks, {}) == encode_ref(word, merges), (
            word,
            merges,
        )


ADVERSARIAL = [
    # odd runs: greedy leftmost gives (cc)(cc)c — the case where
    # space-join + string replace approaches get (cc)c(cc) wrong
    (["c", "c", "c", "c", "c"], ("c", "c")),
    (["a", "b", "a", "b"], ("a", "b")),
    (["a", "a", "a"], ("a", "a")),
    (["x"], ("a", "b")),
    (["a", "b"], ("a", "b")),
    (["b", "a"], ("a", "b")),
    (["ab", "a", "b", "ab"], ("a", "b")),
    (["a", "ab", "b"], ("a", "b")),
]


def test_merge_apply_expr_matches_greedy(spark):
    """The JVM `aggregate` fold must merge greedy leftmost-first,
    exactly like the Python reference, on the adversarial shapes."""
    for i, (syms, (a, b)) in enumerate(ADVERSARIAL):
        df = spark.createDataFrame([(i, syms)], "id int, symbols array<string>")
        got = df.select(
            bpe._merge_apply_expr(a, b, a + b).alias("symbols")
        ).collect()[0].symbols
        assert got == greedy_apply(syms, a, b, a + b), (syms, (a, b), got)


def test_merge_apply_expr_rejects_unsafe_tokens():
    with pytest.raises(ValueError):
        bpe._merge_apply_expr("a'b", "c", "a'bc")


# --- end-to-end parity on real data -------------------------------------------

def test_train_matches_python_reference(spark):
    wf = corpus_word_freq()
    ref = train_ref(wf, bpe.N_MERGES, bpe.MIN_PAIR_COUNT)
    docs = spark.read.parquet(DOCS)
    got = [
        (r.step, r.lhs, r.rhs, r.merged, r.pair_count)
        for r in bpe.bpe_train(docs).orderBy("step").collect()
    ]
    assert got == ref


def test_encode_matches_python_reference(spark):
    wf = corpus_word_freq()
    merges = train_ref(wf, bpe.N_MERGES, bpe.MIN_PAIR_COUNT)
    enc_cache = {w: encode_ref(w, merges) for w in wf}

    expected = {}
    pdf = pd.read_parquet(DOCS, columns=["doc_id", "text"])
    for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
        if not isinstance(text, str):
            continue
        words = re.findall("[a-z]+", text.lower())
        if not words:
            continue
        toks = [t for w in words for t in enc_cache[w]]
        expected[int(doc_id)] = (
            len(words),
            len(toks),
            hashlib.md5(" ".join(toks).encode()).hexdigest(),
        )

    docs = spark.read.parquet(DOCS)
    got = {
        int(r.doc_id): (r.n_words, r.n_bpe_tokens, r.stream_md5)
        for r in bpe.bpe_encode(docs).collect()
    }
    assert got == expected


def test_word_cap_is_take_ordered(spark):
    """max_words must plan as TakeOrderedAndProject — never a global
    rank window (the lm_vocab lesson: one reducer over Heaps-law
    distinct words is the scale-killer)."""
    docs = spark.read.parquet(DOCS)
    plan = bpe.word_counts(docs, max_words=10)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan


# --- plan shape -----------------------------------------------------------------

def test_encode_with_fixed_merges_is_exchange_free(spark):
    """Encoding with a trained merge table is one mapInPandas pass:
    no Exchange of any kind — at 100 TB this runs as a pass-through."""
    docs = spark.read.parquet(DOCS)
    merges = [(1, "e", "r", "er", 100), (2, "o", "r", "or", 50)]
    plan = (
        bpe.bpe_encode_with(docs, merges)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def test_pair_counts_topk_is_take_ordered(spark):
    docs = spark.read.parquet(DOCS)
    plan = (
        bpe.bpe_pair_counts(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan, plan


def test_train_stops_when_pairs_exhaust(spark):
    """min_count acts as the stopping rule: a corpus whose every pair
    is unique trains zero merges (and the gate yields 0 rows, not an
    error)."""
    docs = spark.createDataFrame(
        [(1, "ab"), (2, "cd")], "doc_id bigint, text string"
    )
    assert bpe.bpe_train_merges(docs) == []
    assert bpe.bpe_train(docs).count() == 0


def test_merge_table_save_load_roundtrip(spark, tmp_path):
    """The persisted tokenizer model reloads bit-identically and
    encodes identically through bpe_encode_with — the lifecycle seam
    the bpe_lifecycle gate drives end-to-end."""
    docs = spark.read.parquet(DOCS)
    trained = bpe.bpe_train_merges(docs)
    path = str(tmp_path / "merges")
    bpe.save_merges(spark.createDataFrame(trained, bpe._MERGES_SCHEMA), path)
    loaded = bpe.load_merges(spark, path)
    assert loaded == trained
    direct = {
        r.doc_id: r.stream_md5
        for r in bpe.bpe_encode_with(docs, trained).collect()
    }
    via_disk = {
        r.doc_id: r.stream_md5
        for r in bpe.bpe_encode_with(docs, loaded).collect()
    }
    assert via_disk == direct
