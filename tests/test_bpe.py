"""Property tests for the BPE trainer/encoder (functions/bpe.py).

Three contracts, each against an independent implementation:

- **Spark vs pure-Python reference**: bpe_train's merge table and final
  vocab must equal a from-scratch Python implementation of the same
  replace-based greedy merge (left-to-right scan, no rescan of
  replacements, count DESC then lexicographic tie-break) on both a
  hand-built corpus with adversarial shapes (consecutive merge sites,
  overlapping candidates, single-char words) and a fixture slice.
- **Spark vs DuckDB oracle**: the sql_bpe_train / sql_bpe_encode_stats
  renderings produce identical rows on the fixture documents table —
  the same parity the driver's judged comparator enforces.
- **Encoder consistency**: per-doc n_tokens from bpe_encode_stats equals
  re-encoding each document with the Python reference vocab.
"""

from __future__ import annotations

import re

import duckdb
import pytest

from pyspark.sql import functions as F

from fictional_guacamole_spark.functions.bpe import (
    bpe_encode_stats, bpe_train, sql_bpe_encode_stats, sql_bpe_train)
from fictional_guacamole_spark.tables import load_table

SF = "/root/testdata/sf0.001"


# --- pure-Python reference --------------------------------------------------

def py_words(text: str) -> list[str]:
    return [w for w in re.sub(r"\s+", " ", text.lower()).strip().split(" ")
            if w]


def py_word_freq(texts: list[str]) -> dict[str, int]:
    freq: dict[str, int] = {}
    for t in texts:
        for w in py_words(t):
            freq[w] = freq.get(w, 0) + 1
    return freq


def py_bpe_train(texts: list[str], n_merges: int):
    freq = py_word_freq(texts)
    vocab = {w: " " + "  ".join(w) + " " for w in freq}
    merges = []
    for rank in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for w, f in freq.items():
            syms = vocab[w].strip().split("  ")
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        (a, b), cnt = min(counts.items(),
                          key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((rank, a, b, cnt))
        vocab = {w: r.replace(f" {a}  {b} ", f" {a}{b} ")
                 for w, r in vocab.items()}
    return merges, vocab


def py_encode_stats(texts_by_doc: dict, vocab: dict[str, str]):
    out = {}
    for doc, text in texts_by_doc.items():
        ws = py_words(text)
        ws = [w for w in ws if w in vocab]
        if not ws:
            continue
        out[doc] = (len(ws),
                    sum(len(vocab[w].strip().split("  ")) for w in ws))
    return out


# --- corpora ---------------------------------------------------------------

ADVERSARIAL = [
    "abab abab ab",          # consecutive merge sites inside one word
    "aaaa aa a",             # overlapping candidates (aa + aa vs a+a)
    "x",                     # single-char word: no pairs
    "banana bandana",        # shared prefixes, tie-break exercise
    "  spaced    out  TEXT ",  # normalization: case + whitespace collapse
    "abab",                  # the merged symbol itself becomes a pair member
]


@pytest.fixture(scope="module")
def fixture_texts(spark):
    rows = (load_table(spark, SF, "documents")
            .filter(F.col("doc_id") < 40)
            .select("doc_id", "text").collect())
    return {r.doc_id: r.text for r in rows}


class TestBpeVsPythonReference:
    @pytest.mark.parametrize("n_merges", [1, 3, 8])
    def test_adversarial_corpus(self, spark, n_merges):
        df = spark.createDataFrame([(t,) for t in ADVERSARIAL], "text string")
        merges, vocab = bpe_train(df, "text", n_merges)
        ref_merges, ref_vocab = py_bpe_train(ADVERSARIAL, n_merges)
        assert merges == ref_merges
        got = {r.w: r.r for r in vocab.collect()}
        assert got == ref_vocab
        vocab.unpersist()

    def test_fixture_slice(self, spark, fixture_texts):
        df = (load_table(spark, SF, "documents")
              .filter(F.col("doc_id") < 40))
        merges, vocab = bpe_train(df, "text", 6)
        ref_merges, ref_vocab = py_bpe_train(
            list(fixture_texts.values()), 6)
        assert merges == ref_merges
        got = {r.w: r.r for r in vocab.collect()}
        assert got == ref_vocab
        vocab.unpersist()

    def test_replace_merges_consecutive_sites_in_one_pass(self, spark):
        # ' a  b  a  b ' must become ' ab  ab ' in ONE merge round — the
        # sentinel-respacing invariant that makes str.replace == greedy BPE
        df = spark.createDataFrame([("abab",)], "text string")
        merges, vocab = bpe_train(df, "text", 1)
        assert merges == [(1, "a", "b", 2)]
        [row] = vocab.collect()
        assert row.r == " ab  ab "
        vocab.unpersist()

    def test_encode_stats_match_reference(self, spark, fixture_texts):
        df = (load_table(spark, SF, "documents")
              .filter(F.col("doc_id") < 40))
        _, vocab = bpe_train(df, "text", 6)
        got = {r.doc: (r.n_words, r.n_tokens)
               for r in bpe_encode_stats(df, "doc_id", "text",
                                         vocab).collect()}
        _, ref_vocab = py_bpe_train(list(fixture_texts.values()), 6)
        assert got == py_encode_stats(fixture_texts, ref_vocab)
        vocab.unpersist()


class TestBpeVsDuckdbOracle:
    @pytest.fixture(scope="class")
    def duck(self):
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS "
                    f"SELECT * FROM '{SF}/documents.parquet'")
        return con

    def test_train_parity(self, spark, duck):
        df = (load_table(spark, SF, "documents")
              .filter(F.col("doc_id") < 40))
        merges, vocab = bpe_train(df, "text", 5)
        vocab.unpersist()
        oracle = duck.execute(
            sql_bpe_train("documents", "text", 5,
                          where="doc_id < 40")).fetchall()
        assert [tuple(m) for m in merges] == [tuple(r) for r in oracle]

    def test_encode_stats_parity(self, spark, duck):
        df = (load_table(spark, SF, "documents")
              .filter(F.col("doc_id") < 40))
        _, vocab = bpe_train(df, "text", 5)
        got = sorted((r.doc, r.n_words, r.n_tokens) for r in
                     bpe_encode_stats(df, "doc_id", "text",
                                      vocab).collect())
        vocab.unpersist()
        oracle = duck.execute(
            sql_bpe_encode_stats("documents", "doc_id", "text", 5,
                                 where="doc_id < 40")).fetchall()
        assert got == [tuple(r) for r in oracle]
