"""Edge cases: empty corpus, positions-free build, randomized small
corpora (the test.pl adversarial spirit applied to the whole pipeline)."""

import random

import pytest
from pyspark.sql import functions as F


def test_empty_corpus_build_and_query(spark, tmp_path):
    from femto_spark.index import build_index
    from femto_spark.query import SearchEngine

    empty = spark.createDataFrame([], "doc_id long, text string")
    out = str(tmp_path / "empty")
    build_index(spark, empty, out, n_buckets=4)
    eng = SearchEngine(spark, out, corpus=empty)
    assert eng.n_docs == 0
    assert eng.search("anything", k=5).count() == 0
    assert eng.count("x").count() == 0


def test_positions_free_build(spark, tmp_path, oracle_sf001):
    from femto_spark.index import build_index
    from femto_spark.query import SearchEngine

    corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "nopos")
    build_index(spark, corpus, out, n_buckets=8, with_positions=False)
    eng = SearchEngine(spark, out, corpus=corpus)
    # scoring/boolean identical without positions
    got = [(r["doc_id"], r["score"]) for r in eng.search("data table scan", k=10).collect()]
    assert got == oracle_sf001.search("data table scan", k=10)
    # index must be materially smaller
    import os

    def du(p):
        return sum(
            os.path.getsize(os.path.join(dp, f))
            for dp, _, fs in os.walk(p) for f in fs
        )

    full = str(tmp_path / "withpos")
    build_index(spark, corpus, full, n_buckets=8, with_positions=True)
    assert du(os.path.join(out, "index")) < 0.8 * du(os.path.join(full, "index"))


def test_randomized_corpora_vs_oracle(spark, tmp_path):
    """Seeded random mini-corpora with adversarial docs: empty text,
    single token, huge tf, unicode — full build → oracle-differential on
    counts and searches (the test.pl loop)."""
    from femto_spark.index import build_index
    from femto_spark.oracle import OracleIndex
    from femto_spark.query import SearchEngine
    from femto_spark.tokenizer import tokenize

    rng = random.Random(1)
    vocab = [f"w{i}" for i in range(30)] + ["naïve", "東京", "x9"]
    docs = {0: "", 1: "w0", 2: " ".join(["w1"] * 500)}
    for d in range(3, 40):
        docs[d] = " ".join(rng.choices(vocab, k=rng.randint(1, 60)))

    corpus = spark.createDataFrame(
        [(d, t) for d, t in docs.items()], "doc_id long, text string"
    )
    out = str(tmp_path / "rand")
    build_index(spark, corpus, out, n_buckets=4, range_shift=4)
    eng = SearchEngine(spark, out, corpus=corpus)
    oracle = OracleIndex(docs)

    assert eng.n_docs == oracle.n_docs
    assert eng.avgdl == pytest.approx(oracle.avgdl, abs=0)

    # every term's stats
    got = {r["term"]: (r["df"], r["cf"]) for r in eng.termstats_df().collect()}
    terms = set()
    for t in docs.values():
        terms.update(tokenize(t))
    for t in terms:
        occ, df = oracle.count(t)
        assert got.get(t) == (df, occ), t

    # random searches, exact + WAND
    for _ in range(8):
        q = " ".join(rng.sample(vocab, rng.randint(1, 3)))
        want = oracle.search(q, k=7)
        got_s = [(r["doc_id"], r["score"]) for r in eng.search(q, k=7).collect()]
        assert got_s == want, q
        got_w = [(r["doc_id"], r["score"]) for r in eng.search_wand(q, k=7).collect()]
        assert got_w == want, q
