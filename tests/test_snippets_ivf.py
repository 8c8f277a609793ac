"""Snippets (CONTEXT analogue), docs_for_range, and IVF ANN."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from femto_spark.tokenizer import tokenize


def test_docs_for_range(engine, oracle_sf001):
    got = [r["doc_id"] for r in engine.docs_for_range(100, 150).collect()]
    assert got == list(range(100, 150))
    got_t = [r["doc_id"] for r in engine.docs_for_range(0, 200, term="merge").collect()]
    want = sorted(d for d in oracle_sf001.postings.get("merge", {}) if d < 200)
    assert got_t == want


def test_snippets_contain_match(engine, docs_sf001, oracle_sf001):
    rows = engine.snippets("merge", k=5, width=3).collect()
    want_top = oracle_sf001.search("merge", k=5)
    assert [r["doc_id"] for r in rows] == [d for d, _ in want_top]
    for r in rows:
        toks = tokenize(docs_sf001[r["doc_id"]])
        assert toks[r["first_pos"]] == "merge"
        assert "merge" in r["snippet"].split()
        # snippet is the +-3 token window around first_pos
        lo = max(r["first_pos"] - 3, 0)
        assert r["snippet"].split() == toks[lo : lo + 7]


def test_ivf_topk_selfhit_and_recall(spark):
    from femto_spark.ops.similarity import brute_force_topk, ivf_topk

    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = embs.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = ivf_topk(embs, q, k=5, n_centroids=8, nprobe=3)
    rank1 = {r["query_id"]: r["vec_id"] for r in got.collect() if r["rank"] == 1}
    for i in range(5):
        assert rank1[i] == i  # a query's own cell always probed → self-hit

    # recall@5 vs brute force with generous probing
    exact = brute_force_topk(embs, q, k=5)
    want = {}
    for r in exact.collect():
        want.setdefault(r["query_id"], set()).add(r["vec_id"])
    approx = ivf_topk(embs, q, k=5, n_centroids=8, nprobe=8)  # probe all ⇒ exact
    got_all = {}
    for r in approx.collect():
        got_all.setdefault(r["query_id"], set()).add(r["vec_id"])
    assert got_all == want  # nprobe == C must equal brute force


def test_ivf_deterministic(spark):
    from femto_spark.ops.similarity import train_ivf_centroids

    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = train_ivf_centroids(embs, 8)
    b = train_ivf_centroids(embs, 8)
    assert np.array_equal(a, b)


def test_fielded_search_filter(spark, tmp_path, docs_sf001, oracle_sf001):
    """search(where={...}) filters on indexed metadata fields (FEMTO doc
    header sections): result = global-stats BM25 restricted to the field
    match — and incremental append preserves the field columns."""
    from pyspark.sql import functions as F

    from femto_spark.index import build_index
    from femto_spark.index.incremental import merge_into
    from femto_spark.query import SearchEngine

    corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "fielded")
    build_index(
        spark, corpus.filter(F.col("doc_id") < 400), out, n_buckets=8,
        field_cols=["lang", "source"],
    )
    merge_into(spark, out, corpus.filter(F.col("doc_id") >= 400))
    eng = SearchEngine(spark, out, corpus=corpus)

    langs = {
        r["doc_id"]: r["lang"] for r in corpus.select("doc_id", "lang").collect()
    }
    got = [(r["doc_id"], r["score"]) for r in eng.search(
        "data table scan", k=10, where={"lang": "en"}
    ).collect()]
    want = [
        (d, s) for d, s in oracle_sf001.search("data table scan", k=10**6)
        if langs[d] == "en"
    ][:10]
    assert got == want
    # multi-value filter
    got2 = {r["doc_id"] for r in eng.search(
        "data", k=10**6, where={"lang": ["en", "de"]}
    ).collect()}
    assert got2 == {
        d for d, _ in oracle_sf001.search("data", k=10**6)
        if langs[d] in ("en", "de")
    }
