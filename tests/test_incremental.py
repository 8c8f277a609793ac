"""Incremental append (merge_into) must equal a one-shot build over the
union corpus — the working replacement for FEMTO's compiled-out
INDEX_MERGE (index.h:45-47)."""

import os

import pytest
from pyspark.sql import functions as F


def _signature(spark, out):
    ix = spark.read.parquet(os.path.join(out, "index"))
    rows = ix.select(
        "term_hash", "grp", "shard", "n",
        F.md5("postings").alias("ph"), F.md5("positions").alias("xh"),
    ).collect()
    return sorted(
        (r["term_hash"], r["grp"], r["shard"], r["n"], r["ph"], r["xh"]) for r in rows
    )


def test_merge_into_equals_oneshot(spark, tmp_path):
    from femto_spark.index import build_index
    from femto_spark.index.incremental import merge_into

    corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    old = corpus.filter(F.col("doc_id") < 300)
    new = corpus.filter(F.col("doc_id") >= 300)

    inc = str(tmp_path / "incremental")
    build_index(spark, old, inc, n_buckets=8)
    merge_into(spark, inc, new)

    full = str(tmp_path / "oneshot")
    build_index(spark, corpus, full, n_buckets=8)

    assert _signature(spark, inc) == _signature(spark, full)

    # stats must be recomputed globally (BM25 parity after append)
    import json

    a = json.load(open(os.path.join(inc, "stats.json")))
    b = json.load(open(os.path.join(full, "stats.json")))
    assert (a["n_docs"], a["total_tokens"], a["avgdl"]) == (
        b["n_docs"], b["total_tokens"], b["avgdl"],
    )


def test_merge_into_query_parity(spark, tmp_path, docs_sf001, oracle_sf001):
    from femto_spark.index import build_index
    from femto_spark.index.incremental import merge_into
    from femto_spark.query import SearchEngine

    corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    inc = str(tmp_path / "inc2")
    build_index(spark, corpus.filter(F.col("doc_id") < 250), inc, n_buckets=8)
    merge_into(spark, inc, corpus.filter(F.col("doc_id") >= 250))
    eng = SearchEngine(spark, inc, corpus=corpus)
    for q in ["the", "data table scan", "merge"]:
        got = [(r["doc_id"], r["score"]) for r in eng.search(q, k=10).collect()]
        assert got == oracle_sf001.search(q, k=10), q


def test_merge_into_rejects_overlapping_ids(spark, tmp_path):
    from femto_spark.index import build_index
    from femto_spark.index.incremental import merge_into

    corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "inc3")
    build_index(spark, corpus.filter(F.col("doc_id") < 100), out, n_buckets=8)
    with pytest.raises(ValueError, match="doc_ids must exceed"):
        merge_into(spark, out, corpus.filter(F.col("doc_id") >= 50))


def test_merge_into_positions_free_index(spark, tmp_path):
    """Appending to a with_positions=False index must stay positions-free
    (ADVICE r01: the encode defaulted to with_positions=True and crashed
    the merge / silently mis-permuted)."""
    from femto_spark.index import build_index
    from femto_spark.index.incremental import merge_into
    from femto_spark.query import SearchEngine

    corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    inc = str(tmp_path / "nopos_inc")
    build_index(
        spark, corpus.filter(F.col("doc_id") < 300), inc, n_buckets=8,
        with_positions=False,
    )
    merge_into(spark, inc, corpus.filter(F.col("doc_id") >= 300))

    full = str(tmp_path / "nopos_full")
    build_index(spark, corpus, full, n_buckets=8, with_positions=False)
    assert _signature(spark, inc) == _signature(spark, full)

    # and the index stays queryable
    eng = SearchEngine(spark, inc, corpus=corpus)
    assert eng.search("data table", k=5).count() == 5


def test_merge_into_run_id_idempotent(spark, tmp_path):
    """Replaying a batch (same run_id) — whether after a mid-append crash
    or after full success — must leave the index identical to one append."""
    import os

    from femto_spark.index import build_index
    from femto_spark.index.incremental import merge_into

    corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    old = corpus.filter(F.col("doc_id") < 300)
    new = corpus.filter(F.col("doc_id") >= 300)

    inc = str(tmp_path / "replay")
    build_index(spark, old, inc, n_buckets=8)
    merge_into(spark, inc, new, run_id="b1")
    sig_once = _signature(spark, inc)

    # replay after DONE marker → no-op
    rep = merge_into(spark, inc, new, run_id="b1")
    assert rep.get("skipped") is True
    assert _signature(spark, inc) == sig_once

    # simulate a crash-mid-batch replay: DONE marker missing but the run's
    # partials/docs files already landed → replay must NOT double-append
    os.remove(os.path.join(inc, "_RUN_b1_DONE"))
    merge_into(spark, inc, new, run_id="b1")
    assert _signature(spark, inc) == sig_once

    full = str(tmp_path / "replay_full")
    build_index(spark, corpus, full, n_buckets=8)
    assert sig_once == _signature(spark, full)
