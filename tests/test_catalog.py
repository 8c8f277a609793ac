"""Catalog-mode index storage (build_index catalog_table=...): every
queryable table goes through the DataSource-V2 writeTo API. With an
Iceberg catalog configured (iceberg-spark-runtime on the classpath +
spark.sql.catalog.* — not present in this container) the same code path
yields snapshot-isolated appends/compaction; the session catalog below
exercises the identical writeTo/table-read plumbing end to end."""

import json
import os

import pytest

PREFIX = "femto_cat_t1"
SUFFIXES = ("index", "docs", "vocab", "termstats", "manifest")


@pytest.fixture(scope="module")
def cat_docs(docs_sf001):
    ids = sorted(docs_sf001)
    return (
        {d: docs_sf001[d] for d in ids[:90]},
        {d: docs_sf001[d] for d in ids[90:140]},
    )


@pytest.fixture(scope="module")
def cat_index(spark, cat_docs, tmp_path_factory):
    from femto_spark.index import build_index

    import glob
    import shutil

    for sfx in SUFFIXES:
        spark.sql(f"DROP TABLE IF EXISTS {PREFIX}_{sfx}")
    # the in-memory catalog forgets tables across JVMs but their managed
    # locations persist — purge leftovers from previous test runs
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for d in glob.glob(os.path.join(wh, f"{PREFIX}_*")):
        shutil.rmtree(d, ignore_errors=True)
    out = str(tmp_path_factory.mktemp("cat") / "ix")
    first, _rest = cat_docs
    corpus = spark.createDataFrame(
        list(first.items()), "doc_id long, text string"
    )
    build_index(spark, corpus, out, n_buckets=8, catalog_table=PREFIX)
    return out


def test_tables_exist_and_layout_is_catalog(spark, cat_index):
    for sfx in SUFFIXES:
        assert spark.catalog.tableExists(f"{PREFIX}_{sfx}"), sfx
    # no parquet dirs for the queryable tables — the catalog owns them
    for sfx in SUFFIXES:
        assert not os.path.exists(os.path.join(cat_index, sfx)), sfx
    with open(os.path.join(cat_index, "stats.json")) as f:
        assert json.load(f)["catalog_table"] == PREFIX


def test_catalog_query_matches_oracle(spark, cat_index, cat_docs):
    from femto_spark.oracle import OracleIndex
    from femto_spark.query import SearchEngine

    first, _ = cat_docs
    oracle = OracleIndex(first)
    eng = SearchEngine(spark, cat_index)
    for q in ["data table", "the merge slow", "zzznope"]:
        got = [(r["doc_id"], r["score"]) for r in eng.search(q, k=10).collect()]
        assert got == oracle.search(q, k=10), q
    got = eng.count("data").collect()
    occ, docs = oracle.count("data")
    assert got[0]["n_docs"] == docs and got[0]["n_occurrences"] == occ
    # vocab-backed paths (regex over catalog vocab + gram table)
    got_rx = [r["doc_id"] for r in eng.regex_docs("dat.").collect()]
    assert got_rx == sorted(oracle.regex_docs("dat."))


def test_catalog_append_equals_union(spark, cat_index, cat_docs):
    from femto_spark.index.incremental import merge_into
    from femto_spark.oracle import OracleIndex
    from femto_spark.query import SearchEngine

    first, rest = cat_docs
    merge_into(
        spark,
        cat_index,
        spark.createDataFrame(list(rest.items()), "doc_id long, text string"),
    )
    oracle = OracleIndex({**first, **rest})
    eng = SearchEngine(spark, cat_index)
    for q in ["data table", "merge fast"]:
        got = [(r["doc_id"], r["score"]) for r in eng.search(q, k=10).collect()]
        assert got == oracle.search(q, k=10), q
    # the append went through the catalog (docs row count covers both)
    n = spark.table(f"{PREFIX}_docs").count()
    assert n == len(first) + len(rest)
