"""Forced 64-bit hash-collision path (the 10^9-vocabulary story).

A web-scale vocabulary will eventually collide a 64-bit term hash
(expected collisions = |V|^2 / 2^65 — O(1) far past 10^9 terms). The
build re-keys the colliding handful (index/build.py resolve_collisions)
instead of doubling every key to 128 bits. These tests force collisions
with a narrowed hash space (`hash_mask`) over a real corpus slice and
assert the engine stays rank/set-identical to the hash-free pure-Python
oracle through the re-keyed path — build, query, serving, and append.
"""

import json
import os

import pytest

MASK = 63  # 64-slot hash space vs a ~40-term vocab → guaranteed collisions


@pytest.fixture(scope="module")
def collide_docs(docs_sf001):
    # the synthetic corpus has a ~40-word vocabulary; a 64-slot hash
    # space collides a dozen-plus of them (birthday)
    keep = sorted(docs_sf001)[:120]
    return {d: docs_sf001[d] for d in keep}


@pytest.fixture(scope="module")
def collide_ix(spark, collide_docs, tmp_path_factory):
    from femto_spark.index import build_index

    out = str(tmp_path_factory.mktemp("cx") / "masked")
    corpus = spark.createDataFrame(
        list(collide_docs.items()), "doc_id long, text string"
    )
    build_index(spark, corpus, out, n_buckets=8, hash_mask=MASK)
    return out


@pytest.fixture(scope="module")
def collide_engine(spark, collide_ix, collide_docs):
    from femto_spark.query import SearchEngine

    corpus = spark.createDataFrame(
        list(collide_docs.items()), "doc_id long, text string"
    )
    return SearchEngine(spark, collide_ix, corpus=corpus)


@pytest.fixture(scope="module")
def collide_oracle(collide_docs):
    from femto_spark.oracle import OracleIndex

    return OracleIndex(collide_docs)


def _colliding_terms(collide_ix):
    with open(os.path.join(collide_ix, "collisions.json")) as f:
        return sorted(json.load(f))


def test_collisions_detected_and_rekeyed(collide_ix, collide_docs):
    """The masked space must actually collide, and every re-keyed hash
    must be unique across the whole vocab."""
    import duckdb

    remap = json.load(open(os.path.join(collide_ix, "collisions.json")))
    assert remap, "mask produced no collisions — test corpus too small"
    n, h = duckdb.sql(
        f"SELECT count(*), count(DISTINCT term_hash) FROM "
        f"'{collide_ix}/vocab/*.parquet'"
    ).fetchone()
    assert n == h, "vocab still contains colliding hashes after re-key"
    # every effective hash stays inside the masked space except re-keys,
    # which also stay inside it (salted candidates are masked too)
    lo, hi = duckdb.sql(
        f"SELECT min(term_hash), max(term_hash) FROM "
        f"'{collide_ix}/vocab/*.parquet'"
    ).fetchone()
    assert 0 <= lo and hi <= MASK


def test_count_and_search_match_oracle_through_rekey(
    collide_engine, collide_oracle, collide_ix
):
    """Counts and BM25 top-k for REMAPPED terms (the ones that would have
    been conflated without re-keying) match the hash-free oracle."""
    terms = _colliding_terms(collide_ix)[:12]
    assert terms
    for t in terms:
        got = collide_engine.count(t).collect()
        exp_cf, exp_df = collide_oracle.count(t)
        if exp_df == 0:
            assert not got
        else:
            assert got[0]["n_docs"] == exp_df and got[0]["n_occurrences"] == exp_cf, t
    q = " ".join(terms[:3])
    got = [
        (r["doc_id"], r["score"])
        for r in collide_engine.search(q, k=10).collect()
    ]
    assert got == collide_oracle.search(q, k=10)


def test_keeper_terms_unaffected(collide_engine, collide_oracle, collide_ix):
    """Terms that kept their natural (masked) hash also stay correct —
    the CASE remap must not disturb the ELSE branch."""
    import duckdb

    remap = set(_colliding_terms(collide_ix))
    keepers = [
        t
        for (t,) in duckdb.sql(
            f"SELECT term FROM '{collide_ix}/vocab/*.parquet' ORDER BY term"
        ).fetchall()
        if t not in remap
    ][:8]
    for t in keepers:
        got = collide_engine.count(t).collect()
        exp_cf, exp_df = collide_oracle.count(t)
        assert got and got[0]["n_docs"] == exp_df and got[0]["n_occurrences"] == exp_cf, t


def test_serving_matches_engine_through_rekey(collide_ix, collide_engine):
    from femto_spark.serving import LocalSearcher

    ls = LocalSearcher(collide_ix)
    terms = _colliding_terms(collide_ix)[:6]
    q = " ".join(terms[:2])
    eng = [
        (r["doc_id"], r["score"])
        for r in collide_engine.search(q, k=10).collect()
    ]
    assert ls.search(q, k=10) == eng
    for t in terms:
        got = {x[0]: x[1:] for x in ls.count(t)}
        exp = collide_engine.count(t).collect()
        for r in exp:
            assert got[r["term"]] == (r["n_docs"], r["n_occurrences"])


def test_incremental_append_anchors_old_terms(spark, collide_docs, tmp_path_factory):
    """Appending under a masked space: old terms keep their effective
    hashes (postings untouched); new colliding terms re-key. Query results
    equal a one-shot build over the union corpus."""
    from femto_spark.index import build_index
    from femto_spark.index.incremental import merge_into
    from femto_spark.oracle import OracleIndex
    from femto_spark.query import SearchEngine

    ids = sorted(collide_docs)
    first = {d: collide_docs[d] for d in ids[:60]}
    rest = {d: collide_docs[d] for d in ids[60:]}

    out = str(tmp_path_factory.mktemp("cxi") / "masked_inc")
    build_index(
        spark,
        spark.createDataFrame(list(first.items()), "doc_id long, text string"),
        out,
        n_buckets=8,
        hash_mask=MASK,
    )
    with open(os.path.join(out, "collisions.json")) as f:
        before = json.load(f)
    merge_into(
        spark,
        out,
        spark.createDataFrame(list(rest.items()), "doc_id long, text string"),
    )
    with open(os.path.join(out, "collisions.json")) as f:
        after = json.load(f)
    # old assignments are anchored: the appended remap is a superset
    assert all(after.get(t) == h for t, h in before.items())
    assert len(after) >= len(before)

    oracle = OracleIndex(collide_docs)
    eng = SearchEngine(
        spark,
        out,
        corpus=spark.createDataFrame(
            list(collide_docs.items()), "doc_id long, text string"
        ),
    )
    probe = sorted(after)[:3]
    q = " ".join(probe)
    got = [(r["doc_id"], r["score"]) for r in eng.search(q, k=10).collect()]
    assert got == oracle.search(q, k=10)
    for t in probe:
        got_c = eng.count(t).collect()
        exp_cf, exp_df = oracle.count(t)
        if exp_df:
            assert got_c[0]["n_docs"] == exp_df and got_c[0]["n_occurrences"] == exp_cf, t


def test_overlapped_build_redoes_partials_on_rekey(
    spark, collide_docs, tmp_path_factory, monkeypatch
):
    """FEMTO_BUILD_OVERLAP=1 encodes partials optimistically with natural
    hashes; a masked build always collides, so the redo path must fire
    and the result must match the sequential masked build."""
    from femto_spark.index import build_index
    from femto_spark.oracle import OracleIndex
    from femto_spark.query import SearchEngine

    monkeypatch.setenv("FEMTO_BUILD_OVERLAP", "1")
    out = str(tmp_path_factory.mktemp("cxo") / "masked_ovl")
    corpus = spark.createDataFrame(
        list(collide_docs.items()), "doc_id long, text string"
    )
    rep = build_index(spark, corpus, out, n_buckets=8, hash_mask=MASK)
    assert "partials_redo" in rep["stages"], "redo path did not fire"
    oracle = OracleIndex(collide_docs)
    eng = SearchEngine(spark, out, corpus=corpus)
    remap = json.load(open(os.path.join(out, "collisions.json")))
    q = " ".join(sorted(remap)[:3])
    got = [(r["doc_id"], r["score"]) for r in eng.search(q, k=10).collect()]
    assert got == oracle.search(q, k=10)
