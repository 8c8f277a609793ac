"""Differential tests: distributed engine vs the pure-Python oracle on the
driver's sf0.001 documents table — our test.pl analogue (SURVEY.md §5.2)."""

import pytest

# query set: hot terms, mid terms, multi-term, misses (vocabulary of the
# synthetic documents table is small English-ish words)
HOT_QUERIES = ["the", "data", "value"]
MULTI_QUERIES = ["table scan filter", "the data", "spark window agg", "fast slow"]
MISS_QUERIES = ["zzzznotaterm", "qqq www"]


@pytest.fixture(scope="module")
def all_terms(docs_sf001):
    from femto_spark.tokenizer import tokenize

    terms = set()
    for t in docs_sf001.values():
        terms.update(tokenize(t))
    return sorted(terms)


def test_term_counts_match(engine, oracle_sf001, all_terms):
    # every single term's (df, cf) must match the oracle exactly
    rows = engine.termstats_df().collect()
    got = {r["term"]: (r["df"], r["cf"]) for r in rows}
    for t in all_terms:
        occ, df = oracle_sf001.count(t)
        assert got.get(t, (0, 0)) == (df, occ), t
    assert set(got) == set(all_terms)


def test_stats_match(engine, oracle_sf001):
    assert engine.n_docs == oracle_sf001.n_docs
    assert engine.avgdl == pytest.approx(oracle_sf001.avgdl, abs=0)


@pytest.mark.parametrize("q", HOT_QUERIES + MULTI_QUERIES)
def test_search_rank_identical(engine, oracle_sf001, q):
    want = oracle_sf001.search(q, k=10)
    got = [(r["doc_id"], r["score"]) for r in engine.search(q, k=10).collect()]
    assert [d for d, _ in got] == [d for d, _ in want], q
    for (gd, gs), (wd, ws) in zip(got, want):
        assert gs == ws, (q, gd, gs, ws)  # bit-identical rounded scores


@pytest.mark.parametrize("q", MISS_QUERIES)
def test_search_miss(engine, oracle_sf001, q):
    assert engine.search(q, k=10).count() == 0
    assert oracle_sf001.search(q, k=10) == []


@pytest.mark.parametrize("doc_id,n_terms", [(3, 5), (0, 3), (42, 8)])
def test_similar_rank_identical(engine, oracle_sf001, doc_id, n_terms):
    """More-like-this: identical term selection AND identical BM25 ranks."""
    want = oracle_sf001.similar(doc_id, n_terms=n_terms, k=10)
    got = [
        (r["doc_id"], r["score"])
        for r in engine.similar(doc_id, n_terms=n_terms, k=10).collect()
    ]
    assert got == want, (doc_id, n_terms)


def test_search_and_mode(engine, oracle_sf001):
    q = "the data table"
    want = oracle_sf001.search(q, k=10, mode="and")
    got = [(r["doc_id"], r["score"]) for r in engine.search(q, k=10, mode="and").collect()]
    assert got == want


def test_boolean_ops_match(engine, oracle_sf001):
    for op in ("and", "or", "not"):
        want = sorted(oracle_sf001.boolean(op, "data", "table"))
        got = sorted(
            r["doc_id"] for r in engine.boolean_docs(op, "data", "table").collect()
        )
        assert got == want, op


def test_search_many_batch(engine, oracle_sf001):
    queries = {f"q{i}": q for i, q in enumerate(HOT_QUERIES + MULTI_QUERIES)}
    got = engine.search_many(queries, k=5).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"], r["score"]))
    for qid, q in queries.items():
        want = oracle_sf001.search(q, k=5)
        rows = sorted(by_q.get(qid, []))
        assert [(d, s) for _, d, s in rows] == want, qid


def test_locate_positions_match(engine, oracle_sf001):
    term = "merge"
    plist = oracle_sf001.postings.get(term, {})
    want = [(d, p) for d in sorted(plist) for p in plist[d]]
    got = [(r["doc_id"], r["pos"]) for r in engine.locate(term).collect()]
    assert got == want


def test_proximity_match(engine, oracle_sf001):
    for left, right, d, ordered in [
        ("the", "data", 3, True),
        ("the", "data", 3, False),
        ("table", "scan", 5, True),
    ]:
        want = oracle_sf001.proximity(left, right, d, ordered)
        got = [
            (r["doc_id"], r["offset"])
            for r in engine.proximity(left, right, d, ordered).collect()
        ]
        assert got == want, (left, right, d, ordered)


def test_proximity_pruned_path_matches(engine, oracle_sf001, monkeypatch):
    """Force the hot-term prune (distributed semi-join + broadcast of
    matched per-shard-row doc arrays — no driver collect) and assert the
    pruned plan returns exactly the unpruned results."""
    import femto_spark.query.engine as em

    monkeypatch.setattr(em, "_PROX_PRUNE_HI", 0)
    monkeypatch.setattr(em, "_PROX_PRUNE_ASYM", 0)
    for left, right, d, ordered in [
        ("the", "data", 3, True),
        ("the", "data", 3, False),
        ("table", "scan", 5, True),
        ("zzzmissing", "data", 2, True),  # empty intersection
    ]:
        want = oracle_sf001.proximity(left, right, d, ordered)
        got = [
            (r["doc_id"], r["offset"])
            for r in engine.proximity(left, right, d, ordered).collect()
        ]
        assert got == want, (left, right, d, ordered)


def test_postings_with_positions_doc_filter(spark, engine):
    """DataFrame doc_filter == unfiltered result restricted to the set."""
    full = engine.postings_with_positions(["data"]).collect()
    keep = sorted({r["doc_id"] for r in full})[::2]
    flt = spark.createDataFrame([(d,) for d in keep], "doc_id long")
    got = sorted(
        (r["doc_id"], r["tf"], tuple(r["positions"]))
        for r in engine.postings_with_positions(["data"], flt).collect()
    )
    want = sorted(
        (r["doc_id"], r["tf"], tuple(r["positions"]))
        for r in full
        if r["doc_id"] in set(keep)
    )
    assert got == want and got


def test_extract_and_doc_info(engine, docs_sf001):
    row = engine.extract(3).collect()
    assert len(row) == 1 and row[0]["text"] == docs_sf001[3]


def test_extend_matches_oracle(engine, oracle_sf001):
    got = [(r["term"], r["df"]) for r in engine.extend("s", limit=8).collect()]
    assert got == oracle_sf001.extend("s", limit=8)


def test_scan_docs_subset_of_index(engine, oracle_sf001):
    # regex scan fallback agrees with term postings for a literal word
    got = [r["doc_id"] for r in engine.scan_docs(r"\bmerge\b").collect()]
    want = sorted(oracle_sf001.postings.get("merge", {}))
    assert got == want
