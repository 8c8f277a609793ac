"""Phrase / APPROX / word-level REGEXP — engine vs oracle differentials."""

import pytest


@pytest.mark.parametrize(
    "q",
    ["data table", "the data", "fast slow", "merge sort key", "zzz qqq"],
)
def test_phrase_matches_oracle(engine, oracle_sf001, q):
    want = oracle_sf001.phrase(q)
    got = [
        (r["doc_id"], r["n_matches"], r["first_pos"])
        for r in engine.phrase(q).collect()
    ]
    assert got == want, q


def test_phrase_single_term(engine, oracle_sf001):
    want = oracle_sf001.phrase("merge")
    got = [
        (r["doc_id"], r["n_matches"], r["first_pos"])
        for r in engine.phrase("merge").collect()
    ]
    assert got == want


@pytest.mark.parametrize("probe,k", [("tabl", 1), ("scan", 1), ("merge", 2)])
def test_approx_terms_match_oracle(engine, oracle_sf001, probe, k):
    want = oracle_sf001.approx_terms(probe, k)
    got = [
        (r["term"], r["dist"], r["df"])
        for r in engine.approx_terms(probe, k).collect()
    ]
    assert got == want, (probe, k)


def test_approx_docs(engine, oracle_sf001):
    want = set()
    for t, _, _ in oracle_sf001.approx_terms("tabl", 1):
        want |= set(oracle_sf001.postings[t])
    got = {r["doc_id"] for r in engine.approx_docs("tabl", 1).collect()}
    assert got == want


@pytest.mark.parametrize("pattern", ["^mer", "ta.le", "s(can|low)", "^q"])
def test_regex_docs_match_oracle(engine, oracle_sf001, pattern):
    want = sorted(oracle_sf001.regex_docs(pattern))
    got = [r["doc_id"] for r in engine.regex_docs(pattern).collect()]
    assert got == want, pattern
