"""Block-max WAND must be a pure optimization: identical output to the
exhaustive scorer (and therefore to the oracle) for every query and k —
the SURVEY §7.2 M5 criterion ('WAND is safe-to-k')."""

import numpy as np
import pytest


QUERIES = [
    "the",
    "data table scan",
    "the data",
    "spark window agg merge",
    "fast slow filter value key",
    "zzznope",
    "merge",
]


@pytest.mark.parametrize("q", QUERIES)
@pytest.mark.parametrize("k", [1, 3, 10])
def test_wand_equals_exact(engine, oracle_sf001, q, k):
    want = oracle_sf001.search(q, k=k)
    got = [(r["doc_id"], r["score"]) for r in engine.search_wand(q, k=k).collect()]
    assert got == want, (q, k)


def test_wand_batch_equals_oracle(engine, oracle_sf001):
    queries = {f"q{i}": q for i, q in enumerate(QUERIES)}
    rows = engine.search_many_wand(queries, k=5).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"], r["score"]))
    for qid, q in queries.items():
        want = oracle_sf001.search(q, k=5)
        got = [(d, s) for _, d, s in sorted(by_q.get(qid, []))]
        assert got == want, qid


def test_wand_unit_pruning_actually_prunes():
    """Synthetic check of wand_topk itself: a rare high-idf term plus a hot
    low-impact term — hot blocks below θ must be skipped yet results stay
    exact vs brute force."""
    from femto_spark.codec import BLOCK_SIZE, encode_postings
    from femto_spark.query.wand import wand_topk
    from femto_spark.scoring import bm25_term, round_score

    n_docs, avgdl = 100_000, 100.0
    rng = np.random.RandomState(0)

    def mk(term, doc_ids, tfs, dls):
        doc_ids = np.asarray(doc_ids, dtype=np.int64)
        tfs = np.asarray(tfs, dtype=np.int64)
        dls = np.asarray(dls, dtype=np.int64)
        blob, meta = encode_postings(doc_ids, tfs, dls)
        return {
            "term": term,
            "df": int(doc_ids.size),
            "n": meta["n"],
            "tf_off": meta["tf_off"],
            "dl_off": meta["dl_off"],
            "block_last_doc": meta["block_last_doc"],
            "block_max_tf": meta["block_max_tf"],
            "block_min_dl": meta["block_min_dl"],
            "block_gap_off": meta["block_gap_off"],
            "block_tf_off": meta["block_tf_off"],
            "block_dl_off": meta["block_dl_off"],
            "postings": blob,
        }, (doc_ids, tfs, dls)

    # hot term: 20k docs, tf=1, long docs (low impact)
    hot_docs = np.sort(rng.choice(80_000, 20_000, replace=False))
    hot = mk("hot", hot_docs, np.ones(20_000), np.full(20_000, 300))
    # rare term: 30 docs, varied tf
    rare_docs = np.sort(rng.choice(80_000, 30, replace=False))
    rare = mk("rare", rare_docs, rng.randint(1, 10, 30), np.full(30, 80))

    rows = [hot[0], rare[0]]
    got_d, got_s = wand_topk(rows, 10, n_docs, avgdl)

    # brute-force oracle
    scores = {}
    for (term, (dids, tfs, dls)) in [("hot", hot[1]), ("rare", rare[1])]:
        df = dids.size
        for d, tf, dl in zip(dids, tfs, dls):
            scores[d] = scores.get(d, 0.0) + bm25_term(int(tf), int(dl), df, n_docs, avgdl)
    want = sorted(
        ((d, round_score(s)) for d, s in scores.items()), key=lambda x: (-x[1], x[0])
    )[:10]
    assert list(zip(got_d.tolist(), got_s.tolist())) == want
    # and the top-10 must be rare-term docs (idf dominates) — pruning had
    # something real to skip: hot has ~157 blocks, candidates ≪ 20k
    assert set(got_d.tolist()) <= set(rare_docs.tolist())


def test_decode_blocks_selective():
    from femto_spark.codec import (
        BLOCK_SIZE,
        decode_postings_blocks,
        encode_postings,
    )

    n = 1000
    doc_ids = np.cumsum(np.random.RandomState(1).randint(1, 50, n)).astype(np.int64)
    tfs = np.random.RandomState(2).randint(1, 9, n).astype(np.int64)
    dls = np.random.RandomState(3).randint(20, 500, n).astype(np.int64)
    blob, meta = encode_postings(doc_ids, tfs, dls)
    for sel in [[0], [1, 2], [0, 3], [7], list(range(8))]:
        sel = np.array([s for s in sel if s * BLOCK_SIZE < n])
        d, t, l = decode_postings_blocks(
            blob, n, meta["tf_off"], meta["dl_off"], meta["block_last_doc"],
            meta["block_gap_off"], meta["block_tf_off"], meta["block_dl_off"], sel,
        )
        want_idx = np.concatenate(
            [np.arange(s * BLOCK_SIZE, min((s + 1) * BLOCK_SIZE, n)) for s in sel]
        )
        assert np.array_equal(d, doc_ids[want_idx])
        assert np.array_equal(t, tfs[want_idx])
        assert np.array_equal(l, dls[want_idx])
