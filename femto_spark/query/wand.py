"""Block-max WAND top-k — candidate-generate/verify variant, vectorized.

FEMTO skips whole row-ranges via its chunk doc-maps
(`/root/reference/src/main/server.c:4549`, paper §3.3: O(r/h + hk) vs
O(rk)); the posting-list analogue is Block-Max WAND (Ding & Suel 2011):
per-block score upper bounds let the scorer skip decoding blocks that
cannot reach the current top-k threshold.

Classic BMW is doc-at-a-time — a pointer-chasing loop that vectorizes
poorly. This implementation is the batch-friendly *safe* variant:

  1. bootstrap θ: fully score the rarest query term (cheapest postings);
     θ = its k-th best single-term score (a valid lower bound on the final
     k-th score, since scores only grow with more terms);
  2. block prune: for term t, skip block b iff
         ub(b) + Σ_{t'≠t} gub(t') < θ
     (safe: a doc living only in skipped blocks satisfies, for any of its
     terms t0, score(d) ≤ ub(b_t0(d)) + Σ_{t'≠t0} gub(t') < θ);
  3. candidates = docs decoded from surviving blocks;
  4. verify: decode, for EVERY query term, exactly the blocks whose
     doc-range intersects the candidate set, and accumulate exact BM25 in
     ascending-term order (bit-identical to the exact scorer/oracle);
  5. round, tie-break (score desc, doc_id asc), take k.

Rank-safety: candidates ⊇ true top-k (step 2's bound), and verification
is exact — so the output equals the exhaustive scorer's, asserted in
tests/test_wand.py.

Upper bound per block uses (max_tf, min_dl): BM25's tf-normalization is
increasing in tf and decreasing in dl, so idf·tfnorm(max_tf, min_dl) ≥
any member's contribution.
"""

from __future__ import annotations

import math

import numpy as np

from ..codec import decode_postings, decode_postings_blocks
from ..scoring import B, K1


def _idf(df: int, n_docs: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def _tfnorm(tf, dl, avgdl):
    num = tf * (K1 + 1.0)
    den = tf + K1 * (1.0 - B + B * dl / avgdl)
    return num / den


def wand_topk(
    term_rows: list[dict],
    k: int,
    n_docs: int,
    avgdl: float,
    exact: bool = False,
):
    """term_rows: one dict per index row (term shard) with keys
    term, df, n, tf_off, dl_off, block_last_doc, block_max_tf,
    block_min_dl, block_gap_off, block_tf_off, block_dl_off, postings.

    Returns (doc_ids int64[], scores float64[]) — exact top-k, rounded
    half-up to 6 decimals, sorted (score desc, doc_id asc).

    exact=True runs the same harness with θ = −inf: every block survives
    pruning, candidates = all docs of all terms, and step 4's exact
    verification becomes the exhaustive OR-mode scorer — bit-identical to
    the DataFrame exact plan (same idf·(num/den) float64 ops, same
    ascending-term fold), in one co-grouped task per query instead of an
    exploded (query, doc, score) shuffle.
    """
    if not term_rows:
        return np.empty(0, np.int64), np.empty(0, np.float64)

    by_term: dict[str, list[dict]] = {}
    for r in term_rows:
        by_term.setdefault(r["term"], []).append(r)
    terms = sorted(by_term)
    idf = {t: _idf(int(by_term[t][0]["df"]), n_docs) for t in terms}

    # per-row block upper bounds + per-term global upper bound
    gub: dict[str, float] = {}
    for t in terms:
        g = 0.0
        for r in by_term[t]:
            mtf = np.asarray(r["block_max_tf"], dtype=np.float64)
            mdl = np.asarray(r["block_min_dl"], dtype=np.float64)
            r["_ub"] = idf[t] * _tfnorm(mtf, mdl, avgdl)
            if r["_ub"].size:
                g = max(g, float(r["_ub"].max()))
        gub[t] = g
    sum_gub = sum(gub.values())

    def _decode_all(r):
        return decode_postings(
            bytes(r["postings"]), int(r["n"]), int(r["tf_off"]), int(r["dl_off"])
        )

    def _decode_sel(r, sel):
        return decode_postings_blocks(
            bytes(r["postings"]),
            int(r["n"]),
            int(r["tf_off"]),
            int(r["dl_off"]),
            np.asarray(r["block_last_doc"], dtype=np.int64),
            np.asarray(r["block_gap_off"], dtype=np.int64),
            np.asarray(r["block_tf_off"], dtype=np.int64),
            np.asarray(r["block_dl_off"], dtype=np.int64),
            sel,
        )

    # ---- step 1: bootstrap θ from the rarest term ------------------------
    if exact:
        theta = -math.inf  # keep every block: exhaustive exact scorer
    else:
        boot = min(terms, key=lambda t: int(by_term[t][0]["df"]))
        boot_scores: list[np.ndarray] = []
        for r in by_term[boot]:
            d, tf, dl = _decode_all(r)
            r["_full"] = (d, tf, dl)
            boot_scores.append(idf[boot] * _tfnorm(tf.astype(np.float64), dl.astype(np.float64), avgdl))
        bs = np.concatenate(boot_scores) if boot_scores else np.empty(0)
        theta = float(np.partition(bs, bs.size - k)[bs.size - k]) if bs.size >= k else 0.0
        # final ranking happens on 1e-6-rounded scores: a doc up to one
        # rounding quantum below the unrounded k-th can still tie into the
        # rounded top-k, so prune against θ − 1e-6 to stay rank-safe
        theta -= 1e-6

    # ---- step 2+3: prune blocks, gather candidates ------------------------
    cand_parts = []
    for t in terms:
        slack = theta - (sum_gub - gub[t])
        for r in by_term[t]:
            if "_full" in r:
                cand_parts.append(r["_full"][0])
                continue
            keep = np.flatnonzero(r["_ub"] >= slack)
            r["_kept"] = keep
            if keep.size == len(r["_ub"]):
                d, tf, dl = _decode_all(r)
                r["_full"] = (d, tf, dl)
                cand_parts.append(d)
            elif keep.size:
                d, tf, dl = _decode_sel(r, keep)
                cand_parts.append(d)
    if not cand_parts:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    cands = np.unique(np.concatenate(cand_parts))

    # ---- step 4: exact verification in ascending-term order --------------
    scores = np.zeros(cands.size, dtype=np.float64)
    for t in terms:
        for r in by_term[t]:
            if "_full" in r:
                d, tf, dl = r["_full"]
            else:
                # blocks whose doc-range can contain a candidate
                bl = np.asarray(r["block_last_doc"], dtype=np.int64)
                blk = np.unique(np.searchsorted(bl, cands))
                blk = blk[blk < bl.size]
                if blk.size == 0:
                    continue
                d, tf, dl = _decode_sel(r, blk)
            pos = np.searchsorted(cands, d)
            pos_ok = pos < cands.size
            m = np.zeros(d.size, dtype=bool)
            m[pos_ok] = cands[pos[pos_ok]] == d[pos_ok]
            if not m.any():
                continue
            contrib = idf[t] * _tfnorm(
                tf[m].astype(np.float64), dl[m].astype(np.float64), avgdl
            )
            scores[pos[m]] += contrib

    # ---- step 5: round, tie-break, top-k ----------------------------------
    scores = np.floor(scores * 1e6 + 0.5) / 1e6
    order = np.lexsort((cands, -scores))[:k]
    return cands[order], scores[order]
