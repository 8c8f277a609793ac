"""encode_hit_segments must byte-match the single-list encoder per segment
(property-based over random sorted hit streams)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from femto_spark.codec import (
    encode_hit_segments,
    encode_positions_flat,
    encode_postings,
)


def _reference_rows(h_s, grp_s, doc_s, dl_s, pos_s, with_positions=True):
    """Naive per-segment encode via the single-list functions."""
    rows = []
    total = doc_s.size
    seg_change = np.empty(total, dtype=bool)
    seg_change[0] = True
    seg_change[1:] = (h_s[1:] != h_s[:-1]) | (grp_s[1:] != grp_s[:-1])
    seg_starts = np.flatnonzero(seg_change)
    seg_ends = np.append(seg_starts[1:], total)
    for lo, hi in zip(seg_starts, seg_ends):
        d = doc_s[lo:hi]
        uniq, u_starts, tfs = np.unique(d, return_index=True, return_counts=True)
        blob, meta = encode_postings(uniq, tfs, dl_s[lo:hi][u_starts])
        pb = encode_positions_flat(pos_s[lo:hi], tfs) if with_positions else b""
        rows.append(
            {
                "term_hash": int(h_s[lo]),
                "grp": int(grp_s[lo]),
                "n": meta["n"],
                "cf": int(tfs.sum()),
                "tf_off": meta["tf_off"],
                "dl_off": meta["dl_off"],
                "block_last_doc": meta["block_last_doc"].tolist(),
                "block_max_tf": meta["block_max_tf"].tolist(),
                "block_min_dl": meta["block_min_dl"].tolist(),
                "block_gap_off": meta["block_gap_off"].tolist(),
                "block_tf_off": meta["block_tf_off"].tolist(),
                "block_dl_off": meta["block_dl_off"].tolist(),
                "postings": blob,
                "positions": pb,
            }
        )
    return rows


def _norm(row):
    return {
        k: (list(map(int, v)) if isinstance(v, list) else v) for k, v in row.items()
    }


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),  # term id
            st.integers(min_value=0, max_value=600),  # doc id
            st.integers(min_value=1, max_value=4),  # tf
        ),
        min_size=1,
        max_size=200,
    ),
    st.sampled_from([3, 6, 20]),
)
@settings(max_examples=40, deadline=None)
def test_segments_match_reference(hits, shift):
    # expand (term, doc, tf) into sorted hit rows with positions
    expanded = []
    seen = set()
    for t, d, tf in hits:
        if (t, d) in seen:
            continue
        seen.add((t, d))
        for i in range(tf):
            expanded.append((t, d, i * 2))
    expanded.sort()
    h_s = np.array([e[0] for e in expanded], dtype=np.int64)
    doc_s = np.array([e[1] for e in expanded], dtype=np.int64)
    pos_s = np.array([e[2] for e in expanded], dtype=np.int64)
    grp_s = doc_s >> shift
    # dl must be constant per doc
    dl_map = {int(d): int(d % 37 + 1) for d in doc_s}
    dl_s = np.array([dl_map[int(d)] for d in doc_s], dtype=np.int64)

    got = [_norm(r) for r in encode_hit_segments(h_s, grp_s, doc_s, dl_s, pos_s)]
    want = [_norm(r) for r in _reference_rows(h_s, grp_s, doc_s, dl_s, pos_s)]
    assert got == want


def test_segments_no_positions():
    h_s = np.array([1, 1, 2], dtype=np.int64)
    doc_s = np.array([5, 9, 5], dtype=np.int64)
    grp_s = doc_s >> 2
    dl_s = np.array([3, 4, 3], dtype=np.int64)
    pos_s = np.array([0, 1, 2], dtype=np.int64)
    rows = encode_hit_segments(h_s, grp_s, doc_s, dl_s, pos_s, with_positions=False)
    assert all(r["positions"] == b"" for r in rows)


def test_segments_empty():
    e = np.empty(0, dtype=np.int64)
    assert encode_hit_segments(e, e, e, e, e) == []
