"""Codec unit + property tests — encode∘decode = identity.

Mirrors the reference's per-structure unit tests (`make check` targets
bseq_test/wtree_test, SURVEY.md §5.1) for our posting codec.
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from femto_spark.codec import (
    decode_positions,
    decode_postings,
    encode_positions,
    encode_postings,
    varint_decode,
    varint_encode,
)


def test_varint_roundtrip_basic():
    vals = np.array([0, 1, 127, 128, 300, 2**14, 2**35, 2**63 - 1], dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(vals)), vals)


def test_varint_empty():
    assert varint_decode(varint_encode(np.array([], dtype=np.uint64))).size == 0


@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=500))
@settings(max_examples=50, deadline=None)
def test_varint_roundtrip_property(xs):
    vals = np.array(xs, dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(vals)), vals)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**11),  # gap
            st.integers(min_value=1, max_value=500),  # tf
            st.integers(min_value=1, max_value=10_000),  # dl
        ),
        min_size=1,
        max_size=700,
    )
)
@settings(max_examples=30, deadline=None)
def test_postings_roundtrip_property(rows):
    gaps = np.array([r[0] for r in rows], dtype=np.int64)
    doc_ids = np.cumsum(gaps + 1) - 1  # strictly increasing
    tfs = np.array([r[1] for r in rows], dtype=np.int64)
    dls = np.array([r[2] for r in rows], dtype=np.int64)
    blob, meta = encode_postings(doc_ids, tfs, dls)
    d, t, l = decode_postings(blob, meta["n"], meta["tf_off"], meta["dl_off"])
    assert np.array_equal(d, doc_ids)
    assert np.array_equal(t, tfs)
    assert np.array_equal(l, dls)
    # block metadata sanity
    assert meta["block_last_doc"][-1] == doc_ids[-1]
    assert meta["block_max_tf"].max() == tfs.max()


def test_block_meta_values():
    doc_ids = np.arange(0, 300, dtype=np.int64)
    tfs = np.ones(300, dtype=np.int64)
    tfs[200] = 9
    dls = np.full(300, 50, dtype=np.int64)
    blob, meta = encode_postings(doc_ids, tfs, dls)
    assert list(meta["block_last_doc"]) == [127, 255, 299]
    assert list(meta["block_max_tf"]) == [1, 9, 1]


@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=5000), min_size=1, max_size=30),
        min_size=1,
        max_size=100,
    )
)
@settings(max_examples=30, deadline=None)
def test_positions_roundtrip_property(poslists):
    poslists = [np.unique(np.array(p, dtype=np.int64)) for p in poslists]
    tfs = np.array([len(p) for p in poslists], dtype=np.int64)
    blob = encode_positions(poslists)
    flat, starts = decode_positions(blob, tfs)
    for i, p in enumerate(poslists):
        got = flat[starts[i] : starts[i] + tfs[i]]
        assert np.array_equal(got, p), (i, got, p)


def test_positions_empty():
    flat, starts = decode_positions(b"", np.array([], dtype=np.int64))
    assert flat.size == 0 and starts.size == 0


@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=200_000), min_size=0, max_size=30),
        min_size=1,
        max_size=100,
    ),
    st.randoms(use_true_random=False),
)
@settings(max_examples=30, deadline=None)
def test_positions_select_matches_full_decode(poslists, rnd):
    from femto_spark.codec import decode_positions_select

    poslists = [np.unique(np.array(p, dtype=np.int64)) for p in poslists]
    tfs = np.array([len(p) for p in poslists], dtype=np.int64)
    blob = encode_positions(poslists)
    n = len(poslists)
    keep = np.array(
        sorted(rnd.sample(range(n), rnd.randint(1, n))), dtype=np.int64
    )
    flat, starts = decode_positions_select(blob, tfs, keep)
    for j, i in enumerate(keep):
        got = flat[starts[j] : starts[j] + tfs[i]]
        assert np.array_equal(got, poslists[i]), (i, got, poslists[i])
    # multi-byte varints (values > 127 and > 16383) must be covered
    assert starts.size == keep.size
