"""Delta + varint posting-list codec with frame-of-reference blocks.

Spark-native replacement for the reference's succinct-structure compression
(wavelet-tree buckets + gamma-delta doc chunks,
`/root/reference/src/main/wtree.c:85-360`, `src/main/bwt_writer.c:217-319`,
format `src/main/block_format.txt:119-188`). Same function — compressed,
skippable, sorted doc-id runs — re-expressed as LEB128 varints over doc-id
gaps, grouped into fixed-size blocks carrying block-max metadata so the
query side can skip whole blocks (block-max WAND) exactly the way FEMTO's
chunk doc-maps let it skip row ranges (`src/main/server.c:4549`).

Everything here is vectorized numpy — no per-row Python — because it runs
inside Arrow-batched pandas UDFs on the executors (input_hint mandate).

Layout of one encoded postings blob (a `bytes` value per index row):
    [varint doc-gap stream | varint tf stream | varint dl stream]
with entry counts and byte offsets carried OUTSIDE the blob in plain
columns (n_postings, tf_off, dl_off, block_* arrays) so Parquet stats and
column pruning still work on them.

Positions (for THEN/WITHIN proximity) are encoded separately by
``encode_positions`` as [varint within-doc position gaps] with per-posting
counts equal to tf; kept in their own column so non-proximity queries never
read them (column pruning).
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128  # postings per skippable block (FEMTO chunk analogue)

# --------------------------------------------------------------------------
# vectorized LEB128 varint
# --------------------------------------------------------------------------

_THRESHOLDS = np.array([1 << (7 * i) for i in range(1, 10)], dtype=np.uint64)


def varint_encode(values: np.ndarray) -> np.ndarray:
    """Encode a uint64 array as a concatenated LEB128 byte stream.

    Vectorized: O(10) numpy passes regardless of input length.
    """
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return np.empty(0, dtype=np.uint8)
    # number of 7-bit groups per value (1..10)
    nbytes = np.ones(v.shape, dtype=np.int64)
    for t in _THRESHOLDS:
        nbytes += (v >= t).astype(np.int64)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    shifted = v.copy()
    alive = np.arange(v.size)
    j = 0
    while alive.size:
        byte = (shifted[alive] & np.uint64(0x7F)).astype(np.uint8)
        more = nbytes[alive] > (j + 1)
        out[starts[alive] + j] = byte | (more.astype(np.uint8) << np.uint8(7))
        shifted[alive] >>= np.uint64(7)
        alive = alive[more]
        j += 1
    return out


def varint_sizes(values: np.ndarray) -> np.ndarray:
    """Encoded byte length per value (vectorized; used for block offsets)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    nbytes = np.ones(v.shape, dtype=np.int64)
    for t in _THRESHOLDS:
        nbytes += (v >= t).astype(np.int64)
    return nbytes


def varint_decode(buf: np.ndarray, count: int | None = None) -> np.ndarray:
    """Decode a LEB128 byte stream (uint8 array) to uint64 values."""
    b = np.ascontiguousarray(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_end = (b & 0x80) == 0
    ends = np.flatnonzero(is_end)
    if count is not None:
        ends = ends[:count]
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    out = np.zeros(ends.size, dtype=np.uint64)
    maxlen = int(lengths.max())
    data7 = (b & 0x7F).astype(np.uint64)
    for j in range(maxlen):
        mask = lengths > j
        out[mask] |= data7[starts[mask] + j] << np.uint64(7 * j)
    return out


# --------------------------------------------------------------------------
# posting blob: sorted doc_ids (delta) + tfs + dls
# --------------------------------------------------------------------------


def encode_postings(
    doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray
) -> tuple[bytes, dict]:
    """Encode one term's postings (sorted ascending by doc_id, unique).

    Returns (blob, meta) where meta carries everything the reader and the
    WAND skipper need without touching the blob:
      n, tf_off, dl_off            — counts and section byte offsets
      block_last_doc[]             — last doc_id per block (skip pointer)
      block_off[]                  — byte offset of each block's gap stream
      block_max_tfn[]              — max of tf/(tf + K1*(1-B+B*dl/avgdl))
                                     is computed by the caller (needs avgdl);
                                     here we return per-block max tf and min dl
                                     as the raw ingredients (block_max_tf,
                                     block_min_dl).
    """
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    n = doc_ids.size
    gaps = np.empty(n, dtype=np.uint64)
    if n:
        gaps[0] = np.uint64(doc_ids[0])
        np.subtract(
            doc_ids[1:].astype(np.uint64), doc_ids[:-1].astype(np.uint64), out=gaps[1:]
        )
    gap_bytes = varint_encode(gaps)
    tf_bytes = varint_encode(tfs.astype(np.uint64))
    dl_bytes = varint_encode(dls.astype(np.uint64))
    blob = b"".join(
        (gap_bytes.tobytes(), tf_bytes.tobytes(), dl_bytes.tobytes())
    )

    # per-block metadata: skip pointers + block-max ingredients + byte
    # offsets into each varint section so a block can be decoded without
    # touching the others (the first gap of block i is relative to
    # block_last_doc[i-1], which lives in metadata).
    nblocks = (n + BLOCK_SIZE - 1) // BLOCK_SIZE
    block_last_doc = np.empty(nblocks, dtype=np.int64)
    block_max_tf = np.empty(nblocks, dtype=np.int64)
    block_min_dl = np.empty(nblocks, dtype=np.int64)
    for i in range(nblocks):
        lo, hi = i * BLOCK_SIZE, min((i + 1) * BLOCK_SIZE, n)
        block_last_doc[i] = doc_ids[hi - 1]
        block_max_tf[i] = int(tfs[lo:hi].max())
        block_min_dl[i] = int(dls[lo:hi].min())
    bnd = np.arange(nblocks) * BLOCK_SIZE

    def _sect_offs(vals: np.ndarray) -> np.ndarray:
        cs = np.concatenate(([0], np.cumsum(varint_sizes(vals))))
        return cs[bnd]

    meta = {
        "n": int(n),
        "tf_off": int(gap_bytes.size),
        "dl_off": int(gap_bytes.size + tf_bytes.size),
        "block_last_doc": block_last_doc,
        "block_max_tf": block_max_tf,
        "block_min_dl": block_min_dl,
        "block_gap_off": _sect_offs(gaps),
        "block_tf_off": _sect_offs(tfs.astype(np.uint64)),
        "block_dl_off": _sect_offs(dls.astype(np.uint64)),
    }
    return blob, meta


def decode_postings(
    blob: bytes, n: int, tf_off: int, dl_off: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode (doc_ids, tfs, dls) from one blob."""
    buf = np.frombuffer(blob, dtype=np.uint8)
    gaps = varint_decode(buf[:tf_off], n)
    doc_ids = np.cumsum(gaps.astype(np.int64))
    tfs = varint_decode(buf[tf_off:dl_off], n).astype(np.int64)
    dls = varint_decode(buf[dl_off:], n).astype(np.int64)
    return doc_ids, tfs, dls


def decode_postings_blocks(
    blob: bytes,
    n: int,
    tf_off: int,
    dl_off: int,
    block_last_doc: np.ndarray,
    block_gap_off: np.ndarray,
    block_tf_off: np.ndarray,
    block_dl_off: np.ndarray,
    selected: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode ONLY the selected blocks (sorted block indices) — the
    skip-read primitive behind block-max WAND. Consecutive runs of selected
    blocks are decoded in one vectorized varint pass. Returns concatenated
    (doc_ids, tfs, dls) for the selected blocks, in doc_id order."""
    buf = np.frombuffer(blob, dtype=np.uint8)
    nblocks = len(block_last_doc)
    sect = {
        "gap": (np.asarray(block_gap_off), 0, tf_off),
        "tf": (np.asarray(block_tf_off), tf_off, dl_off),
        "dl": (np.asarray(block_dl_off), dl_off, len(blob)),
    }
    sel = np.asarray(selected, dtype=np.int64)
    if sel.size == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e.copy(), e.copy()
    # split into runs of consecutive block indices
    run_breaks = np.flatnonzero(np.diff(sel) != 1) + 1
    runs = np.split(sel, run_breaks)
    docs_out, tfs_out, dls_out = [], [], []
    for run in runs:
        i, j = int(run[0]), int(run[-1]) + 1
        count = min(j * BLOCK_SIZE, n) - i * BLOCK_SIZE

        def _sect_decode(name: str) -> np.ndarray:
            offs, base, end = sect[name]
            lo = base + int(offs[i])
            hi = base + int(offs[j]) if j < nblocks else end
            return varint_decode(buf[lo:hi], count)

        gaps = _sect_decode("gap")
        base_doc = int(block_last_doc[i - 1]) if i > 0 else 0
        docs_out.append(np.cumsum(gaps.astype(np.int64)) + base_doc)
        tfs_out.append(_sect_decode("tf").astype(np.int64))
        dls_out.append(_sect_decode("dl").astype(np.int64))
    return (
        np.concatenate(docs_out),
        np.concatenate(tfs_out),
        np.concatenate(dls_out),
    )


# --------------------------------------------------------------------------
# positions blob (proximity / phrase support)
# --------------------------------------------------------------------------


def encode_positions_flat(flat: np.ndarray, lens: np.ndarray) -> bytes:
    """Encode per-posting sorted position lists as within-doc delta varints.

    `flat` is the concatenation of all postings' position lists; `lens[i]`
    (= tf of posting i) delimits them. Counts are NOT stored — they equal
    each posting's tf, which the reader already has from the postings blob
    (FEMTO similarly derives structure from counts it already stores,
    block_format.txt:119-124). Fully vectorized.
    """
    flat = np.ascontiguousarray(flat, dtype=np.int64)
    lens = np.ascontiguousarray(lens, dtype=np.int64)
    if flat.size == 0:
        return b""
    starts = np.cumsum(lens) - lens
    deltas = flat.astype(np.uint64).copy()
    inner = np.ones(flat.size, dtype=bool)
    inner[starts[lens > 0]] = False
    deltas[inner] = flat[inner].astype(np.uint64) - flat[np.flatnonzero(inner) - 1].astype(
        np.uint64
    )
    return varint_encode(deltas).tobytes()


def encode_positions(positions_per_doc: list[np.ndarray]) -> bytes:
    """List-of-arrays convenience wrapper over ``encode_positions_flat``."""
    if not positions_per_doc:
        return b""
    flat = np.concatenate([np.asarray(p, dtype=np.int64) for p in positions_per_doc])
    lens = np.array([len(p) for p in positions_per_doc], dtype=np.int64)
    return encode_positions_flat(flat, lens)


def decode_positions(blob: bytes, tfs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Decode to (flat_positions, starts) where posting i's positions are
    flat_positions[starts[i] : starts[i] + tfs[i]]."""
    total = int(np.sum(tfs))
    if total == 0:
        return np.empty(0, dtype=np.int64), np.zeros(len(tfs), dtype=np.int64)
    buf = np.frombuffer(blob, dtype=np.uint8)
    deltas = varint_decode(buf, total).astype(np.int64)
    lens = np.asarray(tfs, dtype=np.int64)
    starts = np.cumsum(lens) - lens
    # segmented cumsum: global cumsum, then subtract each segment's carry-in
    csum = np.cumsum(deltas)
    carry = np.zeros(total, dtype=np.int64)
    seg_carry = csum[starts] - deltas[starts]  # cumsum before each segment start
    carry[starts] = seg_carry
    np.maximum.accumulate(carry, out=carry)
    flat = csum - carry
    return flat, starts
