"""Arrow-stream helpers shared by build stages and vectorized operators.

`stream_groups` is the workhorse: process a repartitioned,
sortWithinPartitions stream with mapInPandas and cut group boundaries in
numpy — one Python/Arrow round-trip per PARTITION instead of
applyInPandas' per-GROUP exchange (which dominates when groups are small
and numerous: vocab×salt groups in the build, per-doc groups in MinHash).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def stream_groups(batches, key_cols: list[str], process):
    """Yield process(group_pdf) for each contiguous group of `key_cols` in
    a sorted batch stream, carrying partial groups across Arrow batches."""
    carry: pd.DataFrame | None = None
    for pdf in batches:
        if carry is not None and len(carry):
            pdf = pd.concat([carry, pdf], ignore_index=True)
            carry = None
        n = len(pdf)
        if n == 0:
            continue
        change = np.zeros(n, dtype=bool)
        for c in key_cols:
            v = pdf[c].to_numpy()
            change[1:] |= v[1:] != v[:-1]
        starts = np.flatnonzero(np.concatenate(([True], change[1:])))
        last = starts[-1]
        carry = pdf.iloc[last:]
        for i in range(len(starts) - 1):
            out = process(pdf.iloc[starts[i] : starts[i + 1]])
            if out is not None:
                yield out
    if carry is not None and len(carry):
        out = process(carry)
        if out is not None:
            yield out


def batched_rows(row_iter, batch_rows: int = 256):
    """Collect small per-group result dicts into DataFrame batches."""
    buf: list[dict] = []
    for rows in row_iter:
        buf.extend(rows if isinstance(rows, list) else [rows])
        if len(buf) >= batch_rows:
            yield pd.DataFrame(buf)
            buf = []
    if buf:
        yield pd.DataFrame(buf)
