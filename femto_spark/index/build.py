"""Distributed inverted-index build — the Spark restatement of FEMTO's
parallel external-memory index builder (`femto_index`).

FEMTO's build plan (SURVEY.md §2.2, `/root/reference/src/dcx_cc/dcx.hh`) is
{read → sample splitters → form tuples → distribute → sort bins → merge →
encode blocks → write + header}. Ours is the same shape in Spark terms:

    corpus ──tokenize (JVM exprs)──▶ token rows (term, doc_id, pos, dl)
        ── shuffle on (term, salt) ──▶ stage 1: partial sorted posting runs
           (applyInPandas: numpy sort + delta/varint encode)     [PARTIALS]
        ── shuffle on term ──▶ stage 2: k-way merge of ≤ n_salts runs per
           term, shard into ≤ shard_size posting rows, final encode [INDEX]
        plus doc-length table, global stats, term stats          [HEADER]

Skew (the north rule's named concern): hot Zipf terms are split across
`n_salts` stage-1 tasks keyed by hash(doc_id) — FEMTO's sampled range
splitters (`dcx.hh:3723`) solved the same problem for suffix tuples. The
stage-2 merge input per term is n_salts *compressed* runs, so a single
task's bytes stay bounded; at 100 TB you raise n_salts (and shard_size
caps any one output row). Stage 1 does the heavy lifting map-side — it is
the analogue of Spark's partial aggregation.

Checkpoint/resume (north rule): every stage commits atomically — data
files first, then a `_COMMITTED_<stage>.json` marker; a manifest table
records per-partition lineage metrics (rows, postings, bytes, like FEMTO's
`REPORT DISK_BYTES_*` lines, `dcx.hh:6148-6157`). `build_index(...,
resume=True)` skips stages whose marker exists — kill/rerun equals
one-shot (tests/test_resume.py).

Storage is Parquet partitioned by `bucket` (hash(term) % n_buckets) —
standing in for an Iceberg `bucket(term)` partition transform; swap
`_write`'s format for "iceberg" when a catalog is configured.
"""

from __future__ import annotations

import json
import os
import shutil
import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..codec import (
    decode_positions,
    decode_postings,
    encode_positions_flat,
    encode_postings,
)
from ..tokenizer import spark_tokens_expr
from ..xxhash import term_bucket

# ---------------------------------------------------------------------------
# schemas
# ---------------------------------------------------------------------------

_POSTING_FIELDS = [
    T.StructField("term", T.StringType(), False),
    T.StructField("n", T.LongType(), False),
    T.StructField("cf", T.LongType(), False),
    T.StructField("tf_off", T.IntegerType(), False),
    T.StructField("dl_off", T.IntegerType(), False),
    T.StructField("block_last_doc", T.ArrayType(T.LongType()), False),
    T.StructField("block_max_tf", T.ArrayType(T.LongType()), False),
    T.StructField("block_min_dl", T.ArrayType(T.LongType()), False),
    T.StructField("block_gap_off", T.ArrayType(T.IntegerType()), False),
    T.StructField("block_tf_off", T.ArrayType(T.IntegerType()), False),
    T.StructField("block_dl_off", T.ArrayType(T.IntegerType()), False),
    T.StructField("postings", T.BinaryType(), False),
    T.StructField("positions", T.BinaryType(), True),
]

PARTIAL_SCHEMA = T.StructType(
    [T.StructField("salt", T.IntegerType(), False)] + _POSTING_FIELDS
)

INDEX_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("shard", T.IntegerType(), False),
        T.StructField("df", T.LongType(), False),  # term-level df (all shards)
    ]
    + _POSTING_FIELDS
)


def _posting_row(term, doc_ids, tfs, dls, pos_blob):
    blob, meta = encode_postings(doc_ids, tfs, dls)
    return {
        "term": term,
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
        "positions": pos_blob,
    }


# ---------------------------------------------------------------------------
# sorted-stream group processing
# ---------------------------------------------------------------------------
#
# Both build stages process a stream that is repartitioned on the group key
# and sorted within partitions (repartition + sortWithinPartitions — the
# Spark form of FEMTO's distribute-then-sort bins, dcx.hh:4214). We then
# stream the partition through mapInPandas and cut group boundaries
# ourselves. This avoids applyInPandas' per-group Arrow exchange — with a
# Zipf vocabulary there are ~vocab×n_salts tiny groups, and per-group
# overhead dominates; a partition-level stream pays it once per partition.


def _stream_groups(batches, key_cols: list[str], process):
    """Yield process(group_pdf) for each contiguous group of `key_cols` in a
    sorted batch stream, carrying partial groups across Arrow batches."""
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
        # hold back the last (possibly incomplete) group
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


def _batched(row_iter, batch_rows: int = 64):
    """Collect small per-group result dicts into DataFrame batches."""
    buf: list[dict] = []
    for rows in row_iter:
        buf.extend(rows if isinstance(rows, list) else [rows])
        if len(buf) >= batch_rows:
            yield pd.DataFrame(buf)
            buf = []
    if buf:
        yield pd.DataFrame(buf)


# ---------------------------------------------------------------------------
# stage 1: token rows → partial posting runs per (term, salt)
# ---------------------------------------------------------------------------


def _encode_partials_stream(batches):
    """mapInPandas over a (term, salt)-partitioned, (term, salt, doc_id,
    pos)-sorted stream: per group, collapse to (doc_id, tf, dl, positions)
    and varint-encode one partial run. All numpy — no per-row Python
    (input_hint mandate). Group size ≈ df(term)/n_salts hits — the salted
    bound on task memory."""

    def _one(g: pd.DataFrame) -> dict:
        doc = g["doc_id"].to_numpy(np.int64)
        pos = g["pos"].to_numpy(np.int64)
        dl = g["dl"].to_numpy(np.int64)
        # stream is pre-sorted by (doc_id, pos) within the group
        uniq_doc, starts, tfs = np.unique(doc, return_index=True, return_counts=True)
        pos_blob = encode_positions_flat(pos, tfs)
        row = _posting_row(g["term"].iloc[0], uniq_doc, tfs, dl[starts], pos_blob)
        row["salt"] = int(g["salt"].iloc[0])
        return row

    yield from _batched(_stream_groups(batches, ["term", "salt"], _one))


# ---------------------------------------------------------------------------
# stage 2: merge partial runs per term → sharded final rows
# ---------------------------------------------------------------------------


def _make_merge_stream(shard_size: int, n_buckets: int):
    """mapInPandas over a term-partitioned, (term, salt)-sorted stream of
    partial runs: k-way merge each term's ≤ n_salts compressed runs and
    emit sharded final rows."""

    def _merge(pdf: pd.DataFrame):
        term = pdf["term"].iloc[0]
        runs = []
        for r in pdf.itertuples(index=False):
            d, t, l = decode_postings(bytes(r.postings), r.n, r.tf_off, r.dl_off)
            pflat, _ = decode_positions(bytes(r.positions), t)
            runs.append((d, t, l, pflat))
        doc = np.concatenate([r[0] for r in runs])
        tfs = np.concatenate([r[1] for r in runs])
        dls = np.concatenate([r[2] for r in runs])
        # merge sorted runs: doc_ids are globally unique across salts
        # (salt = hash(doc_id)), so a stable argsort is a k-way merge.
        order = np.argsort(doc, kind="stable")
        # permute the flat position segments into the merged order
        # (vectorized segment gather — no per-posting Python loop):
        flat = np.concatenate([r[3] for r in runs])
        run_offsets = np.cumsum([0] + [r[3].size for r in runs])[:-1]
        # start of each posting's segment within the concatenated flat
        within = np.concatenate(
            [np.cumsum(r[1]) - r[1] for r in runs]
        ) + np.repeat(run_offsets, [r[0].size for r in runs])
        doc, tfs, dls = doc[order], tfs[order], dls[order]
        src_starts = within[order]
        lens = tfs
        total = int(lens.sum())
        out_idx = np.repeat(src_starts, lens) + (
            np.arange(total) - np.repeat(np.cumsum(lens) - lens, lens)
        )
        flat_sorted = flat[out_idx]

        bucket = term_bucket(term, n_buckets)
        df_total = int(doc.size)
        rows = []
        pos_bounds = np.concatenate(([0], np.cumsum(lens)))
        for shard, lo in enumerate(range(0, doc.size, shard_size)):
            hi = min(lo + shard_size, doc.size)
            pb = encode_positions_flat(
                flat_sorted[pos_bounds[lo] : pos_bounds[hi]], lens[lo:hi]
            )
            row = _posting_row(term, doc[lo:hi], tfs[lo:hi], dls[lo:hi], pb)
            row.update({"bucket": bucket, "shard": shard, "df": df_total})
            rows.append(row)
        return rows

    def _stream(batches):
        yield from _batched(_stream_groups(batches, ["term"], _merge))

    return _stream


# ---------------------------------------------------------------------------
# commit/resume plumbing
# ---------------------------------------------------------------------------


def _marker(out_dir: str, stage: str) -> str:
    return os.path.join(out_dir, f"_COMMITTED_{stage}.json")


def _committed(out_dir: str, stage: str) -> bool:
    return os.path.exists(_marker(out_dir, stage))


def _commit(out_dir: str, stage: str, info: dict) -> None:
    with open(_marker(out_dir, stage), "w") as f:
        json.dump({"stage": stage, **info}, f)


def _fresh(path: str) -> None:
    if os.path.exists(path):
        shutil.rmtree(path)


# ---------------------------------------------------------------------------
# the build
# ---------------------------------------------------------------------------


def build_index(
    spark: SparkSession,
    corpus: DataFrame,
    out_dir: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 16,
    n_salts: int = 8,
    shard_size: int = 1 << 18,
    n_partitions: int | None = None,
    resume: bool = False,
    with_positions: bool = True,
) -> dict:
    """Build the full index layout under `out_dir`:

        docs/       doc_id, dl                      (BM25 |d|; extract joins)
        stats.json  n_docs, avgdl, total_tokens     (FEMTO header C[] analogue)
        partials/   stage-1 salted runs             (checkpoint for resume)
        index/      bucket=*/...final posting rows  (FEMTO data blocks)
        termstats/  term, df, cf                    (header block_occs analogue)
        manifest/   per-partition lineage metrics   (FEMTO REPORT lines)

    Returns a dict of stage timings/metrics.
    """
    os.makedirs(out_dir, exist_ok=True)
    report: dict = {"stages": {}}
    manifest_rows: list[dict] = []

    def _stage(name):
        return not (resume and _committed(out_dir, name))

    tokens_expr = spark_tokens_expr(text_col)
    toks = corpus.select(
        F.col(id_col).alias("doc_id"), F.expr(tokens_expr).alias("tokens")
    )

    # ---- stage: docs + stats (header analogue) ---------------------------
    docs_path = os.path.join(out_dir, "docs")
    if _stage("docs"):
        t0 = time.time()
        _fresh(docs_path)
        doc_lens = toks.select("doc_id", F.size("tokens").alias("dl"))
        doc_lens.write.mode("overwrite").parquet(docs_path)
        stats_row = (
            spark.read.parquet(docs_path)
            .agg(
                F.count("*").alias("n_docs"),
                F.sum("dl").alias("total_tokens"),
            )
            .collect()[0]
        )
        n_docs = int(stats_row["n_docs"])
        total_tokens = int(stats_row["total_tokens"] or 0)
        stats = {
            "n_docs": n_docs,
            "total_tokens": total_tokens,
            # float64 division once, here — every scorer reads this value
            "avgdl": (total_tokens / n_docs) if n_docs else 0.0,
            "n_buckets": n_buckets,
            "n_salts": n_salts,
        }
        with open(os.path.join(out_dir, "stats.json"), "w") as f:
            json.dump(stats, f)
        dt = time.time() - t0
        _commit(out_dir, "docs", {"secs": dt, **stats})
        report["stages"]["docs"] = dt

    n_part = n_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))

    # ---- stage: partials (salted stage-1 encode) --------------------------
    partials_path = os.path.join(out_dir, "partials")
    if _stage("partials"):
        t0 = time.time()
        _fresh(partials_path)
        hits = toks.select(
            "doc_id",
            F.size("tokens").alias("dl"),
            F.posexplode("tokens").alias("pos", "term"),
        ).withColumn(
            "salt", F.pmod(F.xxhash64("doc_id"), F.lit(n_salts)).cast("int")
        )
        # FEMTO's distribute-then-sort-bins, Spark form: one shuffle keyed
        # (term, salt), partition-local sort, partition-level stream encode
        partials = (
            hits.repartition(n_part, "term", "salt")
            .sortWithinPartitions("term", "salt", "doc_id", "pos")
            .mapInPandas(_encode_partials_stream, PARTIAL_SCHEMA)
        )
        partials.write.mode("overwrite").parquet(partials_path)
        dt = time.time() - t0
        _commit(out_dir, "partials", {"secs": dt})
        report["stages"]["partials"] = dt

    # ---- stage: final index (merge + shard) -------------------------------
    index_path = os.path.join(out_dir, "index")
    if _stage("index"):
        t0 = time.time()
        _fresh(index_path)
        partials = spark.read.parquet(partials_path)
        merged = (
            partials.repartition(n_part, "term")
            .sortWithinPartitions("term", "salt")
            .mapInPandas(_make_merge_stream(shard_size, n_buckets), INDEX_SCHEMA)
        )
        # one output file per bucket: query-side scans then launch at most
        # |buckets-hit| tasks instead of |written-tasks × buckets|
        merged.repartition(n_buckets, "bucket").write.mode("overwrite").partitionBy(
            "bucket"
        ).parquet(index_path)
        dt = time.time() - t0
        _commit(out_dir, "index", {"secs": dt})
        report["stages"]["index"] = dt

    # ---- stage: termstats + manifest (lineage metrics) --------------------
    if _stage("termstats"):
        t0 = time.time()
        ix = spark.read.parquet(index_path)
        ts_path = os.path.join(out_dir, "termstats")
        _fresh(ts_path)
        (
            ix.groupBy("term")
            .agg(
                F.sum("n").alias("df"),
                F.sum("cf").alias("cf"),
                F.count("*").alias("n_shards"),
            )
            .write.mode("overwrite")
            .parquet(ts_path)
        )
        # per-partition lineage manifest (FEMTO REPORT analogue)
        man_path = os.path.join(out_dir, "manifest")
        _fresh(man_path)
        (
            ix.groupBy("bucket")
            .agg(
                F.count("*").alias("n_rows"),
                F.countDistinct("term").alias("n_terms"),
                F.sum("n").alias("n_postings"),
                F.sum(F.length("postings")).alias("posting_bytes"),
                F.sum(F.length("positions")).alias("position_bytes"),
            )
            .withColumn("stage", F.lit("index"))
            .withColumn("status", F.lit("committed"))
            .write.mode("overwrite")
            .parquet(man_path)
        )
        dt = time.time() - t0
        _commit(out_dir, "termstats", {"secs": dt})
        report["stages"]["termstats"] = dt

    report["out_dir"] = out_dir
    report["n_buckets"] = n_buckets
    report["n_salts"] = n_salts
    return report
