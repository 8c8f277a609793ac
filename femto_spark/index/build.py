"""Distributed inverted-index build — the Spark restatement of FEMTO's
parallel external-memory index builder (`femto_index`).

FEMTO's build plan (SURVEY.md §2.2, `/root/reference/src/dcx_cc/dcx.hh`) is
{read → sample splitters → form tuples → distribute → sort bins → merge →
encode blocks → write + header}. Ours is the same shape with the heavy
lifting MAP-SIDE and *no strings in the hot path*:

  corpus ──JVM: tokenize + hash──▶ (doc_id, dl, term_hash array<long>)
      │  NO raw-token shuffle; Python sees only int64 arrays
      ▼
  stage 1  mapInPandas per corpus partition: numpy-sort the batch's
           (hash, doc, pos) hits, emit one compressed partial RUN per
           (term_hash, doc-range grp) per batch            [PARTIALS ✓ ckpt]
      │  the only posting shuffle moves compressed runs, keyed by BUCKET
      ▼  (bucket = pmod(term_hash, n_buckets)), sorted (term_hash, grp)
  stage 2  mapInPandas stream: k-way merge each (term_hash, grp)'s runs →
           ≤ shard_size rows with block-max metadata; written directly
           partitionBy(bucket) — the merge shuffle IS the final layout,
           blobs move exactly once                          [INDEX]
      ▼
  side tables: vocab/ (term_hash → term, collision-asserted), docs/,
  stats.json, termstats/, manifest/                         [HEADER]

Term strings never cross the JVM↔Python boundary during the build (an
earlier revision shipped 40M token strings through Arrow; converting them
to Python objects dominated the build and did not scale past 8 cores).
Queries hash their terms driver-side with the Spark-parity XXH64
(femto_spark.xxhash), so the index is keyed by term_hash end-to-end; the
vocab table exists for prefix operations (extend) and reporting. 64-bit
collisions are asserted absent at build time (for 10^9+ vocabularies,
widen to 128-bit by pairing xxhash64 with a second seed).

Skew (the north rule's named concern): the merge task for a hot term is
bounded TWO ways — `grp = doc_id >> range_shift` splits every term's
postings into disjoint doc-range groups (a term with df=10^11 becomes
~df/2^range_shift independent merge groups), and `shard_size` caps any
single output row. Range groups keep global doc order, so shards stay
sorted and incremental appends land in fresh groups. Bucket partitions
hold ~|vocab|/n_buckets terms each — balanced by hash.

Checkpoint/resume (north rule): every stage commits atomically — data
files first, then a `_COMMITTED_<stage>.json` marker; a manifest table
records per-partition lineage metrics (FEMTO's `REPORT DISK_BYTES_*`
lines, `dcx.hh:6148-6157`). `build_index(..., resume=True)` skips
committed stages — kill/rerun equals one-shot (tests/test_resume.py).

Storage is Parquet partitioned by `bucket` — standing in for an Iceberg
`bucket(term)` partition transform; swap the writes for `writeTo(...)`
when a catalog is configured.
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
    encode_hit_segments,
    encode_positions_flat,
    encode_postings,
)
from ..tokenizer import spark_tokens_expr

# bump when the on-disk layout changes; readers refuse older layouts
FORMAT_VERSION = 4  # v4: docs/ carries indexed metadata field columns

# ---------------------------------------------------------------------------
# schemas
# ---------------------------------------------------------------------------

_POSTING_FIELDS = [
    T.StructField("term_hash", T.LongType(), False),
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
    [T.StructField("grp", T.LongType(), False)] + _POSTING_FIELDS
)

MERGED_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("grp", T.LongType(), False),
        T.StructField("shard", T.IntegerType(), False),
    ]
    + _POSTING_FIELDS
)


def _posting_row(term_hash: int, doc_ids, tfs, dls, pos_blob):
    blob, meta = encode_postings(doc_ids, tfs, dls)
    return {
        "term_hash": int(term_hash),
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


from ..arrowutil import batched_rows as _batched  # shared Arrow-stream helper


# ---------------------------------------------------------------------------
# stage 1: map-side partial runs — (term_hash, grp) per Arrow batch
# ---------------------------------------------------------------------------


def _make_encode_mapside(range_shift: int, with_positions: bool = True):
    def _encode(batches):
        """mapInPandas over corpus partitions carrying (doc_id, dl,
        thash array<long>). Per Arrow batch: flatten, lexsort hits by
        (hash, doc, pos), then encode every (hash, grp) segment in one
        vectorized pass (codec.encode_hit_segments — global varint
        streams + ufunc.reduceat block stats; no per-segment loops over
        numpy calls). Pure int64 — no Python objects, no per-row Python
        (input_hint mandate); no shuffle has happened — this is the
        map-side combine."""

        def _row_batches():
            for pdf in batches:
                lens = pdf["dl"].to_numpy(np.int64)
                total = int(lens.sum())
                if total == 0:
                    continue
                flat = np.concatenate(
                    [np.asarray(h, dtype=np.int64) for h in pdf["thash"]]
                )
                doc_rep = np.repeat(pdf["doc_id"].to_numpy(np.int64), lens)
                dl_rep = np.repeat(lens, lens)
                starts = np.cumsum(lens) - lens
                pos = np.arange(total, dtype=np.int64) - np.repeat(starts, lens)
                # grp is monotone in doc_id → sorting (hash, doc) sorts grp
                order = np.lexsort((pos, doc_rep, flat))
                rows = encode_hit_segments(
                    flat[order],
                    doc_rep[order] >> range_shift,
                    doc_rep[order],
                    dl_rep[order],
                    pos[order],
                    with_positions,
                )
                if rows:
                    yield pd.DataFrame(rows)

        yield from _row_batches()

    return _encode


# ---------------------------------------------------------------------------
# stage 2: merge partial runs per (term_hash, grp) → sharded final rows
# ---------------------------------------------------------------------------


from ..arrowutil import stream_groups as _stream_groups  # noqa: E402


def _make_merge_stream(shard_size: int, n_buckets: int):
    """mapInPandas over a bucket-partitioned, (term_hash, grp)-sorted
    stream of partial runs: k-way merge each (term_hash, grp) group's runs
    (disjoint doc sets from different source batches) and emit sharded
    final rows. Task input is bounded by the grp doc-range — no whole-term
    task ever exists. Output is already bucket-aligned, so the writer
    needs no further shuffle."""

    def _merge(pdf: pd.DataFrame):
        th = int(pdf["term_hash"].iloc[0])
        runs = []
        for r in pdf.itertuples(index=False):
            d, t, l = decode_postings(bytes(r.postings), r.n, r.tf_off, r.dl_off)
            pblob = bytes(r.positions) if r.positions is not None else b""
            if pblob:
                pflat, _ = decode_positions(pblob, t)
            else:
                pflat = np.empty(0, dtype=np.int64)
            runs.append((d, t, l, pflat))
        doc = np.concatenate([r[0] for r in runs])
        tfs = np.concatenate([r[1] for r in runs])
        dls = np.concatenate([r[2] for r in runs])
        # runs hold disjoint doc sets → stable argsort = k-way merge
        order = np.argsort(doc, kind="stable")
        # permute the flat position segments into merged order (vectorized)
        flat = np.concatenate([r[3] for r in runs])
        has_positions = flat.size > 0
        run_offsets = np.cumsum([0] + [r[3].size for r in runs])[:-1]
        within = np.concatenate(
            [np.cumsum(r[1]) - r[1] for r in runs]
        ) + np.repeat(run_offsets, [r[0].size for r in runs])
        doc, tfs, dls = doc[order], tfs[order], dls[order]
        src_starts = within[order]
        lens = tfs
        total = int(lens.sum())
        if has_positions:
            out_idx = np.repeat(src_starts, lens) + (
                np.arange(total) - np.repeat(np.cumsum(lens) - lens, lens)
            )
            flat_sorted = flat[out_idx]
        else:
            flat_sorted = flat

        bucket = th % n_buckets  # == Spark pmod for positive n_buckets
        grp = int(pdf["grp"].iloc[0])
        rows = []
        pos_bounds = np.concatenate(([0], np.cumsum(lens)))
        for shard, lo in enumerate(range(0, doc.size, shard_size)):
            hi = min(lo + shard_size, doc.size)
            pb = (
                encode_positions_flat(
                    flat_sorted[pos_bounds[lo] : pos_bounds[hi]], lens[lo:hi]
                )
                if has_positions
                else b""
            )
            row = _posting_row(th, doc[lo:hi], tfs[lo:hi], dls[lo:hi], pb)
            row.update({"bucket": bucket, "grp": grp, "shard": shard})
            rows.append(row)
        return rows

    def _stream(batches):
        yield from _batched(_stream_groups(batches, ["term_hash", "grp"], _merge))

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


def build_vocab(spark: SparkSession, toks: DataFrame, vocab_path: str) -> int:
    """Distinct (term_hash, term) side table; asserts no 64-bit collision.
    JVM-only: explode → partial-agg distinct → write. Returns vocab size."""
    _fresh(vocab_path)
    vocab = (
        toks.select(F.explode("tokens").alias("term"))
        .distinct()
        .withColumn("term_hash", F.xxhash64("term"))
    )
    vocab.write.mode("overwrite").parquet(vocab_path)
    v = spark.read.parquet(vocab_path)
    row = v.agg(
        F.count("*").alias("n"), F.countDistinct("term_hash").alias("h")
    ).collect()[0]
    n_terms, n_hashes = int(row["n"]), int(row["h"])
    if n_terms != n_hashes:
        raise RuntimeError(
            f"xxhash64 term collision detected ({n_terms} terms, {n_hashes} "
            "hashes) — widen to 128-bit hashing"
        )
    return n_terms


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
    range_shift: int = 22,
    shard_size: int = 1 << 18,
    n_partitions: int | None = None,
    resume: bool = False,
    with_positions: bool = True,
    field_cols: list[str] | None = None,
) -> dict:
    """Build the full index layout under `out_dir`:

        docs/       doc_id, dl [, field_cols...]    (BM25 |d|; extract joins;
                    indexed metadata fields — FEMTO's doc header sections,
                    block_format.txt:1-15 — queryable via search(where=...))
        stats.json  n_docs, avgdl, range_shift, ... (FEMTO header C[] analogue)
        vocab/      term_hash, term                 (for extend/reporting)
        partials/   stage-1 map-side runs           (checkpoint for resume)
        index/      bucket=*/ final posting rows    (FEMTO data blocks)
        termstats/  term_hash, df, cf               (header block_occs analogue)
        manifest/   per-partition lineage metrics   (FEMTO REPORT lines)

    range_shift: log2 of the doc-range group width — the merge-task bound.
    Returns a dict of stage timings/metrics.
    """
    os.makedirs(out_dir, exist_ok=True)
    report: dict = {"stages": {}}

    def _stage(name):
        return not (resume and _committed(out_dir, name))

    tokens_expr = spark_tokens_expr(text_col)
    toks = corpus.select(
        F.col(id_col).alias("doc_id"), F.expr(tokens_expr).alias("tokens")
    )
    n_part = n_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))

    # three stages consume the tokenized corpus (docs, vocab, partials) —
    # persist it once instead of re-scanning + re-tokenizing per stage
    # (MEMORY_AND_DISK: spills rather than recomputes at 100 TB scale)
    tok_stages = [s for s in ("docs", "vocab", "partials") if _stage(s)]
    if len(tok_stages) >= 2:
        from pyspark import StorageLevel

        toks = toks.persist(StorageLevel.MEMORY_AND_DISK)

    # ---- stage: docs + stats (header analogue) ---------------------------
    docs_path = os.path.join(out_dir, "docs")
    if _stage("docs"):
        t0 = time.time()
        _fresh(docs_path)
        if field_cols:
            # indexed metadata fields ride along in the docs table — one
            # extra projection, zero extra shuffles; queries filter on
            # them with a semi-join (FEMTO's header-section analogue)
            fields = corpus.select(
                F.col(id_col).alias("doc_id"), *[F.col(c) for c in field_cols]
            )
            doc_lens = toks.select(
                "doc_id", F.size("tokens").alias("dl")
            ).join(fields, "doc_id")
        else:
            doc_lens = toks.select("doc_id", F.size("tokens").alias("dl"))
        # corpus stats piggyback on the write job via an Observation —
        # the former persist + separate agg action was a whole extra
        # pass (and a cache pin) per build just to learn two numbers
        from pyspark.sql import Observation

        obs = Observation("docs_stats")
        doc_lens = doc_lens.observe(
            obs,
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("dl").alias("total_tokens"),
        )
        doc_lens.write.mode("overwrite").parquet(docs_path)
        stats_row = obs.get
        n_docs = int(stats_row["n_docs"])
        total_tokens = int(stats_row["total_tokens"] or 0)
        stats = {
            "n_docs": n_docs,
            "total_tokens": total_tokens,
            # float64 division once, here — every scorer reads this value
            "avgdl": (total_tokens / n_docs) if n_docs else 0.0,
            "n_buckets": n_buckets,
            "range_shift": range_shift,
            "with_positions": with_positions,
            "field_cols": list(field_cols or []),
            "format_version": FORMAT_VERSION,
        }
        with open(os.path.join(out_dir, "stats.json"), "w") as f:
            json.dump(stats, f)
        dt = time.time() - t0
        _commit(out_dir, "docs", {"secs": dt, **stats})
        report["stages"]["docs"] = dt

    # ---- stage: vocab side table ------------------------------------------
    if _stage("vocab"):
        t0 = time.time()
        n_terms = build_vocab(spark, toks, os.path.join(out_dir, "vocab"))
        dt = time.time() - t0
        _commit(out_dir, "vocab", {"secs": dt, "n_terms": n_terms})
        report["stages"]["vocab"] = dt

    # ---- stage: partials (map-side stage-1 encode) ------------------------
    partials_path = os.path.join(out_dir, "partials")
    if _stage("partials"):
        t0 = time.time()
        _fresh(partials_path)
        src = toks.select(
            "doc_id",
            F.size("tokens").alias("dl"),
            F.expr("transform(tokens, t -> xxhash64(t))").alias("thash"),
        )
        if src.rdd.getNumPartitions() < n_part:
            src = src.repartition(n_part)
        partials = src.mapInPandas(
            _make_encode_mapside(range_shift, with_positions), PARTIAL_SCHEMA
        )
        partials.write.mode("overwrite").parquet(partials_path)
        dt = time.time() - t0
        _commit(out_dir, "partials", {"secs": dt})
        report["stages"]["partials"] = dt

    if len(tok_stages) >= 2:
        toks.unpersist()

    # ---- stage: final index (merge + shard, bucket-aligned) ---------------
    index_path = os.path.join(out_dir, "index")
    if _stage("index"):
        t0 = time.time()
        _fresh(index_path)
        try:
            partials = spark.read.parquet(partials_path)
        except Exception:  # empty corpus → schema-less parquet dir
            partials = spark.createDataFrame([], PARTIAL_SCHEMA)
        # merge parallelism scales with the cluster, NOT with n_buckets:
        # each bucket splits into k = ceil(n_part / n_buckets) slices by
        # a hash of the merge-group key (term_hash, grp) — every group
        # stays whole, every task is bucket-pure (so the
        # partitionBy(bucket) write stays one-file-per-task), and the
        # slice count scales with the cluster. Placement uses exact
        # steering values (steering.py) instead of repartitionByRange:
        # the old range exchange ran a SAMPLING JOB that executed the
        # full partials scan (blobs included) just to learn boundaries a
        # pure function of the key already determines — a fixed serial
        # cost at every scale. (Round-1's repartition(n_buckets,
        # "bucket") capped the merge at 16 tasks; round-2's range
        # repartition paid the sampling pass.)
        from .steering import steering_values

        k_slices = max(1, -(-n_part // n_buckets))
        n_merge = n_buckets * k_slices
        magics = steering_values(n_merge)
        pid = (
            F.pmod(F.col("term_hash"), F.lit(n_buckets)).cast("int")
            * k_slices
            + F.pmod(
                F.xxhash64(F.col("term_hash"), F.col("grp")), F.lit(k_slices)
            ).cast("int")
        )
        steer = F.element_at(
            F.array(*[F.lit(int(m)).cast("long") for m in magics]),
            pid + 1,
        )
        merged = (
            partials.withColumn("_steer", steer)
            .repartition(n_merge, "_steer")
            .sortWithinPartitions("term_hash", "grp")
            .drop("_steer")
            .mapInPandas(_make_merge_stream(shard_size, n_buckets), MERGED_SCHEMA)
        )
        # output partitions are bucket-aligned → direct partitioned write,
        # exactly one blob shuffle in the whole build
        merged.write.mode("overwrite").partitionBy("bucket").parquet(index_path)
        dt = time.time() - t0
        _commit(out_dir, "index", {"secs": dt})
        report["stages"]["index"] = dt

    # ---- stage: termstats + manifest (lineage metrics) --------------------
    if _stage("termstats"):
        t0 = time.time()
        try:
            ix = spark.read.parquet(index_path)
        except Exception:  # empty corpus
            ix = spark.createDataFrame([], MERGED_SCHEMA)
        ts_path = os.path.join(out_dir, "termstats")
        _fresh(ts_path)
        (
            ix.groupBy("term_hash")
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
                F.countDistinct("term_hash").alias("n_terms"),
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
    report["range_shift"] = range_shift
    if report["stages"]:
        commit_snapshot(out_dir, "build", report["stages"])
    return report


def commit_snapshot(out_dir: str, kind: str, detail: dict) -> dict:
    """Append an entry to the index's snapshot log (snapshots.json) — the
    Iceberg-snapshot-shaped lineage chain: each build / incremental append
    records its parent, so the index's history is auditable and a reader
    can pin a version. (With a real Iceberg catalog this becomes the
    table's own snapshot list; the shape is kept identical.)"""
    path = os.path.join(out_dir, "snapshots.json")
    log = []
    if os.path.exists(path):
        with open(path) as f:
            log = json.load(f)
    entry = {
        "snapshot_id": len(log),
        "parent_id": len(log) - 1 if log else None,
        "kind": kind,
        "detail": detail,
    }
    log.append(entry)
    with open(path, "w") as f:
        json.dump(log, f, indent=1)
    return entry
