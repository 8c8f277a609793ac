"""Deterministic doc-id assignment — SURVEY.md §7.3 hard-part #4.

doc_id must be identical across cluster sizes and reruns (the postings are
compared bit-for-bit), so it is NEVER `monotonically_increasing_id` (which
depends on partitioning). The contract: doc_id = rank of `url` in the
global sorted order.

At scale this is the classic TWO-PASS distributed rank (the single-window
`row_number() OVER (ORDER BY url)` form collapses to ONE task holding the
whole corpus — Spark implements an unpartitioned window as a global sort
into a single partition):

  1. `repartitionByRange(url)` range-partitions the corpus (partition i's
     keys all sort before partition i+1's) and sorts within partitions —
     a normal parallel sort, every executor busy;
  2. per-partition row counts (a tiny agg) become broadcast prefix
     offsets;
  3. doc_id = partition offset + local row index, assigned in one
     mapInPandas pass with zero further shuffle.

The result is exactly the global rank — independent of the partition
boundaries the range sampler picked — so it equals the old single-window
plan bit-for-bit (tests/test_query_language.py::test_assign_doc_ids_two_pass).
Done once at corpus registration, stored, never recomputed.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assign_doc_ids(
    corpus: DataFrame, by: str = "url", n_partitions: int | None = None
) -> DataFrame:
    """Add `doc_id` = 0-based rank of `by` in global sorted order.
    `by` values must be unique (verify_unique_key enforces)."""
    spark = corpus.sparkSession
    n_p = n_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    from pyspark import StorageLevel

    # persist the range-partitioned sort so the counts pass and the
    # assignment pass see the identical physical partitioning
    part = (
        corpus.repartitionByRange(n_p, F.col(by))
        .sortWithinPartitions(by)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    counts = part.groupBy(F.spark_partition_id().alias("_pid")).count().collect()
    offsets: dict[int, int] = {}
    acc = 0
    for r in sorted(counts, key=lambda r: r["_pid"]):
        offsets[int(r["_pid"])] = acc
        acc += int(r["count"])

    out_schema = corpus.schema.add("doc_id", "long", False)

    def _assign(batches):
        base = None
        seen = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if base is None:
                base = offsets[int(pdf["_pid"].iloc[0])]
            pdf = pdf.drop(columns=["_pid"])
            pdf["doc_id"] = np.arange(seen, seen + len(pdf), dtype=np.int64) + base
            seen += len(pdf)
            yield pdf

    return part.withColumn("_pid", F.spark_partition_id()).mapInPandas(
        _assign, out_schema
    )


def verify_unique_key(corpus: DataFrame, by: str = "url") -> None:
    dup = corpus.groupBy(by).count().filter(F.col("count") > 1).limit(1).collect()
    if dup:
        raise ValueError(f"doc-id key {by!r} is not unique, e.g. {dup[0][by]!r}")
