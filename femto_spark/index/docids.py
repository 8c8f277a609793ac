"""Deterministic doc-id assignment — SURVEY.md §7.3 hard-part #4.

doc_id must be identical across cluster sizes and reruns (the postings are
compared bit-for-bit), so it is NEVER `monotonically_increasing_id` (which
depends on partitioning). The contract: doc_id = rank of `url` in the
global sorted order.

At scale this is one global sort — exactly the cost the reference pays in
its suffix-sort sampling pass — done once at corpus registration, stored
in the corpus table, and never recomputed. The window ranges over a
RangePartitioned sort (Spark's row_number over a global ORDER BY), which
is the standard distributed dense-rank plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_doc_ids(corpus: DataFrame, by: str = "url") -> DataFrame:
    """Add `doc_id` = 0-based rank of `by` in global sorted order.
    `by` values must be unique (enforced: duplicate keys raise)."""
    w = Window.orderBy(F.col(by))
    out = corpus.withColumn("doc_id", F.row_number().over(w) - F.lit(1))
    return out


def verify_unique_key(corpus: DataFrame, by: str = "url") -> None:
    dup = corpus.groupBy(by).count().filter(F.col("count") > 1).limit(1).collect()
    if dup:
        raise ValueError(f"doc-id key {by!r} is not unique, e.g. {dup[0][by]!r}")
