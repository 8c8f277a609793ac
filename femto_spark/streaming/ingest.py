"""Continuous ingest — Structured Streaming over the incremental index.

The reference has no streaming engine (SURVEY.md §2.9); its production
answer was a staging-directory protocol
(`/root/reference/src/scripts/README.txt:20-45`): new files land in
`staging/`, get hardlinked into a `working/` set, are searchable only via
the slow `femto_scan` path until a batch re-index moves them to
`indexed/`. Posting lists + Spark Structured Streaming collapse that
whole protocol into one operator:

    stream_ingest(spark, index_dir, source_dir)

  * `readStream` watches `source_dir` for new corpus parquet files
    (the `staging/` analogue; exactly-once via the stream checkpoint);
  * every micro-batch appends to the index through
    `incremental.merge_into` — so the data is *indexed*, not scan-only,
    within one trigger interval;
  * the stream checkpoint + the index's own stage markers give end-to-end
    resumability: every batch calls merge_into with run_id=batch_id, so a
    foreachBatch replay after a crash (Spark re-delivers the same
    batch_id) deletes the failed attempt's run-keyed partial/doc files
    before re-appending, and a replay of a fully-committed batch (the
    `_RUN_<id>_DONE` marker exists) is a no-op — exactly-once appends,
    not blind ones.

Caveat (documented trade): merge_into re-merges affected (term, grp)
groups per batch; for high-frequency triggers, widen the trigger interval
or land batches into a delta index and compact on a schedule — both are
parameter choices, not redesigns.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..index.incremental import merge_into


def stream_ingest(
    spark: SparkSession,
    index_dir: str,
    source_dir: str,
    checkpoint_dir: str,
    *,
    schema: str = "doc_id long, text string",
    id_col: str = "doc_id",
    text_col: str = "text",
    available_now: bool = True,
    trigger_seconds: int = 60,
):
    """Start (and with available_now=True, run to completion) a streaming
    ingest that appends every new corpus file under `source_dir` to the
    index at `index_dir`. Returns the StreamingQuery."""

    def _apply(batch_df, batch_id: int):
        if batch_df.isEmpty():
            return
        merge_into(
            spark,
            index_dir,
            batch_df,
            id_col=id_col,
            text_col=text_col,
            run_id=f"b{batch_id}",
        )

    reader = (
        spark.readStream.schema(schema).parquet(source_dir)
    )
    writer = (
        reader.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.trigger(processingTime=f"{trigger_seconds} seconds").start()
