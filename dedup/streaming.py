"""Incremental dedup over a growing images table (Structured Streaming).

The reference is batch-only (SURVEY.md §2.11); this is the engine's forward
path for continuously-arriving (image, caption) rows: `readStream` over the
landing directory -> `foreachBatch` incremental assignment against a
persistent key-state table.

Semantics (exact-dup tier, the streaming analog of the pipeline's reps
stage): a new row joins the cluster of any previously-seen identical caption
or byte-hash; otherwise it roots a new cluster at its own id. Output and
state writes are idempotent per micro-batch (state overwritten whole, batch
output overwritten at its own path), so Spark's checkpoint-replay after a
crash converges to the same tables. Fuzzy tiers (MinHash/pHash) run as
periodic batch compaction over the accumulated input — LSH band state is not
meaningfully incremental at one-row granularity, and the batch pipeline is
already resumable."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .schema import IMAGES


def _assign_batch(batch: DataFrame, batch_id: int, warehouse: str) -> None:
    spark = batch.sparkSession
    state_dir = os.path.join(warehouse, "stream_state")
    out_dir = os.path.join(warehouse, "stream_assignments", f"batch_id={batch_id}")

    keyed = batch.select(
        "image_id",
        F.concat_ws("|", F.sha2(F.col("bytes"), 256), F.col("caption")).alias("k_exact"),
        F.col("caption").alias("k_caption"),
    )
    try:
        state = spark.read.parquet(state_dir)
        has_state = True
    except Exception:
        state = spark.createDataFrame([], "key string, rep_id string")
        has_state = False

    # longest-match: exact (sha+caption) key first, then caption key
    exploded = keyed.selectExpr("image_id", "stack(2, k_exact, k_caption) AS key")
    hit = (
        exploded.join(F.broadcast(state) if has_state else state, "key", "left")
        .groupBy("image_id")
        .agg(F.min("rep_id").alias("rep_id"))
    )
    # unmatched rows: root at min image_id within the batch's own caption
    # group (caption equality subsumes the sha+caption key, so byte-identical
    # and caption-identical rows of the same batch land in one cluster)
    assigned = (
        keyed.join(hit, "image_id", "left")
        .withColumn(
            "cluster_id",
            F.coalesce(
                F.col("rep_id"), F.min("image_id").over(Window.partitionBy("k_caption"))
            ),
        )
    )
    out = assigned.select("image_id", "cluster_id")
    out.write.mode("overwrite").parquet(out_dir)

    # fold this batch's keys into the state (idempotent overwrite)
    new_keys = (
        assigned.selectExpr("cluster_id AS rep_id", "stack(2, k_exact, k_caption) AS key")
        .groupBy("key")
        .agg(F.min("rep_id").alias("rep_id"))
    )
    merged = (
        state.unionByName(new_keys)
        .groupBy("key")
        .agg(F.min("rep_id").alias("rep_id"))
    )
    tmp = state_dir + ".tmp"
    merged.write.mode("overwrite").parquet(tmp)
    merged_back = spark.read.parquet(tmp)
    merged_back.write.mode("overwrite").parquet(state_dir)


def incremental_dedup_stream(
    spark: SparkSession, input_dir: str, warehouse: str, checkpoint: str,
    available_now: bool = True,
):
    """Start the incremental dedup stream; returns the StreamingQuery.

    With available_now=True the query drains everything currently in
    input_dir and stops — the test/batch-drain mode."""
    stream = spark.readStream.schema(IMAGES).parquet(input_dir)
    writer = (
        stream.writeStream.foreachBatch(
            lambda b, bid: _assign_batch(b, bid, warehouse)
        )
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
