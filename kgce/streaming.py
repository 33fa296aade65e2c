"""Structured-Streaming ingest (optional capability).

The reference is strictly batch (SURVEY.md §2.10) — its per-file driver
loop (run_transformer_batch_prediction.py:57-72) is the closest analog to
"new crawl files keep arriving".  This module re-expresses that loop as
an incremental file-source stream: pages parquet landing in a directory
are picked up, run through the SAME fused mention-detection stage (the
mapInPandas chain is stateless per page, so it is streaming-safe with no
watermark needed), and appended to a mentions sink with exactly-once
file-sink semantics via checkpointing.

``trigger(availableNow=True)`` drains everything currently present and
stops — the batch-compatible mode used in tests; a production deployment
drops the trigger for continuous micro-batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import schemas, tagging


def stream_pages(spark: SparkSession, input_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(schemas.PAGES)
        .option("maxFilesPerTrigger", 16)
        .parquet(input_dir)
    )


def stream_mentions_to_parquet(
    pages_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """pages stream -> mentions parquet sink; returns the StreamingQuery."""
    mentions = tagging.extract_mentions(pages_stream)
    writer = (
        mentions.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
