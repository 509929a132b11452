"""Incremental crawl ingestion via Structured Streaming.

The reference is pure batch (SURVEY §2.11); the 10^12-doc backfill is
batch too (kg/lineage.py). This module adds the *incremental* path:
new crawl files landing in a directory are picked up exactly once
(file-source checkpointing) and run through the SAME multi-stage
extraction engine via foreachBatch — the engine itself is
micro-batch-agnostic because it is deterministic and per-doc.

Trigger.AvailableNow semantics: process everything currently
available, then stop — the natural shape for a cron-scheduled
incremental crawl sweep; switch the trigger for continuous tailing.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .engine import UIEConfig, UIEEngine
from .sources.web_pages import WEB_PAGES_SCHEMA


def stream_extract(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    schema,
    config: Optional[UIEConfig] = None,
    await_termination: bool = True,
):
    """Stream web-page parquet files from ``input_path`` into triple
    parquet under ``output_path``; exactly-once per input file via the
    stream checkpoint. Returns the StreamingQuery."""
    pages = (
        spark.readStream.schema(WEB_PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(input_path)
    )

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        docs = batch_df.select(F.xxhash64("url").alias("doc_id"), "text")
        engine = UIEEngine(spark, schema, config or UIEConfig())
        triples = UIEEngine.triples(engine.extract(docs)).withColumn(
            "epoch_id", F.lit(epoch_id)
        )
        triples.write.mode("append").parquet(output_path)
        engine.unpersist()

    query = (
        pages.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        query.awaitTermination()
    return query
