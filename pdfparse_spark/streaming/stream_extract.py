"""Structured-Streaming front-end for the extraction pipeline.

The batch pipeline's wave/ledger model (resume.py) is deliberately
foreachBatch-shaped, so streaming ingestion is a thin wrapper: a file-source
``readStream`` over transcript parquet drops, the SAME salted mapInPandas
extraction per micro-batch, idempotent append keyed by ``batch_id``, and
Spark's own streaming checkpoint for exactly-once source progress.

The reference has no streaming semantics (SURVEY.md §2.D note) — this module
adds ingestion capability without inventing new extraction semantics: each
micro-batch produces byte-identical output to the batch path on the same
rows (pinned by tests/test_streaming.py).

Scale notes: on a cluster this points at an autoloader-style landing dir (or
Iceberg table with streaming read); ``maxFilesPerTrigger`` bounds batch size
the way wave bucketing bounds it in batch mode.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..pipeline.extract import run_extraction
from ..pipeline.transcripts import INPUT_SCHEMA

__all__ = ["start_stream_extraction"]


def start_stream_extraction(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    num_partitions: int | None = None,
    salt: int = 64,
    max_files_per_trigger: int = 8,
    available_now: bool = True,
):
    """Start (and return) a streaming query extracting transcript drops.

    ``available_now=True`` drains everything currently in ``input_dir`` and
    stops — the batch-backfill trigger; pass False for a continuous tail.
    Output lands in ``out_dir/batch=<id>/`` (overwrite per batch id →
    idempotent under micro-batch replay after a crash, same contract as the
    batch waves).
    """
    stream = (
        spark.readStream.schema(INPUT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def _process_batch(batch_df, batch_id: int) -> None:
        out = run_extraction(batch_df, num_partitions=num_partitions, salt=salt)
        out.withColumn("batch_id", F.lit(batch_id)).write.mode("overwrite").parquet(
            "%s/batch=%d" % (out_dir, batch_id)
        )

    writer = (
        stream.writeStream.foreachBatch(_process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
