"""Custom stateful streaming operator: per-conversation running aggregates
via ``applyInPandasWithState`` (Arrow-batched, grouped state).

Tracks, per conv_id, the running turn count / extracted-char count / ok
count across micro-batches — the streaming face of the ledger metrics.  The
state store lives under the streaming checkpoint, so a restart resumes the
counts exactly (pinned by tests/test_streaming.py).

Scale notes: state is keyed by conv_id — the same key the batch pipeline
buckets by — so a 1000-executor cluster shards the state store evenly;
watermarking is unnecessary because transcripts are append-only per
conversation and the aggregate is monotone.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..pipeline.extract import run_extraction
from ..pipeline.transcripts import INPUT_SCHEMA

__all__ = ["start_conv_stats_stream", "CONV_STATS_SCHEMA"]

CONV_STATS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("n_turns", T.LongType(), False),
        T.StructField("n_chars", T.LongType(), False),
        T.StructField("n_ok", T.LongType(), False),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_turns", T.LongType(), False),
        T.StructField("n_chars", T.LongType(), False),
        T.StructField("n_ok", T.LongType(), False),
    ]
)


def _update_conv_stats(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (conv_id,) = key
    n_turns, n_chars, n_ok = state.get if state.exists else (0, 0, 0)
    for pdf in pdfs:
        n_turns += len(pdf)
        n_chars += int(pdf["n_chars"].sum())
        n_ok += int((pdf["parse_status"] == "ok").sum())
    state.update((n_turns, n_chars, n_ok))
    yield pd.DataFrame(
        {"conv_id": [conv_id], "n_turns": [n_turns], "n_chars": [n_chars], "n_ok": [n_ok]}
    )


def start_conv_stats_stream(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """readStream → extraction → stateful per-conv aggregate → parquet.

    Each micro-batch emits one row per touched conversation with its
    RUNNING totals (operator mode append — required by the file sink); the
    parquet sink keeps history, so the max/latest row per conv_id is the
    live value, exactly like reading a CDC log.
    """
    stream = spark.readStream.schema(INPUT_SCHEMA).parquet(input_dir)
    extracted = run_extraction(stream)
    stats = extracted.select(
        "conv_id", "n_chars", "parse_status"
    ).groupBy("conv_id").applyInPandasWithState(
        _update_conv_stats,
        outputStructType=CONV_STATS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    writer = (
        stats.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
