"""Match-rate / throughput aggregates over extraction output (R5, R14)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["match_rate", "content_type_stats", "join_golden"]


def join_golden(extracted: DataFrame, golden: DataFrame) -> DataFrame:
    """Per-turn equality vs golden under stable (conv_id, turn_idx) keys (R3).

    Broadcast the golden side when it is small (test corpora); at 10^12-turn
    scale both sides are huge and this becomes a sort-merge join on the same
    (conv_id, turn_idx) key the output is already bucketed by.
    """
    g = golden.select(
        "conv_id",
        "turn_idx",
        F.col("content_type").alias("golden_content_type"),
        "golden_text",
        "golden_status",
    )
    joined = extracted.join(g, ["conv_id", "turn_idx"], "inner")
    return joined.withColumn(
        "match",
        (F.col("extracted_text").eqNullSafe(F.col("golden_text")))
        & (F.col("content_type") == F.col("golden_content_type"))
        & (F.col("parse_status") == F.col("golden_status")),
    )


def match_rate(joined: DataFrame) -> DataFrame:
    return joined.agg(
        F.count("*").alias("n_turns"),
        F.sum(F.col("match").cast("long")).alias("n_match"),
        F.round(F.avg(F.col("match").cast("double")), 6).alias("rate"),
    )


def content_type_stats(extracted: DataFrame) -> DataFrame:
    """R5 hash aggregate + R14 distinct-conversation count per content type."""
    return (
        extracted.groupBy("content_type")
        .agg(
            F.count("*").alias("n_turns"),
            F.countDistinct("conv_id").alias("n_convs"),
            F.sum("n_chars").alias("total_chars"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
            F.sum(F.when(F.col("parse_status") == "ok", 1).otherwise(0)).alias("n_ok"),
        )
        .orderBy("content_type")
    )
