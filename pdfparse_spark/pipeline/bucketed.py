"""Bucketed tables: co-located joins without a shuffle (SURVEY.md §4).

At 10^12-turn scale the per-turn verification join (extraction output vs
golden, R3) and any conv-keyed self-join shuffle BOTH sides on conv_id
every time they run.  Writing the tables bucketed by conv_id with the SAME
bucket count pays that shuffle once at write time; every later join reads
bucket i against bucket i with no Exchange in the plan.  This is the
parquet/metastore flavor of what Iceberg hidden partitioning
(bucket(conv_id)) gives the production deployment (sources/io.py).

Local caveat: ``bucketBy`` requires ``saveAsTable`` (a metastore entry);
plain ``.parquet(path)`` writes cannot carry bucket metadata.  Spark's
bucketed scan keeps one file per bucket per writing task — repartition by
the bucket column first so each bucket lands in exactly one file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["write_bucketed", "colocated_join"]


def write_bucketed(
    df: DataFrame,
    table: str,
    n_buckets: int,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` bucketed by conv_id, sorted by (conv_id, turn_idx).

    Repartitioning on conv_id first gives one file per bucket, so the
    bucketed scan needs no extra sort-merge across files within a bucket.
    """
    writer = (
        df.repartition(n_buckets, F.col("conv_id"))
        .write.mode(mode)
        .bucketBy(n_buckets, "conv_id")
        .sortBy("conv_id", "turn_idx")
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join two tables bucketed by conv_id with equal bucket counts.

    The plan contains no Exchange on either side (pinned by
    tests/test_bucketed.py): each task sort-merges bucket i of the left
    table with bucket i of the right.  ``on`` may add more keys after
    conv_id (e.g. turn_idx); bucketing still applies because conv_id is a
    subset of the join keys and the session sets
    ``spark.sql.requireAllClusterKeysForCoPartition=false`` (session.py).
    """
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, on or ["conv_id"], how)
