"""Reproduce BENCH/STREAMING.md's sharded-Bloom vs exact streaming-dedup
measurement: the sf0.1 documents table replayed as transcript turns
through availableNow micro-batches.

Usage: python scripts/bench_stream_bloom.py 'local[32]' bloom
       python scripts/bench_stream_bloom.py 'local[32]' exact
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    master, mode = sys.argv[1], sys.argv[2]  # mode: bloom | exact
    from pyspark.sql import functions as F

    from pdfparse_spark.pipeline.session import get_spark

    spark = get_spark(master=master, shuffle_partitions=32, app_name="bloomstream")
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    drop = "/tmp/bloom_stream_in"
    if not os.path.exists(drop):
        (
            docs.select(
                F.concat(F.lit("c"), F.col("doc_id").cast("string")).alias("conv_id"),
                F.lit(0).alias("turn_idx"),
                F.lit("user").alias("role"),
                F.col("text"),
                F.lit("").alias("tool"),
                F.timestamp_seconds(F.lit(1767225600) + F.col("doc_id"))
                .cast("timestamp")
                .alias("ts"),
            )
            .coalesce(4)
            .write.parquet(drop + "/f1")
        )
    tag = master.replace("[", "").replace("]", "").replace(",", "_")
    base = "/tmp/bloom_stream_%s_%s" % (mode, tag)
    shutil.rmtree(base, ignore_errors=True)
    out, ck = base + "/out", base + "/ck"
    t0 = time.monotonic()
    if mode == "bloom":
        from pdfparse_spark.streaming.bloom_dedup import start_stream_bloom_dedup

        q = start_stream_bloom_dedup(spark, drop + "/f*", out, ck, max_files_per_trigger=1)
    else:
        from pdfparse_spark.streaming.dedup import start_stream_dedup

        q = start_stream_dedup(spark, drop + "/f*", out, ck, max_files_per_trigger=1)
    q.awaitTermination(600)
    wall = time.monotonic() - t0
    got = spark.read.parquet(out)
    if mode == "bloom":
        n, dups = got.count(), got.filter("bloom_hit = 1").count()
    else:
        n, dups = got.count(), docs.count() - got.count()
    print(
        "RESULT", master, mode, round(wall, 1),
        "docs/sec", round(docs.count() / wall, 1), "rows", n, "dups", dups,
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
