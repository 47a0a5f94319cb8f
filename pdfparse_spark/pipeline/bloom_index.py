"""Persisted Bloom-filter index: build once, extend incrementally, probe
from any later job.

Production cross-run dedup is not one query that builds its filter
in-plan (that is ``dedup_bloom_prior``, the gate form) — it is an INDEX
BUILD job after each crawl that writes the filter to storage, EXTEND jobs
that OR each new increment's bits in, and probe jobs that read the filter
and flag suspected duplicates at scan speed.  This module is that split,
the same lifecycle shape as ``ann_index.py``:

- :func:`build_bloom_index` writes two parquet tables under ``out_dir``:
  ``words`` (word_idx, word) — the bit set as bits/64 signed longs; and
  ``meta``  (bits, k, seed_tag, n_set_bits) — the probe parameters, so a
  probe can never run with mismatched hashing (the silent
  false-negative failure mode).
- :func:`extend_bloom_index` ORs a new increment's bits into ``words`` —
  idempotent by construction (OR of already-set bits is a no-op), so a
  retried ingest cannot corrupt the filter.
- :func:`probe_bloom_index` appends ``bloom_hit`` to any DataFrame with
  the text column — a stateless per-row expression against the
  constant-folded bit-set literal, zero shuffle (the gate op's audited
  plan shape).

All three share the ONE position/probe definition in ``textops``
(`_bloom_positions` / `_with_bloom_hit`).  Scale: every build/extend
aggregates onto the ≤bits position domain (map-side combine), so shuffle
and driver collect are bounded by the filter size however large the
corpus; the estimated false-positive rate at probe time is
``(n_set_bits / bits) ** k``, reported by :func:`bloom_index_stats`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .textops import _BLOOM_BITS, _BLOOM_K, _bloom_positions, _bloom_words, _with_bloom_hit

__all__ = [
    "build_bloom_index",
    "extend_bloom_index",
    "probe_bloom_index",
    "bloom_index_stats",
]

_SEED_TAG = "bloomidx"


def _distinct_positions(
    docs: DataFrame, text_col: str, bits: int, k: int
) -> list[int]:
    rows = (
        docs.filter(F.col(text_col).isNotNull())
        .select(
            F.explode(
                F.array(*_bloom_positions(F.col(text_col), _SEED_TAG, bits, k))
            ).alias("pos")
        )
        .distinct()
        .collect()
    )
    return [r["pos"] for r in rows]


def _write(spark: SparkSession, out_dir: str, words: list[int], bits: int, k: int) -> None:
    n_set = sum(bin(w & ((1 << 64) - 1)).count("1") for w in words)
    (
        spark.createDataFrame(
            list(enumerate(words)), "word_idx int, word long"
        ).coalesce(1).write.mode("overwrite").parquet(out_dir + "/words")
    )
    (
        spark.createDataFrame(
            [(bits, k, _SEED_TAG, n_set)], "bits int, k int, seed_tag string, n_set_bits long"
        ).coalesce(1).write.mode("overwrite").parquet(out_dir + "/meta")
    )


def _read(spark: SparkSession, index_dir: str) -> tuple[list[int], int, int]:
    meta = spark.read.parquet(index_dir + "/meta").collect()[0]
    rows = spark.read.parquet(index_dir + "/words").collect()
    words = [0] * (meta["bits"] // 64)
    for r in rows:
        words[r["word_idx"]] = r["word"]
    return words, meta["bits"], meta["k"]


def build_bloom_index(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    text_col: str = "text",
    bits: int = _BLOOM_BITS,
    k: int = _BLOOM_K,
) -> dict:
    """Build the filter over ``docs`` and persist it under ``out_dir``.
    Size ``bits ≈ 1.44 · expected_distinct · log2(1/target_fp)``."""
    if bits % 64:
        raise ValueError("bits must be a multiple of 64")
    words = _bloom_words(_distinct_positions(docs, text_col, bits, k), bits)
    _write(spark, out_dir, words, bits, k)
    return bloom_index_stats(spark, out_dir)


def extend_bloom_index(
    spark: SparkSession,
    docs: DataFrame,
    index_dir: str,
    text_col: str = "text",
) -> dict:
    """OR a new increment's bits into an existing index (idempotent —
    re-running the same increment leaves the filter byte-identical).
    Probe parameters come from the stored meta, never the caller."""
    words, bits, k = _read(spark, index_dir)
    extra = _bloom_words(_distinct_positions(docs, text_col, bits, k), bits)
    merged = []
    for a, b in zip(words, extra):
        w = (a & ((1 << 64) - 1)) | (b & ((1 << 64) - 1))
        merged.append(w - (1 << 64) if w >= (1 << 63) else w)
    _write(spark, index_dir, merged, bits, k)
    return bloom_index_stats(spark, index_dir)


def probe_bloom_index(
    spark: SparkSession,
    docs: DataFrame,
    index_dir: str,
    text_col: str = "text",
    out_col: str = "bloom_hit",
) -> DataFrame:
    """Append ``out_col`` to ``docs``: 1 = the text was (probably) in the
    indexed corpus — false negatives impossible, false positives at the
    stats-reported rate.  NULL texts probe to 0 (nothing to dedup)."""
    words, bits, k = _read(spark, index_dir)
    probed = _with_bloom_hit(
        docs, words, text_col=text_col, seed_tag=_SEED_TAG, bits=bits, k=k, out_col=out_col
    )
    return probed.withColumn(
        out_col,
        F.when(F.col(text_col).isNull(), F.lit(0)).otherwise(F.col(out_col)),
    )


def bloom_index_stats(spark: SparkSession, index_dir: str) -> dict:
    """Fill fraction and estimated per-probe false-positive rate (of the
    compacted base filter; streaming deltas are not folded in here)."""
    meta = spark.read.parquet(index_dir + "/meta").collect()[0]
    fill = meta["n_set_bits"] / meta["bits"]
    return {
        "bits": meta["bits"],
        "k": meta["k"],
        "n_set_bits": meta["n_set_bits"],
        "fill": round(fill, 6),
        "est_fp_rate": round(fill ** meta["k"], 8),
    }


def start_stream_bloom_index(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    bits: int = _BLOOM_BITS,
    k: int = _BLOOM_K,
    max_files_per_trigger: int = 1,
    available_now: bool = True,
):
    """Streaming maintenance of the DURABLE index: each micro-batch probes
    its turns against everything indexed before it, then contributes its
    own bits as a delta partition — so the filter survives the query, is
    shared with batch probes, and keeps growing across restarts (the
    ``ann_index.start_stream_index_append`` role for dedup).

    Replay protocol (the payload-cache discipline from stream_extract):
    the probe reads the base ``words`` (if built) plus every delta with
    ``batch != this batch id`` — a replayed batch therefore recomputes
    exactly its original verdicts and its delta ``overwrite`` is
    byte-stable.  Within-batch duplicates can't be seen by that probe, so
    they are flagged by an exact sha2 first-occurrence window over the
    batch itself (``within_dup``); ``bloom_hit`` is the OR of both.
    Deltas are ≤ bits/64 rows each and scoped ``ck=<sha(checkpoint)>``
    like the extraction cache; compact them periodically by folding into
    ``words/`` with :func:`extend_bloom_index`-style ORs (a maintenance
    job — the probe cost grows one tiny file per batch until then).
    NULL-text turns carry nothing to dedup and are skipped, as in
    ``dedup_stream``.
    """
    import hashlib

    from pyspark.errors import AnalysisException
    from pyspark.sql import Window

    from ..pipeline.transcripts import INPUT_SCHEMA

    delta_root = "%s/deltas/ck=%s" % (
        index_dir,
        hashlib.sha256(checkpoint_dir.encode()).hexdigest()[:12],
    )
    stream = (
        spark.readStream.schema(INPUT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def _prior_words(batch_id: int) -> list[int]:
        acc = 0
        try:
            base_rows = spark.read.parquet(index_dir + "/words").collect()
            for r in base_rows:
                acc |= (r["word"] & ((1 << 64) - 1)) << (64 * r["word_idx"])
        except AnalysisException:
            pass
        try:
            delta_rows = (
                spark.read.option("basePath", delta_root)
                .parquet(delta_root + "/batch=*")
                .filter(F.col("batch") != batch_id)  # replay-stable probe
                .collect()
            )
            for r in delta_rows:
                acc |= (r["word"] & ((1 << 64) - 1)) << (64 * r["word_idx"])
        except AnalysisException:
            pass
        words = []
        for w_i in range(bits // 64):
            w = (acc >> (64 * w_i)) & ((1 << 64) - 1)
            words.append(w - (1 << 64) if w >= (1 << 63) else w)
        return words

    def _process_batch(batch_df, batch_id: int) -> None:
        keyed = (
            batch_df.filter(F.col("text").isNotNull())
            .withColumn(
                "id", F.concat_ws("#", "conv_id", F.col("turn_idx").cast("string"))
            )
            .select("id", "ts", "text")
        )
        w = Window.partitionBy(F.sha2(F.col("text"), 256)).orderBy("ts", "id")
        marked = keyed.withColumn(
            "within_dup", (F.row_number().over(w) > 1).cast("int")
        )
        probed = _with_bloom_hit(
            marked, _prior_words(batch_id), seed_tag=_SEED_TAG, bits=bits, k=k,
            out_col="prior_hit",
        )
        out = probed.select(
            "id",
            "prior_hit",
            "within_dup",
            F.greatest("prior_hit", "within_dup").alias("bloom_hit"),
        )
        out.withColumn("batch_id", F.lit(batch_id)).write.mode("overwrite").parquet(
            "%s/batch=%d" % (out_dir, batch_id)
        )
        delta = _bloom_words(
            [
                r["pos"]
                for r in keyed.select(
                    F.explode(
                        F.array(*_bloom_positions(F.col("text"), _SEED_TAG, bits, k))
                    ).alias("pos")
                )
                .distinct()
                .collect()
            ],
            bits,
        )
        rows = [(i, wv) for i, wv in enumerate(delta) if wv != 0]
        (
            spark.createDataFrame(rows or [(0, 0)], "word_idx int, word long")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet("%s/batch=%d" % (delta_root, batch_id))
        )

    writer = (
        stream.writeStream.foreachBatch(_process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
