"""Persisted Bloom-filter index: build once, extend incrementally, probe
from any later job.

Production cross-run dedup is not one query that builds its filter
in-plan (that is ``dedup_bloom_prior``, the gate form) — it is an INDEX
BUILD job after each crawl that writes the filter to storage, EXTEND jobs
that OR each new increment's bits in, and probe jobs that read the filter
and flag suspected duplicates at scan speed.  This module is that split,
the same lifecycle shape as ``ann_index.py``:

- :func:`build_bloom_index` writes two parquet tables under ``out_dir``:
  ``words`` (word_idx, word) — the bit set as SPARSE signed 64-bit
  words (absent word_idx = all-zero), O(set bits) at any m; and
  ``meta``  (bits, k, seed_tag, n_set_bits) — the probe parameters.
  Every later operation takes bits/k/seed from the STORED meta, never
  from the caller — a hashing mismatch is the silent false-negative
  failure mode, so it must be structurally impossible.
- :func:`extend_bloom_index` ORs a new increment's bits into ``words`` —
  idempotent by construction (OR of already-set bits is a no-op), so a
  retried ingest cannot corrupt the filter.
- :func:`probe_bloom_index` appends ``bloom_hit`` to any DataFrame with
  the text column.  Two verdict-identical probe plans: up to
  ``_LITERAL_MAX_BITS`` a stateless per-row expression against the
  constant-folded bit-set literal, zero shuffle (the gate op's audited
  plan shape); past it, k broadcast equality joins against the sparse
  (word_idx, word) frame — the fat side still never shuffles, and the
  filter never materializes on the driver.  Either way it reads the
  base ``words`` OR-ed with every streaming delta partition, so texts
  indexed only by a live stream are visible to batch probes without
  waiting for compaction.
- :func:`start_stream_bloom_index` maintains the index from a stream
  (per-batch delta partitions); :func:`compact_bloom_deltas` folds the
  deltas into the base words.

WRITER FENCING, stated honestly: the filter is monotone, so a replayed
stream batch reproduces its original verdicts ONLY if the bit set it
probes is what it originally probed.  The stream excludes its own
batch's delta (self-influence handled); what it cannot defend against
is a base mutation — an ``extend_bloom_index`` or compaction that lands
between a batch's original run and its replay can flip that replay's
first-occurrence verdicts to hits.  Run batch extends and compaction
only while no stream lineage on the index has uncommitted batches (the
single-writer discipline; on a real cluster an Iceberg table's snapshot
isolation gives the same guarantee transactionally).

All operations share the ONE position/probe definition in ``textops``
(`_bloom_positions` / `_with_bloom_hit`).  Scale: every build/extend
aggregates onto the ≤bits position domain (map-side combine), so shuffle
and driver collect are bounded by the filter size however large the
corpus; the estimated false-positive rate at probe time is
``(n_set_bits / bits) ** k``, reported by :func:`bloom_index_stats`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .textops import (
    _BLOOM_BITS,
    _BLOOM_K,
    _bloom_positions,
    _with_bloom_hit,
    _with_bloom_hit_join,
)

__all__ = [
    "build_bloom_index",
    "extend_bloom_index",
    "probe_bloom_index",
    "bloom_index_stats",
    "start_stream_bloom_index",
    "compact_bloom_deltas",
]

_SEED_TAG = "bloomidx"
_U64 = (1 << 64) - 1

# Past this filter size the constant-folded literal probe (one bits/8-byte
# array shipped inside the plan) stops being sane — probe_bloom_index
# switches to the broadcast (word_idx, word) equality join, which stays a
# few-MB broadcast up to m ≈ 2^31.  The literal is kept below the cutover
# because it is strictly cheaper there (zero joins, zero broadcast).
_LITERAL_MAX_BITS = 1 << 24


def _distinct_positions(
    docs: DataFrame, text_col: str, bits: int, k: int, seed_tag: str = _SEED_TAG
) -> list[int]:
    rows = (
        docs.filter(F.col(text_col).isNotNull())
        .select(
            F.explode(
                F.array(*_bloom_positions(F.col(text_col), seed_tag, bits, k))
            ).alias("pos")
        )
        .distinct()
        .collect()
    )
    return [r["pos"] for r in rows]


def _or_rows_into(words: list[int], rows) -> list[int]:
    """OR (word_idx, word) rows into a signed-word array, in place."""
    for r in rows:
        w = (words[r["word_idx"]] & _U64) | (r["word"] & _U64)
        words[r["word_idx"]] = w - (1 << 64) if w >= (1 << 63) else w
    return words


def _sparse_words(pos_values) -> list[tuple[int, int]]:
    """Fold bit positions into SPARSE (word_idx, signed_word) rows —
    O(positions) work and memory, never the O(m/64) dense array (the
    large-m discipline: nothing driver-side scales with the filter
    size, only with the bits actually set)."""
    d: dict[int, int] = {}
    for p in pos_values:
        d[p >> 6] = d.get(p >> 6, 0) | (1 << (p & 63))
    return [
        (i, w - (1 << 64) if w >= (1 << 63) else w)
        for i, w in sorted(d.items())
    ]


def _write_rows(
    spark: SparkSession,
    out_dir: str,
    rows: list[tuple[int, int]],
    bits: int,
    k: int,
    seed_tag: str = _SEED_TAG,
) -> None:
    """Persist sparse (word_idx, word) rows + meta.  A word index absent
    from the table is all-zero (both probe paths treat it so), keeping
    the words table O(set bits) even at m = 2^28+."""
    n_set = sum(bin(w & _U64).count("1") for _, w in rows)
    (
        spark.createDataFrame(
            rows or [(0, 0)], "word_idx int, word long"
        ).coalesce(1).write.mode("overwrite").parquet(out_dir + "/words")
    )
    (
        spark.createDataFrame(
            [(bits, k, seed_tag, n_set)], "bits int, k int, seed_tag string, n_set_bits long"
        ).coalesce(1).write.mode("overwrite").parquet(out_dir + "/meta")
    )


def _fold_rewrite_words(
    spark: SparkSession,
    index_dir: str,
    bits: int,
    k: int,
    seed_tag: str,
    extra: DataFrame | None = None,
    include_deltas: bool = False,
) -> None:
    """Fold the base words (optionally with every streaming delta and/or
    an ``extra`` sparse increment frame) into a fresh sparse words table
    by a DISTRIBUTED bit_or aggregate, then swap it in — the filter
    never materializes on the driver, so extend/compact work at any m.
    Stage-write + rename because parquet cannot overwrite a table that
    feeds the writing plan."""
    import os
    import shutil

    words = _read_words_df(spark, index_dir, include_deltas=include_deltas)
    if extra is not None:
        words = (
            words.unionByName(extra)
            .groupBy("word_idx")
            .agg(F.bit_or("word").alias("word"))
        )
    words = words.filter(F.col("word") != 0)
    tmp = index_dir + "/words_tmp"
    # small filters (≤ the literal cutover) stay one tidy file; giant
    # ones keep the write parallel
    if bits <= _LITERAL_MAX_BITS:
        words = words.coalesce(1)
    words.write.mode("overwrite").parquet(tmp)
    n_row = (
        spark.read.parquet(tmp).agg(F.sum(F.bit_count("word")).alias("n")).collect()[0]
    )
    n_set = int(n_row["n"] or 0)
    # rename-then-delete, not delete-then-rename: a crash between the two
    # renames leaves the old table intact under words_old (manual
    # recovery), never a window with NO words table.  On a real
    # lakehouse this whole swap is one Iceberg commit.
    old = index_dir + "/words_old"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(index_dir + "/words", old)
    os.rename(tmp, index_dir + "/words")
    shutil.rmtree(old, ignore_errors=True)
    (
        spark.createDataFrame(
            [(bits, k, seed_tag, n_set)], "bits int, k int, seed_tag string, n_set_bits long"
        ).coalesce(1).write.mode("overwrite").parquet(index_dir + "/meta")
    )


def _increment_words_df(
    docs: DataFrame, text_col: str, bits: int, k: int, seed_tag: str
) -> DataFrame:
    """A new increment's bits as a distributed sparse (word_idx, word)
    frame — the build aggregate without the driver collect.  Map-side
    combine bounds the shuffle by the ≤m position domain; the column-
    valued shift needs the SQL surface (pyspark's shiftleft takes only
    int bits)."""
    pos = (
        docs.filter(F.col(text_col).isNotNull())
        .select(
            F.explode(
                F.array(*_bloom_positions(F.col(text_col), seed_tag, bits, k))
            ).alias("pos")
        )
        .distinct()
    )
    return (
        pos.select(
            F.expr("CAST(shiftright(pos, 6) AS INT)").alias("word_idx"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))"
            ).alias("w1"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("w1").alias("word"))
    )


def _read_meta(spark: SparkSession, index_dir: str):
    return spark.read.parquet(index_dir + "/meta").collect()[0]


def _delta_words(
    spark: SparkSession,
    index_dir: str,
    exclude_delta_batch: tuple[str, int] | None = None,
) -> DataFrame | None:
    """The streaming delta partitions as one (word_idx, word) frame, or
    None when no stream has written deltas yet."""
    from pyspark.errors import AnalysisException

    try:
        deltas = spark.read.option("basePath", index_dir + "/deltas").parquet(
            index_dir + "/deltas/ck=*/batch=*"
        )
    except AnalysisException:
        return None
    if exclude_delta_batch is not None:
        ck, bid = exclude_delta_batch
        deltas = deltas.filter(~((F.col("ck") == ck) & (F.col("batch") == bid)))
    return deltas.select("word_idx", "word")


def _read(
    spark: SparkSession,
    index_dir: str,
    include_deltas: bool = False,
    exclude_delta_batch: tuple[str, int] | None = None,
    meta=None,
) -> tuple[list[int], int, int, str]:
    """Load the filter as a signed-word array + (bits, k, seed_tag) — the
    STORED probe parameters, which every reader must hash with (a seed
    mismatch is the silent false-negative failure mode).  With
    ``include_deltas``, every streaming delta partition under
    ``index_dir/deltas`` is OR-ed in; ``exclude_delta_batch=(ck, id)``
    skips that one batch's delta (the stream's replay-stable probe).
    Callers that already fetched the meta row pass it via ``meta`` to
    skip the second read job."""
    if meta is None:
        meta = _read_meta(spark, index_dir)
    bits, k, seed_tag = meta["bits"], meta["k"], meta["seed_tag"]
    words = [0] * (bits // 64)
    _or_rows_into(words, spark.read.parquet(index_dir + "/words").collect())
    if include_deltas:
        deltas = _delta_words(spark, index_dir, exclude_delta_batch)
        if deltas is not None:
            _or_rows_into(words, deltas.collect())
    return words, bits, k, seed_tag


def _read_words_df(
    spark: SparkSession,
    index_dir: str,
    include_deltas: bool = False,
    exclude_delta_batch: tuple[str, int] | None = None,
) -> DataFrame:
    """The filter as a deduplicated (word_idx, word) frame — the large-m
    twin of :func:`_read` that never materializes the word array on the
    driver.  Base and delta rows for the same index are folded with a
    bitwise-OR aggregate (sparse rows stay sparse)."""
    words = spark.read.parquet(index_dir + "/words").select("word_idx", "word")
    if include_deltas:
        deltas = _delta_words(spark, index_dir, exclude_delta_batch)
        if deltas is not None:
            words = words.unionByName(deltas)
    return words.groupBy("word_idx").agg(F.bit_or("word").alias("word"))


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
    rows = _sparse_words(_distinct_positions(docs, text_col, bits, k))
    _write_rows(spark, out_dir, rows, bits, k)
    return bloom_index_stats(spark, out_dir)


def extend_bloom_index(
    spark: SparkSession,
    docs: DataFrame,
    index_dir: str,
    text_col: str = "text",
) -> dict:
    """OR a new increment's bits into an existing index (idempotent —
    re-running the same increment leaves the filter value-identical).
    Probe parameters come from the stored meta, never the caller.
    Fully distributed: the increment aggregates to a sparse word frame,
    the fold is one bit_or aggregate, and the rewrite is a staged
    write+swap — nothing driver-side scales with m, so extends work on
    filters far past the literal cutover.  See the module docstring's
    writer-fencing note before running this while a stream maintains
    the same index."""
    meta = _read_meta(spark, index_dir)
    bits, k, seed_tag = meta["bits"], meta["k"], meta["seed_tag"]
    inc = _increment_words_df(docs, text_col, bits, k, seed_tag)
    _fold_rewrite_words(spark, index_dir, bits, k, seed_tag, extra=inc)
    return bloom_index_stats(spark, index_dir)


def probe_bloom_index(
    spark: SparkSession,
    docs: DataFrame,
    index_dir: str,
    text_col: str = "text",
    out_col: str = "bloom_hit",
    include_deltas: bool = True,
    method: str = "auto",
) -> DataFrame:
    """Append ``out_col`` to ``docs``: 1 = the text was (probably) in the
    indexed corpus — false negatives impossible, false positives at the
    stats-reported rate.  Streaming delta partitions are visible by
    default, so batch probes see stream-indexed texts without waiting
    for compaction.  NULL texts probe to 0 (nothing to dedup).

    ``method``: ``'literal'`` constant-folds the bit set into the plan
    (cheapest, sane to m ≈ 2^24); ``'join'`` probes via k broadcast
    equality joins on the sparse (word_idx, word) frame (the large-m
    path — never materializes the filter on the driver); ``'auto'``
    picks by the STORED bits against ``_LITERAL_MAX_BITS``.  Both paths
    are verdict-identical (pytest-pinned)."""
    if method not in ("auto", "literal", "join"):
        raise ValueError("method must be 'auto', 'literal' or 'join'")
    meta = _read_meta(spark, index_dir)
    bits, k, seed_tag = meta["bits"], meta["k"], meta["seed_tag"]
    if method == "auto":
        method = "literal" if bits <= _LITERAL_MAX_BITS else "join"
    if method == "literal":
        words, bits, k, seed_tag = _read(
            spark, index_dir, include_deltas=include_deltas, meta=meta
        )
        probed = _with_bloom_hit(
            docs, words, text_col=text_col, seed_tag=seed_tag, bits=bits, k=k, out_col=out_col
        )
    else:
        # eager checkpoint: the k join legs each broadcast this frame
        # with leg-specific aliases, so exchange reuse cannot collapse
        # them — without the checkpoint the base∪deltas scan + bit_or
        # aggregate would execute k times per probe
        words_df = _read_words_df(
            spark, index_dir, include_deltas=include_deltas
        ).localCheckpoint(eager=True)
        probed = _with_bloom_hit_join(
            docs, words_df, text_col=text_col, seed_tag=seed_tag, bits=bits, k=k, out_col=out_col
        )
    return probed.withColumn(
        out_col,
        F.when(F.col(text_col).isNull(), F.lit(0)).otherwise(F.col(out_col)),
    )


def bloom_index_stats(
    spark: SparkSession, index_dir: str, include_deltas: bool = True
) -> dict:
    """Fill fraction and estimated per-probe false-positive rate over the
    filter a probe would actually see (base + streaming deltas).  Counts
    set bits distributedly (one bit_count aggregate over the sparse word
    frame), so it works at any m without a driver-side array."""
    meta = _read_meta(spark, index_dir)
    bits, k = meta["bits"], meta["k"]
    row = (
        _read_words_df(spark, index_dir, include_deltas=include_deltas)
        .agg(F.sum(F.bit_count("word")).alias("n"))
        .collect()[0]
    )
    n_set = int(row["n"] or 0)
    fill = n_set / bits
    return {
        "bits": bits,
        "k": k,
        "n_set_bits": n_set,
        "fill": round(fill, 6),
        "est_fp_rate": round(fill**k, 8),
    }


def compact_bloom_deltas(
    spark: SparkSession, index_dir: str, remove_deltas: bool = False
) -> dict:
    """Fold every streaming delta partition into the base ``words`` (an
    idempotent OR — safe to re-run).  With ``remove_deltas`` the delta
    tree is deleted afterwards (local filesystem paths only): do that
    ONLY once no stream lineage on this index can still replay a batch
    whose delta is being removed — see the writer-fencing note."""
    meta = _read_meta(spark, index_dir)
    _fold_rewrite_words(
        spark,
        index_dir,
        meta["bits"],
        meta["k"],
        meta["seed_tag"],
        include_deltas=True,
    )
    if remove_deltas:
        import shutil

        shutil.rmtree(index_dir + "/deltas", ignore_errors=True)
    return bloom_index_stats(spark, index_dir)


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
    visible to batch probes (which read deltas by default), and keeps
    growing across restarts (the ``ann_index.start_stream_index_append``
    role for dedup).

    ``bits``/``k`` apply only when the index does not exist yet (the
    stream then initializes it with an empty base); an EXISTING index's
    stored meta always wins, so the probe can never run with mismatched
    hashing.  Replay protocol (the payload-cache discipline from
    stream_extract): the probe reads the base plus every delta EXCEPT
    this batch's own, so a replayed batch recomputes its original
    verdicts and its delta ``overwrite`` is byte-stable — provided the
    base is not mutated between run and replay (module docstring's
    writer-fencing note).  Within-batch duplicates can't be seen by that
    probe, so they are flagged by an exact sha2 first-occurrence window
    over the batch itself (``within_dup``); ``bloom_hit`` is the OR of
    both.  Deltas are ≤ bits/64 rows each, scoped ``ck=<sha(checkpoint)>``;
    fold them with :func:`compact_bloom_deltas` periodically (the probe
    cost grows one tiny file per batch until then).  NULL-text turns
    carry nothing to dedup and are skipped, as in ``dedup_stream``.
    """
    import hashlib

    from pyspark.errors import AnalysisException
    from pyspark.sql import Window

    from ..pipeline.transcripts import INPUT_SCHEMA

    seed_tag = _SEED_TAG
    try:
        meta = _read_meta(spark, index_dir)
        # stored params always win, seed included — hashing with anything
        # but the seed the bits were built with silently breaks the
        # no-false-negative guarantee
        bits, k, seed_tag = meta["bits"], meta["k"], meta["seed_tag"]
    except AnalysisException:
        if bits % 64:
            raise ValueError("bits must be a multiple of 64")
        _write_rows(spark, index_dir, [], bits, k)

    ck_tag = hashlib.sha256(checkpoint_dir.encode()).hexdigest()[:12]
    delta_root = "%s/deltas/ck=%s" % (index_dir, ck_tag)
    stream = (
        spark.readStream.schema(INPUT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def _process_batch(batch_df, batch_id: int) -> None:
        keyed = (
            batch_df.filter(F.col("text").isNotNull())
            .withColumn(
                "id", F.concat_ws("#", "conv_id", F.col("turn_idx").cast("string"))
            )
            .select("id", "ts", "text")
            .persist()
        )
        try:
            w = Window.partitionBy(F.sha2(F.col("text"), 256)).orderBy("ts", "id")
            marked = keyed.withColumn(
                "within_dup", (F.row_number().over(w) > 1).cast("int")
            )
            # same literal/join dispatch as probe_bloom_index: past the
            # literal cutover a micro-batch must neither materialize the
            # dense word array on the driver nor ship a tens-of-MB
            # literal in every batch plan
            if bits <= _LITERAL_MAX_BITS:
                prior, _, _, _ = _read(
                    spark,
                    index_dir,
                    include_deltas=True,
                    exclude_delta_batch=(ck_tag, batch_id),
                )
                probed = _with_bloom_hit(
                    marked, prior, seed_tag=seed_tag, bits=bits, k=k, out_col="prior_hit"
                )
            else:
                words_df = _read_words_df(
                    spark,
                    index_dir,
                    include_deltas=True,
                    exclude_delta_batch=(ck_tag, batch_id),
                ).localCheckpoint(eager=True)
                probed = _with_bloom_hit_join(
                    marked, words_df, seed_tag=seed_tag, bits=bits, k=k, out_col="prior_hit"
                )
            probed.select(
                "id",
                "prior_hit",
                "within_dup",
                F.greatest("prior_hit", "within_dup").alias("bloom_hit"),
            ).write.mode("overwrite").parquet("%s/batch=%d" % (out_dir, batch_id))
            rows = _sparse_words(
                _distinct_positions(keyed, "text", bits, k, seed_tag=seed_tag)
            )
            (
                spark.createDataFrame(rows or [(0, 0)], "word_idx int, word long")
                .coalesce(1)
                .write.mode("overwrite")
                .parquet("%s/batch=%d" % (delta_root, batch_id))
            )
        finally:
            keyed.unpersist()

    writer = (
        stream.writeStream.foreachBatch(_process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
