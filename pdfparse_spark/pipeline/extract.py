"""The extraction stage: classify → salt/repartition → mapInPandas kernel.

SURVEY.md §2 operators P8 (classify/route), P10 (skew salting), R12
(vectorized kernel).  The kernel chain (P1–P7) runs entirely inside the
Python worker on Arrow record batches — one JVM↔Python crossing per batch,
never per row (BASELINE.json input_hint: "vectorized pandas/Arrow UDFs, no
per-row Python").

Scale notes (the part Catalyst cannot do for us):
- A 10k-turn conversation must not pin one task.  The kernel is per-turn
  independent, so we salt at TURN granularity: ``repartition(P, conv_id,
  pmod(turn_idx, SALT))`` spreads a hot conv_id over up to SALT partitions
  while keeping the partitioning expression cheap and deterministic.
- ``P`` should be ≥ 4× total cores so stragglers amortize; callers pass it
  explicitly (bench uses 4× cores).
- Column pruning: only (conv_id, turn_idx, role, tool, ts, text) enter the
  Python stage; the fat ``text`` column is dropped on exit, so downstream
  relational ops never re-shuffle payload bytes.
"""

from __future__ import annotations

from collections.abc import Iterator, Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "DEDUP_KERNEL_SCHEMA",
    "OUTPUT_SCHEMA",
    "TELEMETRY_SCHEMA",
    "extract_batch",
    "extract_batch_dedup",
    "extract_batch_telemetry",
    "payload_key",
    "run_extraction",
    "run_extraction_dedup",
    "salt_repartition",
]

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("content_type", T.StringType(), False),
        T.StructField("extracted_text", T.StringType(), True),
        T.StructField(
            "spans",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("page", T.IntegerType(), False),
                        T.StructField("start", T.IntegerType(), False),
                        T.StructField("end", T.IntegerType(), False),
                    ]
                )
            ),
            True,
        ),
        T.StructField("parse_status", T.StringType(), False),
        T.StructField("n_chars", T.IntegerType(), False),
    ]
)


TELEMETRY_SCHEMA = T.StructType(
    OUTPUT_SCHEMA.fields + [T.StructField("kernel_us", T.LongType(), False)]
)


_TURN_KEY_COLS = ("conv_id", "turn_idx", "role", "tool", "ts")


def make_extract_batch(
    device: str = "simple",
    telemetry: bool = False,
    key_cols: tuple[str, ...] = _TURN_KEY_COLS,
):
    """mapInPandas body factory: one parameterized implementation for every
    (layout device, telemetry, key-column) combination — the column-assembly
    dict lives in exactly one place.  ``key_cols`` are the pass-through
    identity columns (turn keys for the per-turn path, the content hash for
    the distinct-payload path).  The kernel is imported lazily inside the
    body so the module object is constructed once per (reused) Python worker
    and the glyph/AFM tables stay warm.

    ``telemetry=True`` also emits ``kernel_us`` — wall microseconds spent
    in the kernel per turn, measured at the call site inside the worker.
    Per-partition sums of ``kernel_us`` are the straggler evidence the
    partition-row-count proxy can't give: a partition can hold few rows
    but one pathological 500-page PDF.  The ~100 ns perf_counter overhead
    per turn is noise next to the 0.1-50 ms kernel cost; telemetry stays
    opt-in only because the extra column changes the output schema.
    """

    def extract_batch_body(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from time import perf_counter_ns

        from ..kernel.extract import extract_turn, get_device_factory

        factory = get_device_factory(device)
        for pdf in batches:
            ctypes, texts, spans_col, statuses, nchars = [], [], [], [], []
            micros = []
            for text in pdf["text"]:
                t0 = perf_counter_ns()
                ctype, extracted, spans, status = extract_turn(text, factory)
                if telemetry:
                    micros.append((perf_counter_ns() - t0) // 1000)
                ctypes.append(ctype)
                texts.append(extracted)
                spans_col.append(
                    [{"page": p, "start": s, "end": e} for (p, s, e) in spans]
                )
                statuses.append(status)
                nchars.append(len(extracted))
            cols = {k: pdf[k] for k in key_cols}
            cols.update(
                {
                    "content_type": ctypes,
                    "extracted_text": texts,
                    "spans": spans_col,
                    "parse_status": statuses,
                    "n_chars": nchars,
                }
            )
            if telemetry:
                cols["kernel_us"] = pd.array(micros, dtype="int64")
            yield pd.DataFrame(cols)

    return extract_batch_body


# the two standard bodies (golden device), kept as module names for callers
extract_batch = make_extract_batch()
extract_batch_telemetry = make_extract_batch(telemetry=True)


def salt_repartition(df: DataFrame, num_partitions: int, salt: int = 64) -> DataFrame:
    """P10: spread hot conv_ids over up to ``salt`` partitions.

    Hash-partitions on (conv_id, turn_idx mod salt).  AQE cannot split a
    skewed Python stage, so this explicit repartition is the skew defense.
    """
    return df.repartition(
        num_partitions,
        F.col("conv_id"),
        F.pmod(F.col("turn_idx").cast("int"), F.lit(salt)),
    )


def run_extraction(
    df: DataFrame,
    num_partitions: int | None = None,
    salt: int = 64,
    telemetry: bool = False,
    device: str = "simple",
) -> DataFrame:
    """Full extraction stage over a transcripts DataFrame (input_hint schema).

    ``telemetry=True`` adds per-turn ``kernel_us`` and the executing
    ``part_id`` (``spark_partition_id`` is stable here: mapInPandas is a
    narrow op, so the id is the salted-shuffle partition that did the work).
    Aggregate with :func:`pdfparse_spark.pipeline.metrics.straggler_stats`.
    """
    cols = ["conv_id", "turn_idx", "role", "tool", "ts", "text"]
    df = df.select(*cols)  # column pruning before the shuffle
    if num_partitions:
        df = salt_repartition(df, num_partitions, salt)
    if telemetry:
        if device != "simple":
            raise ValueError("telemetry supports only the golden device")
        out = df.mapInPandas(extract_batch_telemetry, schema=TELEMETRY_SCHEMA)
        return out.withColumn("part_id", F.spark_partition_id())
    if device != "simple":
        return df.mapInPandas(make_extract_batch(device), schema=OUTPUT_SCHEMA)
    return df.mapInPandas(extract_batch, schema=OUTPUT_SCHEMA)


def payload_key():
    """THE content-address expression — the single definition every path
    (batch dedup, streaming cache probe, parity gates, tests) must share:
    any divergence between producer and prober keys silently splits the
    cache.  sha2-256 of the payload (64-bit hashes collide at 10^12-turn
    birthday bounds); NULL text takes the 'null' sentinel (4 chars — can
    never collide with 64-hex-char sha output) because sha2(NULL) IS NULL
    would drop those turns from any equi-join."""
    return F.coalesce(F.sha2(F.col("text"), 256), F.lit("null"))


# distinct-payload batch body: input (payload_sha, text) → kernel columns
DEDUP_KERNEL_SCHEMA = T.StructType(
    [T.StructField("payload_sha", T.StringType(), False)]
    + [f for f in OUTPUT_SCHEMA.fields if f.name in
       ("content_type", "extracted_text", "spans", "parse_status", "n_chars")]
)


extract_batch_dedup = make_extract_batch(key_cols=("payload_sha",))


def run_extraction_dedup(
    df: DataFrame,
    num_partitions: int | None = None,
    split_pages: bool = False,
) -> DataFrame:
    """Content-addressed extraction: run the kernel ONCE per distinct
    payload and join the result back to every turn carrying it.  Output
    rows are identical to :func:`run_extraction` (ordering aside) — the
    kernel is a pure function of the payload bytes, so extraction is
    memoizable by content hash.

    This is the right shape for the corpus the metric names — a fixture
    corpus REPLICATED to 10^9+ turns — and for any production transcript
    store where the same attachment/document recurs across conversations:
    kernel cost drops from O(turns) to O(distinct payloads).

    Shuffle accounting vs the plain path (which shuffles the fat text once
    for salting, then runs the kernel on every row):
      1. dropDuplicates(payload_sha) — the ONE fat-text shuffle, with
         map-side partial aggregation shrinking it wherever duplicates
         co-locate in the scan;
      2. the kernel runs over distinct payloads only (repartitioned by
         content hash — unique by construction, so no salt is needed; the
         per-page split path remains the heavy-single-doc defense);
      3. the join back moves only skinny turn keys + extracted output —
         comparable to the stage's output size, never the input payloads.
    On a fully-unique corpus the overhead is one no-op dedup pass; on a
    duplicated one the kernel saving is 1 - distinct_ratio of total work.
    sha2-256 content addressing (not a 64-bit hash: at 10^12 turns a
    64-bit birthday bound makes collisions — i.e. silently WRONG text on
    some turns — expected; 256-bit makes them impossible in practice).
    NULL payloads map to the 'null' sentinel key (sha2 of NULL is NULL,
    which would silently drop those turns in the equi-join).

    ``split_pages=True`` composes the heavy-single-doc defense: the
    distinct payloads run through the per-page-parallel extractor
    (split_extract) under pseudo turn keys (conv_id = content hash), so
    one huge DISTINCT document — which content-hash partitioning alone
    can never split — still fans out into page-range segments."""
    cols = ["conv_id", "turn_idx", "role", "tool", "ts", "text"]
    df = df.select(*cols)
    keyed = df.withColumn("payload_sha", payload_key())
    uniq = keyed.select("payload_sha", "text").dropDuplicates(["payload_sha"])
    if split_pages:
        from .split_extract import run_extraction_split

        pseudo = uniq.select(
            F.col("payload_sha").alias("conv_id"),
            F.lit(0).alias("turn_idx"),
            F.lit(None).cast("string").alias("role"),
            F.lit(None).cast("string").alias("tool"),
            F.lit(None).cast("timestamp").alias("ts"),
            "text",
        )
        extracted = run_extraction_split(pseudo, num_partitions=num_partitions).select(
            F.col("conv_id").alias("payload_sha"),
            "content_type",
            "extracted_text",
            "spans",
            "parse_status",
            "n_chars",
        )
    else:
        if num_partitions:
            uniq = uniq.repartition(num_partitions, F.col("payload_sha"))
        extracted = uniq.mapInPandas(extract_batch_dedup, schema=DEDUP_KERNEL_SCHEMA)
    out = keyed.drop("text").join(extracted, "payload_sha", "left")
    return out.select(*[f.name for f in OUTPUT_SCHEMA.fields])
