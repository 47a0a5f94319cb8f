"""Streaming per-event-type moment tracking for the anomaly sweep.

The streaming face of the batch ``events_anomaly`` operator: per
event_type, accumulate the SAME exact-integer moments the batch op uses
(n, S1 = Σu, S2 = Σu² over u = round(value·10⁶)) in
``applyInPandasWithState`` state, one emitted row per (micro-batch,
touched type) with the running totals.  Because the moments are exact
integers, a full replay (availableNow over the same input) finishes with
state that is BIT-IDENTICAL to the batch aggregate in any arrival order —
pinned in tests/test_streaming.py — so scoring events against the final
streaming moments reproduces the batch anomaly set row-for-row.

Parity discipline: the u column is computed SPARK-SIDE with the identical
expression the batch op uses (F.round(value·10⁶) — HALF_UP), BEFORE the
rows reach pandas; the Python side only does arbitrary-precision integer
sums, so no NumPy banker's-rounding or float-summation drift can enter.

State size: S2 reaches ~10²⁷ long before any int64 overflows, so it is
held as two 62-bit limbs in the state store and recombined with Python
bigints.  One state row per event_type — a small, naturally-bounded key
domain (unlike conv_id, no TTL is needed).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["EVENTS_SCHEMA", "MOMENTS_SCHEMA", "with_anomaly_units", "start_anomaly_stream"]

_SCALE = 1_000_000  # keep in lockstep with pipeline.relational._ANOM_SCALE
_LIMB = 62  # S2 limb width: hi·2⁶² + lo, both non-negative int64

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampNTZType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("value", T.DoubleType(), False),
        T.StructField("props", T.StringType(), True),
    ]
)

MOMENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType(), False),
        T.StructField("n", T.LongType(), False),
        T.StructField("s1", T.LongType(), False),
        T.StructField("s2_hi", T.LongType(), False),
        T.StructField("s2_lo", T.LongType(), False),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType(), False),
        T.StructField("s1", T.LongType(), False),
        T.StructField("s2_hi", T.LongType(), False),
        T.StructField("s2_lo", T.LongType(), False),
    ]
)


def with_anomaly_units(events: DataFrame) -> DataFrame:
    """Project (event_type, u) with the batch op's exact rounding — the
    single place the double→integer conversion happens for BOTH engines'
    streaming parity (works on a batch or streaming frame)."""
    return events.select(
        "event_type",
        F.round(F.col("value") * _SCALE, 0).cast("long").alias("u"),
    )


def _update(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (event_type,) = key
    if state.exists:
        n, s1, s2_hi, s2_lo = state.get
        s2 = (int(s2_hi) << _LIMB) + int(s2_lo)
    else:
        n, s1, s2 = 0, 0, 0
    for pdf in pdfs:
        u = pdf["u"]
        n += len(u)
        # Python bigints, not numpy: u² alone is ~2.5·10¹⁷ and the running
        # S2 passes int64 within ~40 rows of squared units
        ints = [int(v) for v in u]
        s1 += sum(ints)
        s2 += sum(v * v for v in ints)
    state.update((n, s1, s2 >> _LIMB, s2 & ((1 << _LIMB) - 1)))
    yield pd.DataFrame(
        {
            "event_type": [event_type],
            "n": [n],
            "s1": [s1],
            "s2_hi": [s2 >> _LIMB],
            "s2_lo": [s2 & ((1 << _LIMB) - 1)],
        }
    )


def start_anomaly_stream(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """readStream(events parquet) → exact-integer moment state → parquet.

    Append mode: each micro-batch emits the running (n, S1, S2) per
    touched event_type; the max-n row per type in the sink is the live
    moment set.  Scoring any event against it is the stateless z
    predicate the batch op applies — no replay needed."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_dir)
    moments = (
        with_anomaly_units(stream)
        .groupBy("event_type")
        .applyInPandasWithState(
            _update,
            outputStructType=MOMENTS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    writer = (
        moments.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
