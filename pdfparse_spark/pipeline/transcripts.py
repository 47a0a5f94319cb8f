"""Deterministic transcript-corpus synthesis (FIXTURES.md §1).

Produces the pipeline's input table with the exact ``input_hint`` schema
(BASELINE.json): ``(conv_id:string, turn_idx:int32, role:string, text:string,
tool:string, ts:timestamp)`` plus a parallel golden table for per-turn
equality checks.

Deterministic for a given (n_convs, turns_per_conv, seed): content payloads
cycle over the fixture corpora (PDF fixtures base64-wrapped as ``pdfb64:...``,
HTML fixtures verbatim, plain-text sentences) in a seeded shuffle; one hot
conversation (``conv000000``) holds ~10% of all turns to exercise skew
salting.  Rows are emitted shuffled so stable (conv_id, turn_idx) ordering is
actually exercised downstream.
"""

from __future__ import annotations

import base64
import datetime as _dt
import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..fixtures.html_gen import build_html_fixtures
from ..fixtures.pdf_gen import build_pdf_fixtures

__all__ = [
    "INPUT_SCHEMA",
    "GOLDEN_SCHEMA",
    "make_transcript_rows",
    "transcripts_df",
    "golden_df",
    "synthesize",
]

INPUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

GOLDEN_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("content_type", T.StringType(), False),
        T.StructField("golden_text", T.StringType(), True),
        T.StructField("golden_status", T.StringType(), False),
    ]
)

_ROLES = ["user", "assistant", "tool"]
_EPOCH = _dt.datetime(2026, 1, 1, 0, 0, 0)

# content-type mix per FIXTURES.md §1: ~20% pdf, ~30% html, ~50% text
_MIX = ["pdf", "html", "text", "text", "html", "text", "pdf", "text", "html", "text"]


class _Corpus:
    """Lazily-built, process-wide fixture payload pool."""

    _instance = None

    def __init__(self) -> None:
        self.pdf = build_pdf_fixtures()
        self.html = build_html_fixtures()

    @classmethod
    def get(cls) -> "_Corpus":
        if cls._instance is None:
            cls._instance = cls()
        return cls._instance


def make_transcript_rows(
    n_convs: int = 20,
    turns_per_conv: int = 12,
    seed: int = 42,
    hot_frac: float = 0.10,
) -> tuple[list[tuple], list[tuple]]:
    """Return (input_rows, golden_rows) as plain tuples matching the schemas."""
    corpus = _Corpus.get()
    rng = random.Random(seed)
    total_turns = n_convs * turns_per_conv
    hot_turns = max(turns_per_conv, int(total_turns * hot_frac))

    rows: list[tuple] = []
    golden: list[tuple] = []
    global_idx = 0
    for ci in range(n_convs):
        conv_id = "conv%06d" % ci
        n_turns = hot_turns if ci == 0 else turns_per_conv
        for ti in range(n_turns):
            ctype = _MIX[(ci * 7 + ti) % len(_MIX)]
            role = _ROLES[ti % 3]
            if ctype == "pdf":
                fx = corpus.pdf[rng.randrange(len(corpus.pdf))]
                text = "pdfb64:" + base64.b64encode(fx.data).decode("ascii")
                gtext, gstatus = fx.golden_text, fx.golden_status
                tool = "fetch_pdf"
            elif ctype == "html":
                fx = corpus.html[rng.randrange(len(corpus.html))]
                text = fx.html
                gtext, gstatus = fx.golden_text, "ok"
                tool = "fetch_html"
            else:
                text = (
                    "Turn %d of conversation %s discusses topic %d in plain "
                    "prose with no markup whatsoever." % (ti, conv_id, rng.randrange(100))
                )
                gtext, gstatus = text, "ok"
                tool = ""
            ts = _EPOCH + _dt.timedelta(seconds=37 * global_idx)
            rows.append((conv_id, ti, role, text, tool, ts))
            golden.append((conv_id, ti, ctype, gtext, gstatus))
            global_idx += 1
    rng.shuffle(rows)  # stable ordering must be earned, not inherited
    return rows, golden


def transcripts_df(spark: SparkSession, rows: list[tuple], partitions: int | None = None) -> DataFrame:
    df = spark.createDataFrame(rows, schema=INPUT_SCHEMA)
    if partitions:
        df = df.repartition(partitions)
    return df


def golden_df(spark: SparkSession, golden: list[tuple]) -> DataFrame:
    return spark.createDataFrame(golden, schema=GOLDEN_SCHEMA)


def synthesize(
    spark: SparkSession,
    n_convs: int = 20,
    turns_per_conv: int = 12,
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    rows, golden = make_transcript_rows(n_convs, turns_per_conv, seed)
    return transcripts_df(spark, rows), golden_df(spark, golden)
