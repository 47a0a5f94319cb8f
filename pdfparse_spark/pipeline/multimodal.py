"""Multimodal-column plumbing: opaque ``binary`` payloads + typed metadata,
decoded/feature-extracted in Arrow-batched ``mapInPandas`` kernels.

The image/audio codec libraries are NOT in this container, so the decode
step is a clearly-marked deterministic stub (``_fake_decode``): it derives
metadata purely from the byte payload, which keeps the Spark-side plumbing
(schema, batch shape, UDF signature, partitioning) fully real and testable
— swap ``_fake_decode`` for a PIL/ffmpeg call on a real cluster.

Scale notes: binary payloads are fat rows — same Arrow-batch-size and
column-pruning discipline as the PDF kernel (extract.py); frame-sampling
and resize would run in the same mapInPandas pass to avoid re-shuffling
payload bytes.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["MM_META_SCHEMA", "decode_meta_batch", "mm_decode_meta", "QUERIES", "ORACLES"]

MM_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("width", T.LongType(), False),
        T.StructField("height", T.LongType(), False),
        T.StructField("n_frames", T.LongType(), False),
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, int, int, int]:
    """Deterministic stand-in for an image/video header parse.

    A real deployment replaces this with e.g. ``PIL.Image.open`` /
    ``av.open``; everything around it (Arrow batching, schema, tests)
    is production-shaped.  Raises on None to exercise the lenient path.
    """
    n = len(payload)
    return n, 64 + n % 512, 64 + (n * 7) % 512, 1 + n % 24


def real_decode(payload: bytes) -> tuple[int, int, int, int]:
    """The genuine codec path: same (n_bytes, width, height, n_frames)
    contract as _fake_decode, so a deployment with PIL installed swaps it
    into decode_meta_batch without touching the Spark plumbing.  Raises
    NotImplementedError when no codec library is importable (this
    container); the skip-marked pytest runs it wherever PIL exists."""
    try:
        from io import BytesIO

        from PIL import Image
    except ImportError as exc:  # pragma: no cover - container has no PIL
        raise NotImplementedError(
            "image/audio codecs not installed; use _fake_decode"
        ) from exc
    with Image.open(BytesIO(payload)) as im:
        return len(payload), im.width, im.height, int(getattr(im, "n_frames", 1))


def decode_meta_batch(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        n_bytes, widths, heights, frames = [], [], [], []
        for payload in pdf["payload"]:
            # NULL payload coerces to b'' — mirrored in every ORACLES
            # entry via coalesce(text, ''), so the lenient path stays
            # value-parity-checked even on a corpus with NULL text
            n, w, h, f = _fake_decode(bytes(payload) if payload is not None else b"")
            n_bytes.append(n)
            widths.append(w)
            heights.append(h)
            frames.append(f)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": n_bytes,
                "width": widths,
                "height": heights,
                "n_frames": frames,
            }
        )


def mm_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize a binary column from documents.text (utf-8 bytes as a fake
    media payload), then run the decode kernel over Arrow batches."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    return docs.mapInPandas(decode_meta_batch, schema=MM_META_SCHEMA)


MM_PIPELINE_SCHEMA = T.StructType(
    MM_META_SCHEMA.fields
    + [
        T.StructField("out_w", T.LongType(), False),
        T.StructField("out_h", T.LongType(), False),
        # scalar encoding of the sampled-frame list (count + csv) — the
        # driver's pandas-based canonicalizer cannot sort list cells, so the
        # gate contract forbids ArrayType output columns
        T.StructField("n_sampled", T.LongType(), False),
        T.StructField("frames_csv", T.StringType(), False),
    ]
)

_FIT_W, _FIT_H = 224, 224  # resize target box
_FRAME_STRIDE = 4


def _fake_resize(w: int, h: int, tw: int = _FIT_W, th: int = _FIT_H) -> tuple[int, int]:
    """Aspect-preserving fit into (tw, th), integer math only (so the
    DuckDB oracle reproduces it exactly — no float-rounding parity risk).
    A real deployment replaces this with PIL's Image.resize and returns the
    resized payload alongside."""
    if w * th <= h * tw:  # height-limited
        return (w * th) // h, th
    return tw, (h * tw) // w


def _fake_frame_sample(n_frames: int, stride: int = _FRAME_STRIDE) -> list[int]:
    """Every ``stride``-th frame index — the video keyframe-sampling shape;
    a real deployment seeks those frames with av/ffmpeg."""
    return list(range(0, n_frames, stride))


def mm_pipeline_batch(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """decode → resize-fit → frame-sample in ONE mapInPandas pass: the fat
    payload column crosses into Python exactly once and never re-shuffles."""
    for pdf in batches:
        cols: dict[str, list] = {k: [] for k in
                                 ("n_bytes", "width", "height", "n_frames",
                                  "out_w", "out_h", "n_sampled", "frames_csv")}
        for payload in pdf["payload"]:
            n, w, h, f = _fake_decode(bytes(payload) if payload is not None else b"")
            ow, oh = _fake_resize(w, h)
            frames = _fake_frame_sample(f)
            cols["n_bytes"].append(n)
            cols["width"].append(w)
            cols["height"].append(h)
            cols["n_frames"].append(f)
            cols["out_w"].append(ow)
            cols["out_h"].append(oh)
            cols["n_sampled"].append(len(frames))
            cols["frames_csv"].append(",".join(str(i) for i in frames))
        yield pd.DataFrame({"doc_id": pdf["doc_id"], **cols})


def mm_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full multimodal plumbing: binary payload → decode meta → aspect-fit
    resize dims → sampled frame indices, one Arrow crossing."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    return docs.mapInPandas(mm_pipeline_batch, schema=MM_PIPELINE_SCHEMA)


MM_AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("sample_rate", T.LongType(), False),
        T.StructField("n_samples", T.LongType(), False),
        T.StructField("n_chunks", T.LongType(), False),
        T.StructField("last_chunk_samples", T.LongType(), False),
    ]
)

_AUDIO_RATES = (8000, 16000, 22050, 44100)


def _fake_audio_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for an audio header parse (16-bit mono PCM
    shape): rate from a byte-derived table, samples = bytes // 2.  A real
    deployment swaps in soundfile/av — integer math keeps the DuckDB
    oracle exact."""
    n = len(payload)
    rate = _AUDIO_RATES[n % 4]
    return n, rate, n // 2


def mm_audio_chunks_batch(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """decode → fixed 1-second chunking in ONE mapInPandas pass — the
    audio face of the frame-sampling plumbing (chunk boundaries feed a
    feature extractor on a real cluster)."""
    for pdf in batches:
        cols: dict[str, list] = {k: [] for k in
                                 ("n_bytes", "sample_rate", "n_samples",
                                  "n_chunks", "last_chunk_samples")}
        for payload in pdf["payload"]:
            n, rate, samples = _fake_audio_decode(bytes(payload) if payload is not None else b"")
            chunks = (samples + rate - 1) // rate
            cols["n_bytes"].append(n)
            cols["sample_rate"].append(rate)
            cols["n_samples"].append(samples)
            cols["n_chunks"].append(chunks)
            cols["last_chunk_samples"].append(
                samples - (chunks - 1) * rate if chunks > 0 else 0
            )
        yield pd.DataFrame({"doc_id": pdf["doc_id"], **cols})


def mm_audio_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-payload plumbing: opaque binary → decoded meta → 1-second
    chunk plan, one Arrow crossing (same batch discipline as mm_pipeline)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    return docs.mapInPandas(mm_audio_chunks_batch, schema=MM_AUDIO_SCHEMA)


ORACLES = {
    # the stub's arithmetic is deliberately SQL-expressible so even the
    # mapInPandas plumbing gets a value-level oracle check
    "mm_decode_meta": """
        SELECT doc_id,
               octet_length(encode(coalesce(text, ''))) AS n_bytes,
               64 + octet_length(encode(coalesce(text, ''))) % 512 AS width,
               64 + (octet_length(encode(coalesce(text, ''))) * 7) % 512 AS height,
               1 + octet_length(encode(coalesce(text, ''))) % 24 AS n_frames
        FROM documents
    """,
    "mm_pipeline": """
        WITH meta AS (
            SELECT doc_id,
                   octet_length(encode(coalesce(text, ''))) AS n_bytes,
                   64 + octet_length(encode(coalesce(text, ''))) % 512 AS width,
                   64 + (octet_length(encode(coalesce(text, ''))) * 7) % 512 AS height,
                   1 + octet_length(encode(coalesce(text, ''))) % 24 AS n_frames
            FROM documents
        )
        SELECT doc_id, n_bytes, width, height, n_frames,
               CASE WHEN width * 224 <= height * 224
                    THEN (width * 224) // height ELSE 224 END AS out_w,
               CASE WHEN width * 224 <= height * 224
                    THEN 224 ELSE (height * 224) // width END AS out_h,
               (n_frames + 3) // 4 AS n_sampled,
               array_to_string(range(0, n_frames, 4), ',') AS frames_csv
        FROM meta
    """,
    "mm_audio_chunks": """
        WITH meta AS (
            SELECT doc_id,
                   octet_length(encode(coalesce(text, ''))) AS n_bytes,
                   ([8000, 16000, 22050, 44100])[octet_length(encode(coalesce(text, ''))) % 4 + 1]
                       AS sample_rate,
                   octet_length(encode(coalesce(text, ''))) // 2 AS n_samples
            FROM documents
        )
        SELECT doc_id, n_bytes, sample_rate, n_samples,
               (n_samples + sample_rate - 1) // sample_rate AS n_chunks,
               CASE WHEN n_samples > 0
                    THEN n_samples - ((n_samples + sample_rate - 1) // sample_rate - 1) * sample_rate
                    ELSE 0 END AS last_chunk_samples
        FROM meta
    """,
}

QUERIES = {
    "mm_decode_meta": mm_decode_meta,
    "mm_pipeline": mm_pipeline,
    "mm_audio_chunks": mm_audio_chunks,
}
