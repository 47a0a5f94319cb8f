"""Per-page-parallel extraction of huge documents (the straggler no salting
can fix).

``run_extraction`` spreads turns, but one 10k-page PDF is still ONE row and
pins one task for minutes while 31 cores idle.  This module splits such
documents across tasks with an EXACT reassembly:

1. **Probe** — pdf-classified turns run a cheap page-count pass (xref +
   page-tree walk, no content decode; ~100x cheaper than extraction).
2. **Split** — docs with ``n_pages > page_threshold`` explode into
   ``pages_per_seg``-page segments, repartitioned so segments of one doc
   land on different tasks.  The payload is replicated per segment — a
   deliberate, bounded cost (n_pages / pages_per_seg copies) paid only for
   the rare heavy docs, in exchange for removing the unbounded straggler.
3. **Merge** — a grouped ``applyInPandas`` reapplies the |Δy|>3 newline
   policy at segment boundaries from each segment's (first_y, last_y)
   metadata (kernel.extract.merge_pdf_segments), making the output
   byte-identical to whole-doc extraction — pinned by
   ``test_split_extraction_matches_whole`` including the
   no-newline-at-page-boundary case.

Light docs (and non-pdf turns) take the normal ``run_extraction`` path
untouched; the heavy key set is broadcast (heavy docs are rare by
definition, and the planner degrades gracefully: an unparseable probe
routes the turn to the whole-doc path, which surfaces the real error).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .extract import OUTPUT_SCHEMA, run_extraction

__all__ = ["run_extraction_split"]

_PROBE_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("n_pages", T.IntegerType(), False),
        # /Count fields validated -> segments may use the subtree-skipping
        # fast window walk (O(window) instead of O(total pages) per segment)
        T.StructField("fast", T.BooleanType(), False),
    ]
)

_SEGMENT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("seg_idx", T.IntegerType(), False),
        T.StructField("seg_text", T.StringType(), True),
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
        T.StructField("status", T.StringType(), False),
        T.StructField("first_y", T.DoubleType(), True),
        T.StructField("last_y", T.DoubleType(), True),
        T.StructField("rendered_any", T.BooleanType(), False),
    ]
)


def _probe_batch(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from ..kernel.extract import probe_pdf_pages_validated

    for pdf in batches:
        probed = [probe_pdf_pages_validated(t) for t in pdf["text"]]
        yield pd.DataFrame(
            {
                "conv_id": pdf["conv_id"],
                "turn_idx": pdf["turn_idx"],
                "n_pages": [n for n, _ in probed],
                "fast": [ok for _, ok in probed],
            }
        )


def _segment_batch(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from ..kernel.extract import extract_pdf_segment

    for pdf in batches:
        rows: dict[str, list] = {k: [] for k in
                                 ("seg_text", "spans", "status",
                                  "first_y", "last_y", "rendered_any")}
        for text, p_start, p_end, fast in zip(
            pdf["text"], pdf["p_start"], pdf["p_end"], pdf["fast"]
        ):
            seg = extract_pdf_segment(text, int(p_start), int(p_end), fast=bool(fast))
            rows["seg_text"].append(seg["seg_text"])
            rows["spans"].append(
                [{"page": p, "start": s, "end": e} for (p, s, e) in seg["spans"]]
            )
            rows["status"].append(seg["status"])
            rows["first_y"].append(seg["first_y"])
            rows["last_y"].append(seg["last_y"])
            rows["rendered_any"].append(seg["rendered_any"])
        yield pd.DataFrame(
            {
                "conv_id": pdf["conv_id"],
                "turn_idx": pdf["turn_idx"],
                "role": pdf["role"],
                "tool": pdf["tool"],
                "ts": pdf["ts"],
                "seg_idx": pdf["seg_idx"],
                **rows,
            }
        )


def _merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
    from ..kernel.extract import merge_pdf_segments

    pdf = pdf.sort_values("seg_idx")
    segs = [
        {
            "seg_text": r.seg_text,
            "spans": [
                (d["page"], d["start"], d["end"])
                for d in (r.spans if r.spans is not None else [])
            ],
            "status": r.status,
            "first_y": r.first_y if pd.notna(r.first_y) else None,
            "last_y": r.last_y if pd.notna(r.last_y) else None,
            "rendered_any": bool(r.rendered_any),
        }
        for r in pdf.itertuples()
    ]
    text, spans, status = merge_pdf_segments(segs)
    first = pdf.iloc[0]
    return pd.DataFrame(
        {
            "conv_id": [first["conv_id"]],
            "turn_idx": [first["turn_idx"]],
            "role": [first["role"]],
            "tool": [first["tool"]],
            "ts": [first["ts"]],
            "content_type": ["pdf"],
            "extracted_text": [text],
            "spans": [[{"page": p, "start": s, "end": e} for (p, s, e) in spans]],
            "parse_status": [status],
            "n_chars": [len(text)],
        }
    )


def run_extraction_split(
    df: DataFrame,
    num_partitions: int | None = None,
    salt: int = 64,
    page_threshold: int = 32,
    pages_per_seg: int = 8,
    probe_min_bytes: int | None = None,
    max_segments_per_doc: int = 64,
) -> DataFrame:
    """Extraction with per-page parallelism for heavy documents.  Output
    rows are identical to :func:`run_extraction` (schema and values).

    ``probe_min_bytes`` skips the page-count probe for payloads below the
    threshold (a JVM-side length check): kernel time scales with content
    size, so a small payload cannot be a straggler regardless of its page
    count — at scale this keeps the probe off the long tail of small docs
    entirely.  Default (None) derives ``page_threshold * 24`` — 24 bytes is
    a conservative floor per page object (dict + xref entry, even ObjStm-
    packed), so no payload below it can exceed ``page_threshold`` pages;
    and even if one somehow did, it would only miss the fast path, never
    lose correctness.  Pass 0 to probe everything.

    ``max_segments_per_doc`` widens segments for extreme page counts so a
    doc never fans out into more than this many tasks: each segment's
    page-tree walk is O(total pages), so total walk work is
    O(pages x segments) — capping segments bounds that overhead factor
    while 64-way fan-out already removes the straggler.
    """
    cols = ["conv_id", "turn_idx", "role", "tool", "ts", "text"]
    df = df.select(*cols)
    if probe_min_bytes is None:
        probe_min_bytes = page_threshold * 24
    is_pdf = F.col("text").startswith("pdfb64:") | F.col("text").startswith("%PDF-")
    probe_pred = is_pdf
    if probe_min_bytes > 0:
        probe_pred = probe_pred & (F.length("text") >= probe_min_bytes)
    probe = (
        df.filter(probe_pred)
        .select("conv_id", "turn_idx", "text")
        .mapInPandas(_probe_batch, schema=_PROBE_SCHEMA)
    )
    # persist the heavy key set: it is broadcast-sized by construction
    # (heavy docs are rare) and feeds BOTH the heavy join and the light
    # anti-join — without the persist the page-count probe would run over
    # every pdf turn twice.  persist (not a driver collect) keeps plan
    # construction lazy: building this DataFrame runs no jobs, and the
    # probe snapshot is taken when the query executes, not when it is
    # planned.
    heavy_keys = probe.filter(F.col("n_pages") > page_threshold).persist()

    heavy = df.join(F.broadcast(heavy_keys), ["conv_id", "turn_idx"])
    seg_pages = F.greatest(
        F.lit(pages_per_seg),
        F.ceil(F.col("n_pages") / F.lit(max_segments_per_doc)).cast("int"),
    )
    segs_in = (
        heavy.withColumn("seg_pages", seg_pages)
        .withColumn(
            "p_start",
            F.explode(F.sequence(F.lit(1), F.col("n_pages"), F.col("seg_pages"))),
        )
        .withColumn("p_end", F.col("p_start") + F.col("seg_pages"))
        .withColumn(
            "seg_idx", ((F.col("p_start") - 1) / F.col("seg_pages")).cast("int")
        )
        .drop("seg_pages")
    )
    if num_partitions:
        # spread SEGMENTS (not docs): one huge doc fans out across tasks
        segs_in = segs_in.repartition(
            num_partitions, F.col("conv_id"), F.col("turn_idx"), F.col("seg_idx")
        )
    seg_out = segs_in.mapInPandas(_segment_batch, schema=_SEGMENT_SCHEMA)
    merged = seg_out.groupBy("conv_id", "turn_idx").applyInPandas(
        _merge_group, schema=OUTPUT_SCHEMA
    )

    light = df.join(
        F.broadcast(heavy_keys.select("conv_id", "turn_idx")),
        ["conv_id", "turn_idx"],
        "left_anti",
    )
    light_out = run_extraction(light, num_partitions=num_partitions, salt=salt)
    return light_out.unionByName(merged)
