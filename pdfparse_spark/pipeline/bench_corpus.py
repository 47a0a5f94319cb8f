"""Benchmark corpus: deterministic fixture transcripts replicated Spark-side.

BASELINE.md prescribes "fixture corpus replicated ×K" — we generate a small
set of conversation templates driver-side (each mixing heavy multi-page
FlateDecode PDFs, the full small-fixture set, HTML and plain text in
realistic proportions), then replicate to the target conversation count with
a crossJoin against ``spark.range`` so the fan-out happens on executors,
never through the driver.  Written once to a cached parquet dir keyed by
(sf, shape); benchmark runs then read parquet like any production input.
"""

from __future__ import annotations

import base64
import datetime as _dt
import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..fixtures.html_gen import build_html_fixtures
from ..fixtures.pdf_gen import build_pdf_fixtures, make_big_pdf
from .transcripts import INPUT_SCHEMA

__all__ = ["ensure_bench_corpus", "TURNS_PER_CONV"]

TURNS_PER_CONV = 20
_N_TEMPLATES = 8
_EPOCH = _dt.datetime(2026, 1, 1)


def _template_rows() -> list[tuple]:
    """8 template conversations × 20 turns: per conv 2 big PDFs, 4 small
    fixture PDFs, 6 HTML, 8 text — ≈45 ms kernel time per conversation."""
    small = build_pdf_fixtures()
    html = build_html_fixtures()
    rows: list[tuple] = []
    g = 0
    for ci in range(_N_TEMPLATES):
        conv = "tpl%02d" % ci
        payloads: list[tuple[str, str]] = []
        for b in range(2):
            fx = make_big_pdf(20, 40, seed=ci * 2 + b)
            payloads.append(("pdfb64:" + base64.b64encode(fx.data).decode(), "fetch_pdf"))
        for s in range(4):
            fx = small[(ci * 4 + s) % len(small)]
            payloads.append(("pdfb64:" + base64.b64encode(fx.data).decode(), "fetch_pdf"))
        for h in range(6):
            payloads.append((html[(ci + h) % len(html)].html, "fetch_html"))
        for t in range(8):
            payloads.append(
                ("Plain turn %d of template %d with ordinary prose content." % (t, ci), "")
            )
        for ti, (text, tool) in enumerate(payloads):
            rows.append(
                (
                    conv,
                    ti,
                    ["user", "assistant", "tool"][ti % 3],
                    text,
                    tool,
                    _EPOCH + _dt.timedelta(seconds=37 * g),
                )
            )
            g += 1
    return rows


def ensure_bench_corpus(
    spark: SparkSession,
    cache_dir: str,
    n_convs: int,
    files: int = 256,
) -> str:
    """Build (once) and return the parquet path for an n_convs corpus.

    The cache path is keyed by (n_convs, template-content hash) so edits to
    the fixture generators force regeneration instead of silently reusing a
    stale corpus that would invalidate benchmark comparability.

    The corpus replicates the _N_TEMPLATES-conversation template whole, so
    the ACTUAL conversation count is n_convs floored to a template multiple
    (bench callers pass exact multiples: 21000 = 2625 x 8); a request below
    one template yields one full template."""
    rows = _template_rows()  # built ONCE: generating the big fixture PDFs
    # twice (hash pass + createDataFrame pass) doubled cache-miss cost
    digest = hashlib.sha256()
    for row in rows:
        digest.update(repr(row).encode())
    path = os.path.join(
        cache_dir, "corpus_%dconvs_%s" % (n_convs, digest.hexdigest()[:12])
    )
    marker = os.path.join(path, "_SUCCESS")
    if os.path.exists(marker):
        return path
    base = spark.createDataFrame(rows, schema=INPUT_SCHEMA)
    reps = max(1, n_convs // _N_TEMPLATES)
    corpus = (
        base.crossJoin(spark.range(reps).select(F.col("id").alias("rep")))
        .withColumn("conv_id", F.concat_ws("_", "conv_id", "rep"))
        .drop("rep")
        .repartition(files)
    )
    corpus.write.mode("overwrite").parquet(path)
    return path
