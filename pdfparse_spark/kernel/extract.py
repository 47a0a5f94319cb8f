"""Turn-level extraction kernel: classify → route → extract.

This is the function applied per transcript turn inside the Spark
``mapInPandas`` stage (SURVEY.md §2 P8/R12).  Pure Python, no Spark imports:
unit-testable standalone, shipped to executors via --py-files.

Contract (BASELINE.json input_hint):
    extract_turn(text: str) -> (content_type, extracted_text, spans, status)
where spans is a list of (page:int, char_start:int, char_end:int) into
extracted_text and status is "ok" | "unsupported_filter" | "error:<cls>".

PDF turns arrive either as raw %PDF- bytes latin-1-smuggled in the string
column or base64-wrapped with prefix "pdfb64:" (FIXTURES.md §1 — a latin-1
string column would corrupt PDF bytes).
"""

from __future__ import annotations

import base64
import binascii

from .device import SimpleTextDevice
from .html_extract import extract_html, html_signals
from .interp import process_pdf
from .pdftypes import PDFNotImplementedError

__all__ = ["classify_text", "extract_pdf_bytes", "extract_turn"]

PDF_B64_PREFIX = "pdfb64:"


def classify_text(text: str) -> str:
    if text.startswith(PDF_B64_PREFIX) or text.startswith("%PDF-"):
        return "pdf"
    if html_signals(text):
        return "html"
    return "text"


def extract_pdf_bytes(data: bytes) -> tuple[str, list[tuple[int, int, int]], str]:
    """Run the full kernel chain (P1-P7) over one PDF; lenient — never raises."""
    device = SimpleTextDevice()
    try:
        process_pdf(device, data)
        status = "ok"
    except PDFNotImplementedError:
        status = "unsupported_filter"
    except RecursionError:
        status = "error:RecursionError"
    except Exception as exc:  # lenient: one bad PDF must not kill the batch
        status = "error:%s" % type(exc).__name__
    return device.get_text(), device.spans, status


def extract_turn(text: str) -> tuple[str, str, list[tuple[int, int, int]], str]:
    """(content_type, extracted_text, spans, parse_status) for one turn."""
    if text is None:
        return ("text", "", [], "ok")
    ctype = classify_text(text)
    if ctype == "pdf":
        if text.startswith(PDF_B64_PREFIX):
            try:
                data = base64.b64decode(text[len(PDF_B64_PREFIX):], validate=False)
            except (binascii.Error, ValueError):
                return ("pdf", "", [], "error:Base64DecodeError")
        else:
            data = text.encode("latin-1", "replace")
        extracted, spans, status = extract_pdf_bytes(data)
        return ("pdf", extracted, spans, status)
    if ctype == "html":
        extracted = extract_html(text)
        return ("html", extracted, [(0, 0, len(extracted))], "ok")
    return ("text", text, [(0, 0, len(text))], "ok")
