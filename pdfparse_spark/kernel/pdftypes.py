"""PDF object model: indirect references, streams, filter decode.

Reference behavior: /root/reference/pdfparse.lisp:800-1056 (SURVEY.md §2 P4).
Lenient by design: type coercions fall back to defaults instead of raising
(the Spark kernel never kills a job on one bad PDF — SURVEY.md §4).

Supported filters match the reference exactly: FlateDecode (+ /Fl) only, with
PNG predictor 12 ("Up"); everything else raises PDFNotImplementedError
(pdfparse.lisp:1016), which the turn-level kernel maps to
parse_status="unsupported_filter".
"""

from __future__ import annotations

import zlib

from .psparse import LIT, PSLiteral

__all__ = [
    "PDFException",
    "PDFTypeError",
    "PDFNotImplementedError",
    "PDFObjRef",
    "PDFStream",
    "resolve1",
    "resolve_all",
    "decipher_all",
    "int_value",
    "num_value",
    "str_value",
    "list_value",
    "dict_value",
    "stream_value",
    "apply_png_predictor",
]


class PDFException(Exception):
    pass


class PDFTypeError(PDFException):
    pass


class PDFNotImplementedError(PDFException):
    pass


class PDFStreamBombError(PDFException):
    """Stream whose decoded size exceeds the safety cap."""


# decoded-stream size cap — see PDFStream.decode
MAX_DECODED_STREAM = 256 << 20

LITERAL_CRYPT = LIT("Crypt")
LITERALS_FLATE_DECODE = (LIT("FlateDecode"), LIT("Fl"))
LITERALS_LZW_DECODE = (LIT("LZWDecode"), LIT("LZW"))
LITERALS_ASCII85_DECODE = (LIT("ASCII85Decode"), LIT("A85"))
LITERALS_ASCIIHEX_DECODE = (LIT("ASCIIHexDecode"), LIT("AHx"))
LITERALS_RUNLENGTH_DECODE = (LIT("RunLengthDecode"), LIT("RL"))
LITERALS_CCITTFAX_DECODE = (LIT("CCITTFaxDecode"), LIT("CCF"))
LITERALS_DCT_DECODE = (LIT("DCTDecode"), LIT("DCT"))


class PDFObjRef:
    """Lazy indirect object reference (objid, doc); pdfparse.lisp:820-834."""

    __slots__ = ("doc", "objid")

    def __init__(self, doc, objid: int):
        self.doc = doc
        self.objid = objid

    def __repr__(self) -> str:  # pragma: no cover
        return "<PDFObjRef:%d>" % self.objid

    def resolve(self):
        return self.doc.getobj(self.objid)


def resolve1(x):
    """Resolve one level of indirection (loops over chained refs).

    Chain length is capped: a ref→ref cycle (1 0 obj 2 0 R / 2 0 obj 1 0 R)
    would otherwise spin forever through the object cache — one adversarial
    document must never pin an executor.  Real chains are 1-2 deep; on
    overflow we resolve to None (lenient)."""
    depth = 0
    while isinstance(x, PDFObjRef):
        depth += 1
        if depth > 32:
            return None  # reference cycle
        x = x.resolve()
    return x


def resolve_all(x):
    """Recursively resolve refs inside lists/dicts (pdfparse.lisp:847-862)."""
    x = resolve1(x)
    if isinstance(x, list):
        return [resolve_all(v) for v in x]
    if isinstance(x, dict):
        return {k: resolve_all(v) for k, v in x.items()}
    return x


def decipher_all(decipher, objid: int, genno: int, x):
    if isinstance(x, bytes):
        return decipher(objid, genno, x)
    if isinstance(x, list):
        return [decipher_all(decipher, objid, genno, v) for v in x]
    if isinstance(x, dict):
        for k, v in x.items():
            x[k] = decipher_all(decipher, objid, genno, v)
    return x


def int_value(x) -> int:
    x = resolve1(x)
    return x if isinstance(x, int) and not isinstance(x, bool) else 0


def num_value(x):
    x = resolve1(x)
    return x if isinstance(x, (int, float)) and not isinstance(x, bool) else 0


def str_value(x) -> bytes:
    x = resolve1(x)
    return x if isinstance(x, bytes) else b""


def list_value(x) -> list:
    x = resolve1(x)
    if isinstance(x, (list, tuple)):
        return list(x)
    return []


def dict_value(x) -> dict:
    x = resolve1(x)
    return x if isinstance(x, dict) else {}


def stream_value(x) -> "PDFStream":
    x = resolve1(x)
    if isinstance(x, PDFStream):
        return x
    return PDFStream({}, b"")


def apply_png_predictor(data: bytes, columns: int) -> bytes:
    """PNG predictor, rows of 1+columns bytes; filter type 2 ('Up') only —
    any other filter byte passes the row through unchanged, matching the
    reference (pdfparse.lisp:1034-1050)."""
    out = bytearray()
    prev = bytes(columns)
    rowlen = columns + 1
    for i in range(0, len(data), rowlen):
        ftype = data[i]
        row = data[i + 1 : i + rowlen]
        if ftype == 2:
            row = bytes((a + b) & 0xFF for a, b in zip(prev, row))
        out += row
        prev = row
    return bytes(out)


LITERAL_PREDICTOR = LIT("Predictor")
LITERAL_COLUMNS = LIT("Columns")
_FILTER_KEYS = (LIT("F"), LIT("Filter"))
_PARMS_KEYS = (LIT("DP"), LIT("DecodeParms"), LIT("FDecodeParms"))


class PDFStream:
    """Stream object: attribute dict + raw bytes; decode is lazy and cached
    (pdfparse.lisp:930-1055)."""

    __slots__ = ("attrs", "rawdata", "decipher", "data", "objid", "genno")

    def __init__(self, attrs: dict, rawdata: bytes, decipher=None):
        self.attrs = attrs
        self.rawdata = rawdata
        self.decipher = decipher
        self.data: bytes | None = None
        self.objid: int | None = None
        self.genno: int | None = None

    def set_objid(self, objid: int, genno: int) -> None:
        self.objid = objid
        self.genno = genno

    def __repr__(self) -> str:  # pragma: no cover
        return "<PDFStream(%r) len=%s %r>" % (
            self.objid,
            len(self.rawdata if self.data is None else self.data),
            self.attrs,
        )

    def __contains__(self, name) -> bool:
        return name in self.attrs

    def get(self, name, default=None):
        return self.attrs.get(name, default)

    def get_any(self, names, default=None):
        for name in names:
            if name in self.attrs:
                return self.attrs[name]
        return default

    def get_filters(self) -> list:
        filters = resolve1(self.get_any(_FILTER_KEYS))
        if filters is None:
            return []
        if not isinstance(filters, list):
            return [filters]
        return [resolve1(f) for f in filters]

    def decode(self) -> None:
        assert self.data is None and self.rawdata is not None
        data = self.rawdata
        if self.decipher:
            data = self.decipher(self.objid, self.genno, data)
        filters = self.get_filters()
        for f in filters:
            if f in LITERALS_FLATE_DECODE:
                # cap expansion: a ~1 MB stream can inflate to gigabytes and
                # pin/OOM an executor (then the tokenizer would crawl it);
                # no legitimate content stream approaches the cap
                d = zlib.decompressobj()
                data = d.decompress(data, MAX_DECODED_STREAM)
                if d.unconsumed_tail:
                    raise PDFStreamBombError(
                        "stream inflates beyond %d bytes" % MAX_DECODED_STREAM
                    )
            else:
                raise PDFNotImplementedError(
                    "unsupported filter: %r" % (getattr(f, "name", f),)
                )
            params = dict_value(self.get_any(_PARMS_KEYS, {}))
            if LITERAL_PREDICTOR in params and LITERAL_COLUMNS in params:
                pred = int_value(params[LITERAL_PREDICTOR])
                columns = int_value(params[LITERAL_COLUMNS])
                if pred:
                    if pred != 12:
                        raise PDFNotImplementedError(
                            "unsupported predictor: %r" % pred
                        )
                    data = apply_png_predictor(data, columns)
        self.data = data
        self.rawdata = None

    def get_data(self) -> bytes:
        if self.data is None:
            self.decode()
        return self.data
