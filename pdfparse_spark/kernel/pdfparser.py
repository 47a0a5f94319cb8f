"""PDF file parser, xref tables/streams, content-stream parser.

Reference behavior: /root/reference/pdfparse.lisp:1058-1292 (xrefs),
1781-1955 (parsers), 2149-2249 (content parser + inline images); SURVEY.md
§2 P2/P3/P5.

Documented deviations (reference mistranslations of pdfminer, resolved in
favor of PDF-spec semantics so fixture goldens are self-consistent):
- xref chain order: newest xref section first, so incremental updates
  override older objects (the reference's `push` builds oldest-first,
  pdfparse.lisp:1901-1912).
- xref-stream field 1 unpacks ent[0:fl1] (the reference's subseq start of 9
  at pdfparse.lisp:1277 cannot work for any real W array).
"""

from __future__ import annotations

import re

from .psparse import (
    KEYWORD_ARRAY_BEGIN,
    KEYWORD_ARRAY_END,
    KEYWORD_DICT_BEGIN,
    KEYWORD_DICT_END,
    KEYWORD_PROC_BEGIN,
    KEYWORD_PROC_END,
    KWD,
    LIT,
    PSEOF,
    PSKeyword,
    PSLiteral,
    PSStackParser,
    PSSyntaxError,
    PSTypeError,
)
from .pdftypes import (
    PDFObjRef,
    PDFStream,
    dict_value,
    int_value,
    stream_value,
)

__all__ = [
    "PDFNoValidXRef",
    "PDFXRef",
    "PDFXRefStream",
    "PDFParser",
    "PDFStreamParser",
    "PDFContentParser",
]

KEYWORD_R = KWD("R")
KEYWORD_NULL = KWD("null")
KEYWORD_OBJ = KWD("obj")
KEYWORD_ENDOBJ = KWD("endobj")
KEYWORD_STREAM = KWD("stream")
KEYWORD_XREF = KWD("xref")
KEYWORD_STARTXREF = KWD("startxref")
KEYWORD_TRAILER = KWD("trailer")
KEYWORD_BI = KWD("BI")
KEYWORD_ID = KWD("ID")
KEYWORD_EI = KWD("EI")

LITERAL_XREFSTM = LIT("XRefStm")
LITERAL_PREV = LIT("Prev")
LITERAL_SIZE = LIT("Size")
LITERAL_INDEX = LIT("Index")
LITERAL_W = LIT("W")
LITERAL_LENGTH = LIT("Length")


class PDFNoValidXRef(Exception):
    pass


def nunpack(s: bytes, default: int = 0) -> int:
    """Big-endian unsigned int of arbitrary (small) width."""
    if not s:
        return default
    return int.from_bytes(s, "big")


class PDFXRef:
    """Classic xref table (pdfparse.lisp:1078-1189)."""

    def __init__(self):
        self.offsets: dict[int, tuple[int | None, int]] = {}
        self.trailer: dict = {}

    def load(self, parser: "PDFParser") -> None:
        while True:
            try:
                pos, line = parser.nextline()
            except PSEOF:
                raise PDFNoValidXRef("unexpected EOF in xref table")
            if not line.strip():
                continue
            if line.startswith(b"trailer"):
                parser.seek(pos)
                break
            f = line.strip().split(b" ")
            if len(f) != 2:
                raise PDFNoValidXRef("trailer not found: line=%r" % line)
            start, nobjs = int(f[0]), int(f[1])
            for objid in range(start, start + nobjs):
                try:
                    _, line = parser.nextline()
                except PSEOF:
                    raise PDFNoValidXRef("unexpected EOF in xref entries")
                f = line.strip().split(b" ")
                if len(f) != 3:
                    raise PDFNoValidXRef("invalid xref format: line=%r" % line)
                offset, genno, use = f
                if use == b"n":
                    self.offsets[objid] = (None, int(offset))
        self.load_trailer(parser)

    def load_trailer(self, parser: "PDFParser") -> None:
        try:
            _, kwd = parser.nexttoken()
            assert kwd is KEYWORD_TRAILER, "expected trailer, got %r" % (kwd,)
            _, dic = parser.nextobject()
        except PSEOF:
            x = parser.pop(1)
            if not x:
                raise PDFNoValidXRef("unexpected EOF - no trailer")
            dic = x[0][1]
        self.trailer.update(dict_value(dic))

    def load_fallback(self, parser: "PDFParser") -> None:
        """Brute-force scan for 'N G obj' patterns (pdfparse.lisp:1153-1174)."""
        parser.seek(0)
        pat = re.compile(rb"^(\d+)\s+(\d+)\s+obj\b")
        while True:
            try:
                pos, line = parser.nextline()
            except PSEOF:
                break
            if line.startswith(b"trailer"):
                parser.seek(pos)
                self.load_trailer(parser)
                break
            m = pat.match(line)
            if m:
                self.offsets[int(m.group(1))] = (None, pos)

    def get_trailer(self) -> dict:
        return self.trailer

    def get_pos(self, objid: int) -> tuple[int | None, int]:
        if objid not in self.offsets:
            raise KeyError(objid)
        return (None, self.offsets[objid][1])


class PDFXRefStream:
    """PDF 1.5 cross-reference stream (pdfparse.lisp:1191-1292)."""

    def __init__(self):
        self.data: bytes | None = None
        self.entlen = 0
        self.fl1 = self.fl2 = self.fl3 = 0
        self.ranges: list[tuple[int, int]] = []
        self.trailer: dict = {}

    def load(self, parser: "PDFParser") -> None:
        parser.nexttoken()  # objid
        parser.nexttoken()  # genno
        parser.nexttoken()  # 'obj'
        _, stream = parser.nextobject()
        if not isinstance(stream, PDFStream):
            raise PDFNoValidXRef("invalid xref stream spec")
        # /Index, /W and /Size must be DIRECT objects here: xref loading is
        # what makes indirect references resolvable in the first place, so
        # a reference (or any wrong type) is treated as an invalid xref —
        # PDFNoValidXRef routes read_xref to the brute-force fallback scan
        # instead of a TypeError escaping and failing the whole document
        def _direct_list(v, what: str) -> list:
            if not isinstance(v, list) or any(isinstance(x, PDFObjRef) for x in v):
                raise PDFNoValidXRef("invalid %s: %r" % (what, v))
            return v

        size_raw = stream.get(LITERAL_SIZE)
        if isinstance(size_raw, PDFObjRef):
            raise PDFNoValidXRef("indirect /Size in xref stream")
        size = int_value(size_raw)
        index = stream.get(LITERAL_INDEX)
        if index is None:
            index = [0, size]
        index = _direct_list(index, "/Index")
        if len(index) % 2 != 0:
            raise PDFNoValidXRef("invalid /Index length")
        self.ranges = [
            (int_value(index[i]), int_value(index[i + 1]))
            for i in range(0, len(index), 2)
        ]
        w = [int_value(v) for v in _direct_list(stream.get(LITERAL_W, []), "/W")]
        if len(w) != 3:
            raise PDFNoValidXRef("invalid /W array: %r" % (w,))
        self.fl1, self.fl2, self.fl3 = w
        self.entlen = self.fl1 + self.fl2 + self.fl3
        self.data = stream.get_data()
        self.trailer = stream.attrs

    def get_trailer(self) -> dict:
        return self.trailer

    def get_pos(self, objid: int) -> tuple[int | None, int]:
        offset = 0
        found = False
        for start, nobjs in self.ranges:
            if start <= objid < start + nobjs:
                offset += objid - start
                found = True
                break
            offset += nobjs
        if not found:
            raise KeyError(objid)
        i = offset * self.entlen
        ent = self.data[i : i + self.entlen]
        f1 = nunpack(ent[: self.fl1], 1)
        if f1 == 1:  # in-use: f2 = byte offset
            return (None, nunpack(ent[self.fl1 : self.fl1 + self.fl2]))
        if f1 == 2:  # in ObjStm: f2 = container objid, f3 = index
            return (
                nunpack(ent[self.fl1 : self.fl1 + self.fl2]),
                nunpack(ent[self.fl1 + self.fl2 :]),
            )
        raise KeyError(objid)  # type 0 = free


class PDFParser(PSStackParser):
    """Whole-file parser: xref location + object/stream capture
    (pdfparse.lisp:1781-1955)."""

    def __init__(self, data: bytes):
        super().__init__(data)
        self.doc = None
        self.fallback = False

    def set_document(self, doc) -> None:
        self.doc = doc

    def do_keyword(self, pos: int, token: PSKeyword) -> None:
        if token is KEYWORD_XREF or token is KEYWORD_STARTXREF:
            self.add_results(*self.pop(1))
        elif token is KEYWORD_ENDOBJ:
            self.add_results(*self.pop(4))
        elif token is KEYWORD_NULL:
            self.push((pos, None))
        elif token is KEYWORD_R:
            vals = self.pop(2)
            try:
                objid, genno = (int(v[1]) for v in vals)
                self.push((pos, PDFObjRef(self.doc, objid)))
            except (TypeError, ValueError):
                pass
        elif token is KEYWORD_STREAM:
            self._capture_stream(pos)
        else:
            self.push((pos, token))

    def _capture_stream(self, kw_pos: int) -> None:
        popped = self.pop(1)
        dic = dict_value(popped[0][1]) if popped else {}
        objlen = 0
        if not self.fallback:
            objlen = int_value(dic.get(LITERAL_LENGTH, 0))
        self.seek(kw_pos)
        try:
            _, line = self.nextline()  # 'stream\r\n'
        except PSEOF:
            return
        pos = kw_pos + len(line)
        data = bytearray(self.data[pos : pos + objlen])
        self.seek(pos + objlen)
        # tolerate wrong /Length: extend until the endstream keyword
        while True:
            try:
                _, line = self.nextline()
            except PSEOF:
                break
            i = line.find(b"endstream")
            if i >= 0:
                objlen += i
                data += line[:i]
                break
            objlen += len(line)
            data += line
        self.seek(pos + objlen)
        decipher = self.doc.decipher if self.doc is not None else None
        self.push((pos, PDFStream(dic, bytes(data), decipher)))

    # --- xref loading ------------------------------------------------------
    def find_xref(self) -> int:
        prev = None
        for line in self.revreadlines():
            line = line.strip()
            if line == b"startxref":
                break
            if line:
                prev = line
        else:
            raise PDFNoValidXRef("startxref not found")
        if prev is None:
            raise PDFNoValidXRef("no offset after startxref")
        try:
            return int(prev)
        except ValueError:
            raise PDFNoValidXRef("bad startxref offset: %r" % prev)

    def read_xref_from(self, start: int, xrefs: list, _seen: set | None = None) -> None:
        # /Prev chains in the wild are short; a crafted self-referential
        # Prev would otherwise recurse to the interpreter limit re-parsing
        # the same section each level
        if _seen is None:
            _seen = set()
        if start in _seen:
            return
        _seen.add(start)
        self.seek(start)
        try:
            pos, token = self.nexttoken()
        except PSEOF:
            raise PDFNoValidXRef("unexpected EOF at xref offset")
        if isinstance(token, int) and not isinstance(token, bool):
            # xref stream: "N G obj <<...>> stream"
            self.seek(pos)
            xref = PDFXRefStream()
            xref.load(self)
        else:
            if token is KEYWORD_XREF:
                self.nextline()
            xref = PDFXRef()
            xref.load(self)
        xrefs.append(xref)
        trailer = xref.get_trailer()
        if LITERAL_XREFSTM in trailer:
            self.read_xref_from(int_value(trailer[LITERAL_XREFSTM]), xrefs, _seen)
        if LITERAL_PREV in trailer:
            self.read_xref_from(int_value(trailer[LITERAL_PREV]), xrefs, _seen)

    def read_xref(self) -> list:
        try:
            xrefs: list = []
            self.read_xref_from(self.find_xref(), xrefs)
            if not xrefs:
                raise PDFNoValidXRef("empty xref chain")
            return xrefs
        except (PDFNoValidXRef, PSEOF, ValueError):
            self.fallback = True
            xref = PDFXRef()
            xref.load_fallback(self)
            return [xref]


class PDFStreamParser(PDFParser):
    """Parser for ObjStm contents: keywords flow through, R still resolves
    (pdfparse.lisp:1934-1955)."""

    def flush(self) -> None:
        if self.curstack:
            self.results.extend(self.curstack)
            self.curstack = []

    def do_keyword(self, pos: int, token: PSKeyword) -> None:
        if token is KEYWORD_R:
            vals = self.pop(2)
            try:
                objid, genno = (int(v[1]) for v in vals)
                self.push((pos, PDFObjRef(self.doc, objid)))
            except (TypeError, ValueError):
                pass
        else:
            self.push((pos, token))


_EI_TRAIL_EOL = re.compile(rb"(\r\n|[\r\n])\Z")


class PDFContentParser(PSStackParser):
    """Parses concatenated page content streams; token state spans stream
    boundaries (pdfparse.lisp:2149-2249).  Handles inline images BI/ID/EI."""

    def __init__(self, streams: list):
        data = b"".join(stream_value(s).get_data() for s in streams)
        super().__init__(data)

    def flush(self) -> None:
        if self.curstack:
            self.results.extend(self.curstack)
            self.curstack = []

    def get_inline_data(self, pos: int, target: bytes = b"EI") -> tuple[int, bytes]:
        """Capture raw bytes until 'EI' followed by one whitespace char
        (pdfparse.lisp:2183-2220); strips the target + 1 trailing EOL."""
        data = self.data
        i = 0
        out = bytearray()
        p = pos
        n = len(data)
        tlen = len(target)
        while i <= tlen:
            if p >= n:
                break
            if i:
                c = data[p]
                out.append(c)
                p += 1
                if i >= tlen and c in b" \t\r\n":
                    i += 1
                elif i < tlen and c == target[i]:
                    i += 1
                else:
                    i = 0
            else:
                j = data.find(target[:1], p)
                if j == -1:
                    out += data[p:]
                    p = n
                else:
                    out += data[p : j + 1]
                    p = j + 1
                    i = 1
        self.pos = p
        captured = bytes(out[: len(out) - (tlen + 1)]) if len(out) > tlen else b""
        captured = _EI_TRAIL_EOL.sub(b"", captured)
        return pos, captured

    def iter_objects(self):
        """Specialized object assembler for the interpreter's execute loop.

        Yields the same object sequence ``nextobject`` would produce (minus
        the positions, which execute ignores) but without the generic
        stack-machine protocol — scalars stream straight through, and only
        genuine collections ([...]  <<...>>  {...}  BI..ID dicts) allocate a
        frame.  ``nextobject`` remains the semantic authority; the
        differential test pins this generator against it on arbitrary soup.
        """
        nexttoken = self.nexttoken
        frames: list = []  # (type, items) — 'a' array, 'p' proc, 'd'/'i' dict
        while True:
            try:
                pos, token = nexttoken()
            except PSEOF:
                return
            cls = token.__class__
            if cls is int or cls is float or cls is bytes or cls is PSLiteral or cls is bool:
                if frames:
                    frames[-1][1].append(token)
                else:
                    yield token
                continue
            if token is KEYWORD_ARRAY_BEGIN:
                frames.append(("a", []))
            elif token is KEYWORD_ARRAY_END:
                if frames and frames[-1][0] == "a":
                    _t, items = frames.pop()
                    if frames:
                        frames[-1][1].append(items)
                    else:
                        yield items
                # else: stray ']' dropped (lenient, nextobject parity)
            elif token is KEYWORD_DICT_BEGIN:
                frames.append(("d", []))
            elif token is KEYWORD_DICT_END:
                if frames and frames[-1][0] == "d":
                    _t, items = frames.pop()
                    if len(items) % 2 != 0:
                        raise PSSyntaxError("invalid dictionary construct: %r" % items)
                    # unhashable key (array/dict in key position of a
                    # malformed << >>): skip the pair leniently — a
                    # TypeError is not a PS* error and would abort the
                    # whole document instead of degrading
                    d = {}
                    for i in range(0, len(items), 2):
                        try:
                            d[items[i]] = items[i + 1]
                        except TypeError:
                            continue
                    if frames:
                        frames[-1][1].append(d)
                    else:
                        yield d
            elif token is KEYWORD_PROC_BEGIN:
                frames.append(("p", []))
            elif token is KEYWORD_PROC_END:
                if frames and frames[-1][0] == "p":
                    _t, items = frames.pop()
                    if frames:
                        frames[-1][1].append(items)
                    else:
                        yield items
            elif token is KEYWORD_BI:
                frames.append(("i", []))
            elif token is KEYWORD_ID:
                if frames and frames[-1][0] == "i":
                    _t, items = frames.pop()
                    if len(items) % 2 == 0:
                        d = {items[i]: items[i + 1] for i in range(0, len(items), 2)}
                        _dpos, data = self.get_inline_data(pos + 3)
                        obj = PDFStream(d, data)
                        if frames:
                            frames[-1][1].append(obj)
                            frames[-1][1].append(KEYWORD_EI)
                        else:
                            yield obj
                            yield KEYWORD_EI
                    # odd dict: dropped (lenient, do_keyword parity)
            elif frames:
                frames[-1][1].append(token)  # keyword inside a collection
            else:
                yield token

    def do_keyword(self, pos: int, token: PSKeyword) -> None:
        if token is KEYWORD_BI:
            self.start_type(pos, "inline")
        elif token is KEYWORD_ID:
            try:
                _, objs = self.end_type("inline")
                if len(objs) % 2 != 0:
                    raise PSTypeError("invalid inline image dict: %r" % objs)
                d = {objs[i]: objs[i + 1] for i in range(0, len(objs), 2)}
                dpos, data = self.get_inline_data(pos + len(b"ID "))
                obj = PDFStream(d, data)
                self.push((dpos, obj))
                self.push((dpos, KEYWORD_EI))
            except PSTypeError:
                pass
        else:
            self.push((pos, token))
