"""Deterministic minimal-PDF fixture corpus with golden text + spans.

Implements FIXTURES.md §2: each fixture pins one kernel path documented in
SURVEY.md §2; goldens are the exact output of the reference layout policy
(simple-device.lisp:19-41): leading newline on the first render (last_y
starts at -1e20), newline iff |Δy|>3 of the text matrix f, ``<CID x>``
uppercase-hex fallback, no synthesized spacing.

Pure Python, no external PDF libraries, fully deterministic (no randomness).
"""

from __future__ import annotations

import zlib

__all__ = ["build_pdf_fixtures", "PDFFixture"]


class PDFFixture:
    __slots__ = ("name", "data", "golden_text", "golden_spans", "golden_status")

    def __init__(self, name, data, golden_text, golden_spans, golden_status="ok"):
        self.name = name
        self.data = data
        self.golden_text = golden_text
        self.golden_spans = golden_spans
        self.golden_status = golden_status


def _assemble(bodies: dict[int, bytes], root: int = 1, extra_trailer: bytes = b"") -> bytes:
    """Classic-xref-table PDF from {objid: body}; body excludes obj/endobj."""
    out = bytearray(b"%PDF-1.4\n")
    offsets: dict[int, int] = {}
    for objid in sorted(bodies):
        offsets[objid] = len(out)
        out += b"%d 0 obj\n" % objid
        out += bodies[objid]
        out += b"\nendobj\n"
    xref_pos = len(out)
    maxid = max(bodies)
    out += b"xref\n0 %d\n" % (maxid + 1)
    out += b"0000000000 65535 f \n"
    for objid in range(1, maxid + 1):
        if objid in offsets:
            out += b"%010d 00000 n \n" % offsets[objid]
        else:
            out += b"0000000000 65535 f \n"
    out += b"trailer\n<< /Size %d /Root %d 0 R %s>>\nstartxref\n%d\n%%%%EOF\n" % (
        maxid + 1,
        root,
        extra_trailer,
        xref_pos,
    )
    return bytes(out)


def _stream(dict_entries: bytes, data: bytes) -> bytes:
    # no EOL between data and endstream: the stream-capture loop (reference
    # pdfparse.lisp:1814-1864 and ours) folds such an EOL into the data,
    # which would break operators split across multi-stream boundaries
    return b"<< %s /Length %d >>\nstream\n%sendstream" % (
        dict_entries,
        len(data),
        data,
    )


def _flate_stream(dict_entries: bytes, data: bytes) -> bytes:
    c = zlib.compress(data)
    return b"<< %s /Filter /FlateDecode /Length %d >>\nstream\n%s\nendstream" % (
        dict_entries,
        len(c),
        c,
    )


def _doc_skeleton(content: bytes, font_body: bytes | None = None,
                  page_extra: bytes = b"", extra_objs: dict[int, bytes] | None = None,
                  resources: bytes | None = None) -> dict[int, bytes]:
    """1=Catalog 2=Pages 3=Page 4=Font 5=Content (+extras from 6)."""
    if font_body is None:
        font_body = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    if resources is None:
        resources = b"<< /Font << /F1 4 0 R >> >>"
    bodies = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources %s /Contents 5 0 R %s>>" % (resources, page_extra)
        ),
        4: font_body,
        5: _stream(b"", content),
    }
    if extra_objs:
        bodies.update(extra_objs)
    return bodies


# --- fixtures ----------------------------------------------------------------


def fx_min_uncompressed() -> PDFFixture:
    content = b"BT /F1 12 Tf 72 720 Td (Hello World) Tj ET"
    data = _assemble(_doc_skeleton(content))
    text = "\nHello World"
    return PDFFixture("pdf_min_uncompressed", data, text, [(1, 0, len(text))])


def fx_flate() -> PDFFixture:
    content = b"BT /F1 12 Tf 72 720 Td (Compressed content) Tj ET"
    bodies = _doc_skeleton(b"")
    bodies[5] = _flate_stream(b"", content)
    data = _assemble(bodies)
    text = "\nCompressed content"
    return PDFFixture("pdf_flate", data, text, [(1, 0, len(text))])


def fx_multiline() -> PDFFixture:
    # TL 14 → leading=-14; T* moves f by d*leading = -14 → newline.
    # TD sets leading=ty (=-16) and moves; ' = T* + show; " sets Tw/Tc + T*?
    # no: " does NOT T*. Td 0 2 = rise-like +2 shift → no newline (|2|<=3).
    content = (
        b"BT /F1 12 Tf 14 TL 72 720 Td (Line one) Tj "
        b"T* (Line two) Tj "
        b"0 -16 TD (Line three) Tj "
        b"(continued) ' "
        b"1 2 (quoted) \" "
        b"0 2 Td (sup) Tj "
        b"ET"
    )
    data = _assemble(_doc_skeleton(content))
    # y walk: 720 (nl), 706 (nl), 690 (nl), T* in ' → 690-16=674 (nl),
    # " shows at 674 (no move, no nl), Td 0 2 → 676 (|Δ|=2 → no nl)
    text = "\nLine one\nLine two\nLine three\ncontinuedquotedsup"
    return PDFFixture("pdf_multiline", data, text, [(1, 0, len(text))])


def fx_tj_array() -> PDFFixture:
    content = (
        b"BT /F1 12 Tf 72 720 Td "
        b"[(Ker) -120 (ned) -80 ( text)] TJ "
        b"ET"
    )
    data = _assemble(_doc_skeleton(content))
    text = "\nKerned text"
    return PDFFixture("pdf_tj_array", data, text, [(1, 0, len(text))])


def fx_hexstring_escapes() -> PDFFixture:
    content = (
        b"BT /F1 12 Tf 72 720 Td "
        b"(a\\(b\\)c \\134 \\110i) Tj "
        b"<48 656C6C 6F21> Tj "
        b"(nest (ed) parens) Tj "
        b"ET"
    )
    data = _assemble(_doc_skeleton(content))
    # octal \134='\\' \110='H'; hex → 'Hello!'
    text = "\na(b)c \\ Hi" + "Hello!" + "nest (ed) parens"
    return PDFFixture("pdf_hexstring_escapes", data, text, [(1, 0, len(text))])


def fx_winansi_differences() -> PDFFixture:
    font = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Custom "
        b"/FirstChar 65 /Widths [500 500 500] /FontDescriptor << >> "
        b"/Encoding << /Type /Encoding /BaseEncoding /WinAnsiEncoding "
        b"/Differences [65 /bullet /Euro 97 /dagger] >> >>"
    )
    content = b"BT /F1 12 Tf 72 720 Td (ABa b\x80) Tj ET"
    data = _assemble(_doc_skeleton(content, font_body=font))
    # A(65)→bullet, B(66)→Euro (names consume successive codes), a(97)→dagger,
    # space→space (WinAnsi), b→b, 0x80→€ (WinAnsi/cp1252)
    text = "\n•€† b€"
    return PDFFixture("pdf_winansi_differences", data, text, [(1, 0, len(text))])


def fx_two_columns() -> PDFFixture:
    """Interleaved two-column page: the reference policy emits raw
    content-stream order (golden below); the opt-in ColumnTextDevice
    reorders it column-major (pinned in test_kernel_golden)."""
    content = (
        b"BT /F1 12 Tf "
        b"72 700 Td (Left one) Tj "
        b"248 0 Td (Right one) Tj "
        b"-248 -20 Td (Left two) Tj "
        b"248 0 Td (Right two) Tj "
        b"ET"
    )
    data = _assemble(_doc_skeleton(content))
    # stream order; right runs stay on the same line (|dy| = 0 <= 3)
    text = "\nLeft oneRight one\nLeft twoRight two"
    return PDFFixture("pdf_two_columns", data, text, [(1, 0, len(text))])


def fx_agl_differences() -> PDFFixture:
    """/Differences naming non-Latin AGL glyphs (Greek, math, Hebrew
    presentation form) — exercises the full 4,281-entry Adobe Glyph List
    (reference glyphlist.lisp:59), not just the Latin subset.  The
    /dalethatafpatah entry is one of the AGL's 81 multi-codepoint values."""
    font = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Custom "
        b"/Encoding << /Type /Encoding /BaseEncoding /WinAnsiEncoding "
        b"/Differences [65 /alpha /summation 97 /aleph /dalethatafpatah] >> >>"
    )
    content = b"BT /F1 12 Tf 72 720 Td (AB ab x) Tj ET"
    data = _assemble(_doc_skeleton(content, font_body=font))
    # A→α B→∑ (names consume successive codes), a→ℵ b→ד?ֲ (2 codepoints),
    # space/x pass through WinAnsi
    text = "\nα∑ ℵדֲ x"
    return PDFFixture("pdf_agl_differences", data, text, [(1, 0, len(text))])


_TOUNICODE_HEADER = (
    b"/CIDInit /ProcSet findresource begin\n"
    b"12 dict begin\n"
    b"begincmap\n"
    b"/CIDSystemInfo << /Registry (T) /Ordering (U) /Supplement 0 >> def\n"
    b"/CMapName /T-U def\n/CMapType 2 def\n"
    b"1 begincodespacerange\n<00> <FF>\nendcodespacerange\n"
)
_TOUNICODE_FOOTER = b"endcmap\nCMapName currentdict /CMap defineresource pop\nend\nend\n"


def fx_tounicode_bfchar() -> PDFFixture:
    cmap = (
        _TOUNICODE_HEADER
        + b"2 beginbfchar\n<41> <0051>\n<42> <0052>\nendbfchar\n"
        + b"1 beginbfrange\n<43> <45> [<0058> <0059> <005A>]\nendbfrange\n"
        + _TOUNICODE_FOOTER
    )
    font = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Custom "
        b"/FirstChar 65 /Widths [500 500 500 500 500] /FontDescriptor << >> "
        b"/Encoding /WinAnsiEncoding /ToUnicode 6 0 R >>"
    )
    bodies = _doc_skeleton(
        b"BT /F1 12 Tf 72 720 Td (ABCDE!) Tj ET",
        font_body=font,
        extra_objs={6: _stream(b"", cmap)},
    )
    data = _assemble(bodies)
    # A→Q B→R, bfrange C,D,E→X,Y,Z; '!' not in map → WinAnsi fallback '!'
    text = "\nQRXYZ!"
    return PDFFixture("pdf_tounicode_bfchar", data, text, [(1, 0, len(text))])


def _cid_font_objs(tounicode: bytes) -> tuple[bytes, dict[int, bytes]]:
    font = (
        b"<< /Type /Font /Subtype /Type0 /BaseFont /TestCID "
        b"/Encoding /Identity-H /DescendantFonts [6 0 R] /ToUnicode 7 0 R >>"
    )
    extras = {
        6: (
            b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /TestCID "
            b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) "
            b"/Supplement 0 >> /FontDescriptor << /FontName /TestCID >> "
            b"/DW 1000 /W [1 [500 500 500 500]] >>"
        ),
        7: _stream(b"", tounicode),
    }
    return font, extras


def fx_cid_identity_h() -> PDFFixture:
    cmap = (
        _TOUNICODE_HEADER
        + b"2 beginbfchar\n<0001> <0051>\n<0002> <0072>\nendbfchar\n"
        + b"1 beginbfrange\n<0003> <0004> <0073>\nendbfrange\n"
        + _TOUNICODE_FOOTER
    )
    font, extras = _cid_font_objs(cmap)
    bodies = _doc_skeleton(
        b"BT /F1 12 Tf 72 720 Td <00010002 0003\n0004> Tj ET",
        font_body=font,
        extra_objs=extras,
    )
    data = _assemble(bodies)
    # 2-byte codes 1..4 → Q r, scalar bfrange 3→s 4→t
    text = "\nQrst"
    return PDFFixture("pdf_cid_identity_h", data, text, [(1, 0, len(text))])


def fx_cid_unmapped() -> PDFFixture:
    cmap = (
        _TOUNICODE_HEADER
        + b"1 beginbfchar\n<0001> <0051>\nendbfchar\n"
        + _TOUNICODE_FOOTER
    )
    font, extras = _cid_font_objs(cmap)
    bodies = _doc_skeleton(
        b"BT /F1 12 Tf 72 720 Td <0001001F> Tj ET",
        font_body=font,
        extra_objs=extras,
    )
    data = _assemble(bodies)
    text = "\nQ<CID 1F>"
    return PDFFixture("pdf_cid_unmapped", data, text, [(1, 0, len(text))])


def _png_up_encode(rows: list[bytes]) -> bytes:
    out = bytearray()
    prev = bytes(len(rows[0]))
    for row in rows:
        out.append(2)
        out += bytes((b - a) & 0xFF for a, b in zip(prev, row))
        prev = row
    return bytes(out)


def fx_xrefstream_objstm() -> PDFFixture:
    """PDF 1.5: catalog/pages/page/font live in an ObjStm; xref is a stream
    with W=[1 2 1] + predictor 12."""
    content = b"BT /F1 12 Tf 72 720 Td (XRef stream works) Tj ET"
    # object 5 = content stream, 6 = ObjStm, 7 = xref stream
    objstm_objs = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        (
            3,
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 4 0 R >> >> /Contents 5 0 R >>",
        ),
        (4, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"),
    ]
    payload = bytearray()
    header = bytearray()
    for objid, body in objstm_objs:
        header += b"%d %d " % (objid, len(payload))
        payload += body + b"\n"
    objstm_data = bytes(header) + bytes(payload)
    first = len(header)

    out = bytearray(b"%PDF-1.5\n")
    offsets: dict[int, int] = {}
    offsets[5] = len(out)
    out += b"5 0 obj\n" + _stream(b"", content) + b"\nendobj\n"
    offsets[6] = len(out)
    out += (
        b"6 0 obj\n"
        + _flate_stream(
            b"/Type /ObjStm /N %d /First %d" % (len(objstm_objs), first),
            objstm_data,
        )
        + b"\nendobj\n"
    )
    xref_pos = len(out)
    # entries for objects 0..7: obj0 free; 1-4 type2 in stream 6; 5,6,7 type1
    rows = []
    rows.append(bytes([0, 0, 0, 255]))  # free
    for idx in range(4):  # objects 1..4 → (2, strmid=6, index)
        rows.append(bytes([2, 0, 6, idx]))
    rows.append(bytes([1]) + offsets[5].to_bytes(2, "big") + bytes([0]))
    rows.append(bytes([1]) + offsets[6].to_bytes(2, "big") + bytes([0]))
    rows.append(bytes([1]) + xref_pos.to_bytes(2, "big") + bytes([0]))
    xref_data = zlib.compress(_png_up_encode(rows))
    out += (
        b"7 0 obj\n<< /Type /XRef /Size 8 /W [1 2 1] /Root 1 0 R "
        b"/Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns 4 >> "
        b"/Length %d >>\nstream\n" % len(xref_data)
    )
    out += xref_data
    out += b"\nendstream\nendobj\n"
    out += b"startxref\n%d\n%%%%EOF\n" % xref_pos
    text = "\nXRef stream works"
    return PDFFixture("pdf_xrefstream_objstm", bytes(out), text, [(1, 0, len(text))])


def fx_incremental_update() -> PDFFixture:
    """Two xref sections chained via /Prev; content overridden in the newer
    section — newest xref wins (PDF-spec precedence; see pdfparser.py
    docstring for the reference deviation)."""
    base_bodies = _doc_skeleton(b"BT /F1 12 Tf 72 720 Td (version ONE) Tj ET")
    base = _assemble(base_bodies)
    old_xref_pos = base.rfind(b"\nxref\n") + 1
    out = bytearray(base)
    new5_pos = len(out)
    newcontent = b"BT /F1 12 Tf 72 720 Td (version TWO) Tj ET"
    out += b"5 0 obj\n" + _stream(b"", newcontent) + b"\nendobj\n"
    xref_pos = len(out)
    out += b"xref\n5 1\n%010d 00000 n \n" % new5_pos
    out += (
        b"trailer\n<< /Size 6 /Root 1 0 R /Prev %d >>\nstartxref\n%d\n%%%%EOF\n"
        % (old_xref_pos, xref_pos)
    )
    text = "\nversion TWO"
    return PDFFixture("pdf_incremental_update", bytes(out), text, [(1, 0, len(text))])


def fx_broken_xref() -> PDFFixture:
    """Garbage startxref → objects found only by the 'N G obj' fallback scan."""
    bodies = _doc_skeleton(b"BT /F1 12 Tf 72 720 Td (found by scan) Tj ET")
    good = _assemble(bodies)
    # wreck the startxref offset
    pos = good.rfind(b"startxref\n")
    end = good.find(b"\n", pos + len(b"startxref\n"))
    data = good[: pos + len(b"startxref\n")] + b"999999999" + good[end:]
    text = "\nfound by scan"
    return PDFFixture("pdf_broken_xref", data, text, [(1, 0, len(text))])


def fx_form_xobject() -> PDFFixture:
    form_content = b"BT /F1 12 Tf 10 10 Td (inside form) Tj ET"
    form = _stream(
        b"/Type /XObject /Subtype /Form /BBox [0 0 200 200] "
        b"/Matrix [1 0 0 1 0 100] "
        b"/Resources << /Font << /F1 4 0 R >> >>",
        form_content,
    )
    content = b"BT /F1 12 Tf 72 720 Td (outside) Tj ET /X1 Do"
    bodies = _doc_skeleton(
        content,
        extra_objs={6: form},
        resources=b"<< /Font << /F1 4 0 R >> /XObject << /X1 6 0 R >> >>",
    )
    data = _assemble(bodies)
    # outside at y=720 (nl); form's own textstate starts fresh: y=10,
    # |720-10|>3 → nl.  The /Matrix y-translation is ignored by the simple
    # device (CTM no-op) — pinned here.
    text = "\noutside\ninside form"
    return PDFFixture("pdf_form_xobject", data, text, [(1, 0, len(text))])


def fx_multistream_page() -> PDFFixture:
    """/Contents as array of 2 streams with the Tj operator split across the
    boundary (streams concatenate with no separator)."""
    part1 = b"BT /F1 12 Tf 72 720 Td (split streams) T"
    part2 = b"j ET"
    bodies = _doc_skeleton(b"")
    bodies[3] = (
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 4 0 R >> >> /Contents [5 0 R 6 0 R] >>"
    )
    bodies[5] = _stream(b"", part1)
    bodies[6] = _stream(b"", part2)
    data = _assemble(bodies)
    text = "\nsplit streams"
    return PDFFixture("pdf_multistream_page", data, text, [(1, 0, len(text))])


def fx_multipage() -> PDFFixture:
    """3 pages via a nested /Pages tree; /Resources inherited from the root
    Pages node.  All pages render at y=720 → last_y persists across pages,
    so no newline between pages (reference: device lives across pages)."""
    bodies = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: (
            b"<< /Type /Pages /Kids [8 0 R 6 0 R] /Count 3 "
            b"/Resources << /Font << /F1 4 0 R >> >> "
            b"/MediaBox [0 0 612 792] >>"
        ),
        8: b"<< /Type /Pages /Parent 2 0 R /Kids [3 0 R 9 0 R] /Count 2 >>",
        3: b"<< /Type /Page /Parent 8 0 R /Contents 5 0 R >>",
        9: b"<< /Type /Page /Parent 8 0 R /Contents 10 0 R >>",
        6: b"<< /Type /Page /Parent 2 0 R /Contents 7 0 R >>",
        4: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        5: _stream(b"", b"BT /F1 12 Tf 72 720 Td (page one ) Tj ET"),
        10: _stream(b"", b"BT /F1 12 Tf 72 720 Td (page two ) Tj ET"),
        7: _stream(b"", b"BT /F1 12 Tf 72 720 Td (page three) Tj ET"),
    }
    data = _assemble(bodies)
    text = "\npage one page two page three"
    # spans: page1 = [0, 10) incl leading \n; page2 = [10, 19); page3 = [19, 29)
    spans = [(1, 0, 10), (2, 10, 19), (3, 19, 29)]
    return PDFFixture("pdf_multipage", data, text, spans)


def fx_rotate90() -> PDFFixture:
    bodies = _doc_skeleton(
        b"BT /F1 12 Tf 72 720 Td (rotated page) Tj ET",
        page_extra=b"/Rotate 90 ",
    )
    data = _assemble(bodies)
    # rotation only changes the CTM, which the simple device ignores
    text = "\nrotated page"
    return PDFFixture("pdf_rotate90", data, text, [(1, 0, len(text))])


def fx_graphics_noise() -> PDFFixture:
    content = (
        b"q 1 0 0 1 10 10 cm 2 w 0 J 1 j 4 M [2 1] 0 d /RelativeColorimetric ri 0 i "
        b"/GS1 gs "
        b"/CS0 cs 0.2 0.3 0.4 scn /CS0 CS 0.5 0.6 0.7 SCN "
        b"0.5 g 0.1 0.2 0.3 RG 0 0 0 1 k "
        b"10 10 m 20 20 l 30 30 40 40 50 50 c 60 60 70 70 v 80 80 90 90 y h "
        b"5 5 100 100 re S 15 15 m 25 25 l f W n "
        b"BI /W 2 /H 2 /BPC 8 ID \x01\x02\x03\x04\x05\x06\x07\x08\x09\x0a\x0b\x0c EI "
        b"/Tag1 MP /Tag2 << /K 1 >> DP /MC1 BMC /MC2 << /P 2 >> BDC "
        b"BT /F1 12 Tf 72 720 Td (noise survived) Tj ET "
        b"EMC EMC Q"
    )
    icc = _stream(b"/N 3", b"fake-icc-profile-bytes")
    bodies = _doc_skeleton(
        content,
        extra_objs={6: icc},
        resources=(
            b"<< /Font << /F1 4 0 R >> "
            b"/ColorSpace << /CS0 [/ICCBased 6 0 R] >> "
            b"/ExtGState << /GS1 << /CA 1 >> >> >>"
        ),
    )
    data = _assemble(bodies)
    text = "\nnoise survived"
    return PDFFixture("pdf_graphics_noise", data, text, [(1, 0, len(text))])


def fx_rc4_encrypted() -> PDFFixture:
    """Standard security handler R2/V1, 40-bit RC4, empty user password
    (PDF 1.7 spec Algorithms 2/4/3.1; exercises pdfparse.lisp:1437-1547:
    key derivation, /U verification, per-object decrypt of streams)."""
    import hashlib
    import struct

    pad = bytes(
        [
            0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
            0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
            0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
        ]
    )

    def _rc4(key: bytes, data: bytes) -> bytes:
        S = list(range(256))
        j = 0
        for i in range(256):
            j = (j + S[i] + key[i % len(key)]) & 0xFF
            S[i], S[j] = S[j], S[i]
        out = bytearray()
        i = j = 0
        for c in data:
            i = (i + 1) & 0xFF
            j = (j + S[i]) & 0xFF
            S[i], S[j] = S[j], S[i]
            out.append(c ^ S[(S[i] + S[j]) & 0xFF])
        return bytes(out)

    docid = hashlib.md5(b"fx_rc4_encrypted").digest()
    owner_pw = (b"owner" + pad)[:32]
    user_pw = pad  # empty user password → padding alone
    # Algorithm 3: /O = RC4(md5(padded owner pw)[:5], padded user pw)
    o_val = _rc4(hashlib.md5(owner_pw).digest()[:5], user_pw)
    p = -1  # all permissions
    # Algorithm 2: file key = md5(padded_user + O + P_le + docid)[:5]
    h = hashlib.md5(user_pw)
    h.update(o_val)
    h.update(struct.pack("<i", p))
    h.update(docid)
    key = h.digest()[:5]
    # Algorithm 4 (R2): /U = RC4(key, padding)
    u_val = _rc4(key, pad)

    def objkey(objid: int, genno: int) -> bytes:
        k1 = key + struct.pack("<L", objid)[:3] + struct.pack("<L", genno)[:2]
        return hashlib.md5(k1).digest()[: min(len(k1), 16)]

    content = b"BT /F1 12 Tf 72 720 Td (Hello Secret) Tj ET"
    enc_content = _rc4(objkey(5, 0), content)
    bodies = _doc_skeleton(b"")  # placeholder for obj 5, replaced below
    bodies[5] = _stream(b"", enc_content)
    # an encrypted INDIRECT STRING object (hexstring form): exercises the
    # per-object string decrypt + the plaintext-cache pin
    # (test_encrypted_object_cache_returns_plaintext) — streams alone
    # never caught a cache that stored ciphertext
    bodies[7] = b"<%s>" % _rc4(objkey(7, 0), b"Top Secret Title").hex().encode()
    bodies[6] = (
        b"<< /Filter /Standard /V 1 /R 2 /Length 40 /P -1 "
        b"/O <%s> /U <%s> >>" % (o_val.hex().encode(), u_val.hex().encode())
    )
    data = _assemble(
        bodies,
        extra_trailer=b"/Encrypt 6 0 R /ID [<%s> <%s>] "
        % (docid.hex().encode(), docid.hex().encode()),
    )
    text = "\nHello Secret"
    return PDFFixture("pdf_rc4_encrypted", data, text, [(1, 0, len(text))])


def fx_unsupported_filter() -> PDFFixture:
    bodies = _doc_skeleton(b"")
    bodies[5] = (
        b"<< /Filter /LZWDecode /Length 8 >>\nstream\n\x80\x0b\x60\x50\x22\x0c\x0c\x85\nendstream"
    )
    data = _assemble(bodies)
    return PDFFixture(
        "pdf_unsupported_filter", data, "", [], golden_status="unsupported_filter"
    )


def fx_names_cycle() -> PDFFixture:
    """A /Names → /Dests tree whose /Kids form a cycle (6 → 7 → 6).  Text
    extraction never walks the name tree, so the golden is a normal page;
    the end-to-end pin is that opening THIS file and calling get_dest
    terminates on both hit and miss (seen-set guard, pdfdocument.py
    lookup_name) instead of looping."""
    content = b"BT /F1 12 Tf 72 720 Td (Cycle resistant) Tj ET"
    bodies = _doc_skeleton(
        content,
        extra_objs={
            6: b"<< /Kids [7 0 R] >>",
            7: b"<< /Kids [6 0 R] /Names [(hit) [3 0 R /Fit]] >>",
        },
    )
    bodies[1] = b"<< /Type /Catalog /Pages 2 0 R /Names << /Dests 6 0 R >> >>"
    data = _assemble(bodies)
    text = "\nCycle resistant"
    return PDFFixture("pdf_names_cycle", data, text, [(1, 0, len(text))])


_FIXTURE_BUILDERS = [
    fx_min_uncompressed,
    fx_flate,
    fx_multiline,
    fx_tj_array,
    fx_hexstring_escapes,
    fx_winansi_differences,
    fx_two_columns,
    fx_agl_differences,
    fx_tounicode_bfchar,
    fx_cid_identity_h,
    fx_cid_unmapped,
    fx_xrefstream_objstm,
    fx_incremental_update,
    fx_broken_xref,
    fx_form_xobject,
    fx_multistream_page,
    fx_multipage,
    fx_rotate90,
    fx_graphics_noise,
    fx_rc4_encrypted,
    fx_unsupported_filter,
    fx_names_cycle,
]


def build_pdf_fixtures() -> list[PDFFixture]:
    return [f() for f in _FIXTURE_BUILDERS]




def make_big_pdf(n_pages: int = 20, lines_per_page: int = 40, seed: int = 0) -> PDFFixture:
    """Parameterized realistic-weight document for benchmarks: n_pages of
    FlateDecode content, TL/T* multiline text (|Δy| = 14 > 3 → newline per
    line, per the reference layout policy).  Golden text is exact."""
    bodies: dict[int, bytes] = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        4: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    }
    kids = []
    next_id = 5
    lines_all: list[str] = []
    for p in range(n_pages):
        page_id, content_id = next_id, next_id + 1
        next_id += 2
        kids.append(page_id)
        lines = [
            "Line %d of page %d in document %d carries synthetic body text."
            % (li, p, seed)
            for li in range(lines_per_page)
        ]
        lines_all.extend(lines)
        content = b"BT /F1 12 Tf 14 TL 72 760 Td " + b" ".join(
            b"(%s) Tj T*" % ln.encode("ascii") for ln in lines
        ) + b" ET"
        bodies[page_id] = (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 4 0 R >> >> /Contents %d 0 R >>" % content_id
        )
        bodies[content_id] = _flate_stream(b"", content)
    bodies[2] = b"<< /Type /Pages /Kids [%s] /Count %d >>" % (
        b" ".join(b"%d 0 R" % k for k in kids),
        n_pages,
    )
    data = _assemble(bodies)
    text = "".join("\n" + ln for ln in lines_all)
    spans: list[tuple[int, int, int]] = []
    pos = 0
    per_page = sum(len(ln) + 1 for ln in lines_all[:lines_per_page])
    for p in range(n_pages):
        plen = sum(len(ln) + 1 for ln in lines_all[p * lines_per_page : (p + 1) * lines_per_page])
        spans.append((p + 1, pos, pos + plen))
        pos += plen
    return PDFFixture("pdf_big_%dx%d_%d" % (n_pages, lines_per_page, seed), data, text, spans)
