"""TrueType 'cmap' subtable parsing (SURVEY.md §2.C; reference
pdfparse.lisp:3214-3346): formats 0, 2 and 4 over hand-built font bytes."""

from __future__ import annotations

import struct

from pdfparse_spark.kernel.fonts import TrueTypeFont


def _ttf_with_cmap(cmap_table: bytes) -> bytes:
    # sfnt header with one table record pointing at our cmap
    header = struct.pack(">4sHHHH", b"\x00\x01\x00\x00", 1, 0, 0, 0)
    record = struct.pack(">4sLLL", b"cmap", 0, 28, len(cmap_table))
    assert len(header) + len(record) == 28
    return header + record + cmap_table


def _subtable_header(nsub: int = 1) -> bytes:
    # cmap header + one encoding record pointing just past it
    return struct.pack(">HH", 0, nsub) + struct.pack(">HHL", 3, 1, 4 + 8)


def test_format0():
    glyphs = bytearray(256)
    glyphs[65] = 7  # 'A' → gid 7
    glyphs[66] = 8
    sub = struct.pack(">HHH", 0, 6 + 256, 0) + bytes(glyphs)
    font = TrueTypeFont("t", _ttf_with_cmap(_subtable_header() + sub))
    umap = font.create_unicode_map()
    assert umap.get_unichr(7) == "A"
    assert umap.get_unichr(8) == "B"


def test_format4():
    # one segment mapping 0x41-0x43 with idDelta (+10), plus the 0xFFFF sentinel
    segcount = 2
    ends = (0x43, 0xFFFF)
    starts = (0x41, 0xFFFF)
    deltas = (10, 1)
    offsets = (0, 0)
    # fmt length language segCountX2 searchRange entrySelector rangeShift
    body = struct.pack(
        ">HHHHHHH", 4, 0, 0, segcount * 2, 0, 0, 0
    ) + struct.pack(">2H", *ends) + struct.pack(">H", 0) + struct.pack(
        ">2H", *starts
    ) + struct.pack(">2h", *deltas) + struct.pack(">2H", *offsets)
    font = TrueTypeFont("t", _ttf_with_cmap(_subtable_header() + body))
    umap = font.create_unicode_map()
    assert umap.get_unichr(0x41 + 10) == "A"
    assert umap.get_unichr(0x43 + 10) == "C"


def test_format2_two_byte_codes():
    # high byte 0x81 → subheader 1: lo in [0x40, 0x42), glyphs from the
    # glyphIndexArray right after the subheaders, idDelta 0
    keys = [0] * 256
    keys[0x81] = 8  # subheader index 1 (keys store index*8)
    nsubh = 2
    # idRangeOffset is measured from its own field position (subh_off+6):
    # glyph array begins right after the 2 subheaders
    sh0 = struct.pack(">HHhH", 0, 0, 0, 0)  # one-byte codes: none
    # subheader 1 at offset subh_base+8; its ro field at +8+6; glyph array at
    # subh_base+16 → rng = (subh_base+16) - (subh_base+8+6) = 2
    sh1 = struct.pack(">HHhH", 0x40, 2, 0, 2)
    glyph_array = struct.pack(">2H", 21, 22)
    body = struct.pack(">HHH", 2, 0, 0) + struct.pack(">256H", *keys) + sh0 + sh1 + glyph_array
    font = TrueTypeFont("t", _ttf_with_cmap(_subtable_header() + body))
    umap = font.create_unicode_map()
    assert umap.get_unichr(21) == chr(0x8140)
    assert umap.get_unichr(22) == chr(0x8141)


def test_format6():
    # trimmed mapping: codes 0x30-0x32 → gids 40,41,42
    body = struct.pack(">HHHHH", 6, 0, 0, 0x30, 3) + struct.pack(">3H", 40, 41, 42)
    font = TrueTypeFont("t", _ttf_with_cmap(_subtable_header() + body))
    umap = font.create_unicode_map()
    assert umap.get_unichr(40) == "0"
    assert umap.get_unichr(42) == "2"


def test_format12_supplementary_plane():
    # two groups: ASCII A-C → gids 100.., and U+1F600 (emoji) → gid 500
    groups = struct.pack(">LLL", 0x41, 0x43, 100) + struct.pack(
        ">LLL", 0x1F600, 0x1F601, 500
    )
    body = struct.pack(">HHLLL", 12, 0, 16 + len(groups), 0, 2) + groups
    font = TrueTypeFont("t", _ttf_with_cmap(_subtable_header() + body))
    umap = font.create_unicode_map()
    assert umap.get_unichr(100) == "A"
    assert umap.get_unichr(102) == "C"
    assert umap.get_unichr(500) == "\U0001F600"
    assert umap.get_unichr(501) == "\U0001F601"


def test_format12_hostile_ranges_are_skipped():
    # e < s, an over-wide range, and an out-of-unicode start must all be
    # skipped leniently without memory blowup; the sane group still maps
    groups = (
        struct.pack(">LLL", 0x50, 0x40, 1)          # end < start
        + struct.pack(">LLL", 0, 0xFFFFFFF0, 1)      # decompression-bomb width
        + struct.pack(">LLL", 0x200000, 0x200002, 9)  # above U+10FFFF
        + struct.pack(">LLL", 0x61, 0x61, 77)        # 'a' → gid 77
    )
    body = struct.pack(">HHLLL", 12, 0, 16 + len(groups), 0, 4) + groups
    font = TrueTypeFont("t", _ttf_with_cmap(_subtable_header() + body))
    umap = font.create_unicode_map()
    assert umap.get_unichr(77) == "a"


def test_format12_cpu_bomb_bounded():
    """A crafted format-12 subtable with 65536 max-width groups would run
    ~4e9 inner iterations without the whole-table work budget; with it the
    parse must finish in seconds and still map the first groups."""
    import time

    ngroups = 65536
    groups = bytearray()
    for g in range(ngroups):
        s0 = g  # overlapping max-width ranges, all within guards
        e0 = s0 + 0xFFFE  # e0 - s0 < _MAX_CMAP_RANGE
        groups += struct.pack(">LLL", s0, e0, 1)
    sub = struct.pack(">HHLLL", 12, 0, 16 + len(groups), 0, ngroups) + bytes(groups)
    font = TrueTypeFont("t", _ttf_with_cmap(_subtable_header() + sub))
    t0 = time.time()
    umap = font.create_unicode_map()
    assert time.time() - t0 < 20, "format-12 bomb not bounded"
    # first group's glyphs are mapped before the budget trips
    assert umap.get_unichr(1) == "\x00"


def test_nsub_repetition_bomb_bounded():
    """65535 subtable records all pointing at ONE format-6 subtable with
    entryCount=0xFFFF: without uniform budget charging this is 65535 x
    65535 iterations.  The shared budget must bound it."""
    import time

    nsub = 0xFFFF
    cmap_hdr = struct.pack(">HH", 0, nsub)
    sub_off = 4 + nsub * 8
    records = b"".join(
        struct.pack(">HHL", 3, 1, sub_off) for _ in range(nsub)
    )
    count = 0xFFFF
    gids = struct.pack(">%dH" % count, *([1] * count))
    # length field is u16 and unread by the parser; clamp it
    sub = struct.pack(">HHHHH", 6, 0xFFFF, 0, 0, count) + gids
    font = TrueTypeFont("t", _ttf_with_cmap(cmap_hdr + records + sub))
    t0 = time.time()
    umap = font.create_unicode_map()
    assert time.time() - t0 < 20, "format-6 nsub bomb not bounded"
    assert umap.get_unichr(1) == "\x00"


def test_format12_surrogates_skipped():
    """A format-12 group covering U+D800-DFFF must not inject unpaired
    surrogates (they crash UTF-8 encoding far from the parser)."""
    groups = struct.pack(">LLL", 0xD7FF, 0xE001, 5)  # straddles surrogates
    sub = struct.pack(">HHLLL", 12, 0, 16 + len(groups), 0, 1) + groups
    font = TrueTypeFont("t", _ttf_with_cmap(_subtable_header() + sub))
    umap = font.create_unicode_map()
    mapped = set(umap.cid2unichr.values())
    assert "퟿" in mapped and "" in mapped
    assert not any(0xD800 <= ord(c) <= 0xDFFF for c in mapped)
    # and every mapped char survives UTF-8 round-trip
    for c in mapped:
        c.encode("utf-8")


def test_font_metrics_bbox_isolated():
    """get_font_metrics must return fully caller-mutable structures: the
    nested FontBBox list may not be shared with the cache or the module
    data table."""
    from pdfparse_spark.kernel.fonts import LIT, get_font_metrics

    d1, w1 = get_font_metrics("Helvetica")
    bbox_key = next(k for k in d1 if getattr(k, "name", "") == "FontBBox")
    original = list(d1[bbox_key])
    d1[bbox_key][0] = -99999
    w1[32] = -1.0
    d2, w2 = get_font_metrics("Helvetica")
    assert list(d2[bbox_key]) == original
    assert w2.get(32) != -1.0
