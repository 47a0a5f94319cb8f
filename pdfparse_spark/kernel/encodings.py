"""Encoding tables and glyph-name → Unicode mapping.

Reference behavior: /root/reference/encodingdb.lisp + glyphlist.lisp (public
Adobe data: PDF Reference 1.6 Appendix D latin encodings, Adobe Glyph List).
The Win/Mac tables are derived from Python's cp1252 / mac_roman codecs (same
public code pages); StandardEncoding and PDFDocEncoding are spelled out from
the PDF spec.

Documented deviation (SURVEY.md §5.2 class): the reference's Differences
handling resets the code counter to 0 on integers (encodingdb.lisp:280) —
mistranslation of pdfminer; the PDF spec sets the counter TO the integer,
which is what we implement.
"""

from __future__ import annotations

from .psparse import PSLiteral

__all__ = ["get_encoding", "name2unicode", "ENCODINGS"]


def _codec_table(codec: str) -> dict[int, str]:
    table: dict[int, str] = {}
    for code in range(256):
        try:
            ch = bytes([code]).decode(codec)
        except UnicodeDecodeError:
            continue
        if ch != "�":
            table[code] = ch
    return table


# WinAnsiEncoding ≈ Windows code page 1252; MacRomanEncoding ≈ Mac OS Roman.
WIN2UNICODE = _codec_table("cp1252")
MAC2UNICODE = _codec_table("mac_roman")
# control range is not part of the PDF encodings
for _c in list(range(0, 32)) + [127]:
    WIN2UNICODE.pop(_c, None)
    MAC2UNICODE.pop(_c, None)

# Adobe StandardEncoding (PDF Reference 1.6, Appendix D.2): ASCII except
# 39→quoteright / 96→quoteleft, plus the upper region below.
STD2UNICODE: dict[int, str] = {c: chr(c) for c in range(32, 127)}
STD2UNICODE[39] = "’"  # quoteright
STD2UNICODE[96] = "‘"  # quoteleft
STD2UNICODE.update(
    {
        161: "¡", 162: "¢", 163: "£", 164: "⁄",
        165: "¥", 166: "ƒ", 167: "§", 168: "¤",
        169: "'", 170: "“", 171: "«", 172: "‹",
        173: "›", 174: "ﬁ", 175: "ﬂ", 177: "–",
        178: "†", 179: "‡", 180: "·", 182: "¶",
        183: "•", 184: "‚", 185: "„", 186: "”",
        187: "»", 188: "…", 189: "‰", 191: "¿",
        193: "`", 194: "´", 195: "ˆ", 196: "˜",
        197: "¯", 198: "˘", 199: "˙", 200: "¨",
        202: "˚", 203: "¸", 205: "˝", 206: "˛",
        207: "ˇ", 208: "—", 225: "Æ", 227: "ª",
        232: "Ł", 233: "Ø", 234: "Œ", 235: "º",
        241: "æ", 245: "ı", 248: "ł", 249: "ø",
        250: "œ", 251: "ß",
    }
)

# PDFDocEncoding (PDF Reference D.2 / pdfparse.lisp:1957-1992)
_PDFDOC_CODEPOINTS = [
    0x0000, 0x0001, 0x0002, 0x0003, 0x0004, 0x0005, 0x0006, 0x0007,
    0x0008, 0x0009, 0x000A, 0x000B, 0x000C, 0x000D, 0x000E, 0x000F,
    0x0010, 0x0011, 0x0012, 0x0013, 0x0014, 0x0015, 0x0017, 0x0017,
    0x02D8, 0x02C7, 0x02C6, 0x02D9, 0x02DD, 0x02DB, 0x02DA, 0x02DC,
] + list(range(0x20, 0x7F)) + [0x0000] + [
    0x2022, 0x2020, 0x2021, 0x2026, 0x2014, 0x2013, 0x0192, 0x2044,
    0x2039, 0x203A, 0x2212, 0x2030, 0x201E, 0x201C, 0x201D, 0x2018,
    0x2019, 0x201A, 0x2122, 0xFB01, 0xFB02, 0x0141, 0x0152, 0x0160,
    0x0178, 0x017D, 0x0131, 0x0142, 0x0153, 0x0161, 0x017E, 0x0000,
    0x20AC,
] + list(range(0xA1, 0xAD)) + [0x0000] + list(range(0xAE, 0x100))

PDF2UNICODE: dict[int, str] = {
    i: chr(cp) for i, cp in enumerate(_PDFDOC_CODEPOINTS) if cp
}

ENCODINGS: dict[str, dict[int, str]] = {
    "StandardEncoding": STD2UNICODE,
    "MacRomanEncoding": MAC2UNICODE,
    "WinAnsiEncoding": WIN2UNICODE,
    "PDFDocEncoding": PDF2UNICODE,
}


def decode_text(s: bytes) -> str:
    """Text-string decode for outlines/metadata (pdfparse.lisp:1994-2005):
    a UTF-16BE BOM selects UTF-16BE, else each byte maps through
    PDFDocEncoding (unmapped codes become NUL, like the reference's
    zero-filled table)."""
    if s.startswith(b"\xfe\xff"):
        return s[2:].decode("utf-16-be", "replace")
    return "".join(PDF2UNICODE.get(b, "\x00") for b in s)


# Full Adobe Glyph List (4,281 entries; public Adobe data, same table the
# reference embeds at glyphlist.lisp:59).  Generated module — regenerate with
# scripts/gen_glyphlist.py.  Round 1 shipped a 231-name Latin subset; any
# /Differences array or Type1 header naming e.g. /alpha or /summation now
# resolves instead of dropping.
from ._agl_data import AGL as GLYPHNAME2UNICODE


def name2unicode(name) -> str:
    """Glyph name → Unicode string.  AGL subset lookup, then uniXXXX /
    uXXXX[XX] hex forms, then a trailing-digits fallback (pdfminer
    semantics; reference encodingdb.lisp:246-253 returns a raw int there —
    mistranslation we do not copy).  Raises KeyError if unmappable."""
    if isinstance(name, PSLiteral):
        name = name.name
    uni = GLYPHNAME2UNICODE.get(name)
    if uni is not None:
        return uni
    if name.startswith("uni") and len(name) >= 7:
        try:
            return chr(int(name[3:7], 16))
        except ValueError:
            pass
    if name.startswith("u") and len(name) in (5, 7):
        try:
            return chr(int(name[1:], 16))
        except ValueError:
            pass
    # names like 'g123' / 'cid42': take the trailing digit run
    digits = "".join(c for c in name if c.isdigit())
    if digits:
        try:
            return chr(int(digits))
        except (ValueError, OverflowError):
            pass
    raise KeyError(name)


def get_encoding(name, diff=None) -> dict[int, str]:
    """Return cid→unicode for a base encoding, applying a /Differences array
    (integer sets the code counter; names map successive codes)."""
    if isinstance(name, PSLiteral):
        name = name.name
    table = ENCODINGS.get(name, STD2UNICODE)
    if not diff:
        return table
    table = dict(table)
    cid = 0
    for x in diff:
        if isinstance(x, int) and not isinstance(x, bool):
            cid = x
        elif isinstance(x, PSLiteral):
            try:
                table[cid] = name2unicode(x)
            except KeyError:
                pass
            cid += 1
    return table
