"""Text-dumping output device = the layout reassembly policy (SURVEY.md §2
P7).  Reference: /root/reference/simple-device.lisp:19-41.

Golden-defining quirks replicated exactly:
- newline emitted iff |last_y - y| > 3, where y is the text matrix's f
  component (CTM is IGNORED — the reference's (setf device-ctm) is a no-op);
- last_y starts at -1e20, so the FIRST rendered string always emits a
  leading newline, and last_y persists across pages;
- only elements at even positions of a TJ sequence are decoded (kern numbers
  at odd positions are skipped without inspection);
- unmapped CIDs render as "<CID x>" with uppercase hex;
- no intra-line x-sorting, no synthesized word spacing.
"""

from __future__ import annotations

from .fonts import PDFUnicodeNotDefined

__all__ = ["SimpleTextDevice"]


class SimpleTextDevice:
    """Accumulates reading-order text + per-page character spans."""

    def __init__(self):
        self._parts: list[str] = []
        self._len = 0
        self._last_y = -1e20
        self._page_no = 0
        self._page_start = 0
        self.spans: list[tuple[int, int, int]] = []
        # segment-merge metadata (per-page split extraction): y of the first
        # rendered string and the final last_y, so a reassembly step can
        # apply the |Δy|>3 newline policy EXACTLY across segment boundaries
        self.first_y: float | None = None
        self.rendered_any = False

    # --- page lifecycle ---------------------------------------------------
    def begin_page(self, page, ctm) -> None:
        self._page_no += 1
        self._page_start = self._len

    def end_page(self, page) -> None:
        self.spans.append((self._page_no, self._page_start, self._len))

    # --- no-op callbacks (simple-device.lisp:10-18) -------------------------
    def begin_tag(self, tag, props=None) -> None:
        pass

    def end_tag(self) -> None:
        pass

    def do_tag(self, tag, props=None) -> None:
        pass

    def begin_figure(self, bbox, matrix) -> None:
        pass

    def end_figure(self) -> None:
        pass

    def paint_path(self, graphicstate, stroke, fill, evenodd, path) -> None:
        pass

    def render_image(self, stream) -> None:
        pass

    def set_ctm(self, ctm) -> None:
        pass  # the simple device ignores CTM entirely

    # --- the policy ---------------------------------------------------------
    def render_string(self, textstate, seq) -> None:
        y = textstate.matrix[5]
        if not self.rendered_any:
            self.first_y = y
            self.rendered_any = True
        chars: list[str] = []
        if abs(self._last_y - y) > 3:
            chars.append("\n")
        self._last_y = y
        font = textstate.font
        trans = font is not None and getattr(font, "_trans_cache", None)
        if trans:
            # hot single-byte font: decode() is the identity byte→cid map,
            # so the whole item renders in one C-level str.translate over
            # the prebuilt 256-entry table ('' drops a char)
            append = chars.append
            for i in range(0, len(seq), 2):
                item = seq[i]
                if isinstance(item, bytes):
                    append(item.decode("latin-1").translate(trans))
        elif font is not None:
            # per-cid loop with a memo cache (mapping is immutable once the
            # font is built); single-byte fonts graduate to the translate
            # fast path after ~200 rendered chars — building the 256-entry
            # table up front would cost more than a small doc renders
            cache = getattr(font, "_render_cache", None)
            if cache is None:
                cache = font._render_cache = {}
            cache_get = cache.get
            append = chars.append
            rendered = 0
            for i in range(0, len(seq), 2):
                item = seq[i]
                if not isinstance(item, bytes):
                    continue  # fixtures place strings at even positions only
                rendered += len(item)
                for cid in font.decode(item):
                    ch = cache_get(cid)
                    if ch is None:
                        try:
                            ch = font.to_unichr(cid)
                        except (PDFUnicodeNotDefined, KeyError):
                            ch = "<CID %X>" % cid
                        cache[cid] = ch
                    if ch:
                        append(ch)
            if not font.is_multibyte():
                total = getattr(font, "_nrendered", 0) + rendered
                font._nrendered = total
                if total > 200:
                    trans = dict(cache)
                    for cid in range(256):
                        if cid not in trans:
                            try:
                                trans[cid] = font.to_unichr(cid) or ""
                            except (PDFUnicodeNotDefined, KeyError):
                                trans[cid] = "<CID %X>" % cid
                        elif not trans[cid]:
                            trans[cid] = ""
                    font._trans_cache = trans
        if chars:
            self._write("".join(chars))

    def _write(self, s: str) -> None:
        self._parts.append(s)
        self._len += len(s)

    def get_text(self) -> str:
        return "".join(self._parts)

    @property
    def last_y(self) -> float:
        return self._last_y
