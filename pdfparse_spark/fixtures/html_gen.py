"""HTML fixture corpus (FIXTURES.md §3).  The reference contains no HTML
code, so goldens are self-defined by our extractor (html_extract.py) and
frozen here; the invariant under test is determinism + policy conformance.
"""

from __future__ import annotations

__all__ = ["HTML_FIXTURES", "HTMLFixture", "build_html_fixtures"]


class HTMLFixture:
    __slots__ = ("name", "html", "golden_text")

    def __init__(self, name: str, html: str, golden_text: str):
        self.name = name
        self.html = html
        self.golden_text = golden_text


_ARTICLE_PARAS = [
    "Paragraph %d of the article body carries the actual long-form content "
    "that a reader came to this page for, sentence after sentence." % i
    for i in range(1, 13)
]

_ARTICLE = (
    "<!DOCTYPE html><html><head><title>t</title>"
    "<style>body{color:red}</style></head><body>"
    "<header><h1>Site Banner</h1><a href='/'>home</a></header>"
    "<nav><ul><li><a href='/a'>News</a></li><li><a href='/b'>Sports</a></li></ul></nav>"
    "<aside>Sidebar promo <a href='/buy'>buy now</a></aside>"
    "<article>"
    + "".join("<p>%s <b>bold</b> and <a href='/x'>a link</a>.</p>" % p for p in _ARTICLE_PARAS)
    + "</article>"
    "<footer>Copyright 2026 <a href='/legal'>legal</a></footer>"
    "</body></html>"
)

_NAV_HEAVY = (
    "<html><body>"
    "<div><a href='/1'>First link</a> <a href='/2'>Second link</a> "
    "<a href='/3'>Third link</a> <a href='/4'>Fourth link</a></div>"
    "<div><ul>"
    "<li><a href='/5'>short</a></li><li><a href='/6'>list</a></li>"
    "</ul></div>"
    "<div>This single long paragraph has no links at all and easily clears "
    "the minimum character threshold, so the extractor keeps it.</div>"
    "</body></html>"
)

_TABLES_CODE = (
    "<html><body><main>"
    "<p>Introduction paragraph explaining the code sample that follows below.</p>"
    "<pre>def f(x):\n    return x + 1  # exact\n</pre>"
    "<table><tr><td>cell one with enough characters to keep around</td>"
    "<td>x</td></tr></table>"
    "<p>Closing paragraph that wraps up the main content of this page.</p>"
    "</main></body></html>"
)

_COMMENTS_SCRIPTS = (
    "<html><body>"
    "<script>var x = 'not content';</script>"
    "<style>.c{display:none}</style>"
    "<!-- an html comment that must vanish entirely -->"
    "<noscript>enable javascript please</noscript>"
    "<p>Only this visible paragraph should survive the stripping pass.</p>"
    "</body></html>"
)

_ENTITIES = (
    "<html><body>"
    "<p>Fish &amp; chips &#x2014; costing &pound;9 &#189; &mdash; &quot;cheap&quot;&nbsp;indeed.</p>"
    "</body></html>"
)

_MALFORMED = (
    "<html><body>"
    "<div><p>Unclosed paragraph with plenty of characters to be kept by the policy"
    "<p>Second paragraph also unclosed and long enough to be kept as well"
    "</div></div></div>"
    "<p>Trailing content after stray closers survives too, quite happily."
    "</body>"
)


def build_html_fixtures() -> list[HTMLFixture]:
    from ..kernel.html_extract import extract_html

    fixtures = [
        ("html_article", _ARTICLE),
        ("html_nav_heavy", _NAV_HEAVY),
        ("html_tables_code", _TABLES_CODE),
        ("html_comments_scripts", _COMMENTS_SCRIPTS),
        ("html_entities", _ENTITIES),
        ("html_malformed", _MALFORMED),
    ]
    return [HTMLFixture(n, h, extract_html(h)) for n, h in fixtures]


HTML_FIXTURES = None  # built lazily
