"""HTML main-content extraction via DOM text-density heuristics.

Not present in the reference (SURVEY.md §2 P9); technique follows the
published text-density / link-density family (Kohlschütter et al., WSDM'10;
Sun et al., SIGIR'11), implemented deterministically on the stdlib
``html.parser`` (no lxml dependency).  Goldens are self-defined by this
extractor and frozen in the fixture corpus (FIXTURES.md §3).

Policy (deterministic):
1. drop <script>/<style>/<noscript>/<template>/<head>/comments entirely;
2. drop boilerplate containers: <nav>, <header>, <footer>, <aside>, <form>;
3. candidate blocks = <p>, <h1>-<h6>, <li>, <pre>, <blockquote>, <td>, <th>,
   <figcaption>, <dt>, <dd>, and <div>s with no block children;
4. keep a block iff len(text) >= 25 and link_density <= 0.5, where
   link_density = chars inside <a> / total chars; <pre> blocks are always
   kept when non-empty (code preservation);
5. entities are decoded; whitespace inside a block is collapsed to single
   spaces (except <pre>, kept verbatim); blocks join with '\n'.
"""

from __future__ import annotations

from html.parser import HTMLParser

__all__ = ["extract_html", "html_signals"]

_DROP_TAGS = frozenset(
    ["script", "style", "noscript", "template", "head", "svg", "iframe"]
)
_BOILERPLATE_TAGS = frozenset(["nav", "header", "footer", "aside", "form"])
_BLOCK_TAGS = frozenset(
    [
        "p", "h1", "h2", "h3", "h4", "h5", "h6", "li", "pre", "blockquote",
        "td", "th", "figcaption", "dt", "dd", "div", "article", "section",
        "main", "body", "ul", "ol", "table", "tr",
    ]
)
_CANDIDATE_TAGS = frozenset(
    [
        "p", "h1", "h2", "h3", "h4", "h5", "h6", "li", "pre", "blockquote",
        "td", "th", "figcaption", "dt", "dd", "div",
    ]
)
_VOID_TAGS = frozenset(
    ["br", "hr", "img", "input", "meta", "link", "area", "base", "col",
     "embed", "source", "track", "wbr"]
)

MIN_BLOCK_CHARS = 25
MAX_LINK_DENSITY = 0.5


class _Node:
    __slots__ = ("tag", "children", "parent")

    def __init__(self, tag: str, parent=None):
        self.tag = tag
        self.children: list = []  # _Node or (text, in_link) tuples
        self.parent = parent


class _TreeBuilder(HTMLParser):
    """Best-effort DOM builder; never raises on malformed input."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = _Node("#root")
        self.cur = self.root
        self._drop_depth = 0
        self._link_depth = 0

    def handle_starttag(self, tag, attrs):
        if tag in _VOID_TAGS:
            if tag == "br" and not self._drop_depth:
                self.cur.children.append(("\n", self._link_depth > 0))
            return
        if tag in _DROP_TAGS:
            self._drop_depth += 1
            return
        if self._drop_depth:
            return
        if tag == "a":
            self._link_depth += 1
        node = _Node(tag, self.cur)
        self.cur.children.append(node)
        self.cur = node

    def handle_endtag(self, tag):
        if tag in _DROP_TAGS:
            if self._drop_depth:
                self._drop_depth -= 1
            return
        if self._drop_depth:
            return
        # find the matching open tag (tolerates stray ends)
        node = self.cur
        while node is not self.root and node.tag != tag:
            node = node.parent
        if node is self.root:
            return  # stray end tag: nothing open to close
        # close everything from cur up to AND including the match,
        # decrementing _link_depth for every <a> implicitly closed on the
        # way — an unclosed <a> must not leak link-ness over the rest of
        # the document (it marked every later block as pure link text and
        # emptied the whole page's extraction)
        n = self.cur
        while True:
            if n.tag == "a" and self._link_depth:
                self._link_depth -= 1
            if n is node:
                break
            n = n.parent
        self.cur = node.parent

    def handle_data(self, data):
        if self._drop_depth or not data:
            return
        self.cur.children.append((data, self._link_depth > 0))


def _node_text(node: _Node) -> tuple[str, int, int]:
    """(text, total_chars, link_chars) of a subtree (raw, uncollapsed).

    Iterative (explicit stack): recursion here bounded extraction depth by
    the interpreter limit, so a ~2000-deep nest of tags raised
    RecursionError THROUGH extract_turn and killed the whole Spark task —
    the one failure mode the lenient kernel may never have.  The " "
    markers pushed around block-tag subtrees reproduce the recursive
    version's spacing exactly."""
    parts: list[str] = []
    total = 0
    link = 0
    stack = list(reversed(node.children))
    while stack:
        child = stack.pop()
        if isinstance(child, str):  # post-subtree spacing marker
            parts.append(child)
            continue
        if isinstance(child, _Node):
            if child.tag in _BOILERPLATE_TAGS:
                continue
            if child.tag in _BLOCK_TAGS:
                parts.append(" ")
                stack.append(" ")
            stack.extend(reversed(child.children))
        else:
            text, in_link = child
            parts.append(text)
            n = len(text.strip())
            total += n
            if in_link:
                link += n
    return "".join(parts), total, link


def _has_block_child(node: _Node) -> bool:
    return any(
        isinstance(c, _Node) and c.tag in _BLOCK_TAGS for c in node.children
    )


def _collapse(text: str) -> str:
    return " ".join(text.split())


def _walk(node: _Node, out: list[str]) -> None:
    """Candidate-block selection in document order — iterative for the
    same unbounded-depth reason as _node_text."""
    stack = list(reversed(node.children))
    while stack:
        child = stack.pop()
        if not isinstance(child, _Node):
            continue
        tag = child.tag
        if tag in _BOILERPLATE_TAGS:
            continue
        if tag == "pre":
            raw, total, _ = _node_text(child)
            raw = raw.strip("\n")
            if total:
                out.append(raw)
            continue
        if tag in _CANDIDATE_TAGS and not (tag == "div" and _has_block_child(child)):
            raw, total, link = _node_text(child)
            if total and (
                total >= MIN_BLOCK_CHARS
                and (link / total) <= MAX_LINK_DENSITY
            ):
                out.append(_collapse(raw))
            continue
        stack.extend(reversed(child.children))


def extract_html(html: str) -> str:
    """Main-content text, blocks joined by newlines.  Never raises."""
    try:
        builder = _TreeBuilder()
        builder.feed(html)
        builder.close()
    except Exception:
        return ""
    out: list[str] = []
    _walk(builder.root, out)
    return "\n".join(out)


_HTML_MARKERS = (
    "<!doctype html", "<html", "<head", "<body", "<div", "<p>", "<p ",
    "<article", "<section", "<table", "<span", "<h1", "<ul", "<nav",
)


def html_signals(text: str) -> bool:
    """Cheap classification signal used by the router (P8)."""
    head = text[:4096].lstrip().lower()
    return head.startswith("<") and any(m in head for m in _HTML_MARKERS)
