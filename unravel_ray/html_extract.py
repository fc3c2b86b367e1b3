"""HTML boilerplate strip + DOM walk -> ordered spans (operators M8/M9).

Behavioral contract, derived from two reference units:

* Sanitization (reference ocrprocessing/impl/UpdateOcrContentImpl.java:45-51,
  98-103): scripts, styles, event handlers and non-safelisted chrome are
  removed; formatting/content tags survive. We generalize the static
  safelist into readability-style DOM-density heuristics per the north rule:
  chrome containers (nav/header/footer/aside/form/...) are dropped
  wholesale, and block elements that are mostly links (link-text ratio
  > LINK_DENSITY_MAX with little absolute text) are dropped as link farms.

* Span walk (reference wordexport/impl/DocxExportServiceImpl.java:46-159):
  walk the body's child elements in document order; h1-h6 emit heading
  runs, p emits a paragraph, ul/ol emit one run per li, unknown containers
  recurse, unknown leaves fall back to a paragraph; inline
  strong/b/em/i/u/span/br contribute to the enclosing paragraph's text
  (br = line break). Bare text nodes at body level are not walked
  (jsoup ``body.children()`` yields elements only).

Output span kinds: ``heading``, ``list_item``, ``text``.

Implementation is stdlib-only (html.parser); no lxml/selectolax dependency.
Spans whose normalized text is empty are dropped (an empty run carries no
content for a data engine; documented engine decision).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

# Subtrees never contributing content (chrome / executable / invisible).
DROP_TAGS = frozenset(
    {
        "script", "style", "nav", "header", "footer", "aside", "form",
        "iframe", "noscript", "template", "button", "svg", "object",
        "embed", "applet", "select", "option", "textarea",
    }
)

VOID_TAGS = frozenset(
    {"br", "hr", "img", "input", "meta", "link", "area", "base", "col",
     "source", "track", "wbr"}
)

HEADING_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})

# Link-farm heuristic: a block whose text is mostly anchor text and short.
LINK_DENSITY_MAX = 0.5
LINK_FARM_MAX_CHARS = 200

_WS_RUN = re.compile(r"[ \t\r\f\v]+")


class Element:
    """Tree node; slotted plain class (a dataclass + per-node attr dict was
    measurable overhead at ~10^4 nodes per block in the hot explode stage)."""

    __slots__ = ("tag", "attrs", "children")

    def __init__(self, tag: str, attrs: dict | None = None,
                 children: list | None = None) -> None:
        self.tag = tag
        self.attrs = {} if attrs is None else attrs
        self.children = [] if children is None else children  # Element | str


class _FragmentParser(HTMLParser):
    """Tolerant HTML-fragment -> tree builder."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Element("#root")
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        el = Element(tag.lower(),
                     {k.lower(): (v or "") for k, v in attrs} if attrs else None)
        self.stack[-1].children.append(el)
        if el.tag not in VOID_TAGS:
            self.stack.append(el)

    def handle_startendtag(self, tag, attrs):
        el = Element(tag.lower(),
                     {k.lower(): (v or "") for k, v in attrs} if attrs else None)
        self.stack[-1].children.append(el)

    def handle_endtag(self, tag):
        tag = tag.lower()
        # pop to the nearest matching open tag; ignore stray closers
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)


def parse_fragment(html: str) -> Element:
    p = _FragmentParser()
    p.feed(html or "")
    p.close()
    return p.root


# Fast-path tokenizer: a single regex pass building the same tree as
# _FragmentParser for the common well-formed subset. Inputs containing
# constructs with parser-specific semantics (entities, comments/doctype,
# processing instructions, stray '<') return None and fall back to the
# stdlib parser — equality on the claimed subset is pinned by a
# differential hypothesis suite (tests/test_properties.py).
_FAST_TAG = re.compile(
    # tag token: unquoted attr chars exclude '<' — a '<' inside an open
    # tag has parser-specific lookahead handling, so such inputs fail this
    # match (the stray-'<' case) and fall back to stdlib. Text runs are
    # carved out with str.find('<') in the scan loop (C-speed), so this
    # regex only ever runs at a literal '<'.
    r"<(/?)([a-zA-Z][a-zA-Z0-9]*)((?:\"[^\"]*\"|'[^']*'|[^<>\"'])*)>"
)


_CDATA_TAGS = frozenset({"script", "style"})  # html.parser CDATA_CONTENT_ELEMENTS
_CDATA_END = re.compile(r"</\s*([a-zA-Z][a-zA-Z0-9]*)\s*>")


def _fast_fragment(html: str) -> Element | None:
    if "&" in html or "<!" in html or "<?" in html:
        return None  # entities / comments / doctype / PI -> stdlib
    root = Element("#root")
    stack = [root]
    pos = 0
    n = len(html)
    while pos < n:
        lt = html.find("<", pos)
        if lt != pos:
            # text run up to the next '<' (or EOF) — no regex involved
            stack[-1].children.append(html[pos:] if lt < 0 else html[pos:lt])
            if lt < 0:
                break
            pos = lt
        m = _FAST_TAG.match(html, pos)
        if m is None:
            return None  # stray '<' has parser-specific lookahead rules
        pos = m.end()
        closing, tag, attrs = m.group(1), m.group(2).lower(), m.group(3)
        # The tag-name group stops at the first non-alphanumeric char; the
        # attrs group must therefore START with a real delimiter or the
        # "attrs" are actually part of a name this tokenizer can't represent
        # (hyphenated/custom tags like <nav-bar>, stdlib names with exotic
        # chars like <p\x0b>) -> stdlib, which models those exactly.
        if attrs and not (attrs[0] in " \t\n\r\f" or attrs == "/"):
            return None
        if closing:
            if attrs.strip():
                return None  # end tag with trailing junk -> stdlib
            for i in range(len(stack) - 1, 0, -1):
                if stack[i].tag == tag:
                    del stack[i:]
                    break
            continue
        a = attrs.rstrip()
        if a.endswith("/"):
            # self-closing ONLY when the slash stands alone (<x/>, <x a="1"/>,
            # <x a=1 />); an unquoted attr value ending in '/' has
            # parser-specific handling -> stdlib
            if len(a) > 1 and a[-2] not in " \t\n\r\"'":
                return None
            stack[-1].children.append(Element(tag))
            continue  # == startendtag (leaf, not pushed)
        el = Element(tag)
        stack[-1].children.append(el)
        if tag in _CDATA_TAGS:
            # raw-text (CDATA) element: content runs to the matching close
            # tag, nested '<' is TEXT (html.parser set_cdata_mode)
            mend = _CDATA_END.search(html, pos)
            while mend is not None and mend.group(1).lower() != tag:
                mend = _CDATA_END.search(html, mend.start() + 1)
            if mend is None:
                # any '</name' residue that didn't parse as a clean end tag
                # has parser-specific handling -> stdlib
                if re.search(rf"</\s*{tag}", html[pos:], re.IGNORECASE):
                    return None
                # unterminated CDATA content is DISCARDED at EOF
                # (html.parser goahead: `if self.cdata_elem: break`)
                pos = n
            else:
                if mend.start() > pos:
                    el.children.append(html[pos:mend.start()])
                pos = mend.end()
            continue
        if tag not in VOID_TAGS:
            stack.append(el)
    return root


# ---------------------------------------------------------------------------
# boilerplate strip (M8 + north-rule DOM-density scoring)
# ---------------------------------------------------------------------------

def _farm_score(node, in_link: bool = False) -> tuple[int, int]:
    """(total_text_len, link_text_len) in ONE traversal — the hot explode
    stage calls this per block element, and the fused walk both halves
    the recursion and strips each text node once instead of twice."""
    if isinstance(node, str):
        n = len(node.strip())
        return n, (n if in_link else 0)
    linked = in_link or node.tag == "a"
    total = link = 0
    for c in node.children:
        t, li = _farm_score(c, linked)
        total += t
        link += li
    return total, link


def _raw_text_len(node) -> int:
    return _farm_score(node)[0]


def _link_text_len(node, in_link: bool = False) -> int:
    return _farm_score(node, in_link)[1]


def _is_link_farm(el: Element) -> bool:
    total, linked = _farm_score(el)
    if total == 0 or total >= LINK_FARM_MAX_CHARS:
        return False
    return linked / total > LINK_DENSITY_MAX


def strip_boilerplate(root: Element) -> Element:
    """Return a copy of the tree with chrome subtrees and link farms removed.

    Event-handler attributes are dropped as well (safelist analog,
    UpdateOcrContentImpl.java:45-51 strips everything not allowed).
    """

    def clean(node):
        if isinstance(node, str):
            return node
        if node.tag in DROP_TAGS:
            return None
        if node.tag in {"div", "ul", "ol", "p", "table", "section"} and _is_link_farm(node):
            return None
        attrs = {k: v for k, v in node.attrs.items() if not k.startswith("on")}
        kids = []
        for c in node.children:
            cc = clean(c)
            if cc is not None:
                kids.append(cc)
        return Element(node.tag, attrs, kids)

    out = clean(root)
    return out if out is not None else Element(root.tag)


# ---------------------------------------------------------------------------
# span walk (M9)
# ---------------------------------------------------------------------------

def _normalize(text: str) -> str:
    """Collapse horizontal whitespace, strip line ends, drop blank edges.

    '\\n' (from <br>) survives as a line separator.
    """
    text = _WS_RUN.sub(" ", text)
    lines = [ln.strip() for ln in text.split("\n")]
    # drop leading/trailing blank lines but keep interior breaks
    while lines and lines[0] == "":
        lines.pop(0)
    while lines and lines[-1] == "":
        lines.pop()
    return "\n".join(lines)


def _inline_text(node) -> str:
    """Render a node's full text for inline/paragraph context; br -> \\n."""
    if isinstance(node, str):
        return node
    if node.tag == "br":
        return "\n"
    return "".join(_inline_text(c) for c in node.children)


def _paragraph_text(el: Element) -> str:
    return _normalize(_inline_text(el))


def walk_spans(root: Element) -> list[tuple[str, str]]:
    """Emit (kind, text) tuples in document order.

    Mirrors the reference DOM walk (DocxExportServiceImpl.java:46-159);
    empty-text runs are dropped.
    """
    out: list[tuple[str, str]] = []

    def emit(kind: str, text: str) -> None:
        if text:
            out.append((kind, text))

    def process(el: Element) -> None:
        tag = el.tag
        if tag in HEADING_TAGS:
            emit("heading", _paragraph_text(el))
        elif tag == "p":
            emit("text", _paragraph_text(el))
        elif tag in {"ul", "ol"}:
            for li in el.children:
                if isinstance(li, Element) and li.tag == "li":
                    emit("list_item", _paragraph_text(li))
        else:
            child_elements = [c for c in el.children if isinstance(c, Element)]
            if child_elements:
                for c in child_elements:
                    process(c)
            else:
                emit("text", _paragraph_text(el))

    for child in root.children:
        if isinstance(child, Element):
            process(child)
    return out


_FARM_TAGS = frozenset({"div", "ul", "ol", "p", "table", "section"})


def _dropped(el: Element) -> bool:
    """Strip decision for one element, evaluated on the ORIGINAL subtree
    (same as strip_boilerplate's top-down clean: farm scoring sees the
    un-stripped subtree)."""
    return el.tag in DROP_TAGS or (el.tag in _FARM_TAGS and _is_link_farm(el))


def _inline_stripped(node, parts: list) -> None:
    """_inline_text over the virtually-stripped tree (no tree copy)."""
    if isinstance(node, str):
        parts.append(node)
        return
    if node.tag == "br":
        parts.append("\n")
        return
    if _dropped(node):
        return
    for c in node.children:
        _inline_stripped(c, parts)


def _para_stripped(el: Element) -> str:
    parts: list = []
    for c in el.children:
        _inline_stripped(c, parts)
    return _normalize("".join(parts))


def extract_html_spans(html: str) -> list[tuple[str, str]]:
    """Full M8+M9 kernel: parse -> strip boilerplate -> ordered spans.

    Single-pass implementation: the strip decisions (DROP_TAGS subtrees,
    link farms) are applied during the walk instead of materializing a
    stripped tree copy — same output as
    walk_spans(strip_boilerplate(tree)) (pinned by the equivalence test),
    roughly half the tree-node allocations in the hot explode stage.
    """
    out: list[tuple[str, str]] = []

    def process(el: Element) -> None:
        tag = el.tag
        if tag in HEADING_TAGS:
            t = _para_stripped(el)
            if t:
                out.append(("heading", t))
        elif tag == "p":
            t = _para_stripped(el)
            if t:
                out.append(("text", t))
        elif tag in ("ul", "ol"):
            for li in el.children:
                if not isinstance(li, str) and li.tag == "li":
                    t = _para_stripped(li)
                    if t:
                        out.append(("list_item", t))
        else:
            surv = [c for c in el.children
                    if not isinstance(c, str) and not _dropped(c)]
            if surv:
                for c in surv:
                    process(c)
            else:
                t = _para_stripped(el)
                if t:
                    out.append(("text", t))

    tree = _fast_fragment(html or "")
    if tree is None:
        tree = parse_fragment(html)
    for child in tree.children:
        if not isinstance(child, str) and not _dropped(child):
            process(child)
    return out


def split_plain_text(text: str) -> list[str]:
    """Plain text -> one run per line (operator M10).

    Reference ``text.split("\\r?\\n")`` (DocxExportServiceImpl.java:28-34);
    Java split drops trailing empty strings — mirrored here.
    """
    if text is None:
        return []
    parts = re.split(r"\r?\n", text)
    while parts and parts[-1] == "":
        parts.pop()
    return parts


def is_html(text: str | None) -> bool:
    """HTML sniff (DocxExportServiceImpl.java:41-44)."""
    return text is not None and any(
        m in text for m in ("<p>", "<h3>", "<ul>", "<li>")
    )
