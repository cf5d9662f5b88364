"""selectolite — a tiny, deterministic CSS-subset selector engine on stdlib.

The sandbox has no lxml/parsel/scrapy, so the reference's CSS selectors
(reference: server/scripts/scrapers/funda/spiders/funda_spider.py) are
re-implemented over a lightweight DOM built with ``html.parser.HTMLParser``.
Only the selector shapes the reference actually uses are supported:

- tag, ``.class``, ``#id``, ``[attr="v"]`` / ``[attr=v]``, ``[attr*=v]``
- ``:contains("text")``  (Scrapy/parsel extension: text content contains)
- descendant combinator (whitespace), adjacent sibling (``+``)
- ``*`` universal selector
- comma-separated selector groups
- trailing ``::text`` (direct text-node children of the match, in document
  order) and ``*::text`` handled via a ``*`` step, and ``::attr(name)``

Semantics mirror parsel closely enough for the fixture corpus: matches are
returned in document order, de-duplicated; ``get()`` is first-or-None.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import Optional

_VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

_RAW_TEXT_TAGS = frozenset(("script", "style"))


class Node:
    __slots__ = ("tag", "attrs", "children", "parent", "_order")

    def __init__(self, tag: str, attrs: dict[str, str], parent: "Node | None", order: int):
        self.tag = tag
        self.attrs = attrs
        self.children: list[object] = []  # Node or str (text node)
        self.parent = parent
        self._order = order

    # --- text access -----------------------------------------------------
    def direct_text_nodes(self) -> list[str]:
        return [c for c in self.children if isinstance(c, str)]

    def all_text_nodes(self) -> list[str]:
        out: list[str] = []
        for c in self.children:
            if isinstance(c, str):
                out.append(c)
            else:
                out.extend(c.all_text_nodes())
        return out

    def text_content(self) -> str:
        return "".join(self.all_text_nodes())

    def iter(self):
        yield self
        for c in self.children:
            if isinstance(c, Node):
                yield from c.iter()

    def classes(self) -> list[str]:
        return self.attrs.get("class", "").split()


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node("#root", {}, None, 0)
        self._stack = [self.root]
        self._n = 1
        self._raw: Optional[str] = None  # inside <script>/<style>

    def handle_starttag(self, tag, attrs):
        if self._raw is not None:
            return
        node = Node(tag, dict(attrs), self._stack[-1], self._n)
        self._n += 1
        self._stack[-1].children.append(node)
        if tag in _RAW_TEXT_TAGS:
            self._raw = tag
            self._stack.append(node)
        elif tag not in _VOID_TAGS:
            self._stack.append(node)

    def handle_startendtag(self, tag, attrs):
        if self._raw is not None:
            return
        node = Node(tag, dict(attrs), self._stack[-1], self._n)
        self._n += 1
        self._stack[-1].children.append(node)

    def handle_endtag(self, tag):
        if self._raw is not None:
            if tag == self._raw:
                self._raw = None
                self._stack.pop()
            return
        # close the nearest matching open tag (lenient, browser-ish)
        for i in range(len(self._stack) - 1, 0, -1):
            if self._stack[i].tag == tag:
                del self._stack[i:]
                break

    def handle_data(self, data):
        if data:
            self._stack[-1].children.append(data)


def parse_html(html: str) -> Node:
    b = _TreeBuilder()
    b.feed(html)
    b.close()
    return b.root


# --- selector compilation -------------------------------------------------

_STEP_RE = re.compile(
    r"""
    (?P<tag>[a-zA-Z][a-zA-Z0-9_-]*|\*)?
    (?P<rest>(?:
        \.[-\w]+ |
        \#[-\w]+ |
        \[[^\]]+\] |
        :contains\((?:"[^"]*"|'[^']*')\)
    )*)
    """,
    re.X,
)

_QUAL_RE = re.compile(
    r"""
    \.(?P<cls>[-\w]+) |
    \#(?P<id>[-\w]+) |
    \[(?P<attr>[-\w]+)(?:(?P<op>\*?=)(?P<val>"[^"]*"|'[^']*'|[^\]]+))?\] |
    :contains\((?P<ctext>"[^"]*"|'[^']*')\)
    """,
    re.X,
)


def _unquote(s: str) -> str:
    if len(s) >= 2 and s[0] in "\"'" and s[-1] == s[0]:
        return s[1:-1]
    return s


class _Step:
    __slots__ = ("tag", "quals", "combinator")

    def __init__(self, tag, quals, combinator):
        self.tag = tag              # None or tag name or '*'
        self.quals = quals          # list of (kind, ...) tuples
        self.combinator = combinator  # ' ' (descendant) or '+' (adjacent)

    def matches(self, node: Node) -> bool:
        if self.tag and self.tag != "*" and node.tag != self.tag:
            return False
        for q in self.quals:
            kind = q[0]
            if kind == "class":
                if q[1] not in node.classes():
                    return False
            elif kind == "id":
                if node.attrs.get("id") != q[1]:
                    return False
            elif kind == "attr":
                _, name, op, val = q
                if op is None:
                    if name not in node.attrs:
                        return False
                elif op == "=":
                    if node.attrs.get(name) != val:
                        return False
                elif op == "*=":
                    if val not in node.attrs.get(name, ""):
                        return False
            elif kind == "contains":
                if q[1] not in node.text_content():
                    return False
        return True


class CompiledSelector:
    """One comma-group of steps, plus the extraction mode."""

    __slots__ = ("steps", "mode", "attr")

    def __init__(self, steps: list[_Step], mode: str, attr: Optional[str]):
        self.steps = steps
        self.mode = mode  # 'node' | 'text' | 'attr'
        self.attr = attr


def _compile_single(sel: str) -> CompiledSelector:
    sel = sel.strip()
    mode, attr = "node", None
    m = re.search(r"::(text|attr\(([-\w]+)\))$", sel)
    if m:
        if m.group(1) == "text":
            mode = "text"
        else:
            mode, attr = "attr", m.group(2)
        sel = sel[: m.start()].strip()

    # tokenize into steps separated by ' ' or ' + ' — but only at depth 0
    # (never inside [...] / :contains(...) / quotes, where '+' and spaces
    # are literal, e.g. [type="application/ld+json"], :contains("Aangeboden sinds"))
    parts: list[str] = []
    buf: list[str] = []
    depth = 0
    quote = None
    for ch in sel:
        if quote:
            buf.append(ch)
            if ch == quote:
                quote = None
        elif ch in "\"'":
            quote = ch
            buf.append(ch)
        elif ch in "[(":
            depth += 1
            buf.append(ch)
        elif ch in "])":
            depth -= 1
            buf.append(ch)
        elif depth == 0 and (ch.isspace() or ch == "+"):
            if buf:
                parts.append("".join(buf))
                buf = []
            if ch == "+":
                parts.append("+")
        else:
            buf.append(ch)
    if buf:
        parts.append("".join(buf))

    steps: list[_Step] = []
    next_comb = " "
    for p in parts:
        if p is None or p == "":
            continue
        if p == "+":
            next_comb = "+"
            continue
        m2 = _STEP_RE.match(p)
        if not m2 or m2.end() != len(p):
            raise ValueError(f"unsupported selector step: {p!r} in {sel!r}")
        tag = m2.group("tag")
        quals = []
        for qm in _QUAL_RE.finditer(m2.group("rest") or ""):
            if qm.group("cls"):
                quals.append(("class", qm.group("cls")))
            elif qm.group("id"):
                quals.append(("id", qm.group("id")))
            elif qm.group("attr"):
                op = qm.group("op")
                val = _unquote(qm.group("val")) if qm.group("val") is not None else None
                quals.append(("attr", qm.group("attr"), op, val))
            elif qm.group("ctext"):
                quals.append(("contains", _unquote(qm.group("ctext"))))
        steps.append(_Step(tag, quals, next_comb))
        next_comb = " "
    if not steps:
        raise ValueError(f"empty selector: {sel!r}")
    return CompiledSelector(steps, mode, attr)


_COMPILE_CACHE: dict[str, list[CompiledSelector]] = {}


def compile_selector(sel: str) -> list[CompiledSelector]:
    hit = _COMPILE_CACHE.get(sel)
    if hit is None:
        hit = _COMPILE_CACHE[sel] = [
            _compile_single(part) for part in sel.split(",") if part.strip()
        ]
    return hit


def _match_steps(root: Node, steps: list[_Step]) -> list[Node]:
    """Return document-ordered nodes matching the step chain."""
    current = [root]
    for i, step in enumerate(steps):
        nxt: list[Node] = []
        seen = set()
        if step.combinator == " ":
            for base in current:
                it = base.iter() if i > 0 or base is root else base.iter()
                for node in it:
                    if node is base and base is not root:
                        continue  # descendant, not self
                    if node.tag == "#root":
                        continue
                    if step.matches(node) and id(node) not in seen:
                        seen.add(id(node))
                        nxt.append(node)
        else:  # '+' adjacent sibling
            for base in current:
                parent = base.parent
                if parent is None:
                    continue
                sibs = [c for c in parent.children if isinstance(c, Node)]
                try:
                    idx = sibs.index(base)
                except ValueError:
                    continue
                if idx + 1 < len(sibs):
                    cand = sibs[idx + 1]
                    if step.matches(cand) and id(cand) not in seen:
                        seen.add(id(cand))
                        nxt.append(cand)
        current = nxt
        if not current:
            break
    current.sort(key=lambda n: n._order)
    return current


class Selector:
    """parsel-ish facade over one parsed document."""

    __slots__ = ("root", "_cache")

    def __init__(self, html: str):
        self.root = parse_html(html)
        self._cache: dict[str, list[str]] = {}

    def css_getall(self, sel: str) -> list[str]:
        hit = self._cache.get(sel)
        if hit is not None:
            return hit
        out: list[str] = []
        for c in compile_selector(sel):
            nodes = _match_steps(self.root, c.steps)
            if c.mode == "text":
                for n in nodes:
                    out.extend(n.direct_text_nodes())
            elif c.mode == "attr":
                for n in nodes:
                    if c.attr in n.attrs:
                        out.append(n.attrs[c.attr])
            else:
                out.extend(n.text_content() for n in nodes)
        self._cache[sel] = out
        return out

    def css_get(self, sel: str) -> Optional[str]:
        r = self.css_getall(sel)
        return r[0] if r else None

    def jsonld_scripts(self) -> list[str]:
        """Text of every <script type="application/ld+json">, document order."""
        return self.css_getall('script[type="application/ld+json"]::text')
