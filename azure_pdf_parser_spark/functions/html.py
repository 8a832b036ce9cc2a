"""Lightweight HTML → interleaved-span parser (pure Python, no deps).

The north_star's HTML path: DOM-walk with boilerplate stripping via
element-path heuristics. The reference treats HTML as out of scope
(reference experimental_base.py:118-121 dispatches on content type but
the repo only parses PDFs), so these semantics are engine-defined:

* a streaming tag tokenizer (regex over ``<tag ...>`` / text runs) with
  an open-element stack — no external HTML library;
* content inside script/style/noscript/template/head/svg is dropped;
* DOM-path boilerplate: <nav>/<aside>/<header> map to 'pageHeader',
  <footer> to 'pageFooter', and any element whose class/id matches
  nav|menu|footer|sidebar|banner|breadcrumb|cookie|comment is
  boilerplate by path — exactly the kinds the main-content filter
  strips downstream;
* h1 → 'title', h2..h6 → 'sectionHeading', td/th → 'TableCell',
  <img src> → media span ('figure', media_ref=src, text NULL);
* offset = character offset of the text run (or tag) in the raw HTML —
  strictly increasing, unique per doc (the input_hint invariant).

This module is imported inside the mapInPandas parse stage
(operators/parse.py); it is deliberately dependency-free so executors
need only the shipped --py-files zip.
"""

from __future__ import annotations

import re

TAG_RE = re.compile(r"<!--.*?-->|<!\[CDATA\[.*?\]\]>|<[^>]+>|[^<]+", re.DOTALL)
ATTR_RE = re.compile(
    r"""([a-zA-Z-]+)\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]+))"""
)
WS_RE = re.compile(r"\s+")

SKIP_CONTENT = {"script", "style", "noscript", "template", "head", "svg"}
VOID_TAGS = {
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
    "meta", "param", "source", "track", "wbr",
}
BOILERPLATE_PATH_RE = re.compile(
    r"nav|menu|footer|sidebar|banner|breadcrumb|cookie|comment", re.IGNORECASE
)

KIND_BY_TAG = {
    "h1": "title",
    "h2": "sectionHeading",
    "h3": "sectionHeading",
    "h4": "sectionHeading",
    "h5": "sectionHeading",
    "h6": "sectionHeading",
    "td": "TableCell",
    "th": "TableCell",
    "nav": "pageHeader",
    "aside": "pageHeader",
    "header": "pageHeader",
    "footer": "pageFooter",
}


def _parse_attrs(tag_body: str) -> dict[str, str]:
    return {
        m.group(1).lower(): (m.group(3) or m.group(4) or m.group(5) or "")
        for m in ATTR_RE.finditer(tag_body)
    }


def html_to_spans(html: str) -> list[dict]:
    """Parse one HTML document into interleaved (kind,text,media_ref,offset)."""
    spans: list[dict] = []
    # stack entries: (tag, kind_override or None, is_boilerplate_path)
    stack: list[tuple[str, str | None, bool]] = []
    skip_depth = 0

    def current_kind() -> str:
        # innermost classification wins; at the same element a semantic tag
        # kind (nav → pageHeader) beats the class/id boilerplate heuristic
        for tag, kind, boiler in reversed(stack):
            if kind is not None:
                return kind
            if boiler:
                return "pageFooter"
        return "Text"

    for m in TAG_RE.finditer(html):
        token = m.group(0)
        if token.startswith("<!--") or token.startswith("<![CDATA["):
            continue
        if token.startswith("<"):
            inner = token[1:-1].strip()
            if not inner or inner.startswith("!") or inner.startswith("?"):
                continue
            closing = inner.startswith("/")
            name_match = re.match(r"/?\s*([a-zA-Z][a-zA-Z0-9-]*)", inner)
            if not name_match:
                continue
            tag = name_match.group(1).lower()
            self_closing = inner.endswith("/") or tag in VOID_TAGS

            if closing:
                if tag in SKIP_CONTENT and skip_depth > 0:
                    skip_depth -= 1
                for i in range(len(stack) - 1, -1, -1):
                    if stack[i][0] == tag:
                        del stack[i:]
                        break
                continue

            attrs = _parse_attrs(inner) if ("=" in inner) else {}
            if tag == "img" and skip_depth == 0:
                src = attrs.get("src", "")
                if src:
                    spans.append(
                        {
                            "kind": "figure",
                            "text": None,
                            "media_ref": src,
                            "offset": m.start(),
                        }
                    )
                continue
            if self_closing:
                continue
            if tag in SKIP_CONTENT:
                skip_depth += 1
                stack.append((tag, None, False))
                continue
            boiler = bool(
                BOILERPLATE_PATH_RE.search(attrs.get("class", ""))
                or BOILERPLATE_PATH_RE.search(attrs.get("id", ""))
            )
            stack.append((tag, KIND_BY_TAG.get(tag), boiler))
        else:
            if skip_depth > 0:
                continue
            text = WS_RE.sub(" ", token).strip()
            if not text:
                continue
            spans.append(
                {
                    "kind": current_kind(),
                    "text": _unescape(text),
                    "media_ref": None,
                    "offset": m.start(),
                }
            )
    return spans


_ENTITIES = {
    "&amp;": "&",
    "&lt;": "<",
    "&gt;": ">",
    "&quot;": '"',
    "&#39;": "'",
    "&apos;": "'",
    "&nbsp;": " ",
}


def _unescape(text: str) -> str:
    for k, v in _ENTITIES.items():
        if k in text:
            text = text.replace(k, v)
    return text
