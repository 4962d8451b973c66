"""Text extraction: DOM textContent of <body> + element spans.

The reference's canonical extraction is DOM ``textContent`` of the body
element (demonstrated at /root/reference/README.md:138-147); this module
reproduces that invariant (the `BASELINE.json` byte-identical-text-per-url
check hangs off it) and additionally emits per-element character spans for
the output table's ``spans`` column.
"""

from __future__ import annotations

from .dom import HTML_NS, Document, DocumentFragment, Element, Text


def find_body(doc: Document) -> Element | None:
    for child in doc.children:
        if isinstance(child, Element) and child.namespace == HTML_NS and child.name == "html":
            for sub in child.children:
                if isinstance(sub, Element) and sub.namespace == HTML_NS \
                        and sub.name in ("body", "frameset"):
                    return sub if sub.name == "body" else None
    return None


def text_content(node) -> str:
    """DOM textContent: concatenation of all descendant Text data in tree
    order. Template *contents* are excluded (they are not children)."""
    parts: list[str] = []
    stack = [node]
    while stack:
        n = stack.pop()
        if isinstance(n, Text):
            parts.append(n.data)
        elif isinstance(n, (Element, Document, DocumentFragment)):
            stack.extend(reversed(n.children))
    return "".join(parts)


def extract_body_text(doc: Document) -> str:
    """Fast path: body.textContent only, no span bookkeeping (used by
    the production no-spans job). Identical text to extract_text()[0]."""
    body = find_body(doc)
    return text_content(body) if body is not None else ""


def extract_text(doc: Document, max_spans: int = 10_000):
    """Returns (text, spans) where ``text`` is body.textContent and
    ``spans`` is a list of (path, tag, start, end) char-offset tuples, one
    per element under body in document order (capped at ``max_spans``)."""
    body = find_body(doc)
    if body is None:
        return "", []
    parts: list[str] = []
    spans: list[tuple[str, str, int, int]] = []
    offset = 0

    def walk(el: Element, path: str) -> None:
        nonlocal offset
        counters: dict[str, int] = {}
        for child in el.children:
            if isinstance(child, Text):
                parts.append(child.data)
                offset += len(child.data)
            elif isinstance(child, Element):
                idx = counters.get(child.name, 0)
                counters[child.name] = idx + 1
                child_path = f"{path}/{child.name}[{idx}]"
                start = offset
                walk(child, child_path)
                if len(spans) < max_spans:
                    spans.append((child_path, child.name, start, offset))

    walk(body, "body")
    return "".join(parts), spans
