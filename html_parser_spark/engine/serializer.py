"""WHATWG HTML fragment serialization (§13.3 of the public spec).

Capability parity with the reference's Serializer
(/root/reference/lib/Parser/Serializer.php:70-528) minus its non-standard
pretty-printer (off by default there, dropped here per SURVEY.md §2.8).
The rawtext-literal rule (text inside style/script/... serialized verbatim,
parity Serializer.php:353-356) is load-bearing for byte-identical output.
"""

from __future__ import annotations

from .dom import (
    XLINK_NS, XML_NS, XMLNS_NS, HTML_NS,
    Comment, Document, DocumentFragment, DocumentType, Element, Node,
    ProcessingInstruction, Text,
)
from .tables import VOID_HTML

_RAWTEXT_PARENTS = frozenset(
    ["style", "script", "xmp", "iframe", "noembed", "noframes", "plaintext"])


def _escape_text(s: str) -> str:
    if "&" in s:
        s = s.replace("&", "&amp;")
    if "\xa0" in s:
        s = s.replace("\xa0", "&nbsp;")
    if "<" in s:
        s = s.replace("<", "&lt;")
    if ">" in s:
        s = s.replace(">", "&gt;")
    return s


def _escape_attr(s: str) -> str:
    if "&" in s:
        s = s.replace("&", "&amp;")
    if "\xa0" in s:
        s = s.replace("\xa0", "&nbsp;")
    if '"' in s:
        s = s.replace('"', "&quot;")
    return s


def _attr_name(key) -> str:
    if isinstance(key, tuple):
        prefix, local, ns = key
        if ns == XML_NS:
            return f"xml:{local}"
        if ns == XMLNS_NS:
            return "xmlns" if local == "xmlns" and not prefix else f"xmlns:{local}"
        if ns == XLINK_NS:
            return f"xlink:{local}"
        # any other namespace: the attribute's qualified name (WHATWG
        # serialization §"attribute's serialized name", final clause)
        return f"{prefix}:{local}" if prefix else local
    return key


def _serialize_node(node: Node, out: list[str], scripting: bool) -> None:
    if isinstance(node, Element):
        out.append("<")
        out.append(node.name)
        for key, value in node.attrs.items():
            out.append(" ")
            out.append(_attr_name(key))
            out.append('="')
            out.append(_escape_attr(value))
            out.append('"')
        out.append(">")
        if node.namespace == HTML_NS and node.name in VOID_HTML:
            return
        if node.content is not None:  # template contents
            for child in node.content.children:
                _serialize_node(child, out, scripting)
        else:
            raw = node.namespace == HTML_NS and (
                node.name in _RAWTEXT_PARENTS
                or (node.name == "noscript" and scripting))
            for child in node.children:
                if raw and isinstance(child, Text):
                    out.append(child.data)
                else:
                    _serialize_node(child, out, scripting)
        out.append("</")
        out.append(node.name)
        out.append(">")
    elif isinstance(node, Text):
        out.append(_escape_text(node.data))
    elif isinstance(node, Comment):
        out.append("<!--")
        out.append(node.data)
        out.append("-->")
    elif isinstance(node, ProcessingInstruction):
        out.append("<?")
        out.append(node.target)
        out.append(" ")
        out.append(node.data)
        out.append(">")
    elif isinstance(node, DocumentType):
        out.append("<!DOCTYPE ")
        out.append(node.name)
        out.append(">")
    elif isinstance(node, (Document, DocumentFragment)):
        for child in node.children:
            _serialize_node(child, out, scripting)


def serialize_inner(node: Node, scripting: bool = False) -> str:
    """innerHTML: serialize the children of ``node``."""
    out: list[str] = []
    if isinstance(node, Element) and node.content is not None:
        for child in node.content.children:
            _serialize_node(child, out, scripting)
    elif isinstance(node, (Element, Document, DocumentFragment)):
        for child in node.children:
            _serialize_node(child, out, scripting)
    return "".join(out)


def serialize(node: Node, scripting: bool = False) -> str:
    """outerHTML: serialize ``node`` itself (documents serialize children)."""
    out: list[str] = []
    _serialize_node(node, out, scripting)
    return "".join(out)
