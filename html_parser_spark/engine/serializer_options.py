"""Configurable serializer: the reference's non-standard serializer
options (reference Serializer.php:70-667), including the
whitespace-reformatting pretty-printer.

Options (names per the reference's config, snake_cased):

- ``boolean_attribute_values`` (True): when False, boolean attributes
  on HTML elements whose value is empty or case-insensitively equals
  the attribute name serialize as bare names.
- ``foreign_void_end_tags`` (True): when False, childless foreign
  elements self-close (``<path d=""/>``) instead of printing end tags.
- ``group_elements`` (True): pretty-printer inserts a blank line
  between runs of unlike block-level siblings (h1-h6 count as alike).
- ``reformat_whitespace`` (False): the pretty-printer.
- ``indent_step`` (1) / ``indent_with_spaces`` (True).

The pretty-printer reproduces the reference's semantics, quirks
included (they are pinned by its bundled test cases, which
tests/test_reference_parity.py runs against this module):

- "treat as block" asks whether the element *contains* a block-ish
  descendant (outside preformatted subtrees and template contents),
  with button/input/output/textarea only counting when they are not
  the sole candidate (Serializer.php BLOCK_QUERY's ``not(last()=1)``).
- the inline-text first/last-of-line scan uses the reference's
  *text* block-ancestor list verbatim — including the fact that its
  XPath never matches ``body`` (a typo in the reference we mirror for
  output parity).

The default-path serializer (serializer.py) stays untouched: this
module is for the API surface, not the extraction hot path.
"""

from __future__ import annotations

import re

from .dom import (HTML_NS, Comment, Document, DocumentFragment,
                  DocumentType, Element, Node, ProcessingInstruction, Text)
from .serializer import _attr_name, _escape_attr, _escape_text
from .tables import VOID_HTML

H_ELEMENTS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})
PREFORMATTED = frozenset({
    "iframe", "listing", "noembed", "noframes", "noscript", "plaintext",
    "pre", "style", "script", "textarea", "title", "xmp"})
RAWTEXT = frozenset({
    "style", "script", "xmp", "iframe", "noembed", "noframes", "plaintext"})

BOOLEAN_ATTRIBUTES: dict[str, tuple[str, ...] | bool] = {
    "allowfullscreen": ("iframe",),
    "async": ("script",),
    "autofocus": True,
    "autoplay": ("audio", "video"),
    "checked": ("input",),
    "compact": ("dir", "dl", "menu", "ol", "ul"),
    "controls": ("audio", "video"),
    "declare": ("object",),
    "default": ("track",),
    "defer": ("script",),
    "disabled": ("button", "fieldset", "input", "link", "optgroup",
                 "option", "select", "textarea"),
    "formnovalidate": ("button", "input"),
    "hidden": True,
    "ismap": ("img",),
    "itemscope": True,
    "loop": ("audio", "video"),
    "multiple": ("input", "select"),
    "muted": ("audio", "video"),
    "nohref": ("area",),
    "nomodule": ("script",),
    "noresize": ("frame",),
    "noshade": ("hr",),
    "novalidate": ("form",),
    "nowrap": ("td", "th"),
    "open": ("details", "dialog"),
    "playsinline": ("video",),
    "readonly": ("input", "textarea"),
    "required": ("input", "select", "textarea"),
    "reversed": ("ol",),
    "selected": ("option",),
}

# BLOCK_QUERY's name list (Serializer.php:56): block-making descendants
_CORE_BLOCK = frozenset("""address article aside blockquote base body
canvas datalist details dialog dd div dl dt fieldset figcaption figure
footer form frame frameset h1 h2 h3 h4 h5 h6 head header hr html
isindex li link main meta nav ol optgroup option p picture pre section
select script source style table tbody td tfoot th thead title tr ul
video""".split())
_QUIRK_BLOCK = frozenset({"button", "input", "output", "textarea"})

# the reference's *text* block-ancestor XPath list (Serializer.php:399)
# — note: its `name="body"` is an attribute test, so body never
# matches; mirrored verbatim for parity
_TEXT_BLOCK_ANCESTORS = frozenset("""address article aside blockquote
canvas dd div dl dt fieldset figcaption figure footer form h1 h2 h3 h4
h5 h6 head header hr html li main nav ol p section table tfoot ul
video""".split())

_WS = "\t\n\x0c\x0d "
_WS_RUN = re.compile(r"[\t\n\x0c\x0d ]+")
_WS_AROUND_NL = re.compile(r"[\t\n\x0c\x0d ]*\n[\t\n\x0c\x0d ]*")
_HAS_WS = re.compile(r"[\t\n\x0c\x0d ]")
_MULTI_SPACE = re.compile(r" +")


def _is_html(el) -> bool:
    return isinstance(el, Element) and el.namespace == HTML_NS


def _is_preformatted_content(node: Node) -> bool:
    n = node
    while n is not None:
        if _is_html(n) and n.name in PREFORMATTED:
            return True
        if isinstance(n, DocumentFragment) and n.host is not None:
            n = n.host
            continue
        n = n.parent
    return False


def _block_candidates(node) -> list[str]:
    """Names of descendant HTML elements outside preformatted subtrees
    (template contents excluded, like the reference's stock DOM)."""
    out: list[str] = []
    stack = list(node.children)
    while stack:
        n = stack.pop()
        if isinstance(n, Element):
            if n.namespace == HTML_NS:
                if n.name in PREFORMATTED:
                    out.append(n.name)  # itself counts; subtree excluded
                    continue
                out.append(n.name)
            if n.content is None:
                stack.extend(n.children)
    return out


def _treat_as_block(node) -> bool:
    if isinstance(node, Document):
        return True
    if isinstance(node, DocumentFragment):
        return node.host is None
    if not isinstance(node, Element):
        node = node.parent
        if node is None:
            return False
        if isinstance(node, (Document, DocumentFragment)):
            return _treat_as_block(node)
    if _is_preformatted_content(node):
        # every candidate would carry a preformatted ancestor
        return False
    cands = [c for c in _block_candidates(node)]
    for name in cands:
        if name in _CORE_BLOCK:
            return True
        if name in _QUIRK_BLOCK and len(cands) > 1:
            return True
    return False


def _treat_foreign_root_as_block(node) -> bool:
    n = node
    while n is not None:
        p = n.parent
        if p is not None and isinstance(p, Element) and p.namespace != HTML_NS:
            n = p
            continue
        if p is None:
            return False
        return _treat_as_block(p)
    return False


def _default_config() -> dict:
    return {
        "boolean_attribute_values": True,
        "foreign_void_end_tags": True,
        "group_elements": True,
        "reformat_whitespace": False,
        "indent_step": 1,
        "indent_with_spaces": True,
    }


class _Ctx:
    __slots__ = ("cfg", "scripting", "indent_char")

    def __init__(self, cfg: dict, scripting: bool):
        self.cfg = cfg
        self.scripting = scripting
        self.indent_char = " " if cfg["indent_with_spaces"] else "\t"


def _attr_text(ctx: _Ctx, el, tag: str) -> str:
    parts = []
    html_el = el.namespace == HTML_NS
    for key, value in el.attrs.items():
        name = _attr_name(key)
        escaped = _escape_attr(value)
        scope = BOOLEAN_ATTRIBUTES.get(name)
        if (ctx.cfg["boolean_attribute_values"]
                or not html_el
                or scope is None
                or (scope is not True and tag not in scope)
                or (len(escaped) and escaped.lower() != name)):
            parts.append(f' {name}="{escaped}"')
        else:
            parts.append(f" {name}")
    return "".join(parts)


def _closest_text_block_root(node):
    n = node.parent
    while n is not None:
        if _is_html(n) and n.name in _TEXT_BLOCK_ANCESTORS:
            return n
        if isinstance(n, (Document, DocumentFragment)):
            return None
        n = n.parent
    return None


def _descendant_texts(root) -> list:
    out = []
    stack = list(reversed(root.children))
    while stack:
        n = stack.pop()
        if isinstance(n, Text):
            out.append(n)
        elif isinstance(n, Element):
            if n.content is not None:
                continue  # not under templates
            stack.extend(reversed(n.children))
        elif isinstance(n, (Document, DocumentFragment)):
            stack.extend(reversed(n.children))
    return out


def _serialize(node: Node, ctx: _Ctx, out: list[str], first: bool,
               level: int, foreign_as_block: bool, preformatted: bool,
               reformat: bool) -> None:
    cfg = ctx.cfg
    if isinstance(node, Element):
        html_el = node.namespace == HTML_NS
        tag = node.name
        if reformat:
            modify = False
            preformatted = preformatted or _is_preformatted_content(node)
            if not preformatted or (html_el and tag in PREFORMATTED):
                if html_el:
                    if not first and node.parent is not None \
                            and _treat_as_block(node.parent):
                        modify = True
                elif foreign_as_block:
                    modify = True
                else:
                    parent = node.parent
                    if parent is None:
                        modify = True
                        foreign_as_block = True
                    elif (isinstance(parent, (Document, DocumentFragment))
                          or (isinstance(parent, Element)
                              and parent.namespace == HTML_NS)):
                        if _treat_as_block(parent):
                            modify = True
                            foreign_as_block = True
                    elif _treat_foreign_root_as_block(parent):
                        modify = True
                        foreign_as_block = True
                if not first and modify:
                    if cfg["group_elements"]:
                        n = node
                        while True:
                            n = _prev_sibling(n)
                            if n is None:
                                break
                            if not isinstance(n, Text):
                                if not isinstance(n, (Element, DocumentType)) \
                                        or (isinstance(n, Element)
                                            and n.name != tag
                                            and not (n.name in H_ELEMENTS
                                                     and tag in H_ELEMENTS)):
                                    out.append("\n")
                                break
                    out.append("\n" + ctx.indent_char
                               * (level * cfg["indent_step"]))
            if preformatted:
                reformat = False
            first = False

        out.append(f"<{tag}{_attr_text(ctx, node, tag)}")
        inner: Node = node
        if html_el and tag == "template":
            inner = node.content if node.content is not None else node
        has_children = bool(inner.children)
        if not cfg["foreign_void_end_tags"] and not html_el \
                and not has_children:
            out.append("/>")
            return
        out.append(">")
        if html_el and tag in VOID_HTML:
            return
        if has_children:
            raw = html_el and (tag in RAWTEXT
                               or (tag == "noscript" and ctx.scripting))
            for child in inner.children:
                if raw and isinstance(child, Text):
                    out.append(child.data)
                else:
                    _serialize(child, ctx, out, first, level + 1,
                               foreign_as_block, preformatted, reformat)
                first = False
            if reformat and not preformatted:
                first_el = next((c for c in inner.children
                                 if isinstance(c, Element)), None)
                if first_el is not None and (
                        foreign_as_block
                        or (html_el and _treat_as_block(node))):
                    out.append("\n" + ctx.indent_char
                               * (level * cfg["indent_step"]))
        out.append(f"</{tag}>")
    elif isinstance(node, Text):
        p = node.parent
        if _is_html(p) and (p.name in RAWTEXT
                            or (p.name == "noscript" and ctx.scripting)):
            out.append(node.data)
            return
        data = node.data
        if reformat:
            preformatted = preformatted or _is_preformatted_content(node)
            if not preformatted:
                as_block = _treat_as_block(node)
                all_ws = data.strip(_WS) == ""
                if all_ws and (foreign_as_block or as_block
                               or (node.parent is not None
                                   and _treat_as_block(node.parent)
                                   and len(node.parent.children) == 1)):
                    return
                if as_block:
                    data = _WS_RUN.sub(" ", data.strip(_WS))
                    if data == "":
                        return
                elif _HAS_WS.search(data):
                    data = _WS_AROUND_NL.sub("\n", data)
                    data = data.replace("\t", " ").replace("\n", " ")
                    root = _closest_text_block_root(node)
                    if root is not None:
                        texts = _descendant_texts(root)
                    else:
                        n = node
                        while n.parent is not None:
                            n = n.parent
                        if n is node:
                            texts = []
                        else:
                            texts = _descendant_texts(n)
                    if texts:
                        first_of_line = node is texts[0]
                        last_of_line = node is texts[-1]
                    else:
                        first_of_line = last_of_line = True
                    data = _MULTI_SPACE.sub(" ", data)
                    if not first_of_line:
                        for i, t in enumerate(texts):
                            if t is node and i > 0 and texts[i - 1].data \
                                    and texts[i - 1].data[-1] in _WS:
                                data = data.lstrip(_WS)
                                break
                    if first_of_line:
                        data = data.lstrip(_WS)
                    if last_of_line:
                        data = data.rstrip(_WS)
        out.append(_escape_text(data))
    elif isinstance(node, (Comment, ProcessingInstruction)):
        is_pi = isinstance(node, ProcessingInstruction)
        if reformat and not first:
            preformatted = preformatted or _is_preformatted_content(node)
            if not preformatted and (
                    foreign_as_block
                    or (node.parent is not None
                        and _treat_as_block(node.parent))):
                n = node
                while True:
                    n = _prev_sibling(n)
                    if n is None:
                        break
                    if not isinstance(n, Text):
                        same = (isinstance(n, ProcessingInstruction)
                                if is_pi else isinstance(n, Comment))
                        if not same:
                            out.append("\n")
                        break
                out.append("\n" + ctx.indent_char
                           * (level * cfg["indent_step"]))
        if is_pi:
            out.append(f"<?{node.target} {node.data}>")
        else:
            out.append(f"<!--{node.data}-->")
    elif isinstance(node, DocumentType):
        if reformat and not first:
            out.append("\n")
        out.append(f"<!DOCTYPE {node.name.strip()}>")
    elif isinstance(node, (Document, DocumentFragment)):
        for child in node.children:
            _serialize(child, ctx, out, first, level,
                       foreign_as_block, preformatted, reformat)
            first = False


def _prev_sibling(node: Node):
    p = node.parent
    if p is None:
        return None
    siblings = p.children
    try:
        i = siblings.index(node)
    except ValueError:
        return None
    return siblings[i - 1] if i > 0 else None


def serialize(node: Node, scripting: bool = False, **options) -> str:
    """outerHTML with serializer options (see module docstring)."""
    cfg = _default_config()
    for k, v in options.items():
        if k not in cfg:
            raise ValueError(f"unknown serializer option: {k}")
        cfg[k] = v
    ctx = _Ctx(cfg, scripting)
    out: list[str] = []
    _serialize(node, ctx, out, True, 0, False, False,
               cfg["reformat_whitespace"])
    return "".join(out)


def serialize_inner(node: Node, scripting: bool = False, **options) -> str:
    """innerHTML with serializer options."""
    cfg = _default_config()
    for k, v in options.items():
        if k not in cfg:
            raise ValueError(f"unknown serializer option: {k}")
        cfg[k] = v
    if isinstance(node, Element) and node.namespace == HTML_NS:
        if node.name in VOID_HTML:
            return ""
        if node.content is not None:
            node = node.content
    ctx = _Ctx(cfg, scripting)
    out: list[str] = []
    first = True
    for child in node.children:
        _serialize(child, ctx, out, first, 0, False, False,
                   cfg["reformat_whitespace"])
        first = False
    return "".join(out)
