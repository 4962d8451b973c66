"""Minimal-but-real PDF text extraction (stdlib only).

The north rule's "PDF/layout parse" slot. This is a genuine byte-level
parser for the well-formed subset a crawl pipeline most often meets —
sequential object scan (robust to broken xref tables, like every
production PDF extractor's fallback path), FlateDecode content streams
(zlib), and the text-showing operator subset (``Tj``, ``'``, ``\"``,
``TJ`` arrays with kerning, ``Td``/``TD``/``T*`` line advances,
literal-string escapes incl. octal and balanced nested parens).

Honest scope: no encryption, no object streams (/ObjStm), no CID/CMap
fonts (strings are treated as latin-1), no layout reconstruction
beyond line advances. A production build swaps a full PDF library into
the same ``mapInPandas`` seam (operators/extract.py::extract_pdf_pages)
without touching the plan.
"""

from __future__ import annotations

import re
import zlib

_OBJ_RE = re.compile(rb"(\d+)\s+0\s+obj(.*?)endobj", re.S)
# /Contents may be a single indirect ref or an array of refs (the normal
# form for multi-content-stream pages, e.g. Acrobat output).
_CONTENTS_RE = re.compile(rb"/Contents\s*(\d+)\s+0\s+R")
_CONTENTS_ARR_RE = re.compile(rb"/Contents\s*\[((?:\s*\d+\s+0\s+R)*)\s*\]")
_REF_RE = re.compile(rb"(\d+)\s+0\s+R")
# /Type/Page with or without whitespace, but never /Type/Pages (tree node)
_TYPE_PAGE_RE = re.compile(rb"/Type\s*/Page(?![a-zA-Z])")
_TYPE_PAGES_RE = re.compile(rb"/Type\s*/Pages(?![a-zA-Z])")
_OP_RE = re.compile(rb"[A-Za-z'\"*]+")

_ESCAPES = {ord("n"): "\n", ord("r"): "\r", ord("t"): "\t",
            ord("b"): "\b", ord("f"): "\f",
            ord("("): "(", ord(")"): ")", ord("\\"): "\\"}


def _literal_string(data: bytes, pos: int) -> tuple[str, int]:
    """Parse a PDF literal string starting at the '(' at ``pos``.
    Returns (decoded, position after the closing paren)."""
    out: list[str] = []
    depth = 1
    i = pos + 1
    n = len(data)
    while i < n:
        c = data[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = data[i]
            if 0x30 <= e <= 0x37:  # octal, up to 3 digits
                o = e - 0x30
                for _ in range(2):
                    if i + 1 < n and 0x30 <= data[i + 1] <= 0x37:
                        i += 1
                        o = o * 8 + (data[i] - 0x30)
                # high-order overflow ignored per PDF 32000 §7.3.4.2
                out.append(chr(o & 0xFF))
            elif e == 0x0A:  # line continuation \<LF>
                pass
            elif e == 0x0D:  # line continuation \<CR> or \<CR><LF>
                if i + 1 < n and data[i + 1] == 0x0A:
                    i += 1
            else:
                out.append(_ESCAPES.get(e, chr(e)))
            i += 1
            continue
        if c == 0x28:  # unescaped '(' — balanced nesting is legal
            depth += 1
            out.append("(")
        elif c == 0x29:  # ')'
            depth -= 1
            if depth == 0:
                return "".join(out), i + 1
            out.append(")")
        else:
            out.append(chr(c))
        i += 1
    return "".join(out), i  # unterminated: best effort


def _stream_text(content: bytes) -> str:
    """Extract shown text from one content stream."""
    parts: list[str] = []
    pending_nl = False
    shown_any = False
    tj_buf: list[str] = []
    in_array = False
    i = 0
    n = len(content)
    while i < n:
        c = content[i]
        if c == 0x28:  # (
            s, i = _literal_string(content, i)
            if in_array:
                tj_buf.append(s)
            else:
                tj_buf = [s]
            continue
        if c == 0x5B:  # [
            in_array = True
            tj_buf = []
            i += 1
            continue
        if c == 0x5D:  # ]
            in_array = False
            i += 1
            continue
        m = _OP_RE.match(content, i)
        if m is not None:
            op = m.group()
            if op in (b"Tj", b"TJ") or op == b"'" or op == b'"':
                if tj_buf:
                    if op == b"'" or op == b'"':
                        pending_nl = shown_any  # ' implies T*
                    if pending_nl and shown_any:
                        parts.append("\n")
                    parts.append("".join(tj_buf))
                    shown_any = True
                    pending_nl = False
                    tj_buf = []
            elif op in (b"Td", b"TD") or op == b"T*":
                if shown_any:
                    pending_nl = True
            i = m.end()
            continue
        i += 1
    return "".join(parts)


def extract_pdf_text(data: bytes) -> str:
    """Whole-document text: page content streams in file order, pages
    joined by newline. Raises ValueError on documents with no
    extractable page (the caller's failure arm isolates the row)."""
    if not data.startswith(b"%PDF"):
        raise ValueError("not a PDF")
    objs: dict[int, bytes] = {}
    for m in _OBJ_RE.finditer(data):
        objs[int(m.group(1))] = m.group(2)
    page_texts: list[str] = []
    for num in sorted(objs):
        body = objs[num]
        if _TYPE_PAGE_RE.search(body) is None \
                or _TYPE_PAGES_RE.search(body) is not None:
            continue
        # Resolve content stream refs: array form first (it would also
        # partially match the scalar regex), then single-ref form. A
        # page we can SEE but cannot read is a hard failure — silent
        # skipping would return ok=true with truncated text, the
        # opposite of the per-row failure-arm discipline.
        am = _CONTENTS_ARR_RE.search(body)
        if am is not None:
            refs = [int(g) for g in _REF_RE.findall(am.group(1))]
        else:
            cm = _CONTENTS_RE.search(body)
            if cm is None:
                raise ValueError(f"page obj {num}: no /Contents")
            refs = [int(cm.group(1))]
        payloads: list[bytes] = []
        for ref in refs:
            cobj = objs.get(ref)
            if cobj is None:
                raise ValueError(
                    f"page obj {num}: missing content obj {ref}")
            sm = re.search(rb"stream\r?\n(.*?)\nendstream", cobj, re.S)
            if sm is None:
                raise ValueError(
                    f"page obj {num}: content obj {ref} has no stream")
            payload = sm.group(1)
            if b"/FlateDecode" in cobj[:sm.start()]:
                payload = zlib.decompress(payload)
            payloads.append(payload)
        # PDF 32000 §7.8.2: multiple content streams are concatenated
        # (with whitespace between) and parsed as ONE stream, so text
        # state (line-advance pending, shown_any) carries across the
        # stream boundary — parsing each separately would drop
        # newlines at the seams.
        page_texts.append(_stream_text(b"\n".join(payloads)))
    if not page_texts:
        raise ValueError("no extractable pages")
    return "\n".join(page_texts)
