"""Deterministic PDF synthesis — the layout-parse input table.

The north rule names "PDF/layout parse" next to HTML boilerplate strip
as part of the main-content extraction pipeline. This module is the
``pages.py`` analogue for that slot: every ``documents.parquet`` row
becomes one small, valid PDF (pure function, no RNG), so the expected
extracted text is closed-form SQL and the DuckDB oracle can verify a
real byte-level PDF parse end-to-end.

Structure variants keyed on doc_id (each exercises a different parser
path in ``engine/pdf.py``):

- ``% 2 == 0``  → content stream FlateDecode-compressed (zlib), else raw
- ``% 3 == 0``  → text shown via ``TJ`` arrays with kerning numbers,
                  else plain ``Tj`` shows
- ``% 4 == 1``  → two pages (the lang line moves to page 2)
- ``% 7 == 1``  → an extra line containing ``(``, ``)`` and ``\\`` so
                  the literal-string escape path is oracle-pinned
- ``% 97 == 0`` → deliberately corrupt bytes (no page object): the
                  extractor's per-row failure arm must isolate it
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd

PDFS_SCHEMA = "url string, pdf binary"

ESC_LINE = "esc(\\)"  # literal text of the %7 escape-coverage line


def _lit(s: str) -> bytes:
    """PDF literal string with the three required escapes."""
    out = s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
    return b"(" + out.encode("latin-1", "replace") + b")"


def _content_stream(lines: list[str], use_tj_array: bool) -> bytes:
    ops = [b"BT /F1 12 Tf 72 720 Td"]
    for i, line in enumerate(lines):
        if i:
            ops.append(b"0 -14 Td")
        if use_tj_array:
            # split the line in two with a kerning number between —
            # the extractor must concatenate shows and ignore numbers
            mid = len(line) // 2
            ops.append(b"[" + _lit(line[:mid]) + b" -120 "
                       + _lit(line[mid:]) + b"] TJ")
        else:
            ops.append(_lit(line) + b" Tj")
    ops.append(b"ET")
    return b"\n".join(ops)


def expected_pdf_text(doc_id: int, text: str, lang: str) -> str:
    """Golden extraction — keep in lockstep with the oracle SQL in
    __spark_entry__.py (pdf_extract)."""
    if doc_id % 97 == 0:
        return ""
    lines = [f"Doc {doc_id}", text, f"lang={lang}"]
    if doc_id % 7 == 1:
        lines.append(ESC_LINE)
    return "\n".join(lines)


def build_pdf(doc_id: int, text: str, lang: str, source: str
              ) -> tuple[str, bytes]:
    url = f"https://example.org/{source}/doc{doc_id:08d}.pdf"
    if doc_id % 97 == 0:
        # corrupt: header but no parseable page/content object
        return url, b"%PDF-1.4\ngarbage " + str(doc_id).encode()

    lines = [f"Doc {doc_id}", text, f"lang={lang}"]
    if doc_id % 7 == 1:
        lines.append(ESC_LINE)
    two_pages = doc_id % 4 == 1
    if two_pages:
        page_lines = [lines[:2], lines[2:]]
    else:
        page_lines = [lines]
    use_tj = doc_id % 3 == 0
    compress = doc_id % 2 == 0

    objs: list[bytes] = []

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)  # 1-based object number

    n_pages = len(page_lines)
    # object layout: 1 catalog, 2 pages, then per page (page, content),
    # finally the font
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    add(b"<< /Type /Catalog /Pages 2 0 R >>")
    add(f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>"
        .encode())
    font_num = 3 + 2 * n_pages
    for i, pl in enumerate(page_lines):
        add(f"<< /Type /Page /Parent 2 0 R /Contents {4 + 2 * i} 0 R "
            f"/MediaBox [0 0 612 792] /Resources << /Font << /F1 "
            f"{font_num} 0 R >> >> >>".encode())
        data = _content_stream(pl, use_tj)
        if compress:
            data = zlib.compress(data)
            head = (b"<< /Length " + str(len(data)).encode()
                    + b" /Filter /FlateDecode >>")
        else:
            head = b"<< /Length " + str(len(data)).encode() + b" >>"
        add(head + b"\nstream\n" + data + b"\nendstream")
    add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

    buf = [b"%PDF-1.4"]
    offsets = []
    pos = len(buf[0]) + 1
    for i, body in enumerate(objs, start=1):
        piece = f"{i} 0 obj\n".encode() + body + b"\nendobj"
        offsets.append(pos)
        buf.append(piece)
        pos += len(piece) + 1
    xref_pos = pos
    xref = [f"xref\n0 {len(objs) + 1}".encode(),
            b"0000000000 65535 f "]
    xref += [f"{o:010d} 00000 n ".encode() for o in offsets]
    trailer = (b"trailer\n<< /Size " + str(len(objs) + 1).encode()
               + b" /Root 1 0 R >>\nstartxref\n"
               + str(xref_pos).encode() + b"\n%%EOF")
    buf.append(b"\n".join(xref) + b"\n" + trailer)
    return url, b"\n".join(buf)


def _synthesize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = [build_pdf(int(r.doc_id), r.text, r.lang, r.source)
                for r in pdf.itertuples(index=False)]
        yield pd.DataFrame(rows, columns=["url", "pdf"])


def pdfs_df(spark, sf_dir: str):
    """documents.parquet -> (url, pdf) DataFrame, synthesized
    distributed (mapInPandas), same shape discipline as pages_df."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text", "lang", "source")
    return docs.mapInPandas(_synthesize, schema=PDFS_SCHEMA)
