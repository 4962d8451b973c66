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
- ``% 5 == 2``  → page content split across two streams referenced via
                  ``/Contents [a 0 R b 0 R]`` (Acrobat multi-stream
                  form; PDF 32000 §7.8.2 concatenation)
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


def _lines(doc_id: int, text: str, lang: str) -> list[str]:
    """THE golden line list — single construction shared by the PDF
    builder and the Python oracle so the two cannot drift (the third
    copy, the DuckDB SQL in __spark_entry__.py, is independent by
    design)."""
    lines = [f"Doc {doc_id}", text, f"lang={lang}"]
    if doc_id % 7 == 1:
        lines.append(ESC_LINE)
    return lines


def expected_pdf_text(doc_id: int, text: str, lang: str) -> str:
    """Golden extraction — keep in lockstep with the oracle SQL in
    __spark_entry__.py (pdf_extract)."""
    if doc_id % 97 == 0:
        return ""
    return "\n".join(_lines(doc_id, text, lang))


def build_pdf(doc_id: int, text: str, lang: str, source: str
              ) -> tuple[str, bytes]:
    url = f"https://example.org/{source}/doc{doc_id:08d}.pdf"
    if doc_id % 97 == 0:
        # corrupt: header but no parseable page/content object
        return url, b"%PDF-1.4\ngarbage " + str(doc_id).encode()

    lines = _lines(doc_id, text, lang)
    two_pages = doc_id % 4 == 1
    if two_pages:
        page_lines = [lines[:2], lines[2:]]
    else:
        page_lines = [lines]
    use_tj = doc_id % 3 == 0
    compress = doc_id % 2 == 0
    # %5==2: the page's ops are split across TWO content streams and
    # referenced as "/Contents [a 0 R b 0 R]" — the normal Acrobat
    # multi-stream form; the extractor must concatenate before parsing
    split_contents = doc_id % 5 == 2

    objs: list[bytes] = []

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)  # 1-based object number

    def add_stream(data: bytes) -> int:
        if compress:
            data = zlib.compress(data)
            head = (b"<< /Length " + str(len(data)).encode()
                    + b" /Filter /FlateDecode >>")
        else:
            head = b"<< /Length " + str(len(data)).encode() + b" >>"
        return add(head + b"\nstream\n" + data + b"\nendstream")

    n_pages = len(page_lines)
    streams_per_page = 2 if split_contents else 1
    stride = 1 + streams_per_page  # page obj + its content objs
    # object layout: 1 catalog, 2 pages, then per page
    # (page, content...), finally the font
    kids = " ".join(f"{3 + stride * i} 0 R" for i in range(n_pages))
    add(b"<< /Type /Catalog /Pages 2 0 R >>")
    add(f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>"
        .encode())
    font_num = 3 + stride * n_pages
    for i, pl in enumerate(page_lines):
        first_c = 4 + stride * i
        if split_contents:
            contents = (f"[{first_c} 0 R {first_c + 1} 0 R]")
        else:
            contents = f"{first_c} 0 R"
        add(f"<< /Type /Page /Parent 2 0 R /Contents {contents} "
            f"/MediaBox [0 0 612 792] /Resources << /Font << /F1 "
            f"{font_num} 0 R >> >> >>".encode())
        data = _content_stream(pl, use_tj)
        if split_contents:
            # split at an op boundary; §7.8.2 concatenation restores it
            ops = data.split(b"\n")
            mid = max(1, len(ops) // 2)
            add_stream(b"\n".join(ops[:mid]))
            add_stream(b"\n".join(ops[mid:]))
        else:
            add_stream(data)
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
