"""Tree-construction error (line, col) positions — debug mode.

Convention (documented at treebuilder.py::TreeBuilder.error): tree
errors point at the LAST input character consumed when the error fired
— the reference's ``whereIs(0)`` (ParseErrorEmitter.php:68), i.e. the
final char of the triggering token. Exceptions mirroring the
reference's pended-character handling (ParseErrorEmitter.php:30-31):
``fostered-char`` from the in-table-text flush points back at the
first offending pended run, not at the token that forced the flush.

Every expected tuple below was hand-derived from the input before
being frozen (FIXTURES.md §7 protocol); together with the tokenizer
position fixtures this makes every code in engine/errors.py
position-verified except ``encoding-error`` (bulk decode-time counter,
explicitly position-less — see COVERAGE.md §2.6).
"""

from __future__ import annotations

import pytest

from html_parser_spark.engine import tokenizer as tz
from html_parser_spark.engine.dom import Element, HTML_NS
from html_parser_spark.engine.parser import parse
from html_parser_spark.engine.treebuilder import TreeBuilder

EDS = "expected-doctype-but-got-start-tag"

DOCUMENT_CASES = [
    # (input, [(code, line, col), ...]) — full expected list, in order
    ("x", [("expected-doctype-but-got-chars", 1, 1)]),
    ("<p>hi", [(EDS, 1, 3)]),
    ("</p>", [("expected-doctype-but-got-end-tag", 1, 4),
              ("unexpected-end-tag", 1, 4)]),
    ("", [("expected-doctype-but-got-eof", 1, 1)]),
    ("<!DOCTYPE html><!DOCTYPE html>", [("unexpected-doctype", 1, 30)]),
    ("<b><p></b>x", [(EDS, 1, 3), ("adoption-agency-1.3", 1, 10)]),
    ("</br>", [("expected-doctype-but-got-end-tag", 1, 5),
               ("unexpected-end-tag-treated-as-br", 1, 5)]),
    # fostered-char points back at the pended 'A', not at <div>
    ("<table>A<div>", [(EDS, 1, 7), ("fostered-char", 1, 8),
                       ("fostered-start-tag", 1, 13)]),
    ("<table><tr>x</tr></table>", [(EDS, 1, 7), ("fostered-char", 1, 12)]),
    ("<table><colgroup>x", [(EDS, 1, 7), ("fostered-char", 1, 18)]),
    ("<template>", [(EDS, 1, 10), ("eof-in-template", 1, 10)]),
    ("<frameset>", [(EDS, 1, 10), ("eof-in-frameset", 1, 10)]),
    ("<div/>", [(EDS, 1, 6),
                ("non-void-html-element-start-tag-with-trailing-solidus",
                 1, 6)]),
    ("<image>", [(EDS, 1, 7), ("image-start-tag", 1, 7)]),
    ("<!DOCTYPE html><body></body>x",
     [("unexpected-token-after-body", 1, 29)]),
    ('<svg xmlns="wrong">',
     [(EDS, 1, 19), ("invalid-namespace-attribute-value", 1, 19)]),
    ('<table><input type="hidden">',
     [(EDS, 1, 7), ("unexpected-hidden-input-in-table", 1, 28)]),
    ("<table><form>", [(EDS, 1, 7), ("unexpected-form-in-table", 1, 13)]),
    ("<svg><div>x",
     [(EDS, 1, 5), ("unexpected-html-element-in-foreign-content", 1, 10)]),
    ("<head></head><base>",
     [(EDS, 1, 6), ("unexpected-start-tag-out-of-head", 1, 19)]),
    ("<frameset>x", [(EDS, 1, 10), ("unexpected-char-in-frameset", 1, 11),
                     ("eof-in-frameset", 1, 11)]),
    ("<frameset></frameset>x",
     [(EDS, 1, 10), ("unexpected-char-after-frameset", 1, 22)]),
    ("<frameset></frameset></html>x",
     [(EDS, 1, 10), ("unexpected-char-after-after-frameset", 1, 29)]),
    ("<!DOCTYPE html><body></body></html>x",
     [("unexpected-token-after-after-body", 1, 36)]),
    ("<table><tbody><td>x",
     [(EDS, 1, 7), ("unexpected-cell-in-table-body", 1, 18)]),
    ("<head><noscript><title>x</title></noscript>",
     [(EDS, 1, 6), ("unexpected-token-in-head-noscript", 1, 23),
      ("unexpected-end-tag", 1, 43)]),
    ("<title>x",
     [(EDS, 1, 7), ("expected-named-closing-tag-but-got-eof", 1, 8)]),
    ("x<frameset>", [("expected-doctype-but-got-chars", 1, 1),
                     ("unexpected-start-tag", 1, 11)]),
    ("<select><select>", [(EDS, 1, 8), ("unexpected-start-tag", 1, 16)]),
    ("<caption>", [(EDS, 1, 9), ("unexpected-start-tag-ignored", 1, 9)]),
    # AAA step 1.2: <b> fostered out of the table stays in the AFE but
    # </table> pops it off the stack
    ("<table><b></table></b>",
     [(EDS, 1, 7), ("fostered-start-tag", 1, 10),
      ("adoption-agency-1.2", 1, 22)]),
    # AAA step 4.4: b on the stack but table is a scope barrier
    ("<b><table></b>", [(EDS, 1, 3), ("fostered-end-tag", 1, 14),
                        ("adoption-agency-4.4", 1, 14)]),
    ("<!DOCTYPE html><div></body>",
     [("expected-closing-tag-but-got-end-tag", 1, 27)]),
    ("<table><tr><td><b><td>",
     [(EDS, 1, 7), ("unexpected-cell-end-tag", 1, 22)]),
    ("<p><b>x</p>", [(EDS, 1, 3), ("unexpected-implied-end-tag", 1, 11)]),
    ("<li><b>x<li>",
     [(EDS, 1, 4), ("unexpected-start-tag-implies-end-tag", 1, 12)]),
    ("<frameset></frameset><div>",
     [(EDS, 1, 10), ("unexpected-token-after-frameset", 1, 26)]),
    ("<frameset></frameset></html><div>",
     [(EDS, 1, 10), ("unexpected-token-after-after-frameset", 1, 33)]),
    ("<frameset><div>", [(EDS, 1, 10),
                         ("unexpected-token-in-frameset", 1, 15),
                         ("eof-in-frameset", 1, 15)]),
    # line counting: the pended 'A' sits on line 2
    ("<!DOCTYPE html>\n<table>A</table>", [("fostered-char", 2, 8)]),
    # --- fused data-state bare-tag path (tokenizer.py::_DATA_CHUNK):
    # the CHARS token preceding a fused tag must still be processed
    # with self.pos at the '<' so char-blamed errors point at the run,
    # and errors on the fused tag itself blame its '>'
    ("x<caption>", [("expected-doctype-but-got-chars", 1, 1),
                    ("unexpected-start-tag-ignored", 1, 10)]),
    ("<frameset>x<frame>", [(EDS, 1, 10),
                            ("unexpected-char-in-frameset", 1, 11),
                            ("eof-in-frameset", 1, 18)]),
    ("<!DOCTYPE html><body></p>", [("unexpected-end-tag", 1, 25)]),
    ("<!DOCTYPE html>\n<table>\nAB\n<div>",
     [("fostered-char", 3, 3), ("fostered-start-tag", 4, 5)]),
]

# codes only reachable through the fragment algorithm (context resets
# the mode while the stack is just [html]): (data, context, expected)
FRAGMENT_CASES = [
    ("<td>", "caption", [("unexpected-token", 1, 4)]),
    ("<tr>", "tr", [("unexpected-token", 1, 4)]),
    ("<caption>", "tbody", [("unexpected-token", 1, 9)]),
    ("x", "colgroup", [("unexpected-token", 1, 1)]),
    ("</frameset>", "frameset", [("unexpected-frameset-end", 1, 11)]),
]


@pytest.mark.parametrize("inp,expected", DOCUMENT_CASES,
                         ids=[repr(c[0])[:40] for c in DOCUMENT_CASES])
def test_document_tree_error_positions(inp, expected):
    o = parse(inp, track_positions=True)
    assert o.error_positions == expected
    # positions stay 1:1 with the errors list (tokenizer then tree)
    assert [c for c, _, _ in o.error_positions] == o.errors


@pytest.mark.parametrize("data,ctx,expected", FRAGMENT_CASES,
                         ids=[c[1] for c in FRAGMENT_CASES])
def test_fragment_tree_error_positions(data, ctx, expected):
    t = tz.Tokenizer(data, track_positions=True)
    tb = TreeBuilder(t, fragment_context=Element(ctx, HTML_NS))
    tb.run()
    assert t.error_positions() + tb.error_positions() == expected


def test_production_mode_records_no_offsets():
    """The production path pays nothing: no offsets lists exist."""
    o = parse("<table>A<div>x")
    assert o.error_positions is None
    t = tz.Tokenizer("<p>x")
    tb = TreeBuilder(t)
    tb.run()
    assert tb.error_offsets is None


def test_every_registry_code_position_verified_or_recorded():
    """COVERAGE.md §2.6 completeness claim, pinned: every code in the
    registry appears in a position-asserting fixture/test except
    ``encoding-error`` (emitted by the bulk decoder before a character
    stream exists — count-exact via decode_count, explicitly
    position-less)."""
    import glob
    import json
    import os

    from html_parser_spark.engine.errors import TOKENIZER_CODES, TREE_CODES

    verified = set()
    fixdir = os.path.join(os.path.dirname(__file__), "fixtures", "tokenizer")
    for f in glob.glob(os.path.join(fixdir, "positions*.test")):
        with open(f) as fh:
            for t in json.load(fh)["tests"]:
                for e in t.get("errors", []):
                    verified.add(e["code"])
    for _, expected in DOCUMENT_CASES:
        verified.update(c for c, _, _ in expected)
    for _, _, expected in FRAGMENT_CASES:
        verified.update(c for c, _, _ in expected)
    registry = set(TOKENIZER_CODES) | set(TREE_CODES)
    assert registry - verified == {"encoding-error"}
