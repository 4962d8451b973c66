"""Generator for positions.test — hand-derived expectations.

Unlike gen_edge_fixtures.py, the expected (code, line, col) tuples here
are NOT produced by the engine under test: each was derived by hand
from the html5lib position convention (1-based; the current input
character; EOF errors one past the end) with the offsets counted
manually in the docblocks below. The script only handles JSON escaping
of control characters.
"""
import json
import os

NUL = "\x00"

tests = [
    # "</script/>": '>' is the 10th char -> (1, 10); matches the
    # reference's bundled mensbeam01.test expectation for this code.
    {"description": "trailing solidus on end tag: error at the '>'",
     "initialStates": ["Script data state"], "lastStartTag": "script",
     "input": "</script/>", "output": [["EndTag", "script"]],
     "errors": [{"code": "end-tag-with-trailing-solidus",
                 "line": 1, "col": 10}]},
    # "<b></b foo='1'>": '>' at offset 14 -> col 15
    {"description": "attribute on end tag: error at the '>'",
     "input": "<b></b foo='1'>",
     "output": [["StartTag", "b", {}], ["EndTag", "b"]],
     "errors": [{"code": "end-tag-with-attributes", "line": 1, "col": 15}]},
    # "a\nb<NUL>c": NUL at offset 3, one newline before -> (2, 2)
    {"description": "NUL in data on the second line",
     "input": "a\nb" + NUL + "c",
     "output": [["Character", "a\nb" + NUL + "c"]],
     "errors": [{"code": "unexpected-null-character", "line": 2, "col": 2}]},
    # "&notit;": "not" matches legacy entity, ';' expected at offset 4
    # ('i') -> col 5 (the upstream html5lib expectation for this input)
    {"description": "legacy charref without semicolon",
     "input": "&notit;",
     "output": [["Character", "¬it;"]],
     "errors": [{"code": "missing-semicolon-after-character-reference",
                 "line": 1, "col": 5}]},
    # "&#123": semicolon expected at EOF offset 5 -> col 6
    {"description": "numeric charref cut off by EOF",
     "input": "&#123",
     "output": [["Character", "{"]],
     "errors": [{"code": "missing-semicolon-after-character-reference",
                 "line": 1, "col": 6}]},
    # "</>": '>' at offset 2 -> col 3
    {"description": "missing end tag name",
     "input": "</>", "output": [],
     "errors": [{"code": "missing-end-tag-name", "line": 1, "col": 3}]},
    # "<?php?>": '?' at offset 1 -> col 2
    {"description": "question mark instead of tag name (PI-style)",
     "input": "<?php?>",
     "output": [["Comment", "?php?"]],
     "errors": [{"code": "unexpected-question-mark-instead-of-tag-name",
                 "line": 1, "col": 2}]},
    # "<a ": EOF after 3 chars -> col 4
    {"description": "eof in tag: error one past the end",
     "input": "<a ", "output": [],
     "errors": [{"code": "eof-in-tag", "line": 1, "col": 4}]},
    # "<4>": '4' at offset 1 -> col 2
    {"description": "invalid first character of tag name",
     "input": "<4>",
     "output": [["Character", "<4>"]],
     "errors": [{"code": "invalid-first-character-of-tag-name",
                 "line": 1, "col": 2}]},
    # "a\n\nb</x/>": '>' at offset 8, newlines at 1 and 2 -> (3, 6)
    {"description": "position on line 3 after two newlines",
     "input": "a\n\nb</x/>",
     "output": [["Character", "a\n\nb"], ["EndTag", "x"]],
     "errors": [{"code": "end-tag-with-trailing-solidus",
                 "line": 3, "col": 6}]},
    # "&nosuchthing;x": no entity prefix matches; ';' at offset 12 -> col 13
    {"description": "unknown named charref with semicolon",
     "input": "&nosuchthing;x",
     "output": [["Character", "&nosuchthing;x"]],
     "errors": [{"code": "unknown-named-character-reference",
                 "line": 1, "col": 13}]},
]

if __name__ == "__main__":
    out = os.path.join(os.path.dirname(__file__), "tokenizer",
                       "positions.test")
    with open(out, "w", encoding="utf-8") as f:
        json.dump({"tests": tests}, f, indent=4, ensure_ascii=True)
        f.write("\n")
    print(f"wrote {out} ({len(tests)} cases)")
