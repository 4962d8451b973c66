"""Generator for positions3.test — hand-derived numeric-charref error
positions. Spec semantics: the value-family errors (null/out-of-range/
surrogate/noncharacter/control) are emitted in the "numeric character
reference end state", i.e. with the parser one past the consumed
reference; absence-of-digits is emitted in the decimal/hex start state
at the character where the first digit was expected. Offsets counted
by hand below.
"""
import json
import os

tests = [
    # "&#0;x": reference spans 0-3; end-state position offset 4 -> col 5
    {"description": "null character reference",
     "input": "&#0;x",
     "output": [["Character", "�x"]],
     "errors": [{"code": "null-character-reference",
                 "line": 1, "col": 5}]},
    # "&#x110000;x": ';' at offset 9, end at 10 -> col 11
    {"description": "out of range reference",
     "input": "&#x110000;x",
     "output": [["Character", "�x"]],
     "errors": [{"code": "character-reference-outside-unicode-range",
                 "line": 1, "col": 11}]},
    # "&#xD83D;": end at offset 8 -> col 9
    {"description": "surrogate reference",
     "input": "&#xD83D;",
     "output": [["Character", "�"]],
     "errors": [{"code": "surrogate-character-reference",
                 "line": 1, "col": 9}]},
    # "&#xFDD0;": end at offset 8 -> col 9
    {"description": "noncharacter reference",
     "input": "&#xFDD0;",
     "output": [["Character", "﷐"]],
     "errors": [{"code": "noncharacter-character-reference",
                 "line": 1, "col": 9}]},
    # "&#x80;": end at offset 6 -> col 7; C1 remap to U+20AC
    {"description": "control (C1 remap) reference",
     "input": "&#x80;",
     "output": [["Character", "€"]],
     "errors": [{"code": "control-character-reference",
                 "line": 1, "col": 7}]},
    # "&#;x": first digit expected at ';' offset 2 -> col 3
    {"description": "absence of digits (decimal)",
     "input": "&#;x",
     "output": [["Character", "&#;x"]],
     "errors": [{"code":
                 "absence-of-digits-in-numeric-character-reference",
                 "line": 1, "col": 3}]},
    # "&#x;x": first hex digit expected at ';' offset 3 -> col 4
    {"description": "absence of digits (hex)",
     "input": "&#x;x",
     "output": [["Character", "&#x;x"]],
     "errors": [{"code":
                 "absence-of-digits-in-numeric-character-reference",
                 "line": 1, "col": 4}]},
]

if __name__ == "__main__":
    out = os.path.join(os.path.dirname(__file__), "tokenizer",
                       "positions3.test")
    with open(out, "w", encoding="utf-8") as f:
        json.dump({"tests": tests}, f, indent=4, ensure_ascii=True)
        f.write("\n")
    print(f"wrote {out} ({len(tests)} cases)")
