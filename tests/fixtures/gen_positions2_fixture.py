"""Generator for positions2.test — hand-derived comment/doctype error
positions (html5lib convention: the current input character, 1-based;
EOF one past the end). Offsets counted by hand in the comments; the
script exists only for JSON escaping.
"""
import json
import os

tests = [
    # "<!-->x": '>' at offset 4 -> col 5
    {"description": "abrupt empty comment",
     "input": "<!-->x",
     "output": [["Comment", ""], ["Character", "x"]],
     "errors": [{"code": "abrupt-closing-of-empty-comment",
                 "line": 1, "col": 5}]},
    # "<!--->x": comment-start-dash sees '>' at offset 5 -> col 6
    {"description": "abrupt empty comment with dash",
     "input": "<!--->x",
     "output": [["Comment", ""], ["Character", "x"]],
     "errors": [{"code": "abrupt-closing-of-empty-comment",
                 "line": 1, "col": 6}]},
    # "<!--a--!>b": '>' at offset 8 -> col 9
    {"description": "incorrectly closed comment",
     "input": "<!--a--!>b",
     "output": [["Comment", "a"], ["Character", "b"]],
     "errors": [{"code": "incorrectly-closed-comment",
                 "line": 1, "col": 9}]},
    # "<!--a<!--b-->": bang-dash-dash sees 'b' at offset 9 -> col 10
    {"description": "nested comment",
     "input": "<!--a<!--b-->",
     "output": [["Comment", "a<!--b"]],
     "errors": [{"code": "nested-comment", "line": 1, "col": 10}]},
    # "<!--a": EOF at offset 5 -> col 6
    {"description": "eof in comment",
     "input": "<!--a",
     "output": [["Comment", "a"]],
     "errors": [{"code": "eof-in-comment", "line": 1, "col": 6}]},
    # "<!DOCTYPE>": '>' at offset 9 -> col 10
    {"description": "missing doctype name",
     "input": "<!DOCTYPE>",
     "output": [["DOCTYPE", None, None, None, False]],
     "errors": [{"code": "missing-doctype-name", "line": 1, "col": 10}]},
    # "<!DOCTYPEhtml>": 'h' at offset 9 -> col 10
    {"description": "missing whitespace before doctype name",
     "input": "<!DOCTYPEhtml>",
     "output": [["DOCTYPE", "html", None, None, True]],
     "errors": [{"code": "missing-whitespace-before-doctype-name",
                 "line": 1, "col": 10}]},
    # "<!DOCTYPE html PUBLIC>": '>' at offset 21 -> col 22
    {"description": "missing public identifier",
     "input": "<!DOCTYPE html PUBLIC>",
     "output": [["DOCTYPE", "html", None, None, False]],
     "errors": [{"code": "missing-doctype-public-identifier",
                 "line": 1, "col": 22}]},
    # "<!DOCTYPE html PUBLIC'p'>": quote at offset 21 -> col 22
    {"description": "missing whitespace after PUBLIC keyword",
     "input": "<!DOCTYPE html PUBLIC'p'>",
     "output": [["DOCTYPE", "html", "p", None, True]],
     "errors": [{"code": "missing-whitespace-after-doctype-public-keyword",
                 "line": 1, "col": 22}]},
    # "<!DOCTYPE html PUBLIC x>": 'x' at offset 22 -> col 23
    {"description": "missing quote before public identifier",
     "input": "<!DOCTYPE html PUBLIC x>",
     "output": [["DOCTYPE", "html", None, None, False]],
     "errors": [{"code": "missing-quote-before-doctype-public-identifier",
                 "line": 1, "col": 23}]},
    # "<!DOCTYPE html PUBLIC 'p>": '>' at offset 24 -> col 25
    {"description": "abrupt public identifier",
     "input": "<!DOCTYPE html PUBLIC 'p>",
     "output": [["DOCTYPE", "html", "p", None, False]],
     "errors": [{"code": "abrupt-doctype-public-identifier",
                 "line": 1, "col": 25}]},
    # "<!DOCTYPE html PUBLIC 'p''s'>": the state errors on the system
    # id's opening quote at offset 25 -> col 26
    {"description": "missing whitespace between public and system",
     "input": "<!DOCTYPE html PUBLIC 'p''s'>",
     "output": [["DOCTYPE", "html", "p", "s", True]],
     "errors": [{"code":
                 "missing-whitespace-between-doctype-public-and-system-identifiers",
                 "line": 1, "col": 26}]},
    # "<!DOCTYPE html SYSTEM 's>": '>' at offset 24 -> col 25
    {"description": "abrupt system identifier",
     "input": "<!DOCTYPE html SYSTEM 's>",
     "output": [["DOCTYPE", "html", None, "s", False]],
     "errors": [{"code": "abrupt-doctype-system-identifier",
                 "line": 1, "col": 25}]},
]

if __name__ == "__main__":
    out = os.path.join(os.path.dirname(__file__), "tokenizer",
                       "positions2.test")
    with open(out, "w", encoding="utf-8") as f:
        json.dump({"tests": tests}, f, indent=4, ensure_ascii=True)
        f.write("\n")
    print(f"wrote {out} ({len(tests)} cases)")
