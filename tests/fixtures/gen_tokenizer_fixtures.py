"""Generate tokenizer .test fixture files (html5lib public format).

Expectations are hand-derived from the WHATWG tokenizer spec, not produced
by the engine under test. Run from repo root:
    python tests/fixtures/gen_tokenizer_fixtures.py
"""

import json
import os

HERE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "tokenizer")

ENTITIES = [
    {"description": "named with semicolon", "input": "&amp;", "output": [["Character", "&"]]},
    {"description": "legacy named without semicolon", "input": "&amp", "output": [["Character", "&"]]},
    {"description": "legacy prefix then letter", "input": "&ampx", "output": [["Character", "&x"]]},
    {"description": "partial longest match", "input": "&notit;", "output": [["Character", "¬it;"]]},
    {"description": "longer name wins", "input": "&notin;", "output": [["Character", "∉"]]},
    {"description": "numeric dec/hex", "input": "&#65;&#x41;&#X42;", "output": [["Character", "AAB"]]},
    {"description": "null charref", "input": "&#0;", "output": [["Character", "�"]]},
    {"description": "out of range", "input": "&#x110000;", "output": [["Character", "�"]]},
    {"description": "C1 remap", "input": "&#x80;&#x9F;", "output": [["Character", "€Ÿ"]]},
    {"description": "surrogate", "input": "&#xD800;", "output": [["Character", "�"]]},
    {"description": "bare ampersands", "input": "& &; &x;", "output": [["Character", "& &; &x;"]]},
    {"description": "longest entity name", "input": "&CounterClockwiseContourIntegral;",
     "output": [["Character", "∳"]]},
    {"description": "no digits", "input": "&#;&#x;", "output": [["Character", "&#;&#x;"]]},
    {"description": "missing semicolon numeric", "input": "&#97 b", "output": [["Character", "a b"]]},
    {"description": "attr historical rule", "input": "<a href=\"&ampx\">",
     "output": [["StartTag", "a", {"href": "&ampx"}]]},
    {"description": "attr charref", "input": "<a href=\"&amp;x&lt;\">",
     "output": [["StartTag", "a", {"href": "&x<"}]]},
    {"description": "attr historical with equals", "input": "<a href=\"&not=\">",
     "output": [["StartTag", "a", {"href": "&not="}]]},
    {"description": "charref in unquoted attr", "input": "<a href=a&amp;b>",
     "output": [["StartTag", "a", {"href": "a&b"}]]},
]

TAGS = [
    {"description": "simple pair", "input": "<h1>x</h1>",
     "output": [["StartTag", "h1", {}], ["Character", "x"], ["EndTag", "h1"]]},
    {"description": "case folding + quoted attrs", "input": "<DIV CLASS='a b'>",
     "output": [["StartTag", "div", {"class": "a b"}]]},
    {"description": "self closing", "input": "<br/>",
     "output": [["StartTag", "br", {}, True]]},
    {"description": "boolean attr", "input": "<input checked>",
     "output": [["StartTag", "input", {"checked": ""}]]},
    {"description": "attr styles", "input": "<a b=c d e='f' g=\"h\">",
     "output": [["StartTag", "a", {"b": "c", "d": "", "e": "f", "g": "h"}]]},
    {"description": "end tag open bogus", "input": "</ x>",
     "output": [["Comment", " x"]]},
    {"description": "duplicate attribute drops later", "input": "<a a=b a=c>",
     "output": [["StartTag", "a", {"a": "b"}]]},
    {"description": "equals before attr name", "input": "<a =b>",
     "output": [["StartTag", "a", {"=b": ""}]]},
    {"description": "space before equals", "input": "<a a =b>",
     "output": [["StartTag", "a", {"a": "b"}]]},
    {"description": "newline separated attrs", "input": "<a a\nb>",
     "output": [["StartTag", "a", {"a": "", "b": ""}]]},
    {"description": "stray solidus", "input": "<a/b>",
     "output": [["StartTag", "a", {"b": ""}]]},
    {"description": "value case preserved", "input": "<A B=C>",
     "output": [["StartTag", "a", {"b": "C"}]]},
    {"description": "end tag with attrs dropped", "input": "</p class=x>",
     "output": [["EndTag", "p"]]},
    {"description": "missing end tag name", "input": "</>x",
     "output": [["Character", "x"]]},
    {"description": "lt before tag", "input": "a < b <c>",
     "output": [["Character", "a < b "], ["StartTag", "c", {}]]},
    {"description": "eof in tag emits nothing", "input": "<a href=",
     "output": []},
    {"description": "eof after lt", "input": "a<",
     "output": [["Character", "a<"]]},
    {"description": "null in data passes through", "input": "a\x00b",
     "output": [["Character", "a\x00b"]]},
    {"description": "unquoted value stops at gt", "input": "<a b=c>d",
     "output": [["StartTag", "a", {"b": "c"}], ["Character", "d"]]},
]

COMMENTS = [
    {"description": "simple comment", "input": "<!--x-->", "output": [["Comment", "x"]]},
    {"description": "abrupt empty 1", "input": "<!-->", "output": [["Comment", ""]]},
    {"description": "abrupt empty 2", "input": "<!--->", "output": [["Comment", ""]]},
    {"description": "empty", "input": "<!---->", "output": [["Comment", ""]]},
    {"description": "double dash inside", "input": "<!-- -- -->", "output": [["Comment", " -- "]]},
    {"description": "bang close", "input": "<!--a--!>", "output": [["Comment", "a"]]},
    {"description": "dashes in data", "input": "<!--a--b-->", "output": [["Comment", "a--b"]]},
    {"description": "single dash in data", "input": "<!--a-b-->", "output": [["Comment", "a-b"]]},
    {"description": "trailing extra dashes", "input": "<!--a---->", "output": [["Comment", "a--"]]},
    {"description": "eof in comment", "input": "<!--a", "output": [["Comment", "a"]]},
    {"description": "doctype simple", "input": "<!DOCTYPE html>",
     "output": [["DOCTYPE", "html", None, None, True]]},
    {"description": "doctype lowercased", "input": "<!doctype HTML>",
     "output": [["DOCTYPE", "html", None, None, True]]},
    {"description": "doctype public+system", "input": "<!DOCTYPE html PUBLIC \"a\" \"b\">",
     "output": [["DOCTYPE", "html", "a", "b", True]]},
    {"description": "doctype system", "input": "<!DOCTYPE html SYSTEM 's'>",
     "output": [["DOCTYPE", "html", None, "s", True]]},
    {"description": "doctype missing name", "input": "<!DOCTYPE>",
     "output": [["DOCTYPE", None, None, None, False]]},
    {"description": "doctype bogus keyword", "input": "<!DOCTYPE html BOGUS>",
     "output": [["DOCTYPE", "html", None, None, False]]},
    {"description": "doctype abrupt public", "input": "<!DOCTYPE html PUBLIC \"a>x",
     "output": [["DOCTYPE", "html", "a", None, False], ["Character", "x"]]},
    {"description": "question mark bogus comment", "input": "<?php ?>",
     "output": [["Comment", "?php ?"]]},
    {"description": "bang bogus comment", "input": "<!CDATA[x]]>",
     "output": [["Comment", "CDATA[x]]"]]},
    {"description": "cdata outside foreign is bogus", "input": "<![CDATA[x]]>",
     "output": [["Comment", "[CDATA[x]]"]]},
]

RAWTEXT = [
    {"description": "rawtext appropriate end tag", "initialStates": ["RAWTEXT state"],
     "lastStartTag": "xmp", "input": "</xmp>x",
     "output": [["EndTag", "xmp"], ["Character", "x"]]},
    {"description": "rawtext other end tag is text", "initialStates": ["RAWTEXT state"],
     "lastStartTag": "xmp", "input": "a</b>c",
     "output": [["Character", "a</b>c"]]},
    {"description": "rcdata decodes charrefs", "initialStates": ["RCDATA state"],
     "lastStartTag": "title", "input": "&amp;</title>",
     "output": [["Character", "&"], ["EndTag", "title"]]},
    {"description": "rawtext keeps charrefs literal", "initialStates": ["RAWTEXT state"],
     "lastStartTag": "style", "input": "&amp;</style>",
     "output": [["Character", "&amp;"], ["EndTag", "style"]]},
    {"description": "script double escape", "initialStates": ["Script data state"],
     "lastStartTag": "script", "input": "<!--<script>a</script>b--></script>",
     "output": [["Character", "<!--<script>a</script>b-->"], ["EndTag", "script"]]},
    {"description": "script escaped end tag honored", "initialStates": ["Script data state"],
     "lastStartTag": "script", "input": "<!-- x </script>y",
     "output": [["Character", "<!-- x "], ["EndTag", "script"], ["Character", "y"]]},
    {"description": "script plain lt", "initialStates": ["Script data state"],
     "lastStartTag": "script", "input": "a<b</script>",
     "output": [["Character", "a<b"], ["EndTag", "script"]]},
    {"description": "script escape closes with arrow", "initialStates": ["Script data state"],
     "lastStartTag": "script", "input": "<!--x--></script>",
     "output": [["Character", "<!--x-->"], ["EndTag", "script"]]},
    {"description": "plaintext consumes everything", "initialStates": ["PLAINTEXT state"],
     "lastStartTag": "plaintext", "input": "a</plaintext>b",
     "output": [["Character", "a</plaintext>b"]]},
    {"description": "rcdata end tag with spaces", "initialStates": ["RCDATA state"],
     "lastStartTag": "title", "input": "x</title >y",
     "output": [["Character", "x"], ["EndTag", "title"], ["Character", "y"]]},
    {"description": "rcdata near-miss keeps case", "initialStates": ["RCDATA state"],
     "lastStartTag": "title", "input": "</TITL></title>",
     "output": [["Character", "</TITL>"], ["EndTag", "title"]]},
    {"description": "rcdata null to replacement", "initialStates": ["RCDATA state"],
     "lastStartTag": "title", "input": "a\x00b</title>",
     "output": [["Character", "a�b"], ["EndTag", "title"]]},
]


def main() -> None:
    os.makedirs(HERE, exist_ok=True)
    for name, tests in [("entities.test", ENTITIES), ("tags_attrs.test", TAGS),
                        ("comments_doctypes.test", COMMENTS), ("rawtext_script.test", RAWTEXT)]:
        with open(os.path.join(HERE, name), "w", encoding="utf-8") as f:
            json.dump({"tests": tests}, f, indent=1, ensure_ascii=True)
    print("wrote", len(ENTITIES) + len(TAGS) + len(COMMENTS) + len(RAWTEXT), "cases")


if __name__ == "__main__":
    main()
