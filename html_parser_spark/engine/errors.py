"""Parse-error code registry.

Mirrors the reference's ParseError registry
(/root/reference/lib/Parser/ParseError.php:11-165) with html5lib-style
kebab-case names. The standardized tokenizer codes (reference constants
100-148) are covered 1:1; for the non-standardized tree-construction
codes we keep html5lib's more specific names where the reference uses
its own generic ones — the mapping is recorded in REFERENCE_ALIASES so
parity stays checkable.
"""

from __future__ import annotations

# Standardized tokenizer + preprocessing codes (WHATWG §13.2;
# reference ParseError.php:11-59, constants 100-148), 1:1.
TOKENIZER_CODES = frozenset({
    "encoding-error",
    "unexpected-null-character",
    "unexpected-question-mark-instead-of-tag-name",
    "eof-before-tag-name",
    "invalid-first-character-of-tag-name",
    "missing-end-tag-name",
    "eof-in-tag",
    "eof-in-script-html-comment-like-text",
    "unexpected-equals-sign-before-attribute-name",
    "duplicate-attribute",
    "unexpected-character-in-attribute-name",
    "missing-attribute-value",
    "unexpected-character-in-unquoted-attribute-value",
    "missing-whitespace-between-attributes",
    "unexpected-solidus-in-tag",
    "cdata-in-html-content",
    "incorrectly-opened-comment",
    "abrupt-closing-of-empty-comment",
    "eof-in-comment",
    "nested-comment",
    "incorrectly-closed-comment",
    "eof-in-doctype",
    "missing-whitespace-before-doctype-name",
    "missing-doctype-name",
    "invalid-character-sequence-after-doctype-name",
    "missing-whitespace-after-doctype-public-keyword",
    "missing-doctype-public-identifier",
    "missing-quote-before-doctype-public-identifier",
    "abrupt-doctype-public-identifier",
    "missing-whitespace-between-doctype-public-and-system-identifiers",
    "missing-whitespace-after-doctype-system-keyword",
    "missing-doctype-system-identifier",
    "missing-quote-before-doctype-system-identifier",
    "abrupt-doctype-system-identifier",
    "unexpected-character-after-doctype-system-identifier",
    "eof-in-cdata",
    "end-tag-with-attributes",
    "end-tag-with-trailing-solidus",
    "missing-semicolon-after-character-reference",
    "unknown-named-character-reference",
    "absence-of-digits-in-numeric-character-reference",
    "null-character-reference",
    "character-reference-outside-unicode-range",
    "surrogate-character-reference",
    "noncharacter-character-reference",
    "control-character-reference",
    "surrogate-in-input-stream",
    "noncharacter-in-input-stream",
    "control-character-in-input-stream",
})

# Tree-construction codes (not yet standardized; html5lib-style names,
# reference ParseError.php:60-165 equivalents).
TREE_CODES = frozenset({
    "expected-doctype-but-got-chars",
    "expected-doctype-but-got-start-tag",
    "expected-doctype-but-got-end-tag",
    "expected-doctype-but-got-eof",
    "unexpected-doctype",
    "non-void-html-element-start-tag-with-trailing-solidus",
    "fostered-char",
    "fostered-start-tag",
    "fostered-end-tag",
    "invalid-namespace-attribute-value",
    "image-start-tag",
    "unexpected-token",
    "unexpected-start-tag",
    "unexpected-start-tag-ignored",
    "unexpected-start-tag-implies-end-tag",
    "unexpected-start-tag-out-of-head",
    "unexpected-end-tag",
    "unexpected-end-tag-treated-as-br",
    "unexpected-implied-end-tag",
    "expected-closing-tag-but-got-end-tag",
    "expected-named-closing-tag-but-got-eof",
    "unexpected-cell-end-tag",
    "unexpected-cell-in-table-body",
    "unexpected-form-in-table",
    "unexpected-hidden-input-in-table",
    "unexpected-html-element-in-foreign-content",
    "unexpected-token-after-body",
    "unexpected-token-after-after-body",
    "unexpected-token-in-frameset",
    "unexpected-token-after-frameset",
    "unexpected-token-after-after-frameset",
    "unexpected-token-in-head-noscript",
    "unexpected-char-in-frameset",
    "unexpected-char-after-frameset",
    "unexpected-char-after-after-frameset",
    "unexpected-frameset-end",
    "eof-in-frameset",
    "eof-in-template",
    # adoption-agency step failures (spec §13.2.6.4.7 numbered steps;
    # reachable on e.g. '<b><p></b>' — emitted by treebuilder.py AAA)
    "adoption-agency-1.2",
    "adoption-agency-1.3",
    "adoption-agency-4.4",
})

ALL_CODES = TOKENIZER_CODES | TREE_CODES

# Reference codes whose events we report under a different (more
# specific html5lib-style) name — deliberate deviations, same events:
REFERENCE_ALIASES = {
    "unknown-doctype": "unexpected-doctype",
    "unexpected-start-tag-alias": "image-start-tag",
    "unexpected-null-character-omit": "unexpected-null-character",
    "unexpected-null-character-replace": "unexpected-null-character",
    # the reference's generic catch-alls map onto our per-mode codes
    "unexpected-char": "unexpected-char-in-frameset (and friends)",
    "unexpected-eof": "eof-in-frameset / eof-in-template / "
                      "expected-named-closing-tag-but-got-eof",
    "unexpected-parent": "(not emitted: PHP-DOM workaround only)",
}
