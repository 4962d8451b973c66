"""DOMParser façade: ``parse_from_string(data, type)``.

Parity with the reference's DOMParser (text/html branch of
/root/reference/lib/DOMParser.php:76-105): a MIME type string selects
the parser; a ``charset`` parameter supplies the transport encoding,
with a BOM taking authority over it (the reference resolves
BOM ?? charset-param and hands the result to the parser; our sniff
ladder applies the same precedence), and the no-signal fallback is
UTF-8 (not windows-1252 — DOMParser is a Unicode-world API).

The XML branch (DOMParser.php:106-202) is out of scope by design
(SURVEY §2.1 disposition: this engine is an HTML parser); XML types
raise ``NotImplementedError`` so callers get an honest signal, and
non-HTML/XML types raise ``ValueError`` exactly like the reference's
``InvalidArgumentException``.
"""

from __future__ import annotations

from .parser import Output, parse

_HTTP_WS = " \t\n\r"


def parse_mime_type(s: str) -> tuple[str, str, dict[str, str]] | None:
    """Minimal WHATWG "parse a MIME type": (type, subtype, params) or
    None. Quoted parameter values are unwrapped; first occurrence of a
    parameter name wins."""
    s = s.strip(_HTTP_WS)
    if "/" not in s:
        return None
    type_, _, rest = s.partition("/")
    subtype, _, param_str = rest.partition(";")
    type_ = type_.strip(_HTTP_WS).lower()
    subtype = subtype.strip(_HTTP_WS).lower()
    if not type_ or not subtype:
        return None
    params: dict[str, str] = {}
    for part in param_str.split(";"):
        name, eq, value = part.partition("=")
        if not eq:
            continue
        name = name.strip(_HTTP_WS).lower()
        value = value.strip(_HTTP_WS)
        if len(value) >= 2 and value[0] == '"' and value[-1] == '"':
            value = value[1:-1]
        if name and name not in params:
            params[name] = value
    return type_, subtype, params


def _is_xml_type(type_: str, subtype: str) -> bool:
    return (subtype.endswith("+xml")
            or (type_ in ("text", "application") and subtype == "xml"))


class DOMParser:
    """``DOMParser().parse_from_string(data, "text/html")`` →
    :class:`~html_parser_spark.engine.parser.Output` (``.document`` is
    the parsed DOM)."""

    def parse_from_string(self, data: bytes | str, type_: str,
                          scripting: bool = False) -> Output:
        mt = parse_mime_type(type_)
        if mt is None:
            raise ValueError(f"invalid MIME type: {type_!r}")
        t, sub, params = mt
        if (t, sub) == ("text", "html"):
            if isinstance(data, str):
                data = data.encode("utf-8")
            return parse(data, transport_charset=params.get("charset"),
                         fallback="utf-8", scripting=scripting)
        if _is_xml_type(t, sub):
            raise NotImplementedError(
                "XML parsing is out of scope for this engine "
                "(reference DOMParser.php:106-202; SURVEY §2.1)")
        raise ValueError('type must be "text/html" or an XML type')
