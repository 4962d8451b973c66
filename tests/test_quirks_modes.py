"""Quirks-mode determination per the WHATWG "initial" insertion mode
public/system-ID tables (reference parity:
/root/reference/lib/Parser/TreeConstructor.php:1409-1489)."""

import pytest

from html_parser_spark.engine import parse
from html_parser_spark.engine.dom import LIMITED_QUIRKS, NO_QUIRKS, QUIRKS


@pytest.mark.parametrize("html,mode", [
    ("<!DOCTYPE html>x", NO_QUIRKS),
    ("x", QUIRKS),  # missing doctype
    ('<!DOCTYPE html PUBLIC "-//W3C//DTD HTML 4.01 Transitional//EN">x',
     QUIRKS),  # public-id prefix, no system id
    ('<!DOCTYPE html PUBLIC "-//W3C//DTD HTML 4.01 Transitional//EN" "u">x',
     LIMITED_QUIRKS),  # same prefix WITH system id → limited
    ('<!DOCTYPE html PUBLIC "-//W3C//DTD XHTML 1.0 Transitional//EN">x',
     LIMITED_QUIRKS),
    ('<!DOCTYPE html PUBLIC "-//W3O//DTD W3 HTML Strict 3.0//EN//">x',
     QUIRKS),  # exact-match quirky public id
    ('<!DOCTYPE html SYSTEM '
     '"http://www.ibm.com/data/dtd/v11/ibmxhtml1-transitional.dtd">x',
     QUIRKS),  # the one quirky system id
    ("<!DOCTYPE html SYSTEM 'about:legacy-compat'>x", NO_QUIRKS),
    ("<!DOCTYPE foo>x", QUIRKS),  # non-html doctype name
])
def test_quirks_mode(html, mode):
    assert parse(html).quirks_mode == mode
