"""Shim: the conformance loaders/runners moved into the package so the
Spark-side conformance operator can reuse them (html_parser_spark/
conformance.py). Test modules keep importing from here."""

from html_parser_spark.conformance import *  # noqa: F401,F403
from html_parser_spark.conformance import (  # noqa: F401
    FIXTURES, _merge_chars, _unescape_double, iter_fixture_files,
    load_dat_cases, load_encoding_cases, load_tokenizer_cases,
    load_tree_cases, run_tokenizer_case, run_tree_case)
