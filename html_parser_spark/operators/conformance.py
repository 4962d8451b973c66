"""Distributed conformance runner: html5lib-format suites through the
same engine code paths the production UDF uses.

The reference runs its conformance corpus single-process under PHPUnit
(/root/reference/tests/cases/TestTokenizer.php:99-216,
TestTreeConstructor.php:65-136); here the cases become a DataFrame and
the pass/fail evaluation fans out across executors — at full
html5lib-tests scale (thousands of cases × fragment contexts) that's a
few seconds instead of minutes, and the *same* kernel binary (the
engine package shipped via --py-files) is what gets certified.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd

from .. import conformance as conf

CASE_SCHEMA = "case_id string, kind string, payload string"
RESULT_SCHEMA = "case_id string, kind string, passed boolean"


def load_all_cases() -> list[tuple[str, str, str]]:
    """Flatten every fixture suite into (case_id, kind, payload-json)."""
    rows: list[tuple[str, str, str]] = []
    for path in conf.iter_fixture_files("tokenizer", ".test"):
        for case_id, case, state in conf.load_tokenizer_cases(path):
            rows.append((case_id, "tokenizer",
                         json.dumps({"case": case, "state": state})))
    for path in conf.iter_fixture_files("tree-construction", ".dat"):
        for case in conf.load_tree_cases(path):
            rows.append((case["case_id"], "tree", json.dumps(case)))
    for path in conf.iter_fixture_files("encoding", ".dat"):
        for case in conf.load_encoding_cases(path):
            rows.append((case["case_id"], "encoding", json.dumps(
                {"input_hex": case["input"].hex(),
                 "expected": case["expected"]})))
    for path in conf.iter_fixture_files("serializer", ".dat"):
        for case in conf.load_serializer_cases(path):
            rows.append((case["case_id"], "serializer", json.dumps(case)))
    return rows


def _run_case(kind: str, payload: str) -> bool:
    p = json.loads(payload)
    if kind == "tokenizer":
        actual, expected = conf.run_tokenizer_case(p["case"], p["state"])
        return actual == expected
    if kind == "tree":
        actual, expected = conf.run_tree_case(p)
        return actual == expected
    if kind == "encoding":
        from ..engine import charset
        enc, _ = charset.sniff(bytes.fromhex(p["input_hex"]))
        return enc == p["expected"]
    if kind == "serializer":
        actual, expected = conf.run_serializer_case(p)
        return actual == expected
    return False


def conformance_results(spark, num_partitions: int = 0):
    """DataFrame of (case_id, kind, passed) for every fixture case."""
    rows = load_all_cases()
    df = spark.createDataFrame(rows, schema=CASE_SCHEMA)
    if num_partitions:
        df = df.repartition(num_partitions)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            passed = []
            for kind, payload in zip(pdf["kind"], pdf["payload"]):
                try:
                    passed.append(bool(_run_case(kind, payload)))
                except Exception:
                    passed.append(False)
            yield pd.DataFrame({"case_id": pdf["case_id"],
                                "kind": pdf["kind"], "passed": passed})

    return df.mapInPandas(run, schema=RESULT_SCHEMA)
