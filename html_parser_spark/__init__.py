"""html_parser_spark — a PySpark-native HTML5 main-content extraction engine.

A from-scratch reimplementation of the capability surface of
mensbeam/HTML-Parser (WHATWG-conformant HTML5 parsing + serialization +
text extraction; reference studied at /root/reference), re-architected for
Apache Spark:

- ``engine/``    pure-Python WHATWG HTML5 kernel (charset sniff, tokenizer,
                 tree construction, serializer, extractor) — no Spark imports,
                 unit-testable standalone, designed around run-span scanning
                 so the per-document loop advances by runs, not characters.
- ``operators/`` Spark operators: the vectorized mapInPandas extraction
                 kernel, dedup (exact / MinHash-LSH / SimHash / n-gram
                 Jaccard), similarity search, text analysis.
- ``sources/``   deterministic Common-Crawl-style ``pages`` synthesis and
                 parquet/Iceberg IO with checkpoint-resume.
- ``functions/`` reusable Catalyst column expressions (JVM-side).
- ``plans/``     job orchestration: partitioning/salting plans, run reports.

Everything here derives from public knowledge only: the WHATWG HTML and
Encoding standards, the Apache Spark / PySpark API, and observation of the
reference's behavior (file:line citations in docstrings point into
/root/reference for parity checking — no code is copied from it).
"""

__version__ = "0.1.0"
