"""Spark operators: the vectorized extraction kernel plus the
training-data-pipeline operators (dedup, similarity search, text
analysis). Everything here is either a native DataFrame expression
(JVM-side, whole-stage-codegen) or an Arrow-batched pandas kernel —
never per-row Python UDFs.
"""

from .extract import extract_pages, EXTRACT_SCHEMA  # noqa: F401
