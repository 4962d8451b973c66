"""Reusable Catalyst column expressions (JVM-side, codegen-friendly).

These are plain Spark SQL expression builders — no Python UDFs — shared
by the dedup/similarity/text-analysis operators and mirrored 1:1 by the
DuckDB oracle SQL in ``__spark_entry__.py`` (same constants, same
integer arithmetic, so results hash-match exactly).
"""

from .hashing import (P31, MINHASH_A, MINHASH_B, NUM_HASHES, BANDS,
                      ROWS_PER_BAND, SIMHASH_BITS,
                      spark_base_hash, duckdb_base_hash)  # noqa: F401
