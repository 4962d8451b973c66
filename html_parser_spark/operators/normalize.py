"""Unicode normalization for a multilingual training corpus.

NFC normalization (UAX #15 canonical composition) is a standard early
pass in web-text pipelines: crawled pages mix composed and decomposed
forms of the same grapheme (``e`` + U+0301 vs ``é``), which breaks
exact dedup, token counting, and vocabulary statistics downstream.
Spark has no built-in normalizer, so this is one of the declared
Python kernels (like the parse kernel) — an Arrow-batched pandas UDF,
never per-row ``F.udf``.

Scale discipline: the kernel's hot path costs ONE C-level call per
document — ``str.isascii()`` (true for the vast majority of
post-extraction web text) short-circuits to identity, and
``unicodedata.is_normalized("NFC", t)`` (a quick-check pass, no
allocation for already-composed text) catches most of the rest; only
genuinely decomposed documents pay the normalize+realloc. The
operator is a narrow map — zero shuffle, zero skew surface.

Oracle twin: DuckDB ``nfc_normalize`` (utf8proc) — both sides
implement UAX #15, so composed output is bit-identical for any
corpus whose code points both Unicode tables know.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf


def _nfc_batch(col: pd.Series) -> pd.Series:
    def one(t):
        if t is None or t.isascii() or unicodedata.is_normalized("NFC", t):
            return t
        return unicodedata.normalize("NFC", t)
    return col.map(one)


def normalize_text(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, norm_text, changed): NFC-normalize ``text_col``.
    ``changed`` flags documents the pass actually rewrote — the audit
    counter a pipeline logs per partition."""
    # created lazily: pandas_udf parses its DDL type against the
    # ACTIVE session, so a module-level decorator would break import
    # before any SparkSession exists (spark-submit --py-files order)
    nfc = pandas_udf(_nfc_batch, "string")
    norm = nfc(F.col(text_col))
    # coalesce: a NULL-text doc was not rewritten — changed must be
    # False, not NULL, or audit counts won't sum to the doc count
    return docs.select(
        "doc_id",
        norm.alias("norm_text"),
        F.coalesce(norm != F.col(text_col), F.lit(False))
        .alias("changed"))
