"""Text analysis operators for training-data curation, all pure
Catalyst expressions (whole-stage codegen; zero Python in the hot path)
with exact DuckDB-oracle twins.

- token counting (whitespace tokenizer; a BPE-ish sub-token estimate)
- quality scoring (length / mean token length / stopword ratio)
- language ID (stopword-hit heuristic — n-gram-free variant that is
  expressible identically in SQL; a real model would slot in as a
  pandas UDF scorer)
- document fingerprinting (normalized md5; rolling/content-defined
  chunking would extend this for partial-dup detection)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

STOPWORDS = ("a", "the", "of", "and", "to", "in", "is")
LANG_EN_THRESHOLD_PCT = 5  # ≥5% stopword tokens → 'en'


def token_stats(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_chars, avg_token_len, stopword_pct,
    n_subtokens) — integer/exact-ratio quality features."""
    w = F.split(F.col("text"), " ")
    n_tokens = F.size(w)
    n_chars = F.length("text")
    sw = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(w, lambda t: F.array_contains(sw, t)))
    # BPE-ish estimate: ceil(token_len / 4) summed — integer arithmetic
    n_sub = F.aggregate(w, F.lit(0),
                        lambda acc, t: acc + F.floor((F.length(t) + 3) / 4)
                        .cast("int"))
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_chars.alias("n_chars"),
        F.round((n_chars - (n_tokens - 1)) / n_tokens, 6)
        .alias("avg_token_len"),
        (100 * n_stop).alias("stop_x100"),
        n_sub.alias("n_subtokens"))


def lang_id(docs: DataFrame) -> DataFrame:
    """(doc_id, lang_pred): 'en' if stopword tokens ≥ threshold% else
    'unk'. Integer comparison form keeps it oracle-exact."""
    w = F.split(F.col("text"), " ")
    sw = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(w, lambda t: F.array_contains(sw, t)))
    pred = F.when(100 * n_stop >= LANG_EN_THRESHOLD_PCT * F.size(w),
                  F.lit("en")).otherwise(F.lit("unk"))
    return docs.select("doc_id", pred.alias("lang_pred"))


def fingerprint(docs: DataFrame) -> DataFrame:
    """(doc_id, fp): md5 of whitespace-normalized text."""
    norm = F.regexp_replace(F.trim(F.col("text")), " +", " ")
    return docs.select("doc_id",
                       F.md5(norm.cast("binary")).alias("fp"))
