"""Fixed-window document chunking (training context windows).

Tokenized pretraining corpora are consumed as fixed-length sequences;
the standard preprocessing step slices each document into windows of
``window`` tokens advancing by ``window - overlap`` (the overlap keeps
context across boundaries for embedding / retrieval chunking). This is
pure Catalyst — ``split`` → ``sequence`` of window starts → ``slice``
per start → ``explode`` — a narrow map + generate, NO shuffle and no
Python: chunking 100 TB is exactly one pass over the scan.

Row-count math: a doc with n tokens emits ceil'(n / step) chunks
(starts 0, step, 2·step, … < n), so output rows ≈ input × (1 +
overlap/window) — bounded fan-out, no skew amplification (a giant doc
fans into proportionally many *narrow* rows; downstream per-chunk work
rebalances across executors better than the unsplit giant did —
chunking IS the skew fix for per-token downstream stages).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def chunk_documents(docs: DataFrame, window: int = 128,
                    overlap: int = 32) -> DataFrame:
    """(doc_id, chunk_id, chunk, n_chunk_tokens) — whitespace-token
    windows of ``window`` tokens every ``window - overlap`` tokens.
    Docs whose text splits to zero tokens emit nothing (the split of
    an empty string is [''] — one token — so only NULL text drops).

    Window starts stop at ``n - 1 - overlap`` (not ``n - 1``): a later
    start would emit a tail chunk that is a pure subset of its
    predecessor — every token already present — which for training
    data is systematic duplication. The cap guarantees each chunk
    after the first contributes at least one new token."""
    if not 0 <= overlap < window:
        raise ValueError("need 0 <= overlap < window")
    step = window - overlap
    toks = F.split(F.col("text"), " ")
    return (docs
            .select("doc_id", toks.alias("toks"), F.size(toks).alias("n"))
            .where(F.col("n") > 0)
            .select("doc_id",
                    F.posexplode(
                        F.transform(
                            F.sequence(F.lit(0),
                                       F.greatest(
                                           F.col("n") - 1 - overlap,
                                           F.lit(0)),
                                       F.lit(step)),
                            lambda s: F.slice(F.col("toks"), s + 1,
                                              F.lit(window))))
                    .alias("chunk_id", "c"))
            .select("doc_id",
                    F.col("chunk_id").cast("long").alias("chunk_id"),
                    F.array_join("c", " ").alias("chunk"),
                    F.size("c").cast("long").alias("n_chunk_tokens")))
