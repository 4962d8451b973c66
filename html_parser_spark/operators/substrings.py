"""Exact duplicated-substring removal (suffix-array dedup stand-in).

Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
Better") remove every substring of ≥50 tokens that occurs twice
anywhere in the corpus, via a giant suffix array. The distributed
equivalent used here: a position-tracked k-token shingle index —
a substring of ≥k tokens occurs twice iff all of its length-k windows
do, so marking every k-shingle whose hash occurs ≥2 times (within OR
across docs) and removing covered tokens deletes the same content with
shingle-boundary granularity (up to k-1 boundary tokens of slack per
span — the standard trade for making the problem embarrassingly
groupable).

Plan shape at 100 TB:

- Shingle construction is the O(len) zip_with chain (shared with
  dedup.word_shingles), hashed per position to 60-bit md5 ints —
  zero shuffle, whole-stage codegen.
- The global index is ONE exchange of (hash, doc_id, pos) rows —
  ~16 bytes × total corpus tokens, i.e. cheaper than shuffling the
  text itself — with map-side partial counts; duplicated hashes are a
  tiny filtered subset joined back on the same hash partitioning.
- Matched starts re-group per doc (second exchange, doc_id keys) and
  token coverage is a per-row HOF: token i is covered iff some
  matched start lies in [i-k+1, i]. ``max_matches_per_doc`` caps the
  per-row work (O(n_tokens × cap)); a pathological self-repeating doc
  keeps its first ``cap`` duplicated spans and the counters report
  the uncapped total, so nothing is silently hidden.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def substring_dedup(docs: DataFrame, k: int = 8,
                    max_matches_per_doc: int = 256) -> DataFrame:
    """(doc_id, n_matched_starts, n_dup_tokens, clean_text):
    ``clean_text`` is the document with every token covered by a
    corpus-duplicated k-token window removed; counters are exact and
    uncapped (coverage uses the first ``max_matches_per_doc`` starts
    — see module doc)."""
    w = F.split(F.col("text"), " ")
    cnt = F.size(w) - (k - 1)
    g = F.slice(w, 1, cnt)
    for i in range(2, k + 1):
        g = F.zip_with(g, F.slice(w, i, cnt),
                       lambda a, b: F.concat_ws(" ", a, b))
    grams = F.when(F.size(w) >= k, g).otherwise(
        F.expr("array()").cast("array<string>"))
    hashes = F.transform(
        grams, lambda s: F.conv(F.substring(F.md5(s.cast("binary")),
                                            1, 15), 16, 10).cast("long"))

    pos = (docs.select("doc_id", F.posexplode(hashes)
                       .alias("pos", "h")))
    dup = (pos.groupBy("h")
           .agg(F.count("*").alias("cnt"))
           .where(F.col("cnt") >= 2)
           .select("h"))
    matched = pos.join(dup, "h").select("doc_id", "pos")
    starts = (matched.groupBy("doc_id")
              .agg(F.slice(F.array_sort(F.collect_list("pos")), 1,
                           max_matches_per_doc).alias("starts"),
                   F.count("*").cast("long").alias("n_matched_starts")))

    out = docs.join(starts, "doc_id", "left")
    st = F.coalesce(F.col("starts"),
                    F.expr("array()").cast("array<int>"))
    kept = F.filter(
        F.split(F.col("text"), " "),
        lambda t, i: ~F.exists(
            st, lambda s: (s <= i) & (i < s + F.lit(k))))
    return out.select(
        "doc_id",
        F.coalesce("n_matched_starts", F.lit(0).cast("long"))
        .alias("n_matched_starts"),
        (F.size(F.split(F.col("text"), " ")) - F.size(kept))
        .cast("long").alias("n_dup_tokens"),
        F.array_join(kept, " ").alias("clean_text"))
