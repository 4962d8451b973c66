"""Duplicate-cluster resolution — connected components over near-dup
pairs.

The pair generators (``dedup.jaccard_pairs``, ``minhash_band_pairs``,
``simhash_pairs``) emit *edges*; a pipeline must resolve them into
*clusters* and keep exactly one document per cluster — transitivity
matters (A~B, B~C ⇒ {A,B,C} is one group even when A≁C directly), so
"keep min(doc_a, doc_b) per pair" over-deletes. This module is that
resolution step: distributed connected components with the canonical
min-label convention (cluster id = smallest doc_id in the component,
which is also the kept representative).

Algorithm: iterative min-label propagation —
``label(v) ← min(label(v), min over neighbors u of label(u))`` until a
fixpoint. Each round is one equi-join of the (symmetrized, distinct)
edge list against the label table plus one groupBy — two exchanges,
both on doc_id keys, partitioning reused round-to-round by AQE. Rounds
= component diameter; near-dup graphs are star-shaped (a template hub
plus leaves), so 2-4 rounds in practice. ``localCheckpoint`` after
every round cuts the lineage chain — the classic failure mode of
iterative DataFrame jobs (plan grows each round until the optimizer
chokes) — and makes the per-round convergence count cheap. For
adversarial chain-shaped graphs the alternating large-star/small-star
rewrite (Kiveris et al., "Connected Components in MapReduce", SoCC'14)
drops rounds to O(log n) with the same per-round join shape; the
min-label loop here is the right default at the cluster shapes dedup
actually produces.

The DuckDB oracle computes the same fixpoint independently via a
recursive-CTE transitive closure (min reachable vertex) — a different
algorithm entirely, so parity pins semantics, not implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(pairs: DataFrame, src: str = "doc_a",
                         dst: str = "doc_b", max_iter: int = 25
                         ) -> DataFrame:
    """(doc_id, cluster_id): min-label connected components over an
    undirected pair list. Raises if the fixpoint is not reached within
    ``max_iter`` rounds (diameter bound exceeded — switch to
    large-star/small-star before raising the cap)."""
    e = pairs.select(F.col(src).cast("long").alias("u"),
                     F.col(dst).cast("long").alias("v"))
    # materialize the symmetrized edge list ONCE — it is re-joined every
    # propagation round, and without the checkpoint each round would
    # re-run the (possibly expensive) upstream pair generation
    sym = (e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
           .distinct().localCheckpoint())
    lab = (sym.groupBy("u")
           .agg(F.least(F.col("u"), F.min("v")).alias("lab"))
           .localCheckpoint())
    for _ in range(max_iter):
        nb = (sym.join(lab.select(F.col("u").alias("v"),
                                  F.col("lab").alias("vlab")), "v")
              .groupBy("u").agg(F.min("vlab").alias("nlab")))
        new = (lab.join(nb, "u")
               .select("u", F.col("lab").alias("old"),
                       F.least("lab", "nlab").alias("lab"))
               .localCheckpoint())
        changed = new.filter(F.col("lab") != F.col("old")).count()
        lab = new.select("u", "lab")
        if changed == 0:
            return lab.select(F.col("u").alias("doc_id"),
                              F.col("lab").cast("long").alias("cluster_id"))
    raise RuntimeError(
        f"connected_components: no fixpoint in {max_iter} rounds")


def dedup_clusters(pairs: DataFrame, src: str = "doc_a",
                   dst: str = "doc_b") -> DataFrame:
    """Resolve near-dup pairs into keep/drop decisions:
    (doc_id, cluster_id, cluster_size, is_kept) for every document that
    appears in at least one pair. ``is_kept`` marks the cluster's
    min-id representative; the training-set filter is an anti-join of
    the corpus against the ``is_kept = false`` rows."""
    lab = connected_components(pairs, src, dst)
    sizes = (lab.groupBy("cluster_id")
             .agg(F.count("*").cast("long").alias("cluster_size")))
    return (lab.join(sizes, "cluster_id")
            .select("doc_id", "cluster_id", "cluster_size",
                    (F.col("doc_id") == F.col("cluster_id"))
                    .alias("is_kept")))
