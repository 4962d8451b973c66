"""Host-level PageRank over the link graph (crawl-quality signal).

Pretraining curation uses link-graph centrality as a document-quality
prior (OpenWebText's karma filter, Common-Crawl-derived host ranks);
this operator computes weighted PageRank over the
``links.host_graph`` edge list with a fixed iteration count.

**Integer fixed-point, deliberately.** Ranks are parts-per-million
integers and every update is integer arithmetic::

    contrib(u→v) = (r_u * w_uv) // W_u          (W_u = total out-weight)
    r'_v         = (SCALE - d) + (d * Σ contrib) // SCALE

Integer sums are associative-and-commutative EXACTLY, so the result is
bit-identical regardless of partitioning, join order, or executor
count — a float formulation would drift under Spark's nondeterministic
aggregation order and could never be value-oracled (or audited across
reruns at 100 TB). Floor-division mass loss is ≤ 1 ppm per edge per
iteration — irrelevant for a quality *ranking*.

Dangling hosts (no out-edges) keep receiving rank but their mass exits
the system (the standard simplification; a teleport-redistribution
term would add one extra agg per iteration with the same plan shape).

Scale notes (10^8+ hosts):

- ranks/edges join on ``src_host`` both sides — hash partitioning is
  reused across iterations (same key), so each round is one shuffle of
  the (narrow) rank table plus one map-side-combined agg; the edge
  list itself stays put.
- ``localCheckpoint`` per round cuts the growing-lineage plan (same
  discipline as operators/clusters.py).
- Hub hosts (wikipedia.org's in-degree) are exactly the AQE skew-agg
  case: partial aggregation bounds any one task's work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SCALE = 1_000_000  # ppm fixed point


def host_rank(edges: DataFrame, iters: int = 10,
              damping_ppm: int = 850_000) -> DataFrame:
    """edges(src_host, dst_host, n_links) -> (host, rank_ppm) after
    ``iters`` synchronous power iterations from a uniform start.
    ``rank_ppm`` is exact (integer fixed point — see module doc)."""
    # materialize the (narrow) edge list ONCE before iterating — every
    # round references it, and without the cut each lazy-checkpointed
    # round would recompute the upstream graph (e.g. a full re-parse
    # when the edges come straight off extract_links)
    edges = edges.localCheckpoint(eager=True)
    nodes = (edges.select(F.col("src_host").alias("host"))
             .unionByName(edges.select(F.col("dst_host").alias("host")))
             .distinct())
    out_w = edges.groupBy("src_host").agg(
        F.sum("n_links").cast("long").alias("out_w"))
    e = edges.join(out_w, "src_host").select(
        "src_host", "dst_host",
        F.col("n_links").cast("long").alias("w"), "out_w")

    base = SCALE - damping_ppm
    ranks = nodes.withColumn("rank_ppm", F.lit(SCALE).cast("long"))
    for _ in range(iters):
        # integer DIV (not `/`, which routes through DOUBLE) keeps every
        # step exact. (rank_ppm*w) DIV out_w is rearranged through the
        # exact identity r*w DIV o = (r DIV o)*w + ((r%o)*w) DIV o so no
        # intermediate exceeds max(rank_ppm, out_w²); exact-arithmetic
        # safety therefore needs per-host out-weight < ~3×10^9
        # (sqrt(2^63)) — beyond that, pre-scale edge weights by 2^k
        # (documented contract; ratios preserved, still deterministic)
        contrib = (e.join(ranks.withColumnRenamed("host", "src_host"),
                          "src_host")
                   .select("dst_host",
                           F.expr("(rank_ppm DIV out_w) * w + "
                                  "((rank_ppm % out_w) * w) DIV out_w")
                           .alias("c")))
        summed = contrib.groupBy("dst_host").agg(
            F.sum("c").cast("long").alias("s"))
        # (d*s) DIV SCALE would overflow int64 once >~10^7 hosts' worth
        # of rank mass lands on one hub (wikipedia-style in-degree); the
        # exact identity d*(s DIV SCALE) + (d*(s%SCALE)) DIV SCALE keeps
        # every intermediate below s itself — safe until total graph
        # mass alone overflows (~10^13 hosts)
        upd = (f"{base}L + {damping_ppm}L * (coalesce(s, 0L) DIV {SCALE}L)"
               f" + ({damping_ppm}L * (coalesce(s, 0L) % {SCALE}L))"
               f" DIV {SCALE}L")
        ranks = (nodes.join(summed,
                            nodes.host == summed.dst_host, "left")
                 .select("host",
                         F.expr(upd).cast("long").alias("rank_ppm"))
                 .localCheckpoint(eager=False))
    return ranks
