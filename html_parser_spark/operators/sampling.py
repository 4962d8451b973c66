"""Sampling operators — crawl-diversity caps and data-mixing rates.

Web corpora are violently skewed by host: a handful of domains
(wikis, forums, mirrors) contribute most of the raw pages, and every
production pretraining pipeline caps documents per site before
training. This module is that operator, built skew-safe:

``quota_sample(df, key, cap, order_col)`` keeps the first ``cap`` rows
per key in ``order_col`` order (deterministic — re-running a crawl
yields the same sample). The naive plan is a single
``row_number() OVER (PARTITION BY key)`` window, which routes EVERY
row of a hot domain through one task — exactly the skew that kills a
100 TB run. Instead:

  phase 1 (salted pre-cap): window over ``(key, salt)`` where salt =
      ``hash(order_col) % n_salt`` keeps the first ``cap`` rows per
      salt bucket — per-task row count is bounded by the bucket, and
      a hot key's rows spread over ``n_salt`` tasks;
  phase 2 (exact): a second window over ``key`` alone ranks the
      surviving ≤ ``cap × n_salt`` rows per key and keeps ``cap``.

Phase 1 is a strict superset of the final answer (the global first
``cap`` rows per key are, per salt bucket, within that bucket's first
``cap``), so the result is EXACTLY the naive window's — pinned by the
oracle — while the shuffle skew is bounded by cap × n_salt per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# host + first path segment of the synthetic crawl urls
# (https://example.org/<source>/docNNNNNNNN.html) — at real-crawl scale
# this would be the registrable domain from a public-suffix split
SITE_RE = r"^https?://[^/]+/([^/]+)/"


def site_of(url_col: str = "url"):
    """Grouping key for the quota: the crawl-source path segment."""
    return F.regexp_extract(F.col(url_col), SITE_RE, 1)


def quota_sample(df: DataFrame, key: str, cap: int,
                 order_col: str, n_salt: int = 16) -> DataFrame:
    """First ``cap`` rows per ``key`` by ``order_col``, skew-safe.
    Output: the surviving rows plus ``rk`` (1-based rank within key)."""
    salt = F.pmod(F.hash(F.col(order_col)), F.lit(n_salt))
    w1 = (Window.partitionBy(F.col(key), salt)
          .orderBy(F.col(order_col)))
    pre = (df.withColumn("_pre_rk", F.row_number().over(w1))
           .filter(F.col("_pre_rk") <= cap)
           .drop("_pre_rk"))
    w2 = Window.partitionBy(F.col(key)).orderBy(F.col(order_col))
    return (pre.withColumn("rk", F.row_number().over(w2).cast("long"))
            .filter(F.col("rk") <= cap))


SAMPLE_PPM_MOD = 1_000_000


def stratified_sample(df: DataFrame, stratum_col: str,
                      rates_ppm: dict[str, int], default_ppm: int,
                      key_col: str = "doc_id",
                      salt: str = "smp") -> DataFrame:
    """Deterministic per-stratum downsampling — the data-mixing step
    that turns a curated pool into a training mix ("keep 80% of en,
    50% of zh, 25% of the rest").

    Each row draws a uniform integer in [0, 1e6) from the md5 of its
    key (``functions.hashing`` base hash, salted so the draw is
    independent of every other md5 use in the pipeline) and survives
    iff it falls below its stratum's parts-per-million rate. Pure
    narrow filter: ZERO shuffle, no RNG state, reproducible across
    runs/retries/cluster sizes — resubmitting a failed 100 TB job
    yields byte-identical samples, and upping a rate strictly grows
    the sample (nested samples, the property ad-hoc ``rand()``
    sampling loses). Appends ``u_ppm`` (the draw) for auditability."""
    from ..functions.hashing import spark_base_hash

    u = F.pmod(
        F.expr(spark_base_hash(
            f"concat('{salt}:', cast({key_col} as string))")),
        F.lit(SAMPLE_PPM_MOD))
    rate = F.lit(default_ppm)
    for k, v in sorted(rates_ppm.items()):
        rate = F.when(F.col(stratum_col) == k, F.lit(v)).otherwise(rate)
    return (df.withColumn("u_ppm", u.cast("long"))
            .filter(F.col("u_ppm") < rate))
