"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k — **broadcast** the (small)
  query set against the full corpus; dot products via Catalyst
  higher-order functions (zip_with + aggregate), entirely JVM-side.
  This is the correctness baseline and is already the right plan when
  |queries| is small: one broadcast, zero shuffles on the corpus side,
  then a per-query top-k window.
- ``hyperplane_lsh_topk``: the scale path — random-hyperplane sign
  sketches bucket the corpus (deterministic hyperplanes derived from
  md5, no RNG); candidates = same-bucket rows (plus optional multi-probe
  neighbors), exact rerank inside buckets only. At 10^12 vectors the
  bucket id becomes the shuffle/partition key and the broadcast is per
  bucket.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.hashing import SIMHASH_BITS  # noqa: F401  (doc parity)


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, x: acc + x))


def with_cosine(pairs: DataFrame, a_col: str = "qvec",
                b_col: str = "embedding") -> DataFrame:
    a = F.transform(F.col(a_col), lambda x: x.cast("double"))
    b = F.transform(F.col(b_col), lambda x: x.cast("double"))
    return pairs.withColumn("cosine", _dot(a, b) / (_norm(a) * _norm(b)))


def cosine_topk(emb: DataFrame, query_ids: list[int], k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding"
                ) -> DataFrame:
    """Exact top-k cosine neighbors for each query id (excluding self).
    Returns (q_id, neighbor_id, rank, cosine)."""
    q = (emb.filter(F.col(id_col).isin(query_ids))
         .select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("qvec")))
    joined = emb.join(F.broadcast(q), F.col(id_col) != F.col("q_id"))
    scored = with_cosine(joined, "qvec", vec_col)
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(),
                                           F.col(id_col).asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("q_id", F.col(id_col).alias("neighbor_id"),
                    "rank", F.round("cosine", 4).alias("cosine_r4")))


def hyperplanes(dim: int, n_planes: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes: component (p, d) is an
    md5-derived value in [-0.5, 0.5). Reproducible across runs/engines."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            v = int(hashlib.md5(f"plane:{p}:{d}".encode()).hexdigest()[:8],
                    16)
            row.append(v / float(1 << 32) - 0.5)
        planes.append(row)
    return planes


def bucket_ids(emb: DataFrame, dim: int, n_planes: int = 8,
               vec_col: str = "embedding") -> DataFrame:
    """Add an LSH ``bucket`` column: sign bits against n_planes fixed
    hyperplanes, packed into an int. Pure Catalyst arithmetic."""
    planes = hyperplanes(dim, n_planes)
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    bucket = F.lit(0)
    for p, plane in enumerate(planes):
        arr = F.array(*[F.lit(c) for c in plane])
        dp = _dot(arr, v)
        bucket = bucket + F.when(dp > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return emb.withColumn("bucket", bucket)


def hyperplane_lsh_topk(emb: DataFrame, query_ids: list[int], dim: int,
                        k: int = 5, n_planes: int = 6,
                        id_col: str = "vec_id", vec_col: str = "embedding"
                        ) -> DataFrame:
    """ANN top-k: candidates restricted to the query's LSH bucket, exact
    cosine rerank inside it. Recall is measured in tests against
    ``cosine_topk``. Returns (q_id, neighbor_id, rank, cosine_r4)."""
    bucketed = bucket_ids(emb, dim, n_planes, vec_col)
    q = (bucketed.filter(F.col(id_col).isin(query_ids))
         .select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("qvec"),
                 F.col("bucket").alias("q_bucket")))
    joined = bucketed.join(
        F.broadcast(q),
        (F.col("bucket") == F.col("q_bucket")) & (F.col(id_col) != F.col("q_id")))
    scored = with_cosine(joined, "qvec", vec_col)
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(),
                                           F.col(id_col).asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("q_id", F.col(id_col).alias("neighbor_id"),
                    "rank", F.round("cosine", 4).alias("cosine_r4")))
