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


def hyperplanes(dim: int, n_planes: int, table: int = 0
                ) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes: component (t, p, d) is
    an md5-derived value in [-0.5, 0.5). Reproducible across runs —
    no RNG state to ship to executors."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            v = int(hashlib.md5(f"plane:{table}:{p}:{d}".encode())
                    .hexdigest()[:8], 16)
            row.append(v / float(1 << 32) - 0.5)
        planes.append(row)
    return planes


def _bucket_expr(vec_col: str, dim: int, n_planes: int, table: int):
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    bucket = F.lit(0)
    for p, plane in enumerate(hyperplanes(dim, n_planes, table)):
        arr = F.array(*[F.lit(c) for c in plane])
        bucket = bucket + F.when(_dot(arr, v) > 0,
                                 F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def bucket_keys(emb: DataFrame, dim: int, n_planes: int = 4,
                n_tables: int = 8, vec_col: str = "embedding") -> DataFrame:
    """Multi-table LSH keys: one (table, bucket) row per input row per
    table. Pure Catalyst arithmetic (the sign-sketch dot products are
    unrolled into codegen'd expressions); the explode is JVM-side."""
    keys = F.array(*[
        F.struct(F.lit(t).alias("table"),
                 _bucket_expr(vec_col, dim, n_planes, t).alias("bucket"))
        for t in range(n_tables)])
    return (emb.withColumn("_k", F.explode(keys))
            .withColumn("table", F.col("_k.table"))
            .withColumn("bucket", F.col("_k.bucket"))
            .drop("_k"))


def embedding_near_dup_pairs(emb: DataFrame, dim: int,
                             threshold: float = 0.85,
                             n_planes: int = 4, n_tables: int = 8,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-bucketed (the
    training-data dedup shape): candidates = pairs sharing any
    (table, bucket) under the deterministic hyperplane sketches — an
    equi-join keyed on the bucket, never a cartesian — then an exact
    cosine filter at ``threshold``. Semantics are deliberately
    "LSH-candidate near-dups": the OR-construction over ``n_tables``
    tables bounds the missed-pair rate, and because the hyperplanes are
    md5-deterministic the full result (candidates AND cosines) is
    closed-form for the oracle. Returns (id_a, id_b, cosine_r4)."""
    keyed = bucket_keys(emb, dim, n_planes, n_tables, vec_col) \
        .select(id_col, "table", "bucket")
    a = keyed.select(F.col(id_col).alias("id_a"), "table", "bucket")
    b = keyed.select(F.col(id_col).alias("id_b"), "table", "bucket")
    # candidates carry ids only — the distinct shuffles 16-byte rows,
    # not 2×dim float payloads; vectors rejoin afterwards keyed on id
    # (bucketable/co-locatable with the stored embedding table at
    # 10^12 rows)
    cand = (a.join(b, ["table", "bucket"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct())
    ea = emb.select(F.col(id_col).alias("id_a"),
                    F.col(vec_col).alias("va"))
    eb = emb.select(F.col(id_col).alias("id_b"),
                    F.col(vec_col).alias("vb"))
    scored = with_cosine(cand.join(ea, "id_a").join(eb, "id_b"),
                         "va", "vb")
    return (scored.filter(F.col("cosine") >= threshold)
            .select("id_a", "id_b",
                    F.round("cosine", 4).alias("cosine_r4")))


def ivf_train(emb: DataFrame, k: int = 8, iters: int = 2,
              id_col: str = "vec_id", vec_col: str = "embedding"
              ) -> list[list[float]]:
    """Train IVF centroids with Lloyd's algorithm, all Spark-side.

    - deterministic init: the vectors of the ``k`` smallest ids;
    - assignment: argmin over unrolled per-centroid distance
      expressions (Catalyst, no UDF);
    - update: posexplode → groupBy(cluster, dim) → avg — one small
      map-side-combined shuffle per iteration; only the k×dim centroid
      matrix ever reaches the driver (the standard iterative-ML loop
      shape — same as MLlib KMeans).
    """
    cents = [
        [float(x) for x in r[vec_col]]
        for r in (emb.orderBy(id_col).limit(k).select(vec_col).collect())
    ]
    for _ in range(iters):
        assigned = ivf_assign(emb, cents, vec_col)
        rows = (assigned
                .select("cluster", F.posexplode(
                    F.transform(F.col(vec_col), lambda x: x.cast("double")))
                    .alias("pos", "val"))
                .groupBy("cluster", "pos")
                .agg(F.avg("val").alias("m"))
                .collect())
        new = {(r["cluster"], r["pos"]): r["m"] for r in rows}
        cents = [
            [new.get((c, d), cents[c][d]) for d in range(len(cents[c]))]
            for c in range(k)]
    return cents


def ivf_assign(emb: DataFrame, centroids: list[list[float]],
               vec_col: str = "embedding") -> DataFrame:
    """Add a ``cluster`` column: nearest centroid by squared L2 —
    argmin(|c|² − 2·x·c) unrolled into one Catalyst expression."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    scored = []
    for ci, c in enumerate(centroids):
        arr = F.array(*[F.lit(x) for x in c])
        norm2 = sum(x * x for x in c)
        scored.append(F.struct(
            (F.lit(norm2) - 2.0 * _dot(arr, v)).alias("d"),
            F.lit(ci).alias("c")))
    return emb.withColumn("cluster", F.array_min(F.array(*scored))["c"])


def ivf_topk(emb: DataFrame, query_ids: list[int], k: int = 5,
             n_clusters: int = 8, nprobe: int = 2, iters: int = 2,
             id_col: str = "vec_id", vec_col: str = "embedding"
             ) -> DataFrame:
    """IVF ANN top-k: train/assign coarse clusters, probe each query's
    ``nprobe`` nearest clusters only, exact cosine rerank inside them.
    At 10^12 vectors ``cluster`` is the partition key of the stored
    index (Iceberg partition column) so a probe touches nprobe/k of the
    corpus. Returns (q_id, neighbor_id, rank, cosine_r4)."""
    cents = ivf_train(emb, n_clusters, iters, id_col, vec_col)
    corpus = ivf_assign(emb, cents, vec_col)
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    dists = F.array(*[
        F.struct((F.lit(sum(x * x for x in c))
                  - 2.0 * _dot(F.array(*[F.lit(x) for x in c]), v))
                 .alias("d"), F.lit(ci).alias("c"))
        for ci, c in enumerate(cents)])
    probes = F.slice(F.array_sort(dists), 1, nprobe)
    q = (emb.filter(F.col(id_col).isin(query_ids))
         .select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("qvec"),
                 F.explode(F.transform(probes, lambda s: s["c"]))
                 .alias("q_cluster")))
    cand = corpus.join(
        F.broadcast(q),
        (F.col("cluster") == F.col("q_cluster"))
        & (F.col(id_col) != F.col("q_id")))
    scored = with_cosine(cand, "qvec", vec_col)
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(),
                                           F.col(id_col).asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("q_id", F.col(id_col).alias("neighbor_id"),
                    "rank", F.round("cosine", 4).alias("cosine_r4")))


def hyperplane_lsh_topk(emb: DataFrame, query_ids: list[int], dim: int,
                        k: int = 5, n_planes: int = 4, n_tables: int = 8,
                        id_col: str = "vec_id", vec_col: str = "embedding"
                        ) -> DataFrame:
    """ANN top-k via multi-table random-hyperplane LSH.

    Candidates = rows sharing any (table, bucket) with the query
    (classic L-table OR-construction — recall compounds across tables),
    then an **exact** cosine rerank on the deduped candidate set. Tuning
    trade: more planes/table → smaller buckets (cheaper rerank, lower
    per-table recall); more tables → higher recall, more shuffle rows.
    At 10^12 vectors (table, bucket) is the shuffle key and queries stay
    broadcast. Recall vs ``cosine_topk`` is pinned in tests.
    Returns (q_id, neighbor_id, rank, cosine_r4)."""
    keyed = bucket_keys(emb, dim, n_planes, n_tables, vec_col)
    q = (keyed.filter(F.col(id_col).isin(query_ids))
         .select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("qvec"),
                 F.col("table").alias("q_table"),
                 F.col("bucket").alias("q_bucket")))
    cand = (keyed.join(
        F.broadcast(q),
        (F.col("table") == F.col("q_table"))
        & (F.col("bucket") == F.col("q_bucket"))
        & (F.col(id_col) != F.col("q_id")))
        .select("q_id", "qvec", F.col(id_col), F.col(vec_col))
        .dropDuplicates(["q_id", id_col]))
    scored = with_cosine(cand, "qvec", vec_col)
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(),
                                           F.col(id_col).asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("q_id", F.col(id_col).alias("neighbor_id"),
                    "rank", F.round("cosine", 4).alias("cosine_r4")))
