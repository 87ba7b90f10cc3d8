"""Similarity search over embedding columns (``array<float>``).

Two paths, mirroring what a 100 TB corpus needs:

- ``ann_topk_bruteforce``: exact top-k. The *query* side is broadcast
  (queries are small by definition); the corpus is never shuffled — each
  scan partition scores its rows against the broadcast queries and a
  window top-k reduces. Cost: one corpus scan per query batch. This is
  the correctness oracle and is the right plan whenever |queries| is
  small, even at full scale.

- ``lsh_bucket_ann``: random-hyperplane (SimHash-for-vectors) LSH. Corpus
  rows hash to sign-pattern buckets once (a cheap map-side pass that can
  be precomputed/persisted); queries probe only matching buckets via an
  equi-join on the bucket key, then exact-rerank inside the bucket. At
  scale this replaces the corpus-wide scan with a bucket-local one
  (recall < 1, tunable via ``num_planes``/multi-probe).

All vector math is Catalyst higher-order functions — no Python UDFs.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vector import cosine_similarity, dot, l2_normalize
from .core import ensure_parallelism


def ann_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    include_self: bool = False,
) -> DataFrame:
    """Exact cosine top-k: broadcast queries x corpus, window top-k.

    Returns ``(query_id, neighbor_id, cosine)`` with deterministic
    tie-breaking on neighbor id.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), l2_normalize(vec_col).alias("__qv")
    )
    c = ensure_parallelism(corpus).select(
        F.col(id_col).alias("neighbor_id"), l2_normalize(vec_col).alias("__cv")
    )
    pairs = c.crossJoin(F.broadcast(q))
    if not include_self:
        pairs = pairs.filter(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id", "neighbor_id", dot("__qv", "__cv").alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def random_hyperplanes(dim: int, num_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic unit hyperplanes (seeded PRNG, embedded as literals)."""
    rng = random.Random(seed)
    planes = []
    for _ in range(num_planes):
        v = [rng.gauss(0.0, 1.0) for _ in range(dim)]
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        planes.append([x / n for x in v])
    return planes


def _bucket_col(vec_col, planes: list[list[float]]):
    """Sign-pattern bucket id of a vector against fixed hyperplanes."""
    bucket = F.lit(0).cast("bigint")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(dot(vec_col, plane) >= 0, F.lit(2**i)).otherwise(F.lit(0))
        bucket = bucket + bit
    return bucket


def lsh_bucket_ann(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    num_planes: int = 6,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k via random-hyperplane bucketing.

    Equi-join on the bucket id (plus same-bucket exact rerank); recall
    depends on ``num_planes`` (fewer planes -> bigger buckets -> higher
    recall, more compute). Returns ``(query_id, neighbor_id, cosine)``.
    """
    dim = 64  # fixture embedding dim; planes are generated per call anyway
    first = corpus.select(F.size(vec_col).alias("d")).first()
    if first is not None:
        dim = first["d"]
    planes = random_hyperplanes(dim, num_planes, seed)
    c = ensure_parallelism(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        _bucket_col(F.col(vec_col), planes).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        _bucket_col(F.col(vec_col), planes).alias("bucket"),
    )
    pairs = c.join(F.broadcast(q), "bucket").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        cosine_similarity("__qv", "__cv").alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )
