"""Similarity search over an embedding column (``array<float>``).

Baseline: brute-force cosine top-k — a broadcast of the (tiny) query vector
against a fully-parallel per-row dot product; at 100 TB this is a single
scan with no shuffle except the final top-k (rdd-free ``orderBy(...).limit(k)``
which Spark executes as TakeOrderedAndProject — partial top-k per partition,
only k rows per partition reach the driver-side merge).

Scale path: LSH bucketing (random-hyperplane signs) so candidate pairs join
on a bucket key — the same join-shape trick as minhash-LSH dedup; and an
IVF-style coarse quantizer (assign to nearest of C centroids, search only
matching cells).

All vector math is built-in higher-order functions (``zip_with`` /
``aggregate``) — JVM-side, no Python UDF.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    emb: DataFrame,
    query_vec: Sequence[float],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k for one query vector.

    The query is inlined as a literal array (it would be a broadcast var on
    a cluster — either way it never shuffles); TakeOrderedAndProject keeps
    the top-k distributed until the final k-row merge.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = emb.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col).cast("array<double>"), q), 6).alias("cos_sim"),
    )
    return scored.orderBy(F.desc("cos_sim"), F.col(id_col)).limit(k)


def random_hyperplane_buckets(
    emb: DataFrame,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """LSH scale path: sign-pattern bucket id per vector (random-hyperplane
    cosine LSH). Deterministic pseudo-random planes from an i-indexed LCG so
    tests are reproducible without RNG in the plan."""
    planes = []
    state = 0x9E3779B97F4A7C15
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            row.append(((state >> 33) / float(1 << 31)) - 1.0)  # ~U[-1,1)
        planes.append(row)
    v = F.col(vec_col).cast("array<double>")
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        parr = F.array(*[F.lit(x) for x in p])
        bit = F.when(dot(v, parr) >= 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        bucket = bucket + F.shiftleft(bit, i)
    return emb.select(F.col(id_col), bucket.alias("bucket"))


def lsh_topk(
    emb: DataFrame,
    query_vec: Sequence[float],
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: search only the query's LSH bucket (single-probe).
    At scale the bucket column is a partition/cluster key, so this prunes
    the scan itself, not just the compute."""
    dim = len(query_vec)
    buckets = random_hyperplane_buckets(emb, n_planes, id_col, vec_col, dim)
    qdf_bucket = random_hyperplane_buckets(
        emb.sparkSession.createDataFrame(
            [(int(-1), [float(x) for x in query_vec])], f"{id_col} long, {vec_col} array<double>"
        ),
        n_planes,
        id_col,
        vec_col,
        dim,
    )
    cand = (
        emb.join(buckets, id_col)
        .join(F.broadcast(qdf_bucket.select("bucket")), "bucket", "left_semi")
    )
    return brute_force_topk(cand, query_vec, k, id_col, vec_col)
