"""Similarity search over embedding columns (array<float>).

Two paths, both pure column algebra (``zip_with``/``aggregate`` dot
products — JVM-side, no Python UDF):

* ``cosine_topk``      — brute-force exact top-k against a query vector.
  The correctness baseline; O(corpus) per query but embarrassingly parallel
  and scan-bound, so it is also the right choice for one-off queries at any
  scale.
* ``lsh_bucketed_topk``— the scale path for repeated queries: a signed
  random-projection bucket per vector (hyperplanes = a fixed set of
  *reference vectors from the data itself*, deterministic and
  oracle-reproducible), candidates = same-bucket vectors, exact cosine
  re-rank inside the bucket. Index build is one scan; each query touches
  ~corpus/2^planes vectors.

At 100 TB the bucketed index is written as a parquet/Iceberg table
partitioned by ``bucket`` so a query prunes to its partition
(`spark.read.parquet(...).filter(bucket = q)` → partition pruning, no scan).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a, b) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def norm(a) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a, b) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    embeddings: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine against a single-row query (column ``qv``).
    Deterministic ties: (cosine desc, id)."""
    joined = embeddings.crossJoin(F.broadcast(query))
    scored = joined.select(
        F.col(id_col), F.round(cosine(F.col(vec_col), F.col("qv")), 6).alias("cosine"))
    return scored.orderBy(F.desc("cosine"), id_col).limit(k)


def projection_bucket(vec_col: str, planes: list[list[float]]) -> Column:
    """Signed-projection LSH bucket id: bit j = (vec · plane_j >= 0).

    ``planes`` are literal arrays (broadcast as constants into codegen).
    """
    bits = []
    for j, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        bits.append(
            F.when(dot(F.col(vec_col), p) >= 0, F.lit(1 << j)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


def reference_planes(embeddings: DataFrame, n_planes: int = 2,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     stride: int = 97) -> list[list[float]]:
    """Deterministic hyperplanes drawn from the data: the vectors with
    ``id % stride == 0``, first ``n_planes`` by id. Reproducible by any
    engine reading the same table (no RNG)."""
    rows = (embeddings.filter(F.col(id_col) % stride == 0)
            .orderBy(id_col).limit(n_planes).select(vec_col).collect())
    return [list(r[vec_col]) for r in rows]


def cosine_neardup_pairs(
    embeddings: DataFrame,
    planes: list[list[float]],
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, cosine) with
    id_a < id_b and cosine ≥ threshold.

    Candidates = vectors sharing a signed-projection bucket (high-cosine
    pairs agree on hyperplane signs with probability 1 - θ/π per plane),
    verified by the exact cosine. The self-join is quadratic only WITHIN
    buckets — ``planes`` controls the bucket count, so at corpus scale the
    blowup is bounded by the largest bucket, and the join shuffles on the
    bucket key (bucket-partition the materialized table to co-locate it).
    """
    b = embeddings.withColumn("bucket", projection_bucket(vec_col, planes))
    left = b.select(F.col(id_col).alias("id_a"),
                    F.col(vec_col).alias("va"), "bucket")
    right = b.select(F.col(id_col).alias("id_b"),
                     F.col(vec_col).alias("vb"), "bucket")
    pairs = left.join(right, "bucket").filter(F.col("id_a") < F.col("id_b"))
    return (
        pairs.select(
            "id_a", "id_b",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def lsh_bucketed_topk(
    embeddings: DataFrame,
    query: DataFrame,
    planes: list[list[float]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN: restrict the exact cosine re-rank to the query's bucket.

    Returns (id, cosine) of the top-k *within the bucket* — approximate
    globally, exact within the candidate set.
    """
    bucketed = embeddings.withColumn("bucket", projection_bucket(vec_col, planes))
    q = query.withColumn("qbucket", projection_bucket("qv", planes))
    cands = bucketed.join(F.broadcast(q), F.col("bucket") == F.col("qbucket"))
    scored = cands.select(
        F.col(id_col), F.round(cosine(F.col(vec_col), F.col("qv")), 6).alias("cosine"))
    return scored.orderBy(F.desc("cosine"), id_col).limit(k)
