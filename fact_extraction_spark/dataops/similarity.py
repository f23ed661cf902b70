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
